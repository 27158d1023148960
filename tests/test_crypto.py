"""Column-encryption utility (functions/crypto.py): key-file handling
and AES-GCM column roundtrip — the Spark form of the reference's
Fernet encrypt-before-store capability."""

import base64

import pytest
from pyspark.sql import functions as F

from etl_python_spark.functions.crypto import (
    decrypt_columns,
    encrypt_columns,
    generate_key,
    load_key,
    write_staging_encrypted,
)


def test_key_file_roundtrip(tmp_path):
    path = str(tmp_path / "chave.key")
    key = generate_key(path)
    assert len(key) == 32
    assert load_key(path) == key
    # stored urlsafe-base64, like the reference's chave.key
    with open(path, "rb") as f:
        assert base64.urlsafe_b64decode(f.read()) == key


def test_key_length_validation(tmp_path):
    with pytest.raises(ValueError, match="AES key"):
        generate_key(n_bytes=15)
    bad = tmp_path / "bad.key"
    bad.write_bytes(base64.urlsafe_b64encode(b"short"))
    with pytest.raises(ValueError, match="AES"):
        load_key(str(bad))


def test_encrypt_decrypt_roundtrip(spark):
    key = generate_key()
    df = spark.createDataFrame(
        [(1, "maçã açaí", 10.5), (2, None, 2.25), (3, "plain", None)],
        "id int, nome string, valor double",
    )
    enc = encrypt_columns(df, ["nome", "valor"], key)
    rows = {r.id: r for r in enc.collect()}
    # ciphertext is base64 text, NULLs stay NULL, id untouched
    assert rows[2].nome is None and rows[3].valor is None
    assert rows[1].nome != "maçã açaí" and base64.b64decode(rows[1].nome)
    dec = {r.id: r for r in decrypt_columns(enc, ["nome", "valor"], key).collect()}
    assert dec[1].nome == "maçã açaí"
    assert dec[1].valor == "10.5"  # non-strings roundtrip as their string form
    assert dec[2].nome is None


def test_decrypt_wrong_key_fails(spark):
    k1, k2 = generate_key(), generate_key()
    df = spark.createDataFrame([("secreto",)], "v string")
    enc = encrypt_columns(df, ["v"], k1)
    with pytest.raises(Exception):  # GCM auth failure surfaces as a Spark error
        decrypt_columns(enc, ["v"], k2).collect()


def test_missing_column_fails_fast(spark):
    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(ValueError, match="not in frame"):
        encrypt_columns(df, ["nope"], generate_key())


def test_write_staging_encrypted(spark, tmp_path):
    key = generate_key()
    df = spark.createDataFrame(
        [(1, 2024, "cpf-111"), (2, 2025, "cpf-222")], "id int, ano int, doc string"
    )
    path = str(tmp_path / "enc_out")
    with pytest.raises(ValueError, match="partition columns"):
        write_staging_encrypted(df, path, ["ano"], key, partition_by=["ano"])
    write_staging_encrypted(df, path, ["doc"], key, partition_by=["ano"])
    back = spark.read.parquet(path)
    stored = {r.id: r.doc for r in back.collect()}
    assert stored[1] != "cpf-111"  # at rest: ciphertext only
    dec = {r.id: r.doc for r in decrypt_columns(back, ["doc"], key).collect()}
    assert dec == {1: "cpf-111", 2: "cpf-222"}
