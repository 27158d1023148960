"""Column-level encryption at rest (SURVEY §2 utility parity).

Re-expresses the reference's encryption capability — a Fernet key is
generated once and stored to ``chave.key`` (Chave de Criptografia
.py:1-7), then data is encrypted with it before retention storage
(Criptografia de Banco de Dados.py:39-56) — in the Spark-native form:
AES-GCM **column** expressions (``aes_encrypt``/``aes_decrypt``) that
run JVM-side inside whole-stage codegen, so a 100 TB load encrypts
sensitive columns in the same single pass that writes them, with no
Python stage and no extra shuffle.  (The reference encrypts whole
mysqldump files because its engine has no columnar layer; an engine
does this per column so non-sensitive columns stay queryable.)

Key handling mirrors the reference's file convention: 32 random bytes,
urlsafe-base64 in a key file.  GCM prepends a random IV and appends an
auth tag per value — ciphertexts are non-deterministic and tamper-
evident; equality joins on encrypted columns are therefore impossible
by design (use a keyed hash column for that).
"""

from __future__ import annotations

import base64
import os
import secrets

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KEY_BYTES = (16, 24, 32)  # AES-128 / 192 / 256


def generate_key(path: str | None = None, n_bytes: int = 32) -> bytes:
    """Create a random AES key; optionally store it urlsafe-base64 in a
    key file (the reference's ``chave.key`` convention, with 0o600
    permissions).  Returns the RAW key bytes."""
    if n_bytes not in _KEY_BYTES:
        raise ValueError(f"AES key must be one of {_KEY_BYTES} bytes, got {n_bytes}")
    key = secrets.token_bytes(n_bytes)
    if path:
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
        with os.fdopen(fd, "wb") as f:
            f.write(base64.urlsafe_b64encode(key))
    return key


def load_key(path: str) -> bytes:
    """Read a urlsafe-base64 key file back to raw bytes, validating the
    AES length up front (driver-side fail-fast, never a mid-job
    executor error)."""
    with open(path, "rb") as f:
        key = base64.urlsafe_b64decode(f.read().strip())
    if len(key) not in _KEY_BYTES:
        raise ValueError(
            f"key file {path} holds {len(key)} bytes; AES needs one of {_KEY_BYTES}"
        )
    return key


def _key_lit(key: bytes) -> Column:
    if len(key) not in _KEY_BYTES:
        raise ValueError(f"AES key must be one of {_KEY_BYTES} bytes, got {len(key)}")
    return F.lit(bytearray(key))


def encrypt_column(col: Column | str, key: bytes, mode: str = "GCM") -> Column:
    """AES-encrypt one column → base64 string.  Values are cast to
    string first (one canonical serialized form per value), so any
    column type roundtrips through ``decrypt_column`` as its string
    form; NULLs stay NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.base64(
        F.aes_encrypt(c.cast("string").cast("binary"), _key_lit(key), F.lit(mode))
    )


def decrypt_column(col: Column | str, key: bytes, mode: str = "GCM") -> Column:
    """Inverse of :func:`encrypt_column`: base64 → AES-decrypt →
    string.  GCM authenticates: a wrong key or tampered ciphertext
    raises instead of returning garbage."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_decrypt(F.unbase64(c), _key_lit(key), F.lit(mode)).cast("string")


def encrypt_columns(
    df: DataFrame, cols: list[str], key: bytes, mode: str = "GCM"
) -> DataFrame:
    """Replace ``cols`` with their encrypted form in one projection —
    stays inside whole-stage codegen, zero extra passes."""
    missing = sorted(set(cols) - set(df.columns))
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    return df.withColumns(
        {c: encrypt_column(c, key, mode) for c in cols}
    )


def decrypt_columns(
    df: DataFrame, cols: list[str], key: bytes, mode: str = "GCM"
) -> DataFrame:
    missing = sorted(set(cols) - set(df.columns))
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    return df.withColumns(
        {c: decrypt_column(c, key, mode) for c in cols}
    )


def write_staging_encrypted(
    df: DataFrame,
    path: str,
    encrypt_cols: list[str],
    key: bytes,
    partition_by: list[str] | None = None,
) -> None:
    """Staging write with sensitive columns encrypted in the same pass
    (the reference's encrypt-before-store loop as a writer option).
    Partition columns may not be encrypted — their values become
    directory names."""
    overlap = sorted(set(encrypt_cols) & set(partition_by or []))
    if overlap:
        raise ValueError(
            f"cannot encrypt partition columns {overlap}: partition values "
            "are plaintext directory names by construction"
        )
    from ..sources.writers import write_staging

    write_staging(encrypt_columns(df, encrypt_cols, key), path, partition_by)
