"""End-to-end staging lifecycle (SURVEY §3.1 — the ETL - Venda
B2B.py:104-364 template): dirty pt-BR CSV → schema registry projection
→ scalar cleaning → essential-key dropna → audited staging write →
read-back aggregate checksum.

Mirrors the reference's audit prints as assertions: rows excluded per
rule, money-sum sanity check after cleaning (ETL - Mix de
Produtos.py:146-148), null normalization."""

import csv

from pyspark.sql import functions as F

from etl_python_spark.functions.cleaning import digits_only, parse_brl
from etl_python_spark.model.registry import DatasetSchema
from etl_python_spark.sources.readers import read_csv_sniffed
from etl_python_spark.sources.writers import write_staging

RAW_ROWS = [
    # numero, cliente, cnpj, valor (pt-BR), data (dayfirst), uf
    ("1001", "ACME LTDA", "11.222.333/0001-81", "R$ 1.234,56", "05/03/2026", "SP"),
    ("1002", "BETA SA", "99999999000199", "R$ 10.000,00", "07/03/2026", "RJ"),
    ("1003", "", "", "750,25", "08/03/2026", "MG"),  # cliente vazio → mantém
    ("", "SEM NUMERO", "123", "1,00", "09/03/2026", "RS"),  # sem chave → cai
    ("1005", "GAMA ME", "11222333000181", "", "10/03/2026", "PR"),  # sem valor
]


def _write_raw_csv(path):
    with open(path, "w", newline="", encoding="cp1252") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(["Número Único", "Cliente", "CNPJ", "Valor Total", "Data Negociação", "UF"])
        w.writerows(RAW_ROWS)


SCHEMA = DatasetSchema(
    name="staging_pedidos",
    mapping={
        "Número Único": ("numero_unico", "long"),
        "Cliente": ("cliente", "string"),
        "CNPJ": ("cnpj", "string"),
        "Valor Total": ("valor_total_raw", "string"),
        "Data Negociação": ("data_negociacao_raw", "string"),
        "UF": ("uf", "string"),
        "Coluna Inexistente": ("extra", "string"),  # tolerated → NULL
    },
    required=["numero_unico"],
)


def test_staging_pipeline_end_to_end(spark, tmp_path):
    raw_path = str(tmp_path / "venda.csv")
    _write_raw_csv(raw_path)

    raw = read_csv_sniffed(spark, raw_path)
    assert raw.count() == 5

    staged = SCHEMA.apply(raw)
    # dropna on the essential key: the keyless row is excluded (P2 audit)
    assert staged.count() == 4

    cleaned = staged.select(
        "numero_unico",
        F.coalesce(F.nullif(F.trim("cliente"), F.lit("")), F.lit(None)).alias(
            "cliente"
        ),
        digits_only("cnpj").alias("cnpj"),
        parse_brl("valor_total_raw").alias("valor_total"),
        F.to_date("data_negociacao_raw", "dd/MM/yyyy").alias("data_negociacao"),
        "uf",
        F.current_timestamp().alias("data_carga"),
    )
    rows = {r.numero_unico: r for r in cleaned.collect()}
    # pt-BR currency parsing incl. thousand/decimal disambiguation
    assert rows[1001].valor_total == 1234.56
    assert rows[1002].valor_total == 10000.00
    assert rows[1003].valor_total == 750.25
    assert rows[1005].valor_total is None
    # money-sum sanity check (aggregate checksum audit)
    total = cleaned.agg(F.round(F.sum("valor_total"), 2).alias("s")).first().s
    assert total == round(1234.56 + 10000.00 + 750.25, 2)
    # CNPJ digits-only preserves leading zeros as string
    assert rows[1001].cnpj == "11222333000181"
    # dayfirst date parse
    assert str(rows[1001].data_negociacao) == "2026-03-05"
    # tolerated missing source column became typed NULL
    assert "extra" not in cleaned.columns  # not selected downstream

    # audited staging write + read-back
    out = str(tmp_path / "staging_pedidos")
    n = write_staging(cleaned, out, audit=True)
    assert n == 4
    back = spark.read.parquet(out)
    assert back.count() == 4
    assert (
        back.agg(F.round(F.sum("valor_total"), 2).alias("s")).first().s == total
    )


def test_curation_to_training_export_pipeline(spark, tmp_path):
    """The LLM-data workload end to end through the orchestrator:
    curation keep/drop → stratified sampling of the keepers → packed
    training sequences written as deterministic hash shards — the
    composition a user of the engine actually schedules.  Asserts the
    runner's per-job accounting AND the physical export (shard count,
    no doc lost between stages than the curation/sampling decisions
    explain)."""
    from tests.conftest import SF_SMOKE

    from etl_python_spark.operators.corpus import q_sample_stratified
    from etl_python_spark.operators.curation import q_curation_pipeline
    from etl_python_spark.pipelines.runner import run_jobs
    from etl_python_spark.sources.writers import write_training_shards

    kept_path = str(tmp_path / "kept_docs")
    shard_path = str(tmp_path / "shards")

    def job_curate(s):
        decisions = q_curation_pipeline(s, SF_SMOKE)
        kept = decisions.filter(F.col("manter"))
        # q_sample_stratified already returns only the sampled rows
        sampled = q_sample_stratified(s, SF_SMOKE).select("doc_id")
        final = kept.join(sampled, "doc_id")
        final.write.mode("overwrite").parquet(kept_path)
        return None

    def job_export(s):
        docs = s.read.parquet(kept_path)
        write_training_shards(docs, shard_path, shards=4, shard_key="doc_id")
        return None

    def job_report(s):
        return s.read.parquet(shard_path).groupBy().count()

    results = run_jobs(
        spark,
        {"curate": job_curate, "export": job_export, "report": job_report},
    )
    assert [r.status for r in results] == ["OK", "OK", "OK"]

    import glob as _glob

    files = _glob.glob(shard_path + "/shard=*/part-*.parquet")
    assert 0 < len(files) <= 4  # deterministic hash shards, one file each
    assert len(files) == len(_glob.glob(shard_path + "/shard=*"))
    exported = spark.read.parquet(shard_path)
    assert exported.count() == spark.read.parquet(kept_path).count() > 0
    # every exported doc passed BOTH gates
    assert exported.filter(~F.col("manter")).count() == 0


def test_incremental_ingest_into_txn_table_exactly_once_content(spark, tmp_path):
    """The composition the docstrings advertise: read_incremental
    (at-least-once, deferred manifest commit) feeding txn_merge_upsert
    (content-idempotent, atomic publish).  A crash between the merge
    and the manifest commit reprocesses the same files on rerun, and
    the keyed merge keeps the table content exactly-once."""
    import glob as _glob
    import os
    import shutil as _sh

    from etl_python_spark.sources import txn
    from etl_python_spark.sources.readers import read_incremental

    landing = tmp_path / "landing"
    landing.mkdir()
    manifest = str(tmp_path / "manifest.jsonl")
    table = str(tmp_path / "state")

    def land(name, rows):
        stg = str(tmp_path / f"_stg_{name}")
        spark.createDataFrame(rows, "id long, v string").coalesce(1) \
            .write.mode("overwrite").parquet(stg)
        (part,) = _glob.glob(stg + "/part-*.parquet")
        _sh.copy(part, str(landing / name))

    def ingest(commit_after=True):
        df, new, commit = read_incremental(spark, str(landing), manifest)
        if df is None:
            return 0
        txn.txn_merge_upsert(spark, df, table, keys=["id"])
        if commit_after:
            commit()
        return len(new)

    land("a.parquet", [(1, "a"), (2, "b")])
    assert ingest() == 1
    assert {r.id: r.v for r in txn.txn_read(spark, table).collect()} == {
        1: "a", 2: "b"
    }

    # batch 2 merges but CRASHES before the manifest commit
    land("b.parquet", [(2, "B"), (3, "c")])
    assert ingest(commit_after=False) == 1
    v_after_crash = txn.read_commit(spark, table)["version"]

    # rerun: the same file reprocesses (at-least-once)...
    assert ingest() == 1
    got = {r.id: r.v for r in txn.txn_read(spark, table).collect()}
    # ...and content is exactly-once: the keyed merge absorbed the replay
    assert got == {1: "a", 2: "B", 3: "c"}
    assert txn.read_commit(spark, table)["version"] == v_after_crash + 1

    # nothing new: no reads, no commits
    assert ingest() == 0
    assert txn.read_commit(spark, table)["version"] == v_after_crash + 1
