"""Catalog-based integrity verifier.

Re-expresses the reference's INFORMATION_SCHEMA audit
(scripts_sql/Verificador_de_Integridade.sql:24-52) and database linter
(Database Linter.py:25-66) against the Spark catalog: per registered
table → column inventory, presence of an id-like column, row count,
and constraint-style checks (no-negative, accounting balance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def verify_catalog(spark: SparkSession, tables: list[str] | None = None) -> list[Row]:
    names = tables or [t.name for t in spark.catalog.listTables()]
    out = []
    for name in names:
        cols = spark.catalog.listColumns(name)
        col_names = [c.name for c in cols]
        id_like = [c for c in col_names if c.lower().endswith(("key", "_id", "id"))]
        out.append(
            Row(
                table=name,
                n_columns=len(col_names),
                columns=", ".join(sorted(col_names)),
                has_id_column=bool(id_like),
                id_candidates=", ".join(sorted(id_like)),
            )
        )
    return out


def pk_candidate(columns: list[str]) -> str | None:
    """First id-like column in schema order — the PK suggestion rule
    (ref: Database Linter.py:58-66 'id'/'id_dli' probe; Algoritmo de
    Estruturação de Dados.py:237-255 key-candidacy)."""
    return next(
        (c for c in columns if c.lower().endswith(("key", "id"))), None
    )


def linter_report(spark: SparkSession, frames: dict[str, DataFrame]) -> DataFrame:
    """Per-table structure audit, the engine-side re-expression of
    Verificador_de_Integridade.sql:24-52 + the linter's PK repair
    decision (Database Linter.py auto_fix_structure): column inventory
    (ordered GROUP_CONCAT), the id-like PK candidate, and a
    data-verified uniqueness check of that candidate — one tiny
    aggregate per table, unioned into a single catalog frame.

    ``status`` mirrors the linter's actions: 'Estrutura OK' when the
    candidate is a genuine key (unique + non-null), else
    "PK 'id_dli' criada" (the linter would synthesize a surrogate)."""
    parts = []
    for name, df in sorted(frames.items()):
        if name.startswith("old_"):  # ref: NOT LIKE 'old_%'
            continue
        cand = pk_candidate(df.columns)
        if cand is None:
            agg = df.agg(
                F.count("*").alias("n_rows"),
                F.lit(None).cast("long").alias("n_dist"),
                F.lit(None).cast("long").alias("n_nonnull"),
            )
        else:
            agg = df.agg(
                F.count("*").alias("n_rows"),
                F.countDistinct(cand).alias("n_dist"),
                F.count(cand).alias("n_nonnull"),
            )
        pk_ok = (
            (F.col("n_dist") == F.col("n_rows"))
            & (F.col("n_nonnull") == F.col("n_rows"))
            if cand is not None
            else F.lit(False)
        )
        parts.append(
            agg.select(
                F.lit(name).alias("tabela"),
                F.lit(len(df.columns)).alias("n_cols"),
                F.lit(", ".join(df.columns)).alias("colunas"),
                F.lit(cand).cast("string").alias("pk_candidate"),
                "n_rows",
                pk_ok.alias("pk_ok"),
                F.when(pk_ok, F.lit("Estrutura OK"))
                .otherwise(F.lit("PK 'id_dli' criada"))
                .alias("status"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def check_no_negative(df: DataFrame, col: str) -> int:
    """Domain-violation counter (ref: ETL - TELECONTROL.py:60-62 —
    negative SLA audit). Returns the number of violating rows."""
    return df.filter(F.col(col) < 0).count()


def check_balance(df: DataFrame, a: str, b: str, tol: float = 0.01) -> DataFrame:
    """Accounting integrity |a+b| < tol → 'Íntegro'
    (ref: JSON Resposta 1.sql:25)."""
    status = F.when(
        F.abs(F.col(a) + F.col(b)) < tol, F.lit("Íntegro")
    ).otherwise(F.lit("Inconsistente"))
    return df.withColumn("integridade", status)
