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
