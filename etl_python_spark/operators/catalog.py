"""Metadata-as-data operators (SURVEY.md §1.1 / §2.3 J11).

The reference audits INFORMATION_SCHEMA like a table
(scripts_sql/Verificador_de_Integridade.sql:24-52, Identifica Colunas -
Fatos.sql, Database Linter.py:58-66); here the Spark catalog plays that
role, and the DuckDB oracle states the same audit over its own
``information_schema.columns`` — the assertion is that both engines
agree on the schema inventory of the registered tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..model.integrity import verify_catalog
from ..sources.tables import TABLES, register_views


def q_catalog_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table column inventory + id-column audit from the catalog.

    Catalog listings are driver-side by nature (metadata, not data);
    the result is a dim-sized DataFrame.  Ref semantics:
    Verificador_de_Integridade.sql (ordered GROUP_CONCAT of columns,
    PK presence flag)."""
    register_views(spark, sf_dir)
    rows = verify_catalog(spark, list(TABLES))
    return spark.createDataFrame(
        [
            {
                "tabela": r.table,
                "n_columns": r.n_columns,
                "colunas": r.columns,
                "has_id_column": r.has_id_column,
                "id_candidates": r.id_candidates,
            }
            for r in rows
        ],
        schema="tabela string, n_columns long, colunas string, "
        "has_id_column boolean, id_candidates string",
    )


_TABLES_IN = ", ".join(f"'{t}'" for t in TABLES)

ORACLE_CATALOG = f"""
SELECT table_name AS tabela,
       COUNT(*) AS n_columns,
       string_agg(column_name, ', ' ORDER BY column_name) AS colunas,
       bool_or(lower(column_name) LIKE '%key'
               OR lower(column_name) LIKE '%\\_id' ESCAPE '\\'
               OR lower(column_name) LIKE '%id') AS has_id_column,
       COALESCE(string_agg(column_name, ', ' ORDER BY column_name)
                FILTER (WHERE lower(column_name) LIKE '%key'
                        OR lower(column_name) LIKE '%\\_id' ESCAPE '\\'
                        OR lower(column_name) LIKE '%id'), '') AS id_candidates
FROM information_schema.columns
WHERE table_name IN ({_TABLES_IN})
GROUP BY 1
"""

QUERIES = {
    "catalog_integrity": q_catalog_integrity,
}

ORACLES = {
    "catalog_integrity": ORACLE_CATALOG,
}
