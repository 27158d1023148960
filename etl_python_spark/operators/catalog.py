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

def q_pk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-verified PK audit over every TESTDATA table: the id-like
    candidate column, whether it is a genuine key (unique + non-null,
    checked against the data, not just the name), and the linter's
    repair decision.  lineitem is the designed negative case: its
    l_orderkey candidate is non-unique (composite key), so the linter
    would synthesize a surrogate ("PK 'id_dli' criada")."""
    from ..model.integrity import linter_report
    from ..sources.tables import load_table

    frames = {t: load_table(spark, sf_dir, t) for t in TABLES}
    return linter_report(spark, frames)


def _sql_pk_block(table: str, cols: list[str]) -> str:
    from ..model.integrity import pk_candidate

    cand = pk_candidate(cols)
    inv = ", ".join(cols)
    if cand is None:
        return (
            f"SELECT '{table}' AS tabela, {len(cols)} AS n_cols, "
            f"'{inv}' AS colunas, CAST(NULL AS VARCHAR) AS pk_candidate, "
            "COUNT(*) AS n_rows, FALSE AS pk_ok, "
            f"'PK ''id_dli'' criada' AS status FROM {table}"
        )
    return (
        f"SELECT '{table}' AS tabela, {len(cols)} AS n_cols, "
        f"'{inv}' AS colunas, '{cand}' AS pk_candidate, COUNT(*) AS n_rows, "
        f"(COUNT(DISTINCT {cand}) = COUNT(*) AND COUNT({cand}) = COUNT(*)) AS pk_ok, "
        f"CASE WHEN COUNT(DISTINCT {cand}) = COUNT(*) AND COUNT({cand}) = COUNT(*) "
        "THEN 'Estrutura OK' ELSE 'PK ''id_dli'' criada' END AS status "
        f"FROM {table}"
    )


# Column inventories are part of the published TESTDATA schema
# (TESTDATA.md); stating them literally keeps the oracle pure SQL.
_TESTDATA_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

ORACLE_PK_AUDIT = "\nUNION ALL\n".join(
    _sql_pk_block(t, cols) for t, cols in sorted(_TESTDATA_COLUMNS.items())
)

QUERIES = {
    "catalog_integrity": q_catalog_integrity,
    "pk_audit": q_pk_audit,
}

ORACLES = {
    "catalog_integrity": ORACLE_CATALOG,
    "pk_audit": ORACLE_PK_AUDIT,
}
