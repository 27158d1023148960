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
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..model.integrity import verify_catalog
from ..sources.tables import TABLES, load_table, register_views


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

# Data-quality expectations evaluated over lineitem in ONE aggregate
# pass (contrast: model/profiler.py runs one job per candidate — fine
# for dim audits, wrong for a fact table; this is the fact-table
# shape).  Each rule is a conditional sum inside a single hash
# aggregate, so a 100 TB scan computes every expectation at once.
_DQ_RULES = [
    ("not_null_l_orderkey", "l_orderkey IS NULL"),
    ("range_l_quantity_1_50", "l_quantity < 1 OR l_quantity > 50"),
    ("range_l_discount_0_01", "l_discount < 0 OR l_discount > 0.1"),
    (
        "range_l_shipdate_1992_1999",
        "l_shipdate < DATE '1992-01-01' OR l_shipdate > DATE '1999-12-31'",
    ),
    ("positive_l_extendedprice", "l_extendedprice <= 0"),
    ("enum_l_returnflag", "l_returnflag NOT IN ('A', 'N', 'R')"),
]


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations report: one row per rule with its violation count,
    rows checked, and pass flag — the Deequ/Great-Expectations-style
    contract gate a load job runs before publishing a partition."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.expr(cond).cast("int")).alias(f"v{i}")
            for i, (_, cond) in enumerate(_DQ_RULES)
        ],
    )
    rules = F.array(
        *[
            F.struct(
                F.lit(name).alias("regra"),
                F.col(f"v{i}").cast("bigint").alias("violacoes"),
            )
            for i, (name, _) in enumerate(_DQ_RULES)
        ]
    )
    return agg.select("n", F.explode(rules).alias("r")).select(
        F.col("r.regra").alias("regra"),
        F.col("r.violacoes").alias("violacoes"),
        F.col("n").alias("verificadas"),
        (F.col("r.violacoes") == 0).alias("aprovado"),
    )


ORACLE_DQ_REPORT = (
    "WITH a AS (SELECT COUNT(*) AS n, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS v{i}"
        for i, (_, cond) in enumerate(_DQ_RULES)
    )
    + " FROM lineitem)\n"
    + "\nUNION ALL ".join(
        f"SELECT '{name}' AS regra, v{i} AS violacoes, n AS verificadas, "
        f"v{i} = 0 AS aprovado FROM a"
        for i, (name, _) in enumerate(_DQ_RULES)
    )
)


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots: keys only in
    the new snapshot are ``added``, keys that disappeared are
    ``removed``, keys present in both with a different payload are
    ``changed`` (unchanged rows are dropped — at 100 TB the diff
    output is delta-sized, not table-sized).  One full-outer join on
    the primary key; the payload comparison is a column equality (in
    production, a row-hash column computed in the scan projection).

    Snapshots are derived deterministically from ``orders`` so the
    oracle can restate them: snapshot A drops keys ≡0 (mod 7),
    snapshot B drops keys ≡0 (mod 5) and bumps the price of keys ≡0
    (mod 3) by 1.00 — a synthetic but complete add/remove/change mix.
    The reference's closest analogue is its full-reload jobs; the diff
    is the Spark-first incremental replacement (cited: the DELETE+
    reINSERT pattern in Faturamento.sql / carga scripts)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("preco_a")
    )
    b = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.round(
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 3 == 0, F.lit(1.0)).otherwise(
                F.lit(0.0)
            ),
            2,
        ).alias("preco_b"),
    )
    j = a.join(b, "o_orderkey", "full_outer")
    status = (
        F.when(F.col("preco_a").isNull(), F.lit("added"))
        .when(F.col("preco_b").isNull(), F.lit("removed"))
        .when(F.col("preco_a") != F.col("preco_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "o_orderkey", status.alias("status"), "preco_a", "preco_b"
    ).filter(F.col("status") != "unchanged")


ORACLE_SNAPSHOT_DIFF = """
WITH a AS (
  SELECT o_orderkey, o_totalprice AS preco_a FROM orders WHERE o_orderkey % 7 <> 0
), b AS (
  SELECT o_orderkey,
         ROUND(o_totalprice + CASE WHEN o_orderkey % 3 = 0 THEN 1.0 ELSE 0.0 END, 2)
           AS preco_b
  FROM orders WHERE o_orderkey % 5 <> 0
), j AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey, a.preco_a, b.preco_b,
         CASE WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN b.o_orderkey IS NULL THEN 'removed'
              WHEN a.preco_a <> b.preco_b THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
)
SELECT o_orderkey, status, preco_a, preco_b FROM j WHERE status <> 'unchanged'
"""


def q_balance_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounting-integrity invariant (ref `ScriptsSQL - Belmicro/JSON
    Resposta 1.sql:25` and `CTE - Check de Integridade e Balanço
    Ativo-Passivo.sql`: ``ABS(ativo + passivo) < 0.01 → 'Íntegro'``):
    per order, the booked total (ativo) must reconcile with the sum of
    its line charges (passivo, negated) within one cent; the report
    rolls the verdicts up per order priority with the total absolute
    imbalance — the ledger-audit shape a load job runs before
    publishing financials.

    All money flows as exact integer cents (``cents``/``floor(x*100
    + .5)``) until the single final division, so the Íntegro boundary
    and the imbalance sum are bit-identical across engines — the
    tolerance test on raw doubles would flip on representation ulps.
    Scale shape: one lineitem aggregate keyed on the order key, one
    orders join on the same key (co-partitioned shuffle), then a
    K-row rollup."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    charge = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(cents(charge)).alias("passivo_cents")
    )
    j = orders.join(
        per_order, orders.o_orderkey == per_order.l_orderkey, "left"
    ).select(
        "o_orderpriority",
        (
            cents(F.col("o_totalprice"))
            - F.coalesce(F.col("passivo_cents"), F.lit(0))
        ).alias("saldo_cents"),
    )
    integro = (F.abs(F.col("saldo_cents")) < 1).cast("int")
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_pedidos"),
            F.sum(integro).cast("bigint").alias("n_integros"),
            (F.sum(F.abs(F.col("saldo_cents"))).cast("double") / F.lit(100.0))
            .alias("desvio_total"),
        )
        .withColumn("aprovado", F.col("n_integros") == F.col("n_pedidos"))
    )


_SQL_CENTS_TOTAL = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
_SQL_CENTS_CHARGE = (
    "CAST(FLOOR((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5)"
    " AS BIGINT)"
)

ORACLE_BALANCE_INTEGRITY = f"""
WITH per_order AS (
  SELECT l_orderkey, SUM({_SQL_CENTS_CHARGE}) AS passivo_cents
  FROM lineitem GROUP BY 1
), j AS (
  SELECT o.o_orderpriority,
         {_SQL_CENTS_TOTAL} - COALESCE(p.passivo_cents, 0) AS saldo_cents
  FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
)
SELECT o_orderpriority,
       COUNT(*) AS n_pedidos,
       CAST(SUM(CASE WHEN ABS(saldo_cents) < 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_integros,
       CAST(SUM(ABS(saldo_cents)) AS DOUBLE) / 100.0 AS desvio_total,
       CAST(SUM(CASE WHEN ABS(saldo_cents) < 1 THEN 1 ELSE 0 END) AS BIGINT)
         = COUNT(*) AS aprovado
FROM j GROUP BY 1
"""


QUERIES = {
    "catalog_integrity": q_catalog_integrity,
    "pk_audit": q_pk_audit,
    "dq_report": q_dq_report,
    "snapshot_diff": q_snapshot_diff,
    "balance_integrity": q_balance_integrity,
}

ORACLES = {
    "catalog_integrity": ORACLE_CATALOG,
    "pk_audit": ORACLE_PK_AUDIT,
    "dq_report": ORACLE_DQ_REPORT,
    "snapshot_diff": ORACLE_SNAPSHOT_DIFF,
    "balance_integrity": ORACLE_BALANCE_INTEGRITY,
}
