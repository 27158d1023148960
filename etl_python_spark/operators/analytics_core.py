"""Core analytics query family: aggregations, windows, rollups, pivots.

Each query re-expresses one reference semantic (SURVEY.md §2.4/2.5)
over the TESTDATA star schema.  All plans are pure Catalyst: hash
aggregates with map-side partials, window exchanges on explicit keys,
no Python in the data path.  Money aggregates go through DECIMAL (see
functions.numeric) so results are bit-identical across engines and
across shuffle orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import cents, csum, dsum, sql_csum
from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# A1+A3+A5+A6+A7: the Faturamento stored-procedure shape
# (ref: scripts_sql/Faturamento.sql:1-177 — derived-table aggregate,
#  countDistinct carteira, ratio KPIs with NULLIF, WITH ROLLUP total row
#  labeled via IFNULL(...,'SOMA'))
# ---------------------------------------------------------------------------

def q_faturamento_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue panel per nation for one year, with a rollup 'SOMA' row.

    Spark plan: broadcast-join the tiny nation dim into orders⨝customer,
    then ``rollup`` — a single shuffle on the grouping key; the total
    row costs nothing extra (rollup expands grouping sets in the same
    aggregate).

    ``pedidos`` is COUNT(o_orderkey), not COUNT(DISTINCT): o_orderkey
    is the fact's key and the dim joins are 1:1, so the values are
    identical (the oracle asserts that) — but a second distinct
    aggregate would add another 3-way Expand multiplication of the
    fact before the shuffle, which is the dominant cost at scale.
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1998)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    fact = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)

    agg = (
        fact.rollup("n_name")
        .agg(
            F.grouping("n_name").alias("_g"),
            dsum("o_totalprice").alias("faturamento"),
            F.count("o_orderkey").alias("pedidos"),
            F.countDistinct("o_custkey").alias("carteira"),
        )
        .select(
            F.when(F.col("_g") == 1, F.lit("SOMA"))
            .otherwise(F.col("n_name"))
            .alias("vendedor"),
            "faturamento",
            "pedidos",
            "carteira",
            F.round(
                F.col("faturamento") / F.nullif(F.col("pedidos").cast("double"), F.lit(0.0)),
                2,
            ).alias("ticket_medio"),
        )
    )
    return agg


ORACLE_FATURAMENTO = """
WITH fact AS (
  SELECT n.n_name, o.o_orderkey, o.o_custkey, o.o_totalprice
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE year(o.o_orderdate) = 1998
)
SELECT
  CASE WHEN GROUPING(n_name) = 1 THEN 'SOMA' ELSE n_name END AS vendedor,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento,
  COUNT(DISTINCT o_orderkey) AS pedidos,
  COUNT(DISTINCT o_custkey) AS carteira,
  ROUND(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        / NULLIF(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE), 0.0), 2) AS ticket_medio
FROM fact
GROUP BY ROLLUP (n_name)
"""


# ---------------------------------------------------------------------------
# §3.2 parameterized stored-procedure surface
# (ref: scripts_sql/Faturamento.sql:1-32 — IN p_mes_nome/p_ano params,
#  UPPER normalization, month-name CASE incl. the unaccented 'MARCO'
#  alias, SIGNAL SQLSTATE '45000' on invalid input)
# ---------------------------------------------------------------------------

# month-name → number, including the reference's unaccented alias
_MONTHS_PT = {
    "JANEIRO": 1, "FEVEREIRO": 2, "MARÇO": 3, "MARCO": 3, "ABRIL": 4,
    "MAIO": 5, "JUNHO": 6, "JULHO": 7, "AGOSTO": 8, "SETEMBRO": 9,
    "OUTUBRO": 10, "NOVEMBRO": 11, "DEZEMBRO": 12,
}


def month_number_pt_or_raise(mes_nome: str) -> int:
    """Normalize a pt-BR month-name parameter exactly like the proc's
    prologue: UPPER + CASE ladder; invalid input raises (the Python
    analogue of SIGNAL SQLSTATE '45000')."""
    num = _MONTHS_PT.get(str(mes_nome).strip().upper())
    if num is None:
        raise ValueError(
            "Nome de mês inválido. Use JANEIRO, FEVEREIRO, ... DEZEMBRO."
        )
    return num


def faturamento(
    spark: SparkSession, sf_dir: str, mes_nome: str, ano: int
) -> DataFrame:
    """``CALL Faturamento('NOVEMBRO', 1998)`` as a Python function: the
    parameterized month/year revenue panel with rollup total.  The
    month filter lands on the scan as a pushed predicate; the plan is
    the same broadcast-dims + single-rollup-shuffle shape as
    :func:`q_faturamento_rollup`."""
    mes = month_number_pt_or_raise(mes_nome)
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == int(ano)) & (F.month("o_orderdate") == mes)
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    fact = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    return (
        fact.rollup("n_name")
        .agg(
            F.grouping("n_name").alias("_g"),
            dsum("o_totalprice").alias("faturamento"),
            F.count("o_orderkey").alias("pedidos"),
            F.countDistinct("o_custkey").alias("carteira"),
        )
        .select(
            F.when(F.col("_g") == 1, F.lit("SOMA"))
            .otherwise(F.col("n_name"))
            .alias("vendedor"),
            "faturamento",
            "pedidos",
            "carteira",
            F.round(
                F.col("faturamento")
                / F.nullif(F.col("pedidos").cast("double"), F.lit(0.0)),
                2,
            ).alias("ticket_medio"),
        )
    )


def q_faturamento_proc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return faturamento(spark, sf_dir, "novembro", 1998)


ORACLE_FATURAMENTO_PROC = """
WITH fact AS (
  SELECT n.n_name, o.o_orderkey, o.o_custkey, o.o_totalprice
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE year(o.o_orderdate) = 1998 AND month(o.o_orderdate) = 11
)
SELECT
  CASE WHEN GROUPING(n_name) = 1 THEN 'SOMA' ELSE n_name END AS vendedor,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento,
  COUNT(o_orderkey) AS pedidos,
  COUNT(DISTINCT o_custkey) AS carteira,
  ROUND(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        / NULLIF(CAST(COUNT(o_orderkey) AS DOUBLE), 0.0), 2) AS ticket_medio
FROM fact
GROUP BY ROLLUP (n_name)
"""


# ---------------------------------------------------------------------------
# W1: ROW_NUMBER top-N per group
# (ref: Códigos Úteis SQL/Top 10 Faturamento Por Vendedora (6 meses).sql:13-24)
# ---------------------------------------------------------------------------

def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by revenue inside each nation.

    Shape: aggregate first (shrinks the window input to one row per
    customer), then a single window exchange partitioned by nation.
    Deterministic tie-break on custkey.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    per_cust = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(dsum("o_totalprice").alias("faturamento"))
    )
    # Single rank-limit window (r17, reverting r16's salted two-phase):
    # Spark already plans `row_number() <= K` as WindowGroupLimit
    # Partial/Final — every MAP task prunes to its local top-5 per
    # nation BEFORE the exchange, so the reducer sorts at most
    # #map_tasks*5 rows per nation, never a whole nation.  The r16
    # salt stage duplicated that map-side prune at the cost of one
    # extra full exchange + sort on a headline query (the before-plan
    # already carried WindowGroupLimit Partial; r16 verdict item 4).
    w = Window.partitionBy("n_name").orderBy(
        F.desc("faturamento"), F.asc("c_custkey")
    )
    return (
        per_cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("n_name", "c_custkey", "faturamento", "rn")
    )


ORACLE_TOP_CUSTOMERS = """
WITH per_cust AS (
  SELECT n.n_name, c.c_custkey,
         ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, c.c_custkey
), ranked AS (
  SELECT n_name, c_custkey, faturamento,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY faturamento DESC, c_custkey ASC) AS rn
  FROM per_cust
)
SELECT n_name, c_custkey, faturamento, rn FROM ranked WHERE rn <= 5
"""


# ---------------------------------------------------------------------------
# W2: LAG month-over-month   (ref: SMT_Reparos_MoM.sql:29)
# ---------------------------------------------------------------------------

def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with previous-month value and % variation."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("mes")
        )
        .agg(dsum("o_totalprice").alias("faturamento"))
    )
    w = Window.orderBy("mes")
    return monthly.select(
        "mes",
        "faturamento",
        F.lag("faturamento").over(w).alias("mes_anterior"),
        F.round(
            (F.col("faturamento") / F.nullif(F.lag("faturamento").over(w), F.lit(0.0)) - 1.0)
            * 100.0,
            4,
        ).alias("var_pct"),
    )


ORACLE_MOM = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mes,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento
  FROM orders GROUP BY 1
)
SELECT mes, faturamento,
       LAG(faturamento) OVER (ORDER BY mes) AS mes_anterior,
       ROUND((faturamento / NULLIF(LAG(faturamento) OVER (ORDER BY mes), 0.0) - 1.0) * 100.0, 4) AS var_pct
FROM monthly
"""


# ---------------------------------------------------------------------------
# W3: LAG partitioned — YoY same month   (ref: SMT_Reparos_YoY.sql:29)
# ---------------------------------------------------------------------------

def q_yoy_same_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.year("o_orderdate").alias("ano"), F.month("o_orderdate").alias("mes")
        )
        .agg(dsum("o_totalprice").alias("faturamento"))
    )
    w = Window.partitionBy("mes").orderBy("ano")
    return monthly.select(
        "ano",
        "mes",
        "faturamento",
        F.lag("faturamento").over(w).alias("ano_anterior"),
        F.round(
            (F.col("faturamento") / F.nullif(F.lag("faturamento").over(w), F.lit(0.0)) - 1.0)
            * 100.0,
            4,
        ).alias("yoy_pct"),
    )


ORACLE_YOY = """
WITH monthly AS (
  SELECT year(o_orderdate) AS ano, month(o_orderdate) AS mes,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento
  FROM orders GROUP BY 1, 2
)
SELECT ano, mes, faturamento,
       LAG(faturamento) OVER (PARTITION BY mes ORDER BY ano) AS ano_anterior,
       ROUND((faturamento / NULLIF(LAG(faturamento) OVER (PARTITION BY mes ORDER BY ano), 0.0) - 1.0) * 100.0, 4) AS yoy_pct
FROM monthly
"""


# ---------------------------------------------------------------------------
# A5: conditional aggregation year-pivot  (ref: Cenario_YearToYear.sql:35-38,
# Mix_Mensal_MM.sql:17-36 — SUM(IF(year=Y, x, 0)) columns)
# ---------------------------------------------------------------------------

def q_year_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue pivoted into fixed year columns + growth %.

    Conditional-sum form (not ``.pivot()``) so the pivot columns are
    statically known — one aggregate, no second pass to discover keys.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def year_sum(y: int):
        return F.round(
            F.sum(
                F.when(
                    F.year("o_orderdate") == y,
                    F.col("o_totalprice").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            ).cast("double"),
            2,
        )

    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            year_sum(1997).alias("fat_1997"),
            year_sum(1998).alias("fat_1998"),
        )
        .select(
            "n_name",
            "fat_1997",
            "fat_1998",
            F.round(
                (F.col("fat_1998") / F.nullif(F.col("fat_1997"), F.lit(0.0)) - 1.0) * 100.0,
                4,
            ).alias("crescimento_pct"),
        )
    )


ORACLE_YEAR_PIVOT = """
SELECT n.n_name,
       ROUND(CAST(SUM(CASE WHEN year(o.o_orderdate) = 1997 THEN CAST(o.o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS fat_1997,
       ROUND(CAST(SUM(CASE WHEN year(o.o_orderdate) = 1998 THEN CAST(o.o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS fat_1998,
       ROUND((ROUND(CAST(SUM(CASE WHEN year(o.o_orderdate) = 1998 THEN CAST(o.o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2)
              / NULLIF(ROUND(CAST(SUM(CASE WHEN year(o.o_orderdate) = 1997 THEN CAST(o.o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2), 0.0) - 1.0) * 100.0, 4) AS crescimento_pct
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# W4: windowed total → % of total   (ref: View_SMT_AçõesDefinidas.sql:11,44)
# ---------------------------------------------------------------------------

def q_share_of_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count per (status, priority) with % share inside status."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("qtd")
    )
    w = Window.partitionBy("o_orderstatus")
    return counts.select(
        "o_orderstatus",
        "o_orderpriority",
        "qtd",
        F.round(F.col("qtd") / F.sum("qtd").over(w) * 100.0, 4).alias("pct_grupo"),
    )


ORACLE_SHARE = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS qtd
  FROM orders GROUP BY 1, 2
)
SELECT o_orderstatus, o_orderpriority, qtd,
       ROUND(CAST(qtd AS DOUBLE) / SUM(qtd) OVER (PARTITION BY o_orderstatus) * 100.0, 4) AS pct_grupo
FROM counts
"""


# ---------------------------------------------------------------------------
# P6: parameterized range buckets  (ref: Códigos Úteis SQL/Recorrência.sql:36-45)
# A7 label conventions ride along.
# ---------------------------------------------------------------------------

def q_recency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer recency cohorts: days since last order, bucketed with a
    CASE ladder, counted per bucket.  Anchor = max order date in the
    data (deterministic stand-in for CURDATE())."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("d"))
    last = orders.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("ultima")
    )
    joined = last.crossJoin(F.broadcast(anchor)).select(
        "o_custkey", F.datediff(F.col("d"), F.col("ultima")).alias("dias")
    )
    bucket = (
        F.when(F.col("dias") <= 30, "0-30")
        .when(F.col("dias") <= 90, "31-90")
        .when(F.col("dias") <= 180, "91-180")
        .when(F.col("dias") <= 365, "181-365")
        .otherwise("365+")
    )
    return (
        joined.select(bucket.alias("faixa"))
        .groupBy("faixa")
        .agg(F.count("*").alias("clientes"))
    )


ORACLE_RECENCY = """
WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d FROM orders),
last_order AS (
  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS ultima FROM orders GROUP BY 1
), dias AS (
  SELECT o_custkey, date_diff('day', ultima, (SELECT d FROM anchor)) AS dias FROM last_order
)
SELECT CASE WHEN dias <= 30 THEN '0-30'
            WHEN dias <= 90 THEN '31-90'
            WHEN dias <= 180 THEN '91-180'
            WHEN dias <= 365 THEN '181-365'
            ELSE '365+' END AS faixa,
       COUNT(*) AS clientes
FROM dias GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A9 + A10 + A11: HAVING reincidence + ordered string_agg + conditional count
# (ref: SP_SMT_Reincidencia_Reparos.sql:16-42, SLA de Produção - Completo.sql:118)
# ---------------------------------------------------------------------------

def q_reincidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with more than 3 urgent-ish orders: order count,
    conditional count, first/last dates, and the ordered trail of order
    keys (GROUP_CONCAT SEPARATOR ' -> ' analogue)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("pedidos"),
            F.count(
                F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1))
            ).alias("urgentes"),
            F.min(F.col("o_orderdate").cast("date")).alias("primeiro"),
            F.max(F.col("o_orderdate").cast("date")).alias("ultimo"),
            F.concat_ws(
                " -> ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
                        )
                    ),
                    lambda x: x.o_orderkey.cast("string"),
                ),
            ).alias("trilha"),
        )
        .filter(F.col("pedidos") > 3)
    )


ORACLE_REINCIDENCE = """
SELECT o_custkey,
       COUNT(*) AS pedidos,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS urgentes,
       MIN(CAST(o_orderdate AS DATE)) AS primeiro,
       MAX(CAST(o_orderdate AS DATE)) AS ultimo,
       string_agg(CAST(o_orderkey AS VARCHAR), ' -> ' ORDER BY o_orderdate, o_orderkey) AS trilha
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 3
"""


# ---------------------------------------------------------------------------
# A8/O4: manual total row via UNION ALL re-aggregation
# (ref: PainelSDR_Report.sql:91-116, Inadimplencia.sql:44-67)
# ---------------------------------------------------------------------------

def q_union_detail_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region revenue rows plus a 'TOTAL' row appended via union —
    the reference's manual-total idiom (kept alongside the rollup form
    to cover both)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    fact = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    detail = fact.groupBy("r_name").agg(dsum("o_totalprice").alias("faturamento"))
    total = fact.agg(dsum("o_totalprice").alias("faturamento")).select(
        F.lit("TOTAL").alias("r_name"), "faturamento"
    )
    return detail.unionByName(total).withColumn(
        "ordem", F.when(F.col("r_name") == "TOTAL", F.lit(1)).otherwise(F.lit(0))
    )


ORACLE_UNION_TOTAL = """
WITH fact AS (
  SELECT r.r_name, o.o_totalprice
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT r_name,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento,
       0 AS ordem
FROM fact GROUP BY r_name
UNION ALL
SELECT 'TOTAL' AS r_name,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento,
       1 AS ordem
FROM fact
"""


# ---------------------------------------------------------------------------
# W6: rolling mean + cumulative sum (ref: Modelo de Previsão de
# Vendas.py:103-108 — shift(1), rolling(3).mean(), cumsum())
# ---------------------------------------------------------------------------

def q_rolling_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with 3-month rolling mean and running total."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("mes")
        )
        .agg(dsum("o_totalprice").alias("faturamento"))
    )
    w_roll = Window.orderBy("mes").rowsBetween(-2, 0)
    w_cum = Window.orderBy("mes").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "mes",
        "faturamento",
        F.round(F.avg("faturamento").over(w_roll), 4).alias("media_3m"),
        F.round(F.sum("faturamento").over(w_cum), 2).alias("acumulado"),
    )


ORACLE_ROLLING = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mes,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento
  FROM orders GROUP BY 1
)
SELECT mes, faturamento,
       ROUND(AVG(faturamento) OVER (ORDER BY mes ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS media_3m,
       ROUND(SUM(faturamento) OVER (ORDER BY mes ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS acumulado
FROM monthly
"""


# ---------------------------------------------------------------------------
# P8: date-window predicate anchored at data max (last-3-months filter)
# (ref: Recorrencia_TKM_30D.sql:26-27; Top 10 ... (6 meses).sql:17-19)
# ---------------------------------------------------------------------------

def q_last_quarter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per mktsegment over the 3 months ending at the newest
    order date. The range predicate lands in PushedFilters at the scan
    once the scalar anchor is resolved."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    anchor_row = orders.agg(F.max(F.col("o_orderdate").cast("date"))).collect()[0][0]
    cutoff = anchor_row  # date
    recent = orders.filter(
        F.col("o_orderdate").cast("date") > F.add_months(F.lit(cutoff), -3)
    )
    return (
        recent.join(customer, recent.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            dsum("o_totalprice").alias("faturamento"),
            F.countDistinct("o_custkey").alias("clientes"),
        )
    )


ORACLE_LAST_QUARTER = """
WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d FROM orders)
SELECT c.c_mktsegment,
       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento,
       COUNT(DISTINCT o.o_custkey) AS clientes
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE CAST(o.o_orderdate AS DATE) > (SELECT d - INTERVAL 3 MONTH FROM anchor)
GROUP BY c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# A14: one-pass data profiling aggregates
# (ref: Algoritmo de Estruturação de Dados.py:86-126,743-761)
# ---------------------------------------------------------------------------

def q_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema profile of `customer`: per column → rows, nulls,
    distincts, uniqueness ratio.  Single aggregate pass (all measures
    in one job), then unpivoted to narrow form."""
    customer = load_table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    aggs = [F.count("*").alias("_rows")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
    wide = customer.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}', {c}__nulls, {c}__distinct")
    narrow = wide.selectExpr(
        "_rows",
        f"stack({len(cols)}, {', '.join(stack_args)}) as (coluna, n_nulos, n_distintos)",
    )
    return narrow.select(
        "coluna",
        F.col("_rows").alias("n_linhas"),
        "n_nulos",
        "n_distintos",
        F.round(F.col("n_distintos") / F.col("_rows").cast("double"), 6).alias(
            "taxa_unicidade"
        ),
    )


ORACLE_PROFILE = """
WITH stats AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS k_nulls, COUNT(DISTINCT c_custkey) AS k_dist,
         COUNT(CASE WHEN c_name IS NULL THEN 1 END) AS n_nulls, COUNT(DISTINCT c_name) AS n_dist,
         COUNT(CASE WHEN c_nationkey IS NULL THEN 1 END) AS nk_nulls, COUNT(DISTINCT c_nationkey) AS nk_dist,
         COUNT(CASE WHEN c_acctbal IS NULL THEN 1 END) AS a_nulls, COUNT(DISTINCT c_acctbal) AS a_dist,
         COUNT(CASE WHEN c_mktsegment IS NULL THEN 1 END) AS m_nulls, COUNT(DISTINCT c_mktsegment) AS m_dist
  FROM customer
)
SELECT 'c_custkey' AS coluna, n_rows AS n_linhas, k_nulls AS n_nulos, k_dist AS n_distintos,
       ROUND(CAST(k_dist AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS taxa_unicidade FROM stats
UNION ALL
SELECT 'c_name', n_rows, n_nulls, n_dist, ROUND(CAST(n_dist AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) FROM stats
UNION ALL
SELECT 'c_nationkey', n_rows, nk_nulls, nk_dist, ROUND(CAST(nk_dist AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) FROM stats
UNION ALL
SELECT 'c_acctbal', n_rows, a_nulls, a_dist, ROUND(CAST(a_dist AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) FROM stats
UNION ALL
SELECT 'c_mktsegment', n_rows, m_nulls, m_dist, ROUND(CAST(m_dist AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) FROM stats
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary on lineitem (the canonical scan+agg
    benchmark shape; semantics are public TPC-H): one pass over the
    fact, map-side partial aggregation, shuffle only on the 4-value
    (returnflag, linestatus) key.  DECIMAL accumulation keeps sums
    order-independent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2).alias("sum_base_price"),
            csum(disc_price).alias("sum_disc_price"),
            csum(charge).alias("sum_charge"),
            F.round(F.avg(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 4).alias("avg_qty"),
            F.round(F.avg(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 4).alias("avg_price"),
            F.round(F.avg(F.col("l_discount").cast("decimal(18,4)")).cast("double"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
       {sql_csum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_csum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       ROUND(CAST(AVG(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS avg_qty,
       ROUND(CAST(AVG(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS avg_price,
       ROUND(CAST(AVG(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (public semantics, adapted to this
    schema's columns): revenue of unshipped BUILDING-segment orders,
    top 10.  Plan: segment filter pushes into the customer scan, the
    filtered customer side broadcasts into orders, lineitem joins on
    the order key (the only big⨝big edge), then TakeOrdered — no full
    sort of the aggregate."""
    cutoff = F.lit("1995-03-15").cast("date")
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < cutoff
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > cutoff
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(
            F.broadcast(
                orders.join(
                    F.broadcast(customer.select("c_custkey")),
                    orders.o_custkey == F.col("c_custkey"),
                ).select("o_orderkey", "o_orderdate", "o_orderpriority")
            ),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("data_pedido"),
            "o_orderpriority",
        )
        .agg(csum(rev).alias("receita"))
        .orderBy(F.desc("receita"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_SHIPPING_PRIORITY = f"""
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS data_pedido, o_orderpriority,
       {sql_csum('l_extendedprice * (1 - l_discount)')} AS receita
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
GROUP BY 1, 2, 3
ORDER BY receita DESC, l_orderkey ASC
LIMIT 10
"""


def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (public semantics): revenue delta from discount
    tweaks — the maximally-selective scan+aggregate.  Every predicate
    reaches the parquet scan as a pushed filter (the plan-discipline
    test family asserts PushedFilters); no shuffle beyond the single
    global aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1995-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-01-01").cast("date"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        csum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "receita_adicional"
        ),
        F.count("*").alias("itens"),
    )


ORACLE_FORECAST_REVENUE = f"""
SELECT {sql_csum('l_extendedprice * l_discount')}
         AS receita_adicional,
       COUNT(*) AS itens
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


def q_cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (returnflag, linestatus) — all 4 grains in one
    aggregate pass (the generalization past rollup/grouping-sets the
    reference's MySQL 8 also lacked)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.count("*").alias("itens"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2
            ).alias("qtd_total"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("TODOS")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("TODOS")).alias("situacao"),
            "g_flag",
            "g_status",
            "itens",
            "qtd_total",
        )
    )


ORACLE_CUBE = """
SELECT COALESCE(l_returnflag, 'TODOS') AS flag,
       COALESCE(l_linestatus, 'TODOS') AS situacao,
       GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status,
       COUNT(*) AS itens,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS qtd_total
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_supplier_region_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier-nation net revenue and share of its region's total
    (W4 windowed-total over a 4-table join: lineitem ⨝ supplier ⨝
    nation ⨝ region — the fact joins only broadcast dims, so the plan
    is one scan + one aggregate shuffle + one small window)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_nation = (
        lineitem.join(
            F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(cents(net)).alias("receita_cents"))
    )
    # share is computed on integer cents end-to-end: the windowed total
    # is a BIGINT sum, so partial-aggregation order can never move it.
    w_region = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name",
        "n_name",
        (F.col("receita_cents").cast("double") / F.lit(100.0)).alias("receita"),
        F.round(
            F.col("receita_cents").cast("double")
            / F.nullif(
                F.sum("receita_cents").over(w_region).cast("double"), F.lit(0.0)
            )
            * 100,
            4,
        ).alias("share_regiao_pct"),
    )


ORACLE_SUPPLIER_SHARE = """
WITH per_nation AS (
  SELECT r.r_name, n.n_name,
         CAST(SUM(CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS receita_cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name,
       CAST(receita_cents AS DOUBLE) / 100.0 AS receita,
       ROUND(CAST(receita_cents AS DOUBLE)
             / NULLIF(CAST(SUM(receita_cents) OVER (PARTITION BY r_name) AS DOUBLE), 0.0)
             * 100, 4) AS share_regiao_pct
FROM per_nation
"""


def q_formatted_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pt-BR display-formatting parity (the SURVEY §7 'hard' item —
    ref: Faturamento.sql:46-65 ``CONCAT('R$ ', FORMAT(x,2,'de_DE'))``):
    numeric column and its 'R$ 1.234,56' display string side by side,
    via :func:`format_brl` (format_number + separator translate, pure
    codegen).  The numeric column stays canonical; the string is the
    presentation edge — both oracle-checked."""
    from ..functions.cleaning import format_brl

    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(dsum("o_totalprice").alias("receita"))
    return agg.select(
        "o_orderpriority", "receita", format_brl("receita").alias("receita_fmt")
    )


ORACLE_FORMATTED = """
WITH agg AS (
  SELECT o_orderpriority,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS receita
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, receita,
       'R$ ' || replace(format('{:,}', CAST(floor(receita) AS BIGINT)), ',', '.')
             || ',' || lpad(CAST(CAST(round(receita * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0')
         AS receita_fmt
FROM agg
"""


def q_grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the generalization past the reference's WITH
    ROLLUP (Spark supplies it free): order counts and revenue at
    (priority×status), (priority), (status), and grand-total grains in
    ONE aggregate pass, grain labeled via ``grouping()`` flags."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'TODAS') AS prioridade,
               COALESCE(o_orderstatus, 'TODOS') AS situacao,
               grouping(o_orderpriority) + 2 * grouping(o_orderstatus) AS grao,
               COUNT(*) AS pedidos,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS receita
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT COALESCE(o_orderpriority, 'TODAS') AS prioridade,
       COALESCE(o_orderstatus, 'TODOS') AS situacao,
       grouping(o_orderpriority) + 2 * grouping(o_orderstatus) AS grao,
       COUNT(*) AS pedidos,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS receita
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus), ())
"""


_MESES_PT = [
    "JAN", "FEV", "MAR", "ABR", "MAI", "JUN",
    "JUL", "AGO", "SET", "OUT", "NOV", "DEZ",
]


def q_mix_monthly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly mix pivot (ref: scripts_sql/Mix_Mensal_MM.sql:17-36 —
    SUM(IF month=m) columns JAN..DEZ per dimension row, for one year).

    Conditional-sum pivot with statically-known pt-BR month columns —
    a single hash aggregate over the fact (the dynamic
    PREPARE/EXECUTE pivot of Showroom_Comparativo_V2.sql:6-75 becomes
    ordinary Python parameterization of the same expression list)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1998
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def month_sum(m: int):
        return F.round(
            F.sum(
                F.when(
                    F.month("o_orderdate") == m,
                    F.col("o_totalprice").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            ).cast("double"),
            2,
        )

    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            *[month_sum(m + 1).alias(name) for m, name in enumerate(_MESES_PT)],
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
            ).alias("TOTAL"),
        )
    )


_MES_COLS_SQL = ",\n       ".join(
    f"ROUND(CAST(SUM(CASE WHEN month(o_orderdate) = {m + 1} "
    f"THEN CAST(o_totalprice AS DECIMAL(18,2)) "
    f"ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE), 2) AS {name}"
    for m, name in enumerate(_MESES_PT)
)

ORACLE_MIX_MONTHLY = f"""
SELECT n_name,
       {_MES_COLS_SQL},
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS TOTAL
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE year(o_orderdate) = 1998
GROUP BY n_name
"""


def q_json_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON document output (S14 — ref: ScriptsSQL - Belmicro/JSON
    Resposta 1.sql:18-28 ``JSON_ARRAYAGG(JSON_OBJECT(...))``): one JSON
    array of order objects per customer, built JVM-side with
    ``to_json(array_sort(collect_list(struct(...))))``.  The sort makes
    the aggregation order-independent (collect_list order is undefined
    after a shuffle), which is also what makes the string
    hash-comparable across engines."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey")),
        orders.o_custkey == cust.c_custkey,
    )
    return (
        joined.groupBy("c_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.to_json(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("o_orderkey").alias("pedido"),
                            F.col("o_orderstatus").alias("situacao"),
                        )
                    )
                )
            ).alias("pedidos_json"),
        )
    )


ORACLE_JSON_EXPORT = """
SELECT c_custkey, COUNT(*) AS n_orders,
       CAST(to_json(list_sort(list({'pedido': o_orderkey, 'situacao': o_orderstatus}))) AS VARCHAR)
         AS pedidos_json
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_custkey <= 50
GROUP BY c_custkey
"""


def q_revenue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-value percentile report per priority class (p25 /
    p50 / p75 / p90, linear interpolation) plus count and mean — the
    distribution profile behind SLA thresholds and outlier cutoffs.

    ``percentile`` here is the EXACT aggregate (it buffers each
    group's values), which is fine when the group count is tiny and
    bounded (5 priority classes) but is the wrong tool for
    high-cardinality groups at 100 TB — there the one-line swap is
    ``approx_percentile(col, p, accuracy)`` (t-digest, bounded error,
    constant memory), and this query is the audit baseline for
    choosing its accuracy knob.  4dp rounding absorbs the two
    engines' interpolation-arithmetic drift."""
    orders = load_table(spark, sf_dir, "orders")

    def pct(p: float, name: str):
        return F.round(
            F.expr(f"percentile(o_totalprice, {p})"), 4
        ).alias(name)

    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.avg("o_totalprice"), 4).alias("media"),
        pct(0.25, "p25"),
        pct(0.5, "p50"),
        pct(0.75, "p75"),
        pct(0.9, "p90"),
    )


ORACLE_REVENUE_PERCENTILES = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(AVG(o_totalprice), 4) AS media,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
FROM orders
GROUP BY 1
"""


def q_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) cent allocation: distribute each
    order's header total across its line items proportional to the
    line value, in EXACT integer cents — floor shares first, then one
    extra cent to the lines with the largest remainders (tie-break on
    line number) until the allocation reconciles to the pool exactly.
    The classic finance-ETL proration (freight/discount rateio) where
    ROUND() would leave per-order cent drift that auditors reject;
    the per-order sum == pool invariant is pinned in a unit test and
    the whole computation is integer arithmetic, so the DuckDB oracle
    matches hash-exactly.

    Scale shape: one keyed equi-join (AQE broadcasts the header side
    at small SF, shuffles by order key at scale) and three windows all
    partitioned by order key — per-order frames are line-count-sized,
    nothing global."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        cents(F.col("l_extendedprice")).alias("w"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        cents(F.col("o_totalprice")).alias("pool"),
    )
    j = li.join(orders, "l_orderkey")
    w_ord = Window.partitionBy("l_orderkey")
    j = (
        j.withColumn("wtot", F.sum("w").over(w_ord))
        # floor share and remainder in exact 64-bit integers:
        # pool*w <= ~5e14, far under overflow
        .withColumn("base", F.expr("pool * w div wtot"))
        .withColumn("rem", F.expr("pool * w % wtot"))
    )
    j = j.withColumn("short", F.col("pool") - F.sum("base").over(w_ord))
    rnk = F.row_number().over(
        Window.partitionBy("l_orderkey").orderBy(
            F.desc("rem"), F.asc("l_linenumber")
        )
    )
    return j.withColumn("rnk", rnk).select(
        "l_orderkey",
        "l_linenumber",
        F.col("w").alias("line_cents"),
        (F.col("base") + (F.col("rnk") <= F.col("short")).cast("long")).alias(
            "allocated_cents"
        ),
    )


ORACLE_PRORATION = """
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS w
  FROM lineitem
), hdr AS (
  SELECT o_orderkey AS l_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS pool
  FROM orders
), j AS (
  SELECT li.*, hdr.pool,
         SUM(w) OVER (PARTITION BY li.l_orderkey) AS wtot
  FROM li JOIN hdr USING (l_orderkey)
), shares AS (
  -- DuckDB promotes BIGINT*BIGINT to HUGEINT; cast back (pool*w
  -- <= ~5e14, well inside 64 bits)
  SELECT *,
         CAST(pool * w // wtot AS BIGINT) AS base,
         CAST(pool * w % wtot AS BIGINT) AS rem
  FROM j
), ranked AS (
  SELECT *,
         pool - SUM(base) OVER (PARTITION BY l_orderkey) AS short,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY rem DESC, l_linenumber ASC) AS rnk
  FROM shares
)
SELECT l_orderkey, l_linenumber,
       w AS line_cents,
       CAST(base + CASE WHEN rnk <= short THEN 1 ELSE 0 END AS BIGINT)
         AS allocated_cents
FROM ranked
"""


_CORR_COLS = (
    # (name, exact-integer expression builder) — quantized units so
    # every moment is an exact integer
    ("qty", lambda: F.col("l_quantity").cast("long")),
    ("price_c", lambda: cents(F.col("l_extendedprice"))),
    ("disc_bp", lambda: F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("long")),
    ("tax_bp", lambda: F.floor(F.col("l_tax") * 10000 + F.lit(0.5)).cast("long")),
)


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem measures
    (quantity, price, discount, tax), computed from EXACT INTEGER
    moments: values quantize to integer units (cents / basis points),
    every Σx, Σx², Σxy accumulates in DECIMAL(38,0) — summation order
    cannot move a bit (the engine-native corr() aggregates use float
    accumulators whose partial-merge order differs between engines;
    this is the sum-order rule applied to second moments) — and the
    only float arithmetic is one pinned expression per pair at the
    end, 4dp floor-quantized.  corrplot is part of the reference's
    exploratory toolkit (`analise-exploratoria.Rmd` preamble).

    Scale shape: ONE full-pass hash aggregate producing a single row
    of 14 moments (map-side partial combine; bytes cross the wire),
    then the 6 pair rows explode from that one row.  Headroom note:
    n·Σx² stays inside DECIMAL(38,0) up to ~1e12 rows of cent-scale
    values; past that, pre-scale the units."""
    li = load_table(spark, sf_dir, "lineitem").select(
        *[expr().alias(name) for name, expr in _CORR_COLS]
    )
    names = [name for name, _ in _CORR_COLS]
    d38 = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast(d38).alias("n")]
    for a in names:
        aggs.append(F.sum(F.col(a).cast(d38)).alias(f"s_{a}"))
        aggs.append(
            F.sum((F.col(a).cast(d38) * F.col(a).cast(d38))).alias(f"ss_{a}")
        )
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(
                F.sum((F.col(a).cast(d38) * F.col(b).cast(d38))).alias(
                    f"sp_{a}_{b}"
                )
            )
    mom = li.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("n")
        cov = (n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")).cast(
            "double"
        )
        var_a = (n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast(
            "double"
        )
        var_b = (n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")).cast(
            "double"
        )
        r = cov / F.nullif(F.sqrt(var_a) * F.sqrt(var_b), F.lit(0.0))
        return F.floor(r * 10000 + F.lit(0.5)) / 10000

    pairs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            corr_expr(a, b).alias("r"),
        )
        for i, a in enumerate(names)
        for b in names[i + 1 :]
    ]
    return mom.select(
        F.col("n").cast("long").alias("n_rows"),
        F.explode(F.array(*pairs)).alias("p"),
    ).select("p.col_a", "p.col_b", "n_rows", "p.r")


def _oracle_corr_matrix() -> str:
    names = [name for name, _ in _CORR_COLS]
    exprs = {
        "qty": "CAST(l_quantity AS BIGINT)",
        "price_c": "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)",
        "disc_bp": "CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)",
        "tax_bp": "CAST(FLOOR(l_tax * 10000 + 0.5) AS BIGINT)",
    }
    aggs = ["CAST(COUNT(*) AS DECIMAL(38,0)) AS n"]
    for a in names:
        aggs.append(f"SUM(CAST({exprs[a]} AS DECIMAL(38,0))) AS s_{a}")
        aggs.append(
            f"SUM(CAST({exprs[a]} AS DECIMAL(38,0))"
            f" * CAST({exprs[a]} AS DECIMAL(38,0))) AS ss_{a}"
        )
    sels = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(
                f"SUM(CAST({exprs[a]} AS DECIMAL(38,0))"
                f" * CAST({exprs[b]} AS DECIMAL(38,0))) AS sp_{a}_{b}"
            )
            r = (
                f"CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
                f" / NULLIF(sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))"
                f" * sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE)), 0.0)"
            )
            sels.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b,"
                f" CAST(n AS BIGINT) AS n_rows,"
                f" FLOOR(({r}) * 10000 + 0.5) / 10000 AS r FROM mom"
            )
    return (
        "WITH mom AS (\n  SELECT " + ",\n         ".join(aggs)
        + "\n  FROM lineitem\n)\n" + "\nUNION ALL\n".join(sels)
    )


ORACLE_CORR_MATRIX = _oracle_corr_matrix()


QUERIES = {
    "proration": q_proration,
    "corr_matrix": q_corr_matrix,
    "faturamento_rollup": q_faturamento_rollup,
    "faturamento_proc": q_faturamento_proc,
    "json_export": q_json_export,
    "mix_monthly_pivot": q_mix_monthly_pivot,
    "pricing_summary": q_pricing_summary,
    "shipping_priority": q_shipping_priority,
    "forecast_revenue_change": q_forecast_revenue_change,
    "cube_report": q_cube_report,
    "supplier_region_share": q_supplier_region_share,
    "grouping_sets_report": q_grouping_sets_report,
    "formatted_report": q_formatted_report,
    "top_customers_per_nation": q_top_customers_per_nation,
    "mom_growth": q_mom_growth,
    "yoy_same_month": q_yoy_same_month,
    "year_pivot": q_year_pivot,
    "share_of_priority": q_share_of_priority,
    "recency_buckets": q_recency_buckets,
    "reincidence": q_reincidence,
    "union_detail_total": q_union_detail_total,
    "rolling_metrics": q_rolling_metrics,
    "last_quarter_revenue": q_last_quarter_revenue,
    "profile_customer": q_profile_customer,
    "revenue_percentiles": q_revenue_percentiles,
}

ORACLES = {
    "proration": ORACLE_PRORATION,
    "corr_matrix": ORACLE_CORR_MATRIX,
    "faturamento_rollup": ORACLE_FATURAMENTO,
    "faturamento_proc": ORACLE_FATURAMENTO_PROC,
    "json_export": ORACLE_JSON_EXPORT,
    "mix_monthly_pivot": ORACLE_MIX_MONTHLY,
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "forecast_revenue_change": ORACLE_FORECAST_REVENUE,
    "cube_report": ORACLE_CUBE,
    "supplier_region_share": ORACLE_SUPPLIER_SHARE,
    "grouping_sets_report": ORACLE_GROUPING_SETS,
    "formatted_report": ORACLE_FORMATTED,
    "top_customers_per_nation": ORACLE_TOP_CUSTOMERS,
    "mom_growth": ORACLE_MOM,
    "yoy_same_month": ORACLE_YOY,
    "year_pivot": ORACLE_YEAR_PIVOT,
    "share_of_priority": ORACLE_SHARE,
    "recency_buckets": ORACLE_RECENCY,
    "reincidence": ORACLE_REINCIDENCE,
    "union_detail_total": ORACLE_UNION_TOTAL,
    "rolling_metrics": ORACLE_ROLLING,
    "last_quarter_revenue": ORACLE_LAST_QUARTER,
    "profile_customer": ORACLE_PROFILE,
    "revenue_percentiles": ORACLE_REVENUE_PERCENTILES,
}
