"""Join family, set ops, and predicate patterns (SURVEY.md §2.2/2.3/2.6).

Join-strategy notes (the scale story):
- dims (region/nation) are always ``F.broadcast`` — no shuffle of the
  fact side, ever;
- fact⨝fact (orders⨝lineitem) is a shuffle hash/sort-merge join on the
  key both sides already group by, so AQE can reuse the exchange;
- semi/anti joins are expressed as ``left_semi``/``left_anti`` so no
  payload columns cross the wire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import csum, dsum, sql_csum
from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# J1: left equi-join enrichment ("PROCX") with composite key
# (ref: ETL - CRM.py:139-162 — leads ← IBGE cities on CIDADE|UF)
# ---------------------------------------------------------------------------

def q_left_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⟕ nation ⟕ region with a match-flag column (join
    coverage audit, ref ETL - CRM.py:158-160).  Dims broadcast."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left"
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("n_name").alias("nacao"),
            F.col("r_name").alias("regiao"),
            F.col("n_name").isNotNull().alias("match_ok"),
        )
    )


ORACLE_LEFT_ENRICHMENT = """
SELECT c.c_custkey, c.c_mktsegment, n.n_name AS nacao, r.r_name AS regiao,
       n.n_name IS NOT NULL AS match_ok
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
"""


# ---------------------------------------------------------------------------
# J2: full-outer join + key coalesce
# (ref: Algoritmo de Dados (Versão com Graficos).py:74-78)
# ---------------------------------------------------------------------------

def q_full_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1997 ⟗ customers active in 1998, one row per
    customer with both-year flags (the np.where key-coalesce idiom)."""
    orders = load_table(spark, sf_dir, "orders")
    y97 = (
        orders.filter(F.year("o_orderdate") == 1997)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("pedidos_1997"))
    )
    y98 = (
        orders.filter(F.year("o_orderdate") == 1998)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("pedidos_1998"))
    )
    return (
        y97.join(y98, "o_custkey", "full_outer")
        .select(
            F.col("o_custkey").alias("cliente"),
            F.coalesce("pedidos_1997", F.lit(0)).alias("pedidos_1997"),
            F.coalesce("pedidos_1998", F.lit(0)).alias("pedidos_1998"),
        )
        .withColumn(
            "situacao",
            F.when(
                (F.col("pedidos_1997") > 0) & (F.col("pedidos_1998") > 0), "RETIDO"
            )
            .when(F.col("pedidos_1998") > 0, "NOVO")
            .otherwise("CHURN"),
        )
    )


ORACLE_FULL_OUTER = """
WITH y97 AS (
  SELECT o_custkey, COUNT(*) AS pedidos_1997 FROM orders
  WHERE year(o_orderdate) = 1997 GROUP BY 1
), y98 AS (
  SELECT o_custkey, COUNT(*) AS pedidos_1998 FROM orders
  WHERE year(o_orderdate) = 1998 GROUP BY 1
)
SELECT COALESCE(y97.o_custkey, y98.o_custkey) AS cliente,
       COALESCE(pedidos_1997, 0) AS pedidos_1997,
       COALESCE(pedidos_1998, 0) AS pedidos_1998,
       CASE WHEN COALESCE(pedidos_1997,0) > 0 AND COALESCE(pedidos_1998,0) > 0 THEN 'RETIDO'
            WHEN COALESCE(pedidos_1998,0) > 0 THEN 'NOVO'
            ELSE 'CHURN' END AS situacao
FROM y97 FULL OUTER JOIN y98 ON y97.o_custkey = y98.o_custkey
"""


# ---------------------------------------------------------------------------
# J4: join on pre-aggregated/deduped subquery (avoid fan-out)
# (ref: SP_SMT_Reincidencia_Reparos.sql:23-27; Faturamento.sql:154-163)
# ---------------------------------------------------------------------------

def q_preagg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-level revenue joined against a pre-aggregated per-customer
    lifetime total — aggregate-then-join so the fan-out never happens."""
    orders = load_table(spark, sf_dir, "orders")
    lifetime = orders.groupBy("o_custkey").agg(
        dsum("o_totalprice").alias("fat_total_cliente")
    )
    recent = orders.filter(F.year("o_orderdate") == 1998).select(
        "o_orderkey", "o_custkey", F.round(F.col("o_totalprice"), 2).alias("valor")
    )
    return recent.join(lifetime, "o_custkey").select(
        "o_orderkey",
        "o_custkey",
        "valor",
        "fat_total_cliente",
        F.round(F.col("valor") / F.nullif(F.col("fat_total_cliente"), F.lit(0.0)) * 100.0, 4
        ).alias("pct_do_cliente"),
    )


ORACLE_PREAGG_JOIN = """
WITH lifetime AS (
  SELECT o_custkey,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS fat_total_cliente
  FROM orders GROUP BY 1
)
SELECT o.o_orderkey, o.o_custkey, ROUND(o.o_totalprice, 2) AS valor, l.fat_total_cliente,
       ROUND(ROUND(o.o_totalprice, 2) / NULLIF(l.fat_total_cliente, 0.0) * 100.0, 4) AS pct_do_cliente
FROM orders o JOIN lifetime l ON o.o_custkey = l.o_custkey
WHERE year(o.o_orderdate) = 1998
"""


# ---------------------------------------------------------------------------
# J5: join with non-equi range condition inside ON
# (ref: Códigos Úteis SQL/Recorrência.sql:21-23)
# ---------------------------------------------------------------------------

def q_range_condition_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⨝ lineitem on key AND ship-within-60-days range.  The
    equi part keeps it a hash join; the range lands as a join filter."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cond = (
        (orders.o_orderkey == lineitem.l_orderkey)
        & (lineitem.l_shipdate >= orders.o_orderdate)
        & (
            lineitem.l_shipdate
            <= F.date_add(F.col("o_orderdate").cast("date"), 60)
        )
    )
    return (
        orders.join(lineitem, cond)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("itens_rapidos"),
            csum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "receita_rapida"
            ),
        )
    )


ORACLE_RANGE_JOIN = f"""
SELECT o.o_orderstatus,
       COUNT(*) AS itens_rapidos,
       {sql_csum('l.l_extendedprice * (1 - l.l_discount)')} AS receita_rapida
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  AND l.l_shipdate >= o.o_orderdate
  AND l.l_shipdate <= CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
GROUP BY o.o_orderstatus
"""


# ---------------------------------------------------------------------------
# J8: semi-join (EXISTS)   (ref: JSON Resposta 1.sql:12-15)
# ---------------------------------------------------------------------------

def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers holding at least one open ('O') order — left_semi, so
    only keys travel."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    return customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("saldo"))


ORACLE_SEMI = """
SELECT c.c_custkey, c.c_mktsegment, ROUND(c.c_acctbal, 2) AS saldo
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
"""


# ---------------------------------------------------------------------------
# J9: anti-join (missing-in-dim report)   (ref: ETL - CRM.py:318-323)
# ---------------------------------------------------------------------------

def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no 1998 orders — the reference's
    'cities without IBGE match' report as a left_anti join (the year
    filter is pushed below the join build side)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1998
    )
    customer = load_table(spark, sf_dir, "customer")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


ORACLE_ANTI = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND year(o.o_orderdate) = 1998)
"""


# ---------------------------------------------------------------------------
# J10+W5: self-alignment via row_number ordinal then join
# (ref: Showroom_Comparativo_V2.sql:27-53)
# ---------------------------------------------------------------------------

def q_ordinal_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Align the daily event-count series of 'purchase' vs 'click' by
    day ordinal (nth active day of each series) — full-outer on the
    ordinal, replacing the reference's UNION-of-two-LEFT-JOINs."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type", F.col("ts").cast("date").alias("dia"))
        .agg(F.count("*").alias("qtd"))
    )
    w = Window.partitionBy("event_type").orderBy("dia")
    # calendar-sized; both full-outer sides read it — checkpoint so
    # the event aggregate + rank window run once.
    ranked = daily.withColumn(
        "ordinal", F.row_number().over(w)
    ).localCheckpoint(eager=True)
    a = ranked.filter(F.col("event_type") == "purchase").select(
        "ordinal",
        F.col("dia").alias("dia_purchase"),
        F.col("qtd").alias("qtd_purchase"),
    )
    b = ranked.filter(F.col("event_type") == "click").select(
        "ordinal", F.col("dia").alias("dia_click"), F.col("qtd").alias("qtd_click")
    )
    return a.join(b, "ordinal", "full_outer").select(
        "ordinal", "dia_purchase", "qtd_purchase", "dia_click", "qtd_click"
    )


ORACLE_ORDINAL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS dia, COUNT(*) AS qtd
  FROM events WHERE event_type IN ('purchase','click')
  GROUP BY 1, 2
), ranked AS (
  SELECT event_type, dia, qtd,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dia) AS ordinal
  FROM daily
), a AS (
  SELECT ordinal, dia AS dia_purchase, qtd AS qtd_purchase FROM ranked WHERE event_type = 'purchase'
), b AS (
  SELECT ordinal, dia AS dia_click, qtd AS qtd_click FROM ranked WHERE event_type = 'click'
)
SELECT COALESCE(a.ordinal, b.ordinal) AS ordinal, a.dia_purchase, a.qtd_purchase, b.dia_click, b.qtd_click
FROM a FULL OUTER JOIN b ON a.ordinal = b.ordinal
"""


# ---------------------------------------------------------------------------
# J12: argmax link join — latest order per customer
# (ref: SLA de Produção - Completo.sql:79-85,98)
# ---------------------------------------------------------------------------

def q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number()=1 form of MAX()-then-join-back (one shuffle instead
    of two, and no duplicate-max ambiguity)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("ultimo_pedido"),
            F.col("o_orderdate").cast("date").alias("data_ultimo"),
            F.round("o_totalprice", 2).alias("valor_ultimo"),
        )
    )


ORACLE_LATEST_ORDER = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey AS ultimo_pedido, CAST(o_orderdate AS DATE) AS data_ultimo,
       ROUND(o_totalprice, 2) AS valor_ultimo
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# P3/P4/P7: compound predicates, NOT-IN blacklist, LIKE/contains
# (ref: PainelSDR_Report.sql:33-61; Base de Produtos Mais Vendidos.py:61-76)
# ---------------------------------------------------------------------------

def q_blacklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts filtered by compound predicate: brand blacklist (NOT IN),
    name-contains, size range — all pushed to the parquet scan."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            (~F.col("p_brand").isin("Brand#11", "Brand#22"))
            & F.col("p_type").contains("ECO")
            & F.col("p_size").between(5, 30)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )


ORACLE_BLACKLIST = """
SELECT p_partkey, p_brand, p_type, p_size
FROM part
WHERE p_brand NOT IN ('Brand#11', 'Brand#22')
  AND p_type LIKE '%ECO%'
  AND p_size BETWEEN 5 AND 30
"""


# ---------------------------------------------------------------------------
# O2/O3: global top-N with custom sort key
# (ref: Gerador de Ranking de Vendas.py:41-45; Faturamento.sql:173-175)
# ---------------------------------------------------------------------------

def q_global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by value (TakeOrdered — no full sort at scale),
    deterministic tie-break on key."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("valor"),
            F.col("o_orderdate").cast("date").alias("data"),
        )
    )


ORACLE_GLOBAL_TOPN = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS valor, CAST(o_orderdate AS DATE) AS data
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# O5 + A13: union-distinct and dedup-as-aggregation
# (ref: Showroom_Comparativo_V2.sql:42; ETL - CRM.py:351-364)
# ---------------------------------------------------------------------------

def q_union_distinct_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (nationkey) values present in either customer or
    supplier — UNION dedup building a conformed dim key set."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


ORACLE_UNION_DISTINCT = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


SLA_DAYS = 90


def q_sla_leadtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA / lead-time consolidation (ref: SQLServer - Scripts/SLA de
    Produção - Completo.sql — per-OP completion via argmax link
    :79-85, DATEDIFF lead time :93, on-time status ladder :164-168,
    conditional counts :118):

    order completion = MAX(l_shipdate) per order (the J12 argmax
    folded into one partial-aggregated groupBy, not a join-back),
    lead = DATEDIFF(completion, order date), status = CASE lead ≤ 90,
    then per-priority roll-up with a conditional late count (A11) and
    a NULLIF-guarded late ratio (A6)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    done = lineitem.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("date")).alias("conclusao")
    )
    per_order = orders.join(
        done, orders.o_orderkey == done.l_orderkey
    ).select(
        "o_orderpriority",
        F.datediff(F.col("conclusao"), F.col("o_orderdate").cast("date")).alias(
            "lead_dias"
        ),
    )
    late = F.when(F.col("lead_dias") > SLA_DAYS, F.col("lead_dias"))
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("pedidos"),
            F.round(F.avg("lead_dias"), 2).alias("lead_medio"),
            F.max("lead_dias").alias("lead_max"),
            F.count(late).alias("atrasados"),
        )
        .select(
            "o_orderpriority",
            "pedidos",
            "lead_medio",
            "lead_max",
            "atrasados",
            F.round(
                F.col("atrasados")
                / F.nullif(F.col("pedidos").cast("double"), F.lit(0.0))
                * 100,
                2,
            ).alias("pct_atraso"),
        )
    )


ORACLE_SLA = f"""
WITH done AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS conclusao
  FROM lineitem GROUP BY 1
), per_order AS (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE), d.conclusao) AS lead_dias
  FROM orders o JOIN done d ON o.o_orderkey = d.l_orderkey
)
SELECT o_orderpriority, COUNT(*) AS pedidos,
       ROUND(AVG(lead_dias), 2) AS lead_medio,
       MAX(lead_dias) AS lead_max,
       COUNT(CASE WHEN lead_dias > {SLA_DAYS} THEN lead_dias END) AS atrasados,
       ROUND(COUNT(CASE WHEN lead_dias > {SLA_DAYS} THEN lead_dias END)
             / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0) * 100, 2) AS pct_atraso
FROM per_order
GROUP BY 1
"""


def q_geo_spine_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo rollup joined against the FULL region×nation spine with
    zero-fill (ref: EDA - Faturamento.py:115-119 — merge on the
    ESTADOS_BR region×UF spine so silent zeros appear as rows).  The
    spine is dims-only (cross-join-free: nation already carries its
    region key), the fact aggregate left-joins onto it, and COALESCE
    turns missing cells into explicit zeros."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == 1995
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    spine = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("r_name", "n_name", "n_nationkey")
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            dsum("o_totalprice").alias("fat"),
            F.count("*").alias("pedidos"),
        )
    )
    # rev is a per-nation aggregate — bounded by |nation| at any data
    # scale, so broadcast it explicitly (post-agg relations have no
    # stats; the static planner would fall back to sort-merge)
    return (
        spine.join(F.broadcast(rev), spine.n_nationkey == rev.c_nationkey, "left")
        .select(
            "r_name",
            "n_name",
            F.coalesce("fat", F.lit(0.0)).alias("faturamento"),
            F.coalesce("pedidos", F.lit(0)).alias("pedidos"),
        )
    )


ORACLE_GEO_SPINE = """
WITH rev AS (
  SELECT c.c_nationkey, ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS fat,
         COUNT(*) AS pedidos
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE year(o.o_orderdate) = 1995
  GROUP BY 1
)
SELECT r.r_name, n.n_name,
       COALESCE(rev.fat, 0.0) AS faturamento,
       COALESCE(rev.pedidos, 0) AS pedidos
FROM nation n
JOIN region r ON n.n_regionkey = r.r_regionkey
LEFT JOIN rev ON n.n_nationkey = rev.c_nationkey
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT parity (SURVEY §2.6 notes the reference never
    uses them; Spark supplies both natively): customers active in 1997
    vs 1998 — retained (∩), churned (97∖98), new (98∖97) — labeled and
    unioned.  Set ops plan as aggregate-based distinct joins; at scale
    they are one shuffle each on the compared key."""
    orders = load_table(spark, sf_dir, "orders")

    def actives(year: int):
        return orders.filter(F.year("o_orderdate") == year).select("o_custkey")

    a97, a98 = actives(1997), actives(1998)
    # intersect/subtract are the DISTINCT set ops (SQL INTERSECT /
    # EXCEPT); exceptAll would keep per-order multiplicity and leak
    # both-years customers into the churned set
    retained = a97.intersect(a98).withColumn("grupo", F.lit("retido"))
    churned = a97.subtract(a98).withColumn("grupo", F.lit("perdido"))
    new = a98.subtract(a97).withColumn("grupo", F.lit("novo"))
    return retained.unionByName(churned).unionByName(new)


ORACLE_SET_OPS = """
WITH a97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
     a98 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
SELECT o_custkey, 'retido' AS grupo FROM (SELECT o_custkey FROM a97 INTERSECT SELECT o_custkey FROM a98)
UNION ALL
SELECT o_custkey, 'perdido' FROM (SELECT o_custkey FROM a97 EXCEPT SELECT o_custkey FROM a98)
UNION ALL
SELECT o_custkey, 'novo' FROM (SELECT o_custkey FROM a98 EXCEPT SELECT o_custkey FROM a97)
"""


def q_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped blame analysis (beyond the reference's join
    inventory — the correlated EXISTS + NOT-EXISTS self-join shape):
    suppliers who were the ONLY late shipper (> 60 days after order
    date) in a finalized multi-supplier order, top 20 by blame count.

    Spark-first restatement: instead of two correlated self-joins
    (EXISTS another supplier / NOT EXISTS another late supplier), one
    orderkey-grouped aggregate computes per-order distinct-supplier
    and late-supplier counts, then a single orderkey-keyed join picks
    the blamed rows — the lineitem fact crosses the wire once, and
    both shuffles share the l_orderkey partitioning so AQE reuses the
    exchange.  The supplier dim broadcasts; the final top-20 sorts an
    aggregate that is supplier-count sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    flagged = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff("l_shipdate", "o_orderdate") > 60).cast("int").alias("late"),
    )
    per_os = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    blamed = (
        per_os.filter(F.col("late") == 1)
        .join(
            per_o.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey"), F.col("s_name")
    )
    return (
        blamed.join(F.broadcast(supplier), blamed.l_suppkey == supplier.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


ORACLE_LATE_SUPPLIER_BLAME = """
WITH flagged AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60
              THEN 1 ELSE 0 END AS late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
), per_os AS (
  SELECT l_orderkey, l_suppkey, MAX(late) AS late
  FROM flagged GROUP BY 1, 2
), per_o AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
  FROM per_os GROUP BY 1
)
SELECT s.s_name, COUNT(*) AS numwait
FROM per_os p
JOIN per_o o ON p.l_orderkey = o.l_orderkey
JOIN supplier s ON p.l_suppkey = s.s_suppkey
WHERE p.late = 1 AND o.n_supp > 1 AND o.n_late = 1
GROUP BY 1
ORDER BY numwait DESC, s.s_name ASC
LIMIT 20
"""


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped correlated-average filter (beyond the
    reference's join inventory): revenue locked in small-quantity
    orders of one brand — lineitems whose quantity is below 20% of
    that part's average quantity, reported as total and yearly-average
    cents.

    Spark-first restatement of the correlated scalar subquery: ONE
    partkey-grouped aggregate computes every part's mean quantity,
    then a partkey-keyed join applies the correlated predicate — the
    brand's lineitem slice crosses the wire once and both sides share
    the l_partkey partitioning.  The brand dim filter broadcasts and
    prunes BEFORE any shuffle.

    Exactness: quantities are integer-valued doubles (sums exact at
    any order), so avg = sum/count is identical both engines; money
    quantizes to integer cents per row and aggregates as BIGINT; the
    yearly average is one identical floor division."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li_b = li.join(
        F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    avg_q = li_b.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    small = li_b.join(avg_q, "l_partkey").filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    from ..functions.numeric import cents

    agg = small.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(cents(F.col("l_extendedprice"))).alias("rev_c"),
    )
    return agg.select(
        "n_lineitems",
        "rev_c",
        F.floor(F.col("rev_c").cast("double") / 7.0 + F.lit(0.5))
        .cast("long")
        .alias("avg_yearly_c"),
    )


ORACLE_SMALL_QUANTITY = """
WITH li_b AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
), avg_q AS (
  SELECT l_partkey, SUM(l_quantity) / COUNT(*) AS avg_qty
  FROM li_b GROUP BY 1
), small AS (
  SELECT b.l_extendedprice
  FROM li_b b JOIN avg_q a ON b.l_partkey = a.l_partkey
  WHERE b.l_quantity < 0.2 * a.avg_qty
), agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM small
)
SELECT n_lineitems, rev_c,
       CAST(FLOOR(CAST(rev_c AS DOUBLE) / 7.0 + 0.5) AS BIGINT)
         AS avg_yearly_c
FROM agg
"""


QUERIES = {
    "sla_leadtime": q_sla_leadtime,
    "late_supplier_blame": q_late_supplier_blame,
    "small_quantity_revenue": q_small_quantity_revenue,
    "geo_spine_zerofill": q_geo_spine_zerofill,
    "set_ops": q_set_ops,
    "left_enrichment": q_left_enrichment,
    "full_outer_coalesce": q_full_outer_coalesce,
    "preagg_join": q_preagg_join,
    "range_condition_join": q_range_condition_join,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "ordinal_alignment": q_ordinal_alignment,
    "latest_order_per_customer": q_latest_order_per_customer,
    "blacklist_filter": q_blacklist_filter,
    "global_topn": q_global_topn,
    "union_distinct_dims": q_union_distinct_dims,
}

ORACLES = {
    "sla_leadtime": ORACLE_SLA,
    "late_supplier_blame": ORACLE_LATE_SUPPLIER_BLAME,
    "small_quantity_revenue": ORACLE_SMALL_QUANTITY,
    "geo_spine_zerofill": ORACLE_GEO_SPINE,
    "set_ops": ORACLE_SET_OPS,
    "left_enrichment": ORACLE_LEFT_ENRICHMENT,
    "full_outer_coalesce": ORACLE_FULL_OUTER,
    "preagg_join": ORACLE_PREAGG_JOIN,
    "range_condition_join": ORACLE_RANGE_JOIN,
    "semi_join": ORACLE_SEMI,
    "anti_join": ORACLE_ANTI,
    "ordinal_alignment": ORACLE_ORDINAL,
    "latest_order_per_customer": ORACLE_LATEST_ORDER,
    "blacklist_filter": ORACLE_BLACKLIST,
    "global_topn": ORACLE_GLOBAL_TOPN,
    "union_distinct_dims": ORACLE_UNION_DISTINCT,
}
