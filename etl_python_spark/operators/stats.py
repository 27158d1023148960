"""Behavioral attribution + distribution-comparison statistics.

`attribution_last_touch` closes the reference's marketing-funnel
family (`Recorrencia_*.sql`, CRM lead flow in `ETL - CRM.py`): each
conversion is credited to the latest preceding touchpoint within a
lookback window.  `ks_segments` adds the two-sample
Kolmogorov-Smirnov distance between every pair of customer segments'
spend distributions — the statistical test behind "are these two
segments actually different", computed with EXACT integer arithmetic
so the verdict crosses the engine boundary bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..sources.tables import load_table

LOOKBACK_US = 7 * 24 * 3600 * 1_000_000  # attribution lookback (µs)
TOUCH_TYPES = ("click", "view")
CONVERSION_TYPE = "purchase"


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the most recent
    click/view by the same user at or before the purchase, credited
    only within the 7-day lookback; conversions with no in-window
    touch stay in the output with NULL attribution (the unattributed
    rate is itself a KPI).

    Scale shape: ONE shuffle keyed on user_id; the running last-touch
    is `last(..., ignorenulls=True)` over the per-user ordered window
    (running state, no self-join against the touch stream, no
    per-conversion re-scan).  Ordering ties broken by event_id so the
    carried touch is deterministic.  Touch fields travel as one struct
    so all of them come from the SAME carried event.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch = F.when(
        F.col("event_type").isin(*TOUCH_TYPES),
        F.struct(
            F.col("ts").alias("t_ts"),
            F.col("event_id").alias("t_id"),
            F.col("event_type").alias("t_type"),
        ),
    )
    carried = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.last(touch, ignorenulls=True).over(w).alias("lt"),
    ).filter(F.col("event_type") == CONVERSION_TYPE)

    delay = F.unix_micros("ts") - F.unix_micros(F.col("lt.t_ts"))
    in_window = F.col("lt").isNotNull() & (delay <= F.lit(LOOKBACK_US))
    return carried.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.when(in_window, F.col("lt.t_id")).alias("touch_id"),
        F.when(in_window, F.col("lt.t_type")).alias("touch_type"),
        F.when(in_window, F.col("lt.t_ts")).alias("touch_ts"),
        F.when(in_window, delay).alias("delay_us"),
    )


ORACLE_ATTRIBUTION = f"""
WITH carried AS (
  SELECT user_id, event_id, event_type, ts,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                         THEN ts END IGNORE NULLS)
           OVER w AS t_ts,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                         THEN event_id END IGNORE NULLS)
           OVER w AS t_id,
         LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER w AS t_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
)
SELECT user_id,
       event_id AS purchase_id,
       ts AS purchase_ts,
       CASE WHEN ok THEN t_id END AS touch_id,
       CASE WHEN ok THEN t_type END AS touch_type,
       CASE WHEN ok THEN t_ts END AS touch_ts,
       CASE WHEN ok THEN delay END AS delay_us
FROM (
  SELECT *,
         epoch_us(ts) - epoch_us(t_ts) AS delay,
         t_ts IS NOT NULL
           AND epoch_us(ts) - epoch_us(t_ts) <= {LOOKBACK_US} AS ok
  FROM carried WHERE event_type = '{CONVERSION_TYPE}'
)
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov over all segment pairs
# ---------------------------------------------------------------------------

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
N_KS_PARTS = 8  # range partitions for the two-phase cumulative counts


def _segment_cdf(spark: SparkSession, sf_dir: str):
    """Shared rank machinery for the distribution tests (KS and
    Mann-Whitney): per distinct order value (exact integer cents) the
    per-segment counts c0..c4 AND global cumulative counts cum0..cum4,
    plus the grand totals.

    The cumulative counts use the pareto_abc two-phase GLOBAL cumsum —
    range-partition by value, per-partition local window cumsums
    (parallel), per-partition totals to the driver (N_KS_PARTS × 5
    ints), exclusive offsets broadcast back — so no data-wide
    single-task window exists and the value stream is scanned once
    for all downstream pair statistics."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o["o_custkey"] == c["c_custkey"],
    ).select(
        cents(F.col("o_totalprice")).alias("v"), F.col("c_mktsegment")
    )
    per_v = seg.groupBy("v").agg(
        *[
            F.sum(
                F.when(F.col("c_mktsegment") == s, 1).otherwise(0)
            ).alias(f"c{i}")
            for i, s in enumerate(SEGMENTS)
        ]
    )

    ranged = per_v.repartitionByRange(N_KS_PARTS, F.asc("v")).withColumn(
        "pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=True)

    w_local = Window.partitionBy("pid").orderBy(F.asc("v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = ranged.select(
        "v",
        "pid",
        *[F.col(f"c{i}") for i in range(5)],
        *[F.sum(f"c{i}").over(w_local).alias(f"l{i}") for i in range(5)],
    )
    totals = (
        ranged.groupBy("pid")
        .agg(*[F.sum(f"c{i}").alias(f"t{i}") for i in range(5)])
        .collect()
    )
    totals.sort(key=lambda r: r.pid)
    offsets, acc = [], [0] * 5
    for r in totals:
        offsets.append((r.pid, *acc))
        acc = [acc[i] + r[f"t{i}"] for i in range(5)]
    n = acc  # grand totals per segment
    off_df = spark.createDataFrame(
        offsets, "pid int, " + ", ".join(f"o{i} long" for i in range(5))
    )
    cum = local.join(F.broadcast(off_df), "pid").select(
        "v",
        *[F.col(f"c{i}") for i in range(5)],
        *[
            (F.col(f"l{i}") + F.col(f"o{i}")).alias(f"cum{i}")
            for i in range(5)
        ],
    )
    return cum, n


def q_ks_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS distance D = max_x |F_a(x) - F_b(x)| between the order-value
    distributions of every pair of customer market segments.

    Exactness: values are integer cents; per-value per-segment counts
    are integers; the cumulative counts are integers; and the CDF
    difference is compared CROSS-MULTIPLIED — max |cum_a·n_b −
    cum_b·n_a| as BIGINT — so no float exists until ONE final division
    per pair.  (At n_a·n_b ≥ 2^63 move the cross-product to
    DECIMAL(38,0); the shape is unchanged.)

    Scale shape: one hash aggregate to per-value segment counts (5
    int columns over distinct values), then the pareto_abc two-phase
    GLOBAL cumsum — range-partition by value, per-partition local
    cumsums (parallel), per-partition totals to the driver (N_KS_PARTS
    × 5 ints), exclusive offsets broadcast back.  All 10 pair
    statistics read the SAME cumulative relation via one stack/unpivot
    + a 10-group max — the value stream is scanned once, no data-wide
    single-task window, no per-pair pass.
    """
    cum, n = _segment_cdf(spark, sf_dir)

    pair_exprs = []
    for i in range(5):
        for j in range(i + 1, 5):
            pair_exprs.append(
                (
                    f"'{SEGMENTS[i]}|{SEGMENTS[j]}'",
                    f"abs(cum{i} * {n[j]}L - cum{j} * {n[i]}L)",
                )
            )
    stacked = cum.select(
        F.expr(
            "stack("
            + str(len(pair_exprs))
            + ", "
            + ", ".join(f"{k}, {e}" for k, e in pair_exprs)
            + ") as (pair, xdiff)"
        )
    )
    dmax = stacked.groupBy("pair").agg(F.max("xdiff").alias("dmax_scaled"))

    n_map_a = F.create_map(
        *[
            x
            for i in range(5)
            for j in range(i + 1, 5)
            for x in (
                F.lit(f"{SEGMENTS[i]}|{SEGMENTS[j]}"),
                F.lit(n[i]),
            )
        ]
    )
    n_map_b = F.create_map(
        *[
            x
            for i in range(5)
            for j in range(i + 1, 5)
            for x in (
                F.lit(f"{SEGMENTS[i]}|{SEGMENTS[j]}"),
                F.lit(n[j]),
            )
        ]
    )
    return dmax.select(
        F.split("pair", "\\|")[0].alias("seg_a"),
        F.split("pair", "\\|")[1].alias("seg_b"),
        n_map_a[F.col("pair")].alias("n_a"),
        n_map_b[F.col("pair")].alias("n_b"),
        "dmax_scaled",
        (
            F.col("dmax_scaled").cast("double")
            / F.nullif(
                (n_map_a[F.col("pair")] * n_map_b[F.col("pair")]).cast(
                    "double"
                ),
                F.lit(0.0),
            )
        ).alias("d_stat"),  # NULL when either sample is empty
    )


def _oracle_ks() -> str:
    cums = ",\n         ".join(
        f"CAST(SUM(CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c{i}"
        for i, s in enumerate(SEGMENTS)
    )
    wins = ",\n         ".join(
        f"CAST(SUM(c{i}) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)"
        f" AS BIGINT) AS cum{i}"
        for i in range(5)
    )
    tot = ",\n         ".join(
        f"CAST(SUM(c{i}) AS BIGINT) AS n{i}" for i in range(5)
    )
    selects = []
    for i in range(5):
        for j in range(i + 1, 5):
            selects.append(f"""
SELECT '{SEGMENTS[i]}' AS seg_a, '{SEGMENTS[j]}' AS seg_b,
       t.n{i} AS n_a, t.n{j} AS n_b,
       CAST(MAX(ABS(c.cum{i} * t.n{j} - c.cum{j} * t.n{i})) AS BIGINT)
         AS dmax_scaled,
       CAST(MAX(ABS(c.cum{i} * t.n{j} - c.cum{j} * t.n{i})) AS DOUBLE)
         / NULLIF(CAST(t.n{i} * t.n{j} AS DOUBLE), 0.0) AS d_stat
FROM cum c CROSS JOIN tot t
GROUP BY t.n{i}, t.n{j}""")
    return f"""
WITH seg AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
         c.c_mktsegment
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), per_v AS (
  SELECT v,
         {cums}
  FROM seg GROUP BY v
), cum AS (
  SELECT v,
         {wins}
  FROM per_v
), tot AS (
  SELECT {tot}
  FROM per_v
)
{" UNION ALL ".join(selects)}
"""


ORACLE_KS = _oracle_ks()


# ---------------------------------------------------------------------------
# Mann-Whitney U over all segment pairs (exact, tie-aware)
# ---------------------------------------------------------------------------

def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the order-value
    distributions of every segment pair — the nonparametric
    location test companion to ``ks_segments``, sharing its ONE
    two-phase cumulative pass (`_segment_cdf`).

    Tie-aware and float-free: with per-value counts the pooled
    average rank at value v is (2·before + c + 1)/2, so DOUBLED rank
    sums are exact integers — 2R_a = Σ c_a·(2·before + c + 1) with
    before = pooled cumulative strictly below v.  U_a follows as
    (2R_a − n_a(n_a+1))/2, a .0/.5-exact double; the identity
    U_a + U_b = n_a·n_b is pinned in tests.  No sort of the raw data
    ever happens — ranks come from counts.
    """
    cum, n = _segment_cdf(spark, sf_dir)

    pair_exprs = []
    for i in range(5):
        for j in range(i + 1, 5):
            before = (
                f"(cum{i} - c{i}) + (cum{j} - c{j})"
            )
            contrib = (
                f"c{i} * (2 * ({before}) + (c{i} + c{j}) + 1)"
            )
            pair_exprs.append(
                (f"'{SEGMENTS[i]}|{SEGMENTS[j]}'", contrib)
            )
    stacked = cum.select(
        F.expr(
            "stack("
            + str(len(pair_exprs))
            + ", "
            + ", ".join(f"{k}, {e}" for k, e in pair_exprs)
            + ") as (pair, r2_term)"
        )
    )
    r2 = stacked.groupBy("pair").agg(
        F.sum("r2_term").cast("long").alias("r2_a")
    )

    def seg_map(pick):
        return F.create_map(
            *[
                x
                for i in range(5)
                for j in range(i + 1, 5)
                for x in (
                    F.lit(f"{SEGMENTS[i]}|{SEGMENTS[j]}"),
                    F.lit(pick(i, j)),
                )
            ]
        )

    n_a = seg_map(lambda i, j: n[i])[F.col("pair")]
    n_b = seg_map(lambda i, j: n[j])[F.col("pair")]
    u_a = (
        F.col("r2_a") - n_a * (n_a + F.lit(1))
    ).cast("double") / F.lit(2.0)
    return r2.select(
        F.split("pair", "\\|")[0].alias("seg_a"),
        F.split("pair", "\\|")[1].alias("seg_b"),
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        "r2_a",
        u_a.alias("u_a"),
        (n_a.cast("double") * n_b.cast("double") - u_a).alias("u_b"),
    )


def _oracle_mann_whitney() -> str:
    cums = ",\n         ".join(
        f"CAST(SUM(CASE WHEN c_mktsegment = '{s}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c{i}"
        for i, s in enumerate(SEGMENTS)
    )
    wins = ",\n         ".join(
        [f"c{i}" for i in range(5)]
        + [
            f"CAST(SUM(c{i}) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)"
            f" AS BIGINT) AS cum{i}"
            for i in range(5)
        ]
    )
    tot = ",\n         ".join(
        f"CAST(SUM(c{i}) AS BIGINT) AS n{i}" for i in range(5)
    )
    selects = []
    for i in range(5):
        for j in range(i + 1, 5):
            before = f"(c.cum{i} - c.c{i}) + (c.cum{j} - c.c{j})"
            r2 = (
                f"CAST(SUM(c.c{i} * (2 * ({before}) + (c.c{i} + c.c{j})"
                f" + 1)) AS BIGINT)"
            )
            ua = f"CAST({r2} - t.n{i} * (t.n{i} + 1) AS DOUBLE) / 2.0"
            selects.append(f"""
SELECT '{SEGMENTS[i]}' AS seg_a, '{SEGMENTS[j]}' AS seg_b,
       t.n{i} AS n_a, t.n{j} AS n_b,
       {r2} AS r2_a,
       {ua} AS u_a,
       CAST(t.n{i} AS DOUBLE) * CAST(t.n{j} AS DOUBLE) - {ua} AS u_b
FROM cum c CROSS JOIN tot t
GROUP BY t.n{i}, t.n{j}""")
    return f"""
WITH seg AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v,
         c.c_mktsegment
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), per_v AS (
  SELECT v,
         {cums}
  FROM seg GROUP BY v
), cum AS (
  SELECT v,
         {wins}
  FROM per_v
), tot AS (
  SELECT {tot}
  FROM per_v
)
{" UNION ALL ".join(selects)}
"""


ORACLE_MANN_WHITNEY = _oracle_mann_whitney()


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average (α = 1/2 — bit-exact)
# ---------------------------------------------------------------------------

EWMA_LAGS = 7  # truncation horizon: weight 2^-7 < 1% of the head weight


def q_ewma_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-term exponentially-weighted moving average of daily revenue
    per nation (α = 1/2, so weights are 1, 1/2, …, 1/64 — EXACT binary
    doubles, and weight·cents is exact for cents < 2^53: the whole
    smoothing is bit-identical across engines with NO quantization of
    intermediate terms).  Missing leading lags drop out of numerator
    and denominator together (the pandas ``ewm(adjust=True)`` head
    convention), so early days are unbiased.

    Scale shape: one (nation, day) hash aggregate, then a 7-LAG chain
    in a nation-keyed window — fixed fan-in, no self-join, no
    between-range scan; the lag chain is a single window pass.  The
    truncated-EWMA-as-lags form is the scale answer to the recursive
    definition, whose running state would serialize each group."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    daily = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.col("o_orderdate").alias("dia"))
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_c"))
    )
    w = Window.partitionBy("n_name").orderBy("dia")
    lags = [F.col("rev_c").cast("double")] + [
        F.lag("rev_c", k).over(w).cast("double")
        for k in range(1, EWMA_LAGS)
    ]
    num = None
    den = None
    for k, x in enumerate(lags):
        wk = F.lit(0.5**k)  # exact binary double
        term = F.when(x.isNotNull(), x * wk).otherwise(F.lit(0.0))
        dterm = F.when(x.isNotNull(), wk).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    ewma = F.floor(num / den / F.lit(100.0) * 1e4 + F.lit(0.5)) / 1e4
    return daily.select("n_name", "dia", "rev_c", ewma.alias("ewma"))


def _oracle_ewma() -> str:
    lag_cols = ", ".join(
        f"LAG(rev_c, {k}) OVER (PARTITION BY n_name ORDER BY dia) AS x{k}"
        for k in range(1, EWMA_LAGS)
    )
    num = " + ".join(
        ["CAST(rev_c AS DOUBLE)"]
        + [
            f"CASE WHEN x{k} IS NOT NULL THEN CAST(x{k} AS DOUBLE)"
            f" * CAST({0.5 ** k!r} AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
            for k in range(1, EWMA_LAGS)
        ]
    )
    den = " + ".join(
        ["CAST(1 AS DOUBLE)"]
        + [
            f"CASE WHEN x{k} IS NOT NULL THEN CAST({0.5 ** k!r} AS DOUBLE)"
            f" ELSE CAST(0 AS DOUBLE) END"
            for k in range(1, EWMA_LAGS)
        ]
    )
    return f"""
WITH daily AS (
  SELECT n.n_name, o.o_orderdate AS dia,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), lagged AS (
  SELECT n_name, dia, rev_c, {lag_cols}
  FROM daily
)
SELECT n_name, dia, rev_c,
       FLOOR(({num}) / ({den}) / 100.0 * 1e4 + 0.5) / 1e4 AS ewma
FROM lagged
"""


ORACLE_EWMA = _oracle_ewma()


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (median of pairwise slopes)
# ---------------------------------------------------------------------------

def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator of each nation's monthly-revenue trend:
    the MEDIAN of all pairwise slopes (r_j - r_i)/(t_j - t_i) — robust
    to ~29% outlier months, where the forecast family's OLS is not.

    Exactness: revenues are integer cents, month ordinals integers,
    so each slope is one correctly-rounded division of exact integers,
    floor-quantized to integer micro-cents-per-month BEFORE the
    median; the median of integers is exact in both engines (odd n:
    the middle value; even n: the average of the two middle values —
    a .0/.5 double).

    Scale shape: one (nation, month) aggregate shrinks the input to
    K·M rows (M = months — CALENDAR-sized, not data-sized), and the
    pairwise self-join is keyed on nation over that aggregated
    relation: O(M²) pairs per nation, bounded by the calendar span,
    never by the order count.  The exact-median aggregate runs per
    nation over the M²-row groups.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("t"),
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_c"))
    )
    a = monthly.select(
        "n_name", F.col("t").alias("t1"), F.col("rev_c").alias("r1")
    )
    b = monthly.select(
        "n_name", F.col("t").alias("t2"), F.col("rev_c").alias("r2")
    )
    # the monthly relation is calendar-sized (K nations × M months) by
    # construction, so broadcasting one side is right at ANY data scale
    pairs = a.join(F.broadcast(b), "n_name").filter(
        F.col("t1") < F.col("t2")
    )
    slope_micro = F.floor(
        (F.col("r2") - F.col("r1")).cast("double")
        / (F.col("t2") - F.col("t1")).cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    return (
        pairs.select("n_name", slope_micro.alias("s"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.median("s").cast("double").alias("slope_micro_med"),
        )
        .select(
            "n_name",
            "n_pairs",
            "slope_micro_med",
            (F.col("slope_micro_med") / F.lit(1e6) / F.lit(100.0)).alias(
                "slope_brl_per_month"
            ),
        )
    )


ORACLE_THEIL_SEN = """
WITH monthly AS (
  SELECT n.n_name,
         CAST(YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate) AS BIGINT)
           AS t,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), pairs AS (
  SELECT a.n_name,
         CAST(FLOOR(CAST(b.rev_c - a.rev_c AS DOUBLE)
                    / CAST(b.t - a.t AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
           AS s
  FROM monthly a JOIN monthly b
    ON a.n_name = b.n_name AND a.t < b.t
)
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MEDIAN(s) AS DOUBLE) AS slope_micro_med,
       CAST(MEDIAN(s) AS DOUBLE) / 1e6 / 100.0 AS slope_brl_per_month
FROM pairs GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Duplicate-payment audit (fraud/error screen)
# ---------------------------------------------------------------------------

DUP_WINDOW_DAYS = 3


def q_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate-payment screen — the accounts-payable audit next
    to ``benford_audit`` and ``balance_integrity``: pairs of orders by
    the SAME customer within DUP_WINDOW_DAYS of each other whose cent
    amounts agree within 10% (double-billing / double-pay / re-keyed
    invoice candidates; exact duplicates match a fortiori).

    The tolerance is pure integer arithmetic — 10·|Δcents| ≤
    max(cents) — so no float crosses the engine boundary at all.

    Scale shape: a self-equi-join keyed on the CUSTOMER — per-entity
    pair generation bounded by that entity's order count (the
    market-basket O(k²)-per-key bound applied to payers), with the
    date and amount predicates as narrow post-filters.  A pathological
    payer with millions of orders is the skew case: AQE's skew join
    splits the key, and pre-bucketing by order month bounds k if a
    deployment needs a hard cap."""
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        "o_custkey",
        cents(F.col("o_totalprice")).alias("amount_c"),
        F.col("o_orderkey").alias("k"),
        F.col("o_orderdate").alias("d"),
    )
    a = keyed.select(
        "o_custkey",
        F.col("amount_c").alias("a1"),
        F.col("k").alias("k1"),
        F.col("d").alias("d1"),
    )
    b = keyed.select(
        "o_custkey",
        F.col("amount_c").alias("a2"),
        F.col("k").alias("k2"),
        F.col("d").alias("d2"),
    )
    return (
        a.join(b, "o_custkey")
        .filter(
            (F.col("k1") < F.col("k2"))
            & (F.abs(F.datediff("d2", "d1")) <= DUP_WINDOW_DAYS)
            & (
                F.abs(F.col("a1") - F.col("a2")) * 10
                <= F.greatest("a1", "a2")
            )
        )
        .select(
            "o_custkey",
            "a1",
            "a2",
            "k1",
            "k2",
            "d1",
            "d2",
            F.abs(F.datediff("d2", "d1")).cast("int").alias("gap_days"),
            (F.col("a1") == F.col("a2")).alias("exact_dup"),
        )
    )


ORACLE_DUPLICATE_PAYMENTS = f"""
WITH keyed AS (
  SELECT o_custkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS amount_c,
         o_orderkey AS k, o_orderdate AS d
  FROM orders
)
SELECT a.o_custkey, a.amount_c AS a1, b.amount_c AS a2,
       a.k AS k1, b.k AS k2, a.d AS d1, b.d AS d2,
       CAST(ABS(DATE_DIFF('day', a.d, b.d)) AS INT) AS gap_days,
       a.amount_c = b.amount_c AS exact_dup
FROM keyed a JOIN keyed b
  ON a.o_custkey = b.o_custkey
 AND a.k < b.k
 AND ABS(DATE_DIFF('day', a.d, b.d)) <= {DUP_WINDOW_DAYS}
 AND ABS(a.amount_c - b.amount_c) * 10 <= GREATEST(a.amount_c, b.amount_c)
"""


# ---------------------------------------------------------------------------
# Cohort LTV curves (cumulative revenue per customer by cohort age)
# ---------------------------------------------------------------------------

def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the revenue companion to
    ``cohort_retention``: customers grouped by first-order month, and
    for each cohort age (months since acquisition) the cumulative
    revenue per acquired customer.

    Scale shape: one customer-keyed aggregate finds each customer's
    cohort month; the order stream joins that dim-sized table
    (broadcast here / AQE at scale) and aggregates to (cohort, age)
    cells — calendar²-sized — where the cumulative window runs
    partitioned BY COHORT, never data-wide.  Exactness: integer-cent
    sums, cohort sizes integers, one division at the end floor-
    quantized to 4dp (cents-per-customer precision)."""
    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).alias("cohort_m")
    )
    sizes = first.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        o.join(F.broadcast(first), "o_custkey")
        .groupBy(
            "cohort_m",
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
                - F.col("cohort_m")
            ).alias("age_m"),
        )
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("rev_c"))
    )
    w = Window.partitionBy("cohort_m").orderBy("age_m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.select(
        "cohort_m",
        "age_m",
        "rev_c",
        F.sum("rev_c").over(w).alias("cum_rev_c"),
    ).join(F.broadcast(sizes), "cohort_m")
    ltv = F.floor(
        F.col("cum_rev_c").cast("double")
        / F.col("cohort_size").cast("double")
        / F.lit(100.0)
        * 1e4
        + F.lit(0.5)
    ) / 1e4
    return cum.select(
        "cohort_m",
        "age_m",
        "cohort_size",
        "rev_c",
        "cum_rev_c",
        ltv.alias("ltv_per_customer"),
    )


ORACLE_COHORT_LTV = """
WITH first AS (
  SELECT o_custkey,
         CAST(MIN(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1)
              AS BIGINT) AS cohort_m
  FROM orders GROUP BY 1
), sizes AS (
  SELECT cohort_m, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY 1
), cells AS (
  SELECT f.cohort_m,
         CAST(YEAR(o.o_orderdate) * 12 + MONTH(o.o_orderdate) - 1
              - f.cohort_m AS BIGINT) AS age_m,
         CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
  GROUP BY 1, 2
), cum AS (
  SELECT cohort_m, age_m, rev_c,
         CAST(SUM(rev_c) OVER (PARTITION BY cohort_m ORDER BY age_m
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_rev_c
  FROM cells
)
SELECT c.cohort_m, c.age_m, s.cohort_size, c.rev_c, c.cum_rev_c,
       FLOOR(CAST(c.cum_rev_c AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
             / 100.0 * 1e4 + 0.5) / 1e4 AS ltv_per_customer
FROM cum c JOIN sizes s ON c.cohort_m = s.cohort_m
"""


QUERIES = {
    "attribution_last_touch": q_attribution_last_touch,
    "duplicate_payments": q_duplicate_payments,
    "cohort_ltv": q_cohort_ltv,
    "ks_segments": q_ks_segments,
    "ewma_revenue": q_ewma_revenue,
    "theil_sen_trend": q_theil_sen_trend,
    "mann_whitney": q_mann_whitney,
}

ORACLES = {
    "attribution_last_touch": ORACLE_ATTRIBUTION,
    "ks_segments": ORACLE_KS,
    "ewma_revenue": ORACLE_EWMA,
    "theil_sen_trend": ORACLE_THEIL_SEN,
    "mann_whitney": ORACLE_MANN_WHITNEY,
    "duplicate_payments": ORACLE_DUPLICATE_PAYMENTS,
    "cohort_ltv": ORACLE_COHORT_LTV,
}
