"""Event-stream analytics over the ``events`` table.

Batch expressions of the streaming semantics (the same logic runs
under Structured Streaming in ``streaming/`` with
``trigger(availableNow=True)`` — see SURVEY.md §2.9): tumbling
windows, sessionization, and semi-structured JSON props extraction;
plus the product-analytics staples (ordered funnel conversion, weekly
cohort retention) and per-type z-score anomaly detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..sources.tables import load_table

SESSION_GAP_MIN = 30


# ---------------------------------------------------------------------------
# Tumbling hourly window aggregate (batch form of the streaming query)
# ---------------------------------------------------------------------------

def q_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hora"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("eventos"),
            F.countDistinct("user_id").alias("usuarios"),
            dsum("value").alias("valor_total"),
        )
    )


ORACLE_HOURLY = """
SELECT date_trunc('hour', ts) AS hora, event_type,
       COUNT(*) AS eventos,
       COUNT(DISTINCT user_id) AS usuarios,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS valor_total
FROM events
GROUP BY 1, 2
"""


def q_sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour windows advancing hourly via ``window()`` — each
    event lands in exactly 2 overlapping windows; Spark expands them
    before one hash-aggregate shuffle keyed by (window, type), so the
    cost is 2× the tumbling case, never a re-scan per offset.  The
    oracle restates the expansion with an explicit 2-row unnest."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("eventos"),
            dsum("value").alias("valor_total"),
        )
        .select(
            F.col("w.start").alias("inicio"),
            "event_type",
            "eventos",
            "valor_total",
        )
    )


ORACLE_SLIDING = """
WITH expanded AS (
  SELECT e.*, date_trunc('hour', ts) - INTERVAL (o.o) HOUR AS inicio
  FROM events e, (SELECT unnest([0, 1]) AS o) o
)
SELECT inicio, event_type, COUNT(*) AS eventos,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS valor_total
FROM expanded
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sessionization: gap > 30 min starts a new session (lag + running sum)
# ---------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with event counts and duration — the classic
    lag/cumsum assignment; one window shuffle keyed by user."""
    events = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_user)))
            > SESSION_GAP_MIN * 60,
            1,
        )
        .otherwise(0)
        .alias("nova"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = flagged.withColumn("sessao", F.sum("nova").over(w_cum))
    return sessions.groupBy("user_id", "sessao").agg(
        F.count("*").alias("eventos"),
        F.min("ts").alias("inicio"),
        F.max("ts").alias("fim"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duracao_seg"
        ),
    )


ORACLE_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
                   > {SESSION_GAP_MIN} * 60
              THEN 1 ELSE 0 END AS nova
  FROM events
), sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(nova) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sessao
  FROM flagged
)
SELECT user_id, sessao, COUNT(*) AS eventos, MIN(ts) AS inicio, MAX(ts) AS fim,
       date_diff('second', MIN(ts), MAX(ts)) AS duracao_seg
FROM sessions
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Semi-structured props extraction (schema-on-read JSON, ref
# cnpj_core.py:251-320 / JSON Resposta 1.sql)
# ---------------------------------------------------------------------------

def q_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pull the numeric ``k`` out of the JSON props column and
    aggregate by event_type — get_json_object stays JVM-side."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("com_k"),
            F.sum("k").alias("soma_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_PROPS = """
SELECT event_type,
       COUNT(TRY_CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INT)) AS com_k,
       CAST(SUM(TRY_CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INT)) AS BIGINT) AS soma_k,
       MIN(TRY_CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INT)) AS min_k,
       MAX(TRY_CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS INT)) AS max_k
FROM events
GROUP BY 1
"""


def q_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection per event type: events whose value
    sits more than 3 sample standard deviations from their type's
    mean — the monitoring primitive behind alerting and bad-sensor
    quarantine.

    Per-type stats come from a GROUP BY + broadcast join back, NOT an
    unordered window over the type partition: a window would hold each
    type's full event set in one task (unbounded at 100 TB), while the
    aggregate reduces map-side and broadcasts K rows.  Mean/std come
    from exact integer micro-unit moments (round 11 — the Lloyd-fix
    class: ``ROUND(AVG(double), 6)`` anchors can flip a 6dp boundary
    as summation order shifts, and here a flipped anchor would change
    WHICH EVENTS pass the z-filter); z rounds at 4dp before the
    threshold test.  std = √((n·Σq² − (Σq)²)/(n(n−1)))/1e6 on the
    exact moments, the ``embedding_covariance`` diagonal rule.

    Degenerate groups (stddev rounds to 0 — near-constant types) are
    excluded EXPLICITLY on both sides: Spark's x/0 is NULL while
    DuckDB's IEEE float divide yields ±inf, which would pass
    ABS(z) > 3 — the same query text would silently diverge between
    engines exactly on those groups."""
    events = load_table(spark, sf_dir, "events")
    q = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
    # Square in DECIMAL(19,0), not LongType: a long q*q silently wraps
    # past 2^63 (|value| ≳ 3e3) in non-ANSI Spark while DuckDB raises —
    # the engines would diverge silently.  19+19 ≤ 38 keeps the product
    # an exact DECIMAL(38,0) in BOTH engines (round-11 advice).
    qd = q.cast("decimal(19,0)")
    moments = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(qd * qd).alias("s2"),
    )
    n = F.col("n").cast("double")
    var_micro2 = (
        F.col("n").cast("decimal(38,0)") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1").cast("decimal(38,0)")
    ).cast("double") / (n * (n - F.lit(1.0)))
    stats = moments.select(
        "event_type",
        F.round(F.col("s1").cast("double") / n / F.lit(1e6), 6).alias("m"),
        F.round(F.sqrt(var_micro2) / F.lit(1e6), 6).alias("s"),
    )
    z = F.round((F.col("value") - F.col("m")) / F.col("s"), 4)
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.col("s") != 0)
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 3)
    )


ORACLE_OUTLIERS = """
WITH moments AS (
  SELECT event_type,
         COUNT(*) AS n,
         SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS s1,
         SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS DECIMAL(19,0))
             * CAST(FLOOR(value * 1000000.0 + 0.5) AS DECIMAL(19,0))) AS s2
  FROM events GROUP BY 1
), stats AS (
  SELECT event_type,
         ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6) AS m,
         ROUND(sqrt(CAST(CAST(n AS DECIMAL(38,0)) * s2
                         - CAST(s1 AS DECIMAL(38,0)) * CAST(s1 AS DECIMAL(38,0))
                         AS DOUBLE)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
               / 1000000.0, 6) AS s
  FROM moments
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - st.m) / st.s, 4) AS z
FROM events e JOIN stats st USING (event_type)
WHERE st.s <> 0
  AND ABS(ROUND((e.value - st.m) / st.s, 4)) > 3
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each user's first
    view, first click AT OR AFTER that view, and first purchase at or
    after that click, rolled up by first-view day with step counts and
    conversion rates — the product-analytics staple.

    Three min-aggregations keyed on user_id and two user-keyed joins;
    every shuffle is on the user key, so at 100 TB the funnel costs
    three passes over a (user, type, ts) projection and no step ever
    materializes more than one row per user."""
    events = load_table(spark, sf_dir, "events")

    def first_at_or_after(df, etype, bound_col, out):
        cond = F.col("event_type") == etype
        src = events.filter(cond).select("user_id", F.col("ts").alias("t"))
        j = src.join(df, "user_id").filter(F.col("t") >= F.col(bound_col))
        return (
            j.groupBy("user_id", bound_col)
            .agg(F.min("t").alias(out))
        )

    # views feeds the click step AND the final funnel join, clicks the
    # purchase step AND the funnel — checkpoint each (one row per
    # user) so the funnel costs exactly the documented three passes
    # over the event stream instead of re-running earlier steps per
    # consumer.
    views = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
        .localCheckpoint(eager=True)
    )
    clicks = first_at_or_after(
        views, "click", "first_view", "first_click"
    ).localCheckpoint(eager=True)
    purchases = first_at_or_after(clicks, "purchase", "first_click", "first_purchase")

    funnel = (
        views.join(
            clicks.select("user_id", "first_click"), "user_id", "left"
        ).join(purchases.select("user_id", "first_purchase"), "user_id", "left")
    )
    per_day = funnel.groupBy(
        F.to_date("first_view").alias("dia")
    ).agg(
        F.count("*").alias("viewers"),
        F.count("first_click").alias("clickers"),
        F.count("first_purchase").alias("buyers"),
    )
    return per_day.select(
        "dia",
        "viewers",
        "clickers",
        "buyers",
        F.round(F.col("clickers") / F.col("viewers"), 4).alias("view_to_click"),
        F.round(
            F.col("buyers") / F.nullif(F.col("clickers"), F.lit(0)), 4
        ).alias("click_to_buy"),
    )


ORACLE_FUNNEL = """
WITH views AS (
  SELECT user_id, MIN(ts) AS first_view FROM events
  WHERE event_type = 'view' GROUP BY 1
), clicks AS (
  SELECT e.user_id, v.first_view, MIN(e.ts) AS first_click
  FROM events e JOIN views v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.first_view
  GROUP BY 1, 2
), purchases AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase
  FROM events e JOIN clicks c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.first_click
  GROUP BY 1
), funnel AS (
  SELECT v.user_id, v.first_view, c.first_click, p.first_purchase
  FROM views v
  LEFT JOIN clicks c ON v.user_id = c.user_id
  LEFT JOIN purchases p ON v.user_id = p.user_id
), per_day AS (
  SELECT CAST(first_view AS DATE) AS dia,
         COUNT(*) AS viewers,
         COUNT(first_click) AS clickers,
         COUNT(first_purchase) AS buyers
  FROM funnel GROUP BY 1
)
SELECT dia, viewers, clickers, buyers,
       ROUND(CAST(clickers AS DOUBLE) / viewers, 4) AS view_to_click,
       ROUND(CAST(buyers AS DOUBLE) / NULLIF(clickers, 0), 4) AS click_to_buy
FROM per_day
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event, counted as active in each subsequent week — the
    cohort table behind every retention curve.  One min-aggregate for
    the cohort assignment, one distinct (user, week) activity
    relation, one user-keyed join; output is cohorts × offsets rows
    (tiny) regardless of event volume."""
    events = load_table(spark, sf_dir, "events")
    cohorts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    j = activity.join(cohorts, "user_id")
    return (
        j.groupBy(
            "cohort_week",
            ((F.datediff("wk", "cohort_week")) / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


ORACLE_COHORT = """
WITH cohorts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
), activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
)
SELECT c.cohort_week,
       CAST((a.wk - c.cohort_week) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS active_users
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


# Deterministic HyperLogLog (Flajolet et al. 2007): cardinality
# estimation whose shuffle is REGISTER-sized (m rows per group), the
# way a 100 TB engine counts distincts without an exact distinct
# shuffle — Spark's own approx_count_distinct is the same sketch, but
# built here on the engine-agnostic hash60 so every register and the
# final estimate are bit-reproducible in DuckDB (a value oracle over
# an *approximate* algorithm).  Sketches are mergeable by construction
# (register max), which Catalyst exploits as a map-side partial max.
HLL_P = 9
HLL_M = 1 << HLL_P          # 512 registers
_HLL_WBITS = 60 - HLL_P     # rank domain: leading zeros of the 51-bit rest


def hll_cells(user_col):
    """(bucket, rank) column pair for one key column — the per-row HLL
    contribution.  Exact integer split of the 60-bit hash: low p bits
    pick the register (bit ops, never a double division — precision
    dies past 2^53), rank from the binary-string length (no float
    log2)."""
    from .dedup import hash60

    h = hash60(user_col.cast("string"))
    w = F.shiftright(h, HLL_P)
    rank = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return (h % HLL_M).cast("int"), rank.cast("int")


def hll_finalize(regs: DataFrame) -> DataFrame:
    """(event_type, bucket, m_j) register table → (event_type,
    est_distinct, n_registers).  The harmonic sum Σ2^(-M_j) is scaled
    by 2^(WBITS+1) into exact DECIMAL(38,0) integers so summation
    order cannot flip a bit (the micro-nats rule); the only floats
    are the final alpha·m²/S division and the linear-counting ln —
    single deterministic ops both engines restate identically."""
    scale = _HLL_WBITS + 1  # Σ2^-M scaled by 2^scale stays integral
    per_type = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(
            F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {scale} - m_j) AS DECIMAL(38,0))")
        ).alias("s_present"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("n_registers")).cast("decimal(38,0)")
        * F.lit(1 << scale).cast("decimal(38,0)")
    ).cast("double")
    alpha_num = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
    e_raw = (
        alpha_num
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        * F.lit(float(1 << scale))
        / s_total
    )
    v_zero = F.lit(HLL_M) - F.col("n_registers")
    estimate = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    return per_type.select(
        "event_type",
        F.round(estimate, 1).alias("est_distinct"),
        F.col("n_registers").cast("int").alias("n_registers"),
    )


def q_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type, three ways: the HLL estimate,
    the exact count (the audit), and the register count used.  See
    :func:`hll_cells` / :func:`hll_finalize` for the determinism
    story; the same pieces back the streaming variant
    (``stream_hll_users``), whose register aggregation is just this
    per-bucket max under ``availableNow``."""
    events = load_table(spark, sf_dir, "events")
    bucket, rank = hll_cells(F.col("user_id"))
    regs = (
        events.select(
            "event_type", bucket.alias("bucket"), rank.alias("r")
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("m_j"))
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("int").alias("exact_distinct")
    )
    return hll_finalize(regs).join(exact, "event_type")


ORACLE_HLL_USERS = f"""
WITH hashed AS (
  SELECT event_type, user_id,
         ('0x'||substring(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
  FROM events
), ranked AS (
  SELECT event_type,
         h % {HLL_M} AS bucket,
         CASE WHEN h // {HLL_M} = 0 THEN {_HLL_WBITS + 1}
              ELSE {_HLL_WBITS + 1} - length(printf('%b', h // {HLL_M}))
         END AS r
  FROM hashed
), regs AS (
  SELECT event_type, bucket, MAX(r) AS m_j FROM ranked GROUP BY 1, 2
), per_type AS (
  SELECT event_type, COUNT(*) AS n_registers,
         SUM(((1::BIGINT) << ({_HLL_WBITS + 1} - m_j))::DECIMAL(38,0)) AS s_present
  FROM regs GROUP BY 1
), est AS (
  SELECT event_type, n_registers,
         CAST(s_present + ({HLL_M} - n_registers)::DECIMAL(38,0)
                          * ((1::BIGINT) << {_HLL_WBITS + 1})::DECIMAL(38,0)
              AS DOUBLE) AS s_total
  FROM per_type
), raw AS (
  SELECT event_type, n_registers,
         (0.7213 / (1.0 + 1.079 / {float(HLL_M)}))
           * {float(HLL_M)} * {float(HLL_M)} * {float(1 << (_HLL_WBITS + 1))}
           / s_total AS e_raw,
         {HLL_M} - n_registers AS v_zero
  FROM est
), exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS INT) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT r.event_type,
       ROUND(CASE WHEN r.e_raw <= {2.5 * HLL_M} AND r.v_zero > 0
                  THEN {float(HLL_M)} * ln({float(HLL_M)} / CAST(r.v_zero AS DOUBLE))
                  ELSE r.e_raw END, 1) AS est_distinct,
       CAST(r.n_registers AS INT) AS n_registers,
       e.exact_distinct
FROM raw r JOIN exact e USING (event_type)
"""


# Count-min sketch (Cormode & Muthukrishnan 2005): frequency
# estimation in d*w integer cells — the fixed-size companion of the
# HLL sketch for heavy-hitter detection over an unbounded key space.
# Entirely integer arithmetic on the engine-agnostic hash, so the
# DuckDB oracle is exact by construction (no float anywhere).  The
# sketch is mergeable (cell-wise sum); Spark's map-side partial
# aggregation IS the per-partition sketch merge.
CMS_D = 4      # hash rows
CMS_W = 1024   # cells per row
CMS_PROBE_MOD = 50  # probe slice: user_id % 50 == 0


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated vs exact event count for a probe slice of users, via
    a d x w count-min sketch: est = min over d rows of the hashed
    cell count — an overestimate by guarantee (never under), with the
    overcount reported per user.

    Scale shape: one explode by the constant d (stream x4), one
    aggregate onto d*w = 4096 cells, then a broadcast join of the
    probe keys' cells against the sketch and a min per key.  The
    sketch size is independent of the key cardinality — the point of
    the structure at 100 TB."""
    from .dedup import hash60

    events = load_table(spark, sf_dir, "events")

    def cell(i):
        return (
            hash60(
                F.concat(
                    F.lit(f"{i}|"), F.col("user_id").cast("string")
                )
            )
            % CMS_W
        ).cast("int")

    pairs = events.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), cell(i).alias("c")
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("p")
    )
    sketch = pairs.groupBy("p.i", "p.c").agg(F.count(F.lit(1)).alias("n"))

    probe = (
        events.filter(F.col("user_id") % CMS_PROBE_MOD == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    probe_cells = probe.select(
        "user_id",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), cell(i).alias("c"))
                    for i in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("user_id", "exact_count", "p.i", "p.c")
    return (
        probe_cells.join(F.broadcast(sketch), ["i", "c"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("n").alias("est_count"))
        .select(
            "user_id",
            F.col("est_count").cast("long").alias("est_count"),
            F.col("exact_count").cast("long").alias("exact_count"),
            (F.col("est_count") - F.col("exact_count"))
            .cast("long")
            .alias("overcount"),
        )
    )


ORACLE_CMS_HEAVY_HITTERS = f"""
WITH rows_d AS (
  SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(i)
), cells AS (
  SELECT d.i,
         CAST(('0x'||substring(md5(d.i || '|' || CAST(e.user_id AS VARCHAR)),1,15))::BIGINT
              % {CMS_W} AS INT) AS c
  FROM events e CROSS JOIN rows_d d
), sketch AS (
  SELECT i, c, COUNT(*) AS n FROM cells GROUP BY 1, 2
), probe AS (
  SELECT user_id, COUNT(*) AS exact_count FROM events
  WHERE user_id % {CMS_PROBE_MOD} = 0 GROUP BY 1
), probe_cells AS (
  SELECT p.user_id, p.exact_count, d.i,
         CAST(('0x'||substring(md5(d.i || '|' || CAST(p.user_id AS VARCHAR)),1,15))::BIGINT
              % {CMS_W} AS INT) AS c
  FROM probe p CROSS JOIN rows_d d
)
SELECT pc.user_id,
       CAST(MIN(s.n) AS BIGINT) AS est_count,
       CAST(pc.exact_count AS BIGINT) AS exact_count,
       CAST(MIN(s.n) - pc.exact_count AS BIGINT) AS overcount
FROM probe_cells pc JOIN sketch s USING (i, c)
GROUP BY pc.user_id, pc.exact_count
"""


# KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002; Beyer et al.
# 2007's unioned form): keep the K smallest hash values per group.
# Unlike HLL, KMV sketches support SET OPERATIONS: merging two
# sketches and counting agreement estimates union size, Jaccard, and
# intersection — the audience-overlap question at 100 TB.  Sketch
# build is a per-group top-K over hashes (K rows per group leave the
# shuffle); everything is exact integer arithmetic until the final
# (K-1)·2^60/τ division, identical in both engines by construction.
KMV_K = 256


def _kmv_sketch(events: DataFrame) -> DataFrame:
    """The bottom-K sketch build, pre-materialization.  The sketch
    side needs distinct (type, h) — and h is a pure function of
    user_id, so that is ONE distinct straight off the scan (the
    earlier shared (type, user_id, h) distinct was a second
    corpus-wide exchange that, consumed by both the sketch and the
    exact-audit sides uncheckpointed, executed twice).

    Two-stage bottom-K so no single task ever sorts a type's full
    distinct-hash set: per-(type, salt) partial bottom-K first (64
    parallel tasks per type), then the final bottom-K over the
    <= 64*K surviving candidates — identical result, because the K
    global minima are each the minimum of their salt bucket's K."""
    from .dedup import hash60

    w1 = Window.partitionBy("event_type", "salt").orderBy("h")
    partial = (
        events.select(
            "event_type", hash60(F.col("user_id").cast("string")).alias("h")
        )
        .distinct()
        .withColumn("salt", (F.col("h") % 64).cast("int"))
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= KMV_K)
    )
    w = Window.partitionBy("event_type").orderBy("h")
    return (
        partial.select("event_type", "h")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-user overlap between event types via merged
    bottom-K sketches: estimated union, Jaccard, and intersection,
    with the exact intersection as the audit column.  Pairs whose
    merged sketch holds fewer than K values use the exact-count path
    (the sketch IS the distinct set there — standard KMV practice)."""
    events = load_table(spark, sf_dir, "events")
    # n_types*K rows; 2 consumers (pair broadcast + type list) — the
    # build stage's shape is pinned by test_sketch_family_plan_shapes
    # against _kmv_sketch directly, since the checkpoint hides it from
    # this query's final plan.
    sketch = _kmv_sketch(events).localCheckpoint(eager=True)
    types = sketch.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(types.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
        )
    )
    vals = pairs.join(
        F.broadcast(sketch).alias("s"),
        (F.col("s.event_type") == F.col("t1"))
        | (F.col("s.event_type") == F.col("t2")),
    ).select("t1", "t2", "h", "s.event_type")
    merged = vals.groupBy("t1", "t2", "h").agg(
        F.max((F.col("event_type") == F.col("t1")).cast("int")).alias("in_a"),
        F.max((F.col("event_type") == F.col("t2")).cast("int")).alias("in_b"),
    )
    wp = Window.partitionBy("t1", "t2").orderBy("h")
    topk = merged.withColumn("rn", F.row_number().over(wp)).filter(
        F.col("rn") <= KMV_K
    )
    agg = topk.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).alias("n_vals"),
        F.max("h").alias("tau"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    est_union = F.when(
        F.col("n_vals") < KMV_K, F.col("n_vals").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1))
        * F.lit(float(1 << 60))
        / F.col("tau").cast("double")
    )
    jacc = F.col("n_both").cast("double") / F.col("n_vals").cast("double")
    # exact audit: true distinct-user intersection per pair
    du = events.select("event_type", "user_id").distinct()
    exact = (
        pairs.join(
            du.alias("x"), F.col("x.event_type") == F.col("t1")
        )
        .join(
            du.alias("y"),
            (F.col("y.event_type") == F.col("t2"))
            & (F.col("x.user_id") == F.col("y.user_id")),
        )
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    return (
        agg.select(
            "t1",
            "t2",
            F.round(est_union, 1).alias("est_union"),
            F.round(jacc, 4).alias("est_jaccard"),
            F.round(jacc * est_union, 1).alias("est_both"),
        )
        .join(exact, ["t1", "t2"], "left")
        .withColumn("exact_both", F.coalesce("exact_both", F.lit(0)).cast("long"))
    )


ORACLE_KMV_OVERLAP = f"""
WITH hashed AS (
  SELECT DISTINCT event_type, user_id,
         ('0x'||substring(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
  FROM events
), sk AS (
  SELECT event_type, h FROM (
    SELECT DISTINCT event_type, h FROM hashed
  ) t QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) <= {KMV_K}
), types AS (
  SELECT DISTINCT event_type FROM sk
), pairs AS (
  SELECT a.event_type AS t1, b.event_type AS t2
  FROM types a JOIN types b ON a.event_type < b.event_type
), vals AS (
  SELECT p.t1, p.t2, s.h, s.event_type
  FROM pairs p JOIN sk s ON s.event_type IN (p.t1, p.t2)
), merged AS (
  SELECT t1, t2, h,
         MAX(CASE WHEN event_type = t1 THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN event_type = t2 THEN 1 ELSE 0 END) AS in_b
  FROM vals GROUP BY 1, 2, 3
), topk AS (
  SELECT * FROM merged
  QUALIFY ROW_NUMBER() OVER (PARTITION BY t1, t2 ORDER BY h) <= {KMV_K}
), agg AS (
  SELECT t1, t2, COUNT(*) AS n_vals, MAX(h) AS tau,
         SUM(in_a * in_b) AS n_both
  FROM topk GROUP BY 1, 2
), est AS (
  SELECT t1, t2,
         CASE WHEN n_vals < {KMV_K} THEN CAST(n_vals AS DOUBLE)
              ELSE {float(KMV_K - 1)} * {float(1 << 60)} / CAST(tau AS DOUBLE)
         END AS eu,
         CAST(n_both AS DOUBLE) / CAST(n_vals AS DOUBLE) AS j
  FROM agg
), exact AS (
  SELECT p.t1, p.t2, COUNT(*) AS exact_both
  FROM pairs p
  JOIN (SELECT DISTINCT event_type, user_id FROM hashed) x ON x.event_type = p.t1
  JOIN (SELECT DISTINCT event_type, user_id FROM hashed) y
    ON y.event_type = p.t2 AND y.user_id = x.user_id
  GROUP BY 1, 2
)
SELECT e.t1, e.t2,
       ROUND(e.eu, 1) AS est_union,
       ROUND(e.j, 4) AS est_jaccard,
       ROUND(e.j * e.eu, 1) AS est_both,
       CAST(COALESCE(x.exact_both, 0) AS BIGINT) AS exact_both
FROM est e LEFT JOIN exact x ON x.t1 = e.t1 AND x.t2 = e.t2
"""


# Bloom-filter semi-join (Bloom 1970; the structure behind Spark's
# own runtime row-group filters): build an m-bit k-hash filter over a
# small key set, pre-filter the big side through it, and report the
# false-positive cost against the exact semi-join.  Deterministic by
# construction — bit positions come from salted variants of the
# engine-agnostic hash — so DuckDB restates the filter bit-for-bit.
BLOOM_M = 2048   # bits (sized so sf0.1 exercises real false positives)
BLOOM_KH = 3     # hash functions
BLOOM_SET_MOD = 7  # member set: user_id % 7 == 0


def q_bloom_semi_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: rows passing the Bloom pre-filter vs rows truly
    in the member set, plus the false-positive count — the audit that
    sizes a runtime filter before shipping it to a 100 TB scan.

    Scale shape: the filter is a <=m-row bit table built from the
    (small) member side and BROADCAST; the big side explodes each row
    into its k probe positions and passes iff all k hit — one
    broadcast join and one per-row aggregate, never a shuffle of the
    big side by key.  The exact audit is one broadcast semi-join."""
    from .dedup import hash60

    events = load_table(spark, sf_dir, "events")

    def positions(col):
        return [
            (
                hash60(F.concat(F.lit(f"b{i}|"), col.cast("string")))
                % BLOOM_M
            ).cast("int")
            for i in range(BLOOM_KH)
        ]

    members = (
        events.filter(F.col("user_id") % BLOOM_SET_MOD == 0)
        .select("user_id")
        .distinct()
    )
    bits = (
        members.select(
            F.explode(F.array(*positions(F.col("user_id")))).alias("bit")
        )
        .distinct()
    )
    probes = events.select(
        "event_id",
        "event_type",
        "user_id",
        F.explode(F.array(*positions(F.col("user_id")))).alias("bit"),
    )
    passed = (
        probes.join(F.broadcast(bits), "bit")
        .groupBy("event_id", "event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") == BLOOM_KH)
    )
    per_type = passed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("bloom_passed")
    )
    exact = (
        events.join(F.broadcast(members), "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_members"))
    )
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            F.col("bloom_passed").cast("long").alias("bloom_passed"),
            F.col("exact_members").cast("long").alias("exact_members"),
            (F.col("bloom_passed") - F.col("exact_members"))
            .cast("long")
            .alias("false_positives"),
        )
    )


ORACLE_BLOOM_SEMI = f"""
WITH hashes AS (
  SELECT * FROM (VALUES (0), (1), (2)) AS t(i)
), members AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % {BLOOM_SET_MOD} = 0
), bits AS (
  SELECT DISTINCT
         CAST(('0x'||substring(md5('b' || h.i || '|' || CAST(m.user_id AS VARCHAR)),1,15))::BIGINT
              % {BLOOM_M} AS INT) AS bit
  FROM members m CROSS JOIN hashes h
), probes AS (
  SELECT e.event_id, e.event_type, e.user_id,
         CAST(('0x'||substring(md5('b' || h.i || '|' || CAST(e.user_id AS VARCHAR)),1,15))::BIGINT
              % {BLOOM_M} AS INT) AS bit
  FROM events e CROSS JOIN hashes h
), passed AS (
  SELECT event_id, event_type, user_id
  FROM probes p JOIN bits b USING (bit)
  GROUP BY 1, 2, 3
  HAVING COUNT(*) = {BLOOM_KH}
), per_type AS (
  SELECT event_type, COUNT(*) AS bloom_passed FROM passed GROUP BY 1
), exact AS (
  SELECT e.event_type, COUNT(*) AS exact_members
  FROM events e WHERE e.user_id IN (SELECT user_id FROM members)
  GROUP BY 1
)
SELECT p.event_type,
       CAST(p.bloom_passed AS BIGINT) AS bloom_passed,
       CAST(x.exact_members AS BIGINT) AS exact_members,
       CAST(p.bloom_passed - x.exact_members AS BIGINT) AS false_positives
FROM per_type p JOIN exact x USING (event_type)
"""


# Mergeable equi-width histogram quantiles: the way a 100 TB engine
# answers percentiles without a global sort — per group only HIST_BINS
# counters cross the wire (map-side partial combine collapses each
# input split to <=HIST_BINS rows before the shuffle), then p50/p90/p99
# come from within-bin linear interpolation.  Error is bounded by one
# bin width by construction (pinned in tests/test_sketches.py).
# Deterministic end to end: values quantize to exact integer cents
# (functions.numeric.cents), bin assignment is pure integer floor
# division, and the only floats are the final interpolation — a fixed
# expression shape both engines evaluate identically.
HIST_BINS = 128
# (name, ceil-target numerator/denominator): t = ceil(q*n) as integers
HIST_QS = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def histogram_quantiles(
    df: DataFrame, group_col: str, cents_col, bins: int = HIST_BINS
) -> DataFrame:
    """Generic binned-quantile sketch over ``cents_col`` (an exact
    integer-cents expression) grouped by ``group_col`` — see the block
    comment above for the determinism and scale story."""
    base = df.select(group_col, cents_col.alias("xc"))
    bounds = base.groupBy(group_col).agg(
        F.min("xc").alias("lo"),
        F.max("xc").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = base.join(F.broadcast(bounds), group_col).select(
        group_col,
        "lo",
        "hi",
        "n",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.expr(f"(xc - lo) * {bins} div (hi - lo)"),
                F.lit(bins - 1),
            )
        )
        .cast("int")
        .alias("bin"),
    )
    hist = binned.groupBy(group_col, "lo", "hi", "n", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return quantiles_from_hist(hist, group_col, bins)


def quantiles_from_hist(
    hist: DataFrame, group_col: str, bins: int = HIST_BINS
) -> DataFrame:
    """Quantile recovery over a (group, lo, hi, n, bin, cnt) histogram
    relation — shared by the batch sketch above and the streaming
    variant (whose bin counters arrive from a streaming aggregate)."""
    # bin is unique per group after the aggregate, so the default RANGE
    # frame equals ROWS — no tie ambiguity.
    w = Window.partitionBy(group_col).orderBy("bin")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))

    def estimate(qnum: int, qden: int):
        # ceil(q*n) in exact integers; the crossing bin is the unique
        # one with cum_prev < t <= cum, and the estimate interpolates
        # linearly inside it.  Association is pinned to
        # lo + (bin + frac) * (range / bins) — the oracle restates the
        # identical shape so the doubles agree bitwise.
        t = F.expr(f"(n * {qnum} + {qden} - 1) div {qden}")
        prev = F.col("cum") - F.col("cnt")
        interp = F.col("lo").cast("double") + (
            F.col("bin").cast("double")
            + (t - prev).cast("double") / F.col("cnt").cast("double")
        ) * ((F.col("hi") - F.col("lo")).cast("double") / float(bins))
        cents_est = F.min(F.when((F.col("cum") >= t) & (prev < t), interp))
        # cents -> price units, half-up-quantized to 4dp via exact
        # floor arithmetic (the money-parity rule; never ROUND(double)).
        return F.floor(cents_est * 100.0 + 0.5) / 10000.0

    return cum.groupBy(group_col, "lo", "hi", "n").agg(
        *[estimate(qn, qd).alias(name) for name, qn, qd in HIST_QS]
    ).select(
        group_col,
        F.col("n").cast("long").alias("n_rows"),
        *[name for name, _, _ in HIST_QS],
        (
            F.floor(
                (F.col("hi") - F.col("lo")).cast("double")
                / float(bins)
                * 100.0
                + 0.5
            )
            / 10000.0
        ).alias("bin_width"),
    )


def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate over right-censored durations —
    the reference's stated warranty-failure analysis
    (``todos_SKUs.Rmd:45``: probability a unit has NOT failed by time
    t, censored units counted in the risk set until they drop out;
    the Rmd describes the KM fit over expedition->assistance dates but
    only codes the bucketing, so this implements the stated intent,
    the same rule the payroll family follows).  Here: duration =
    hours from a user's first event to their first ``error`` (failure)
    or to their last observed event (censored).

    Estimator: S(t) = Π over event times t_i <= t of (1 - d_i/n_i).
    The product is computed as an EXACT INTEGER cumulative sum of
    per-term micro-nats (floor(ln(1-d/n)*1e6 + 0.5) — the lm_perplexity
    sum-order rule: never cumulate raw doubles across engines), one
    exp at the end, 4dp floor-quantized.  If a risk set is wiped out
    (d = n) survival locks to exactly 0 from that time on.

    Scale shape: the per-user reduction is one groupBy over the raw
    stream (map-side combined); everything after operates on the
    duration-grouped relation, which is bounded by the observation
    span in HOURS (~720 rows), so its unpartitioned ordered windows
    are metadata-sized by construction — same small-relation argument
    as the histogram recovery."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("tl"),
        F.min(
            F.when(F.col("event_type") == "error", F.col("ts"))
        ).alias("tf"),
    )
    obs = per_user.select(
        F.expr(
            "(unix_timestamp(coalesce(tf, tl)) - unix_timestamp(t0)) div 3600"
        ).alias("dur_h"),
        F.col("tf").isNotNull().cast("int").alias("event"),
    )
    return km_from_obs(obs)


def km_from_obs(obs: DataFrame) -> DataFrame:
    """Kaplan-Meier over any (dur_h, event) relation — separate so the
    estimator is unit-testable against hand-computed curves."""
    grouped = obs.groupBy("dur_h").agg(
        F.sum("event").alias("d"),
        F.sum(1 - F.col("event")).alias("c"),
    )
    w_all = Window.partitionBy(F.lit(1))
    w_prev = (
        Window.partitionBy(F.lit(1))
        .orderBy("dur_h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        grouped.withColumn("n_total", F.sum(F.col("d") + F.col("c")).over(w_all))
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            ),
        )
        .withColumn("n_risk", F.col("n_total") - F.col("cum_prev"))
        .filter(F.col("d") > 0)
    )
    term_micro = F.when(
        F.col("d") < F.col("n_risk"),
        F.floor(
            F.log(
                F.lit(1.0)
                - F.col("d").cast("double") / F.col("n_risk").cast("double")
            )
            * 1e6
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    w_cum = (
        Window.partitionBy(F.lit(1))
        .orderBy("dur_h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    km = (
        risk.withColumn("term_micro", term_micro)
        .withColumn("cum_micro", F.sum("term_micro").over(w_cum))
        .withColumn(
            "wiped",
            F.max((F.col("d") == F.col("n_risk")).cast("int")).over(w_cum),
        )
    )
    survival = F.when(F.col("wiped") == 1, F.lit(0.0)).otherwise(
        F.floor(
            F.exp(F.col("cum_micro").cast("double") / F.lit(1e6)) * 10000
            + F.lit(0.5)
        )
        / 10000
    )
    return km.select(
        F.col("dur_h").cast("long").alias("dur_h"),
        F.col("d").cast("long").alias("n_failures"),
        F.col("n_risk").cast("long").alias("n_risk"),
        survival.alias("survival"),
    )


ORACLE_KM_SURVIVAL = """
WITH per_user AS (
  SELECT user_id,
         MIN(ts) AS t0,
         MAX(ts) AS tl,
         MIN(CASE WHEN event_type = 'error' THEN ts END) AS tf
  FROM events GROUP BY 1
), obs AS (
  -- FLOOR(epoch(...)) mirrors Spark's unix_timestamp() second
  -- truncation (DuckDB's epoch keeps the fractional part)
  SELECT (CAST(FLOOR(epoch(COALESCE(tf, tl))) AS BIGINT)
          - CAST(FLOOR(epoch(t0)) AS BIGINT)) // 3600 AS dur_h,
         CASE WHEN tf IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user
), grouped AS (
  SELECT dur_h, SUM(event) AS d, SUM(1 - event) AS c
  FROM obs GROUP BY 1
), risk AS (
  SELECT dur_h, d, c,
         SUM(d + c) OVER () AS n_total,
         COALESCE(SUM(d + c) OVER (ORDER BY dur_h
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
  FROM grouped
), terms AS (
  SELECT dur_h, d, n_total - cum_prev AS n_risk,
         CASE WHEN d < n_total - cum_prev
              THEN CAST(FLOOR(ln(1.0 - CAST(d AS DOUBLE)
                                   / CAST(n_total - cum_prev AS DOUBLE))
                              * 1e6 + 0.5) AS BIGINT)
              ELSE 0 END AS term_micro
  FROM risk
  WHERE d > 0
), km AS (
  SELECT dur_h, d, n_risk,
         SUM(term_micro) OVER (ORDER BY dur_h
             ROWS UNBOUNDED PRECEDING) AS cum_micro,
         MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY dur_h
             ROWS UNBOUNDED PRECEDING) AS wiped
  FROM terms
)
SELECT CAST(dur_h AS BIGINT) AS dur_h,
       CAST(d AS BIGINT) AS n_failures,
       CAST(n_risk AS BIGINT) AS n_risk,
       CASE WHEN wiped = 1 THEN 0.0
            ELSE FLOOR(exp(CAST(cum_micro AS DOUBLE) / 1e6) * 10000 + 0.5)
                 / 10000
       END AS survival
FROM km
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) builder: collapse each
    user's event stream into validity intervals — one row per
    contiguous run of the same event_type, with ``valid_from`` (first
    event of the run), ``valid_to`` (start of the NEXT run, NULL while
    current — the half-open [from, to) convention downstream as-of
    joins expect) and ``is_current``.  The standard way a warehouse
    derives a versioned dimension from a change stream.

    Runs come from the gaps-and-islands change-flag cumsum; ordering
    is (ts, event_id) so equal timestamps break deterministically.
    Scale shape: two user-keyed windows over the raw stream plus one
    user-keyed window over the (much smaller) interval relation —
    nothing global, state bounded per user."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # null-safe change flag (IS DISTINCT FROM semantics, mirrored in
    # the oracle): the first row and any NULL-vs-value transition
    # start a run; NULL-vs-NULL does not.
    chg = (
        ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w))
    ).cast("int")
    runs = ev.withColumn(
        "version",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("int"),
    )
    iv = runs.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("version")
    return (
        iv.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            "user_id",
            "version",
            "event_type",
            "valid_from",
            "valid_to",
            "n_events",
            "is_current",
        )
    )


ORACLE_SCD2 = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN event_type IS DISTINCT FROM
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS chg
  FROM events
), runs AS (
  SELECT *,
         CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS INT) AS version
  FROM ordered
), iv AS (
  SELECT user_id, version, event_type,
         MIN(ts) AS valid_from,
         CAST(COUNT(*) AS INT) AS n_events
  FROM runs GROUP BY 1, 2, 3
)
SELECT user_id, version, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
         AS valid_to,
       n_events,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
         IS NULL AS is_current
FROM iv
"""


def q_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts with gap-filling and linear interpolation —
    the hypertable rollup pattern (TimescaleDB's ``time_bucket_gapfill``
    + ``interpolate``): a per-type spine of EVERY hour between the
    type's first and last observed hour, observed rows passed through,
    missing hours linearly interpolated between the neighboring
    observations.

    The previous/next observation is found with the gaps-and-islands
    cumulative-count trick (a running COUNT of non-nulls keys each gap
    row to its bracketing observed rows) — engine-agnostic, no
    IGNORE NULLS dependency, and every window is keyed by event_type
    so the spine never globally sorts.  Spine bounds are the observed
    min/max, so every gap is interior and prev/next always exist.
    Interpolation arithmetic: hour offsets as exact integers, one
    pinned float expression, 4dp half-up quantization via floor.

    Scale shape: one groupBy of the raw events (map-side combined),
    a per-type 2-row bounds aggregate exploded into the spine
    (sequence() — rows proportional to hours, not events), one keyed
    left join, and four windows over the spine partitioned by type.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    return gap_fill_hours(hourly)


def gap_fill_hours(hourly: DataFrame) -> DataFrame:
    """Core of :func:`q_gap_fill_interpolate` over any
    (event_type, hr, n) relation — separate so the bracketing and
    interpolation semantics are unit-testable on constructed series."""
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    full = spine.join(hourly, ["event_type", "hr"], "left")

    w_past = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("hr"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = full.withColumn("grp_p", F.count("n").over(w_past)).withColumn(
        "grp_n", F.count("n").over(w_next)
    )
    blk_p = Window.partitionBy("event_type", "grp_p")
    blk_n = Window.partitionBy("event_type", "grp_n")
    bracketed = (
        grouped.withColumn("prev_n", F.max("n").over(blk_p))
        .withColumn("prev_hr", F.min("hr").over(blk_p))
        .withColumn("next_n", F.max("n").over(blk_n))
        .withColumn("next_hr", F.max("hr").over(blk_n))
    )
    d1 = (
        F.unix_timestamp("hr") - F.unix_timestamp("prev_hr")
    ) / F.lit(3600)
    d = (
        F.unix_timestamp("next_hr") - F.unix_timestamp("prev_hr")
    ) / F.lit(3600)
    interp = F.col("prev_n").cast("double") + (
        F.col("next_n") - F.col("prev_n")
    ).cast("double") * (d1.cast("double") / d.cast("double"))
    filled = F.when(F.col("n").isNotNull(), F.col("n").cast("double")).otherwise(
        F.floor(interp * 10000 + F.lit(0.5)) / 10000
    )
    return bracketed.select(
        "event_type",
        "hr",
        F.col("n").cast("long").alias("n_observed"),
        filled.alias("n_filled"),
        F.when(F.col("n").isNotNull(), F.lit("observed"))
        .otherwise(F.lit("interpolated"))
        .alias("method"),
    )


ORACLE_GAP_FILL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, MIN(hr) AS lo, MAX(hr) AS hi FROM hourly GROUP BY 1
), spine AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
  FROM bounds
), filled AS (
  SELECT s.event_type, s.hr, h.n,
         COUNT(h.n) OVER (PARTITION BY s.event_type ORDER BY s.hr
                          ROWS UNBOUNDED PRECEDING) AS grp_p,
         COUNT(h.n) OVER (PARTITION BY s.event_type ORDER BY s.hr DESC
                          ROWS UNBOUNDED PRECEDING) AS grp_n
  FROM spine s LEFT JOIN hourly h USING (event_type, hr)
), bracketed AS (
  SELECT event_type, hr, n,
         MAX(n)  OVER (PARTITION BY event_type, grp_p) AS prev_n,
         MIN(hr) OVER (PARTITION BY event_type, grp_p) AS prev_hr,
         MAX(n)  OVER (PARTITION BY event_type, grp_n) AS next_n,
         MAX(hr) OVER (PARTITION BY event_type, grp_n) AS next_hr
  FROM filled
)
SELECT event_type, hr,
       CAST(n AS BIGINT) AS n_observed,
       CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
            ELSE FLOOR((CAST(prev_n AS DOUBLE)
                        + CAST(next_n - prev_n AS DOUBLE)
                          * (CAST((epoch(hr) - epoch(prev_hr)) // 3600 AS DOUBLE)
                             / CAST((epoch(next_hr) - epoch(prev_hr)) // 3600 AS DOUBLE)))
                       * 10000 + 0.5) / 10000
       END AS n_filled,
       CASE WHEN n IS NOT NULL THEN 'observed' ELSE 'interpolated' END AS method
FROM bracketed
"""


def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of l_extendedprice per return flag via the binned
    sketch — the scale-path twin of the exact ``revenue_percentiles``
    (which global-sorts); max error one bin width, reported as the
    ``bin_width`` audit column."""
    from ..functions.numeric import cents

    li = load_table(spark, sf_dir, "lineitem")
    return histogram_quantiles(
        li, "l_returnflag", cents(F.col("l_extendedprice"))
    )


def _hist_q_sql() -> str:
    sels = []
    for name, qn, qd in HIST_QS:
        t = f"((n * {qn} + {qd} - 1) // {qd})"
        interp = (
            f"CAST(lo AS DOUBLE) + (CAST(bin AS DOUBLE) + "
            f"CAST({t} - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE)) * "
            f"(CAST(hi - lo AS DOUBLE) / {float(HIST_BINS)!r})"
        )
        sels.append(
            f"FLOOR(MIN(CASE WHEN cum >= {t} AND cum - cnt < {t} "
            f"THEN {interp} END) * 100.0 + 0.5) / 10000.0 AS {name}"
        )
    return ",\n       ".join(sels)


ORACLE_HISTOGRAM_QUANTILES = f"""
WITH base AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS xc
  FROM lineitem
), bounds AS (
  SELECT l_returnflag, MIN(xc) AS lo, MAX(xc) AS hi, COUNT(*) AS n
  FROM base GROUP BY 1
), binned AS (
  SELECT b.l_returnflag, d.lo, d.hi, d.n,
         CAST(CASE WHEN d.hi = d.lo THEN 0
              ELSE LEAST((b.xc - d.lo) * {HIST_BINS} // (d.hi - d.lo),
                         {HIST_BINS - 1}) END AS INT) AS bin
  FROM base b JOIN bounds d USING (l_returnflag)
), hist AS (
  SELECT l_returnflag, lo, hi, n, bin, COUNT(*) AS cnt
  FROM binned GROUP BY 1, 2, 3, 4, 5
), cum AS (
  SELECT *, SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       {_hist_q_sql()},
       FLOOR(CAST(hi - lo AS DOUBLE) / {float(HIST_BINS)!r} * 100.0 + 0.5)
         / 10000.0 AS bin_width
FROM cum
GROUP BY l_returnflag, lo, hi, n
"""


QUERIES = {
    "hourly_event_counts": q_hourly_event_counts,
    "sliding_event_counts": q_sliding_event_counts,
    "sessionize": q_sessionize,
    "props_extract": q_props_extract,
    "outlier_events": q_outlier_events,
    "funnel_conversion": q_funnel_conversion,
    "cohort_retention": q_cohort_retention,
    "hll_users": q_hll_users,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "kmv_overlap": q_kmv_overlap,
    "bloom_semi_filter": q_bloom_semi_filter,
    "histogram_quantiles": q_histogram_quantiles,
    "gap_fill_interpolate": q_gap_fill_interpolate,
    "scd2_intervals": q_scd2_intervals,
    "km_survival": q_km_survival,
}

ORACLES = {
    "hll_users": ORACLE_HLL_USERS,
    "histogram_quantiles": ORACLE_HISTOGRAM_QUANTILES,
    "gap_fill_interpolate": ORACLE_GAP_FILL,
    "scd2_intervals": ORACLE_SCD2,
    "km_survival": ORACLE_KM_SURVIVAL,
    "cms_heavy_hitters": ORACLE_CMS_HEAVY_HITTERS,
    "kmv_overlap": ORACLE_KMV_OVERLAP,
    "bloom_semi_filter": ORACLE_BLOOM_SEMI,
    "hourly_event_counts": ORACLE_HOURLY,
    "sliding_event_counts": ORACLE_SLIDING,
    "sessionize": ORACLE_SESSIONIZE,
    "props_extract": ORACLE_PROPS,
    "outlier_events": ORACLE_OUTLIERS,
    "funnel_conversion": ORACLE_FUNNEL,
    "cohort_retention": ORACLE_COHORT,
}
