"""Event-stream analytics over the ``events`` table.

Batch expressions of the streaming semantics (the same logic runs
under Structured Streaming in ``streaming/`` with
``trigger(availableNow=True)`` — see SURVEY.md §2.9): tumbling
windows, sessionization, and semi-structured JSON props extraction.
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
    aggregate reduces map-side and broadcasts K rows.  Mean/std are
    rounded at 6dp first so both engines derive z from bit-identical
    anchors; z rounds at 4dp before the threshold test."""
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("m"),
        F.round(F.stddev_samp("value"), 6).alias("s"),
    )
    z = F.round((F.col("value") - F.col("m")) / F.col("s"), 4)
    return (
        events.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 3)
    )


ORACLE_OUTLIERS = """
WITH stats AS (
  SELECT event_type, ROUND(AVG(value), 6) AS m, ROUND(stddev_samp(value), 6) AS s
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - st.m) / st.s, 4) AS z
FROM events e JOIN stats st USING (event_type)
WHERE ABS(ROUND((e.value - st.m) / st.s, 4)) > 3
"""


QUERIES = {
    "hourly_event_counts": q_hourly_event_counts,
    "sliding_event_counts": q_sliding_event_counts,
    "sessionize": q_sessionize,
    "props_extract": q_props_extract,
    "outlier_events": q_outlier_events,
}

ORACLES = {
    "hourly_event_counts": ORACLE_HOURLY,
    "sliding_event_counts": ORACLE_SLIDING,
    "sessionize": ORACLE_SESSIONIZE,
    "props_extract": ORACLE_PROPS,
    "outlier_events": ORACLE_OUTLIERS,
}
