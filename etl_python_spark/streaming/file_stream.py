"""Structured Streaming pipelines over the events file source.

The reference's closest analogue is watchdog folder-monitoring + full
batch re-runs (SURVEY.md §2.9); the Spark-native form is the file
source with ``trigger(availableNow=True)``: identical batch-like
semantics, but incremental, checkpointed, and watermark-aware when run
continuously.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same nanos-ts
    normalization as the batch reader."""
    path = os.path.join(sf_dir, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # the file source monitors a directory; select just the events
    # file via glob (in production this is the landing directory)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long"))
        )
    return stream


def hourly_counts_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windowed aggregate with a watermark for late
    data; ``availableNow`` drains the source once and the memory sink
    holds the result — the batch-equivalent semantics are verified
    against the SQL oracle."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("janela"), F.col("event_type"))
        .agg(
            F.count("*").alias("eventos"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("valor_total"),
        )
        .select(
            F.col("janela.start").alias("hora"),
            "event_type",
            "eventos",
            "valor_total",
        )
    )
    name = f"hourly_counts_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


ORACLE_STREAM_HOURLY = """
SELECT date_trunc('hour', ts) AS hora, event_type,
       COUNT(*) AS eventos,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS valor_total
FROM events
GROUP BY 1, 2
"""

QUERIES = {
    "stream_hourly_counts": hourly_counts_stream,
}

ORACLES = {
    "stream_hourly_counts": ORACLE_STREAM_HOURLY,
}
