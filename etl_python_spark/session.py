"""SparkSession factory.

Local tests run on ``local[N]`` but every config here is chosen for
cluster scale: AQE handles skew and partition coalescing at 100 TB the
same way it does at sf0.01, and Arrow makes the pandas-UDF boundary
(the only Python hot path we allow) batch-columnar.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl_python_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    - AQE on: runtime coalescing of shuffle partitions, skew-join
      splitting, and dynamic join-strategy switching — the knobs that
      make one config work from 60k rows to 100 TB.
    - Arrow on: the pandas UDF boundary is columnar batches, not rows.
    - Broadcast threshold left at default (10 MB); small dims are
      additionally hinted explicitly with ``F.broadcast`` at call
      sites so the plan survives stale/absent stats.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # columnar parquet reads + pushdown are defaults; pin anyway so
        # a misconfigured cluster profile can't silently disable them
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # 8g measured best on local[32]: a 24g heap ran the shingle
        # stage 3-10x SLOWER (progressive within-session degradation,
        # GC-dominated); small heaps keep G1 pauses short for these
        # sub-GB shuffles
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
