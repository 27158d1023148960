"""Round-17 CC-kernel A/B (VERDICT r16 items 3/7): stock _cc_star
(eager per-round checkpoint + separate convergence-aggregate job) vs a
FUSED variant where the round's small-star output is a LAZY local
checkpoint materialized BY the convergence aggregate — one job per
round instead of two, identical values (same expressions, same exact
set comparison).  Measured through the two benched CC consumers.

Usage: python plans/r17/probe_cc_ab.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

deadline = time.time() + 400
while os.getloadavg()[0] > 1.0 and time.time() < deadline:
    time.sleep(5)
print(f"load at start: {os.getloadavg()}", file=sys.stderr)

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_python_spark.session import get_spark  # noqa: E402

spark = get_spark("probe_cc_ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
spark.range(sc.defaultParallelism * 4).repartition(sc.defaultParallelism).mapInPandas(
    lambda it: it, "id long"
).count()
spark.range(200_000).repartition(sc.defaultParallelism).select(
    F.sum(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1_000_000_007
    )
).count()

from etl_python_spark.operators import dedup as D  # noqa: E402
from etl_python_spark.operators import fuzzy as FZ  # noqa: E402

_module_cc_star = D._cc_star


def _cc_star_eager_r16(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """The r16 form: eager per-round checkpoint + separate check job."""
    e = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("w"))
        .filter(F.col("u") != F.col("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("u").alias("v"))
        .union(e.select(F.col("w").alias("v")))
        .distinct()
    )
    converged = False
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("w").alias("u"), F.col("u").alias("w")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("w").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("w") > F.col("u"))
            .select(F.col("w").alias("u"), F.col("m").alias("w"))
        )
        se = large.select(
            F.greatest("u", "w").alias("u"), F.least("u", "w").alias("w")
        )
        mins2 = se.groupBy("u").agg(F.min("w").alias("m"))
        joined = se.join(mins2, "u")
        small = (
            joined.filter(F.col("w") != F.col("m"))
            .select(F.col("w").alias("u"), F.col("m").alias("w"))
            .union(mins2.select("u", F.col("m").alias("w")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_diff = (
            small.select("u", "w")
            .unionAll(e.select("u", "w"))
            .groupBy("u", "w")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") != 2)
            .limit(1)
            .count()
        )
        if n_diff == 0:
            e = small
            converged = True
            break
        e = small
    if not converged:
        raise RuntimeError("cc did not converge")
    roots = verts.join(e.select(F.col("u").alias("v")), "v", "left_anti").select(
        F.col("v").alias("u"), F.col("v").alias("w")
    )
    labels = e.unionByName(roots)
    return labels.select(
        F.col("u").alias("doc_id"), F.col("w").alias("component_id")
    )


def _cc_star_fused(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    e = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("w"))
        .filter(F.col("u") != F.col("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("u").alias("v"))
        .union(e.select(F.col("w").alias("v")))
        .distinct()
    )
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        sym = e.union(e.select(F.col("w").alias("u"), F.col("u").alias("w")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("w").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("w") > F.col("u"))
            .select(F.col("w").alias("u"), F.col("m").alias("w"))
        )
        se = large.select(
            F.greatest("u", "w").alias("u"), F.least("u", "w").alias("w")
        )
        mins2 = se.groupBy("u").agg(F.min("w").alias("m"))
        joined = se.join(mins2, "u")
        # LAZY checkpoint: the convergence aggregate below is the
        # round's ONLY job — it computes small, persists it as the
        # local checkpoint, and returns the diff count in one pass.
        small = (
            joined.filter(F.col("w") != F.col("m"))
            .select(F.col("w").alias("u"), F.col("m").alias("w"))
            .union(mins2.select("u", F.col("m").alias("w")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        n_diff = (
            small.select("u", "w")
            .unionAll(e.select("u", "w"))
            .groupBy("u", "w")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") != 2)
            .limit(1)
            .count()
        )
        if n_diff == 0:
            e = small
            converged = True
            break
        e = small
    if not converged:
        raise RuntimeError("cc did not converge")
    roots = verts.join(e.select(F.col("u").alias("v")), "v", "left_anti").select(
        F.col("v").alias("u"), F.col("v").alias("w")
    )
    labels = e.unionByName(roots)
    return labels.select(
        F.col("u").alias("doc_id"), F.col("w").alias("component_id")
    )


def build_dedup():
    return D.q_dedup_components(spark, sf_dir)


def build_fuzzy():
    return FZ.q_fuzzy_components(spark, sf_dir)


VARIANTS = {
    "dedup_stock": (build_dedup, _cc_star_eager_r16),
    "dedup_fused": (build_dedup, _cc_star_fused),
    "fuzzy_stock": (build_fuzzy, _cc_star_eager_r16),
    "fuzzy_fused": (build_fuzzy, _cc_star_fused),
}


def timed(build, kernel) -> float:
    D._cc_star = kernel
    try:
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        return time.time() - t0
    finally:
        D._cc_star = _module_cc_star


# value parity first (cheap at sf0.01): fused must return identical rows
par_dir = "/root/testdata/sf0.01"


def rows_of(kernel):
    D._cc_star = kernel
    try:
        df = D.q_dedup_components(spark, par_dir)
        return sorted(map(tuple, df.collect()))
    finally:
        D._cc_star = _module_cc_star


assert rows_of(_cc_star_eager_r16) == rows_of(_cc_star_fused), "fused kernel diverged!"
print("parity ok at sf0.01", file=sys.stderr)

out: dict[str, list[float]] = {k: [] for k in VARIANTS}
for name, (build, kern) in VARIANTS.items():
    sc.setJobDescription(f"warm:{name}")
    timed(build, kern)
for i in range(n_runs):
    for name, (build, kern) in VARIANTS.items():
        sc.setJobDescription(f"run{i}:{name}")
        out[name].append(round(timed(build, kern), 3))

summary = {k: {"min": min(v), "samples": v} for k, v in out.items()}
for k, v in summary.items():
    print(f"{k}: min={v['min']} samples={v['samples']}", file=sys.stderr)
print(json.dumps(summary))
