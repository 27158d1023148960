"""Round-17 checkpoint A/B (VERDICT r16 item 3): per-site idle-host
measurement of the eager localCheckpoints r16 added to
dedup_pairs_on_delete and pagerank_copurchase.  Each variant rebuilds
the SAME query with one materialization choice changed; interleaved
warm min-of-N per variant in one session (bench.py methodology).

Usage: python plans/r17/probe_ckpt_ab.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

deadline = time.time() + 240
while os.getloadavg()[0] > 1.0 and time.time() < deadline:
    time.sleep(5)
print(f"load at start: {os.getloadavg()}", file=sys.stderr)

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_python_spark.session import get_spark  # noqa: E402

spark = get_spark("probe_ckpt_ab", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

# bench warm-up
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
from etl_python_spark.sources.tables import load_table  # noqa: E402


def on_delete_variant(mode_df: str, mode_counts: str):
    """mode_*: 'ckpt' | 'lazy' | 'persist'."""

    def mat(df, mode):
        if mode == "ckpt":
            return df.localCheckpoint(eager=True)
        if mode == "persist":
            return df.persist(StorageLevel.MEMORY_AND_DISK)
        return df

    docs = load_table(spark, sf_dir, "documents")
    is_removed = (F.col("doc_id") % D.DOC_DEL_MOD) == D.DOC_DEL_REM
    base_sh = D._materialize(D.hashed_shingle_stream(docs), "checkpoint")
    base_df = mat(base_sh.groupBy("h").agg(F.count("*").alias("df")), mode_df)
    base_kept = base_sh.join(
        base_df.filter((F.col("df") >= 2) & (F.col("df") <= D.MAX_DF)),
        "h",
        "left_semi",
    )
    removed_ids = docs.filter(is_removed).select("doc_id")
    surv_sh = base_sh.join(removed_ids, "doc_id", "left_anti")
    counts_new, _, _ = D._decremental_pair_counts(
        surv_sh, base_df, mat(D._pair_counts(base_kept), mode_counts), removed_ids
    )
    return D._jaccard_from_counts(counts_new)


def pagerank_variant(ckpt_pair_cnt: bool):
    from etl_python_spark.operators import affinity as A

    baskets = A._baskets(spark, sf_dir)
    pair_cnt = (
        A._basket_pairs(baskets)
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("cnt_ab"))
        .filter(F.col("cnt_ab") >= A.MIN_PAIR_COUNT)
    )
    if ckpt_pair_cnt:
        pair_cnt = pair_cnt.localCheckpoint(eager=True)
    edges = pair_cnt.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst")
    ).unionAll(pair_cnt.select(F.col("p2").alias("src"), F.col("p1").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges = edges.join(deg, "src").localCheckpoint(eager=True)
    n = edges.select("src").distinct().count()
    import math

    u0 = math.floor(A.PR_SCALE / n + 0.5)
    teleport = math.floor(0.15 * A.PR_SCALE / n + 0.5)
    ranks = None
    for _ in range(A.PR_ITERS):
        if ranks is None:
            contribs = edges.select(
                F.col("dst"),
                F.floor(
                    F.lit(u0).cast("double") / F.col("outdeg").cast("double")
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("c"),
            )
        else:
            contribs = edges.join(ranks, edges["src"] == ranks["pk"]).select(
                F.col("dst"),
                F.floor(
                    F.col("u").cast("double") / F.col("outdeg").cast("double")
                    + F.lit(0.5)
                )
                .cast("long")
                .alias("c"),
            )
        sums = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = sums.select(
            F.col("dst").alias("pk"),
            (
                F.lit(teleport)
                + F.floor(
                    F.lit(0.85) * F.col("s").cast("double") + F.lit(0.5)
                ).cast("long")
            )
            .cast("long")
            .alias("u"),
        ).localCheckpoint(eager=True)
    return ranks.select(
        F.col("pk").alias("p_partkey"),
        F.col("u").alias("rank_micro"),
        (F.col("u").cast("double") / F.lit(A.PR_SCALE)).alias("rank"),
    )


VARIANTS = {
    "od_head_ckpt_both": lambda: on_delete_variant("ckpt", "ckpt"),
    "od_lazy_both": lambda: on_delete_variant("lazy", "lazy"),
    "od_ckpt_df_only": lambda: on_delete_variant("ckpt", "lazy"),
    "od_ckpt_counts_only": lambda: on_delete_variant("lazy", "ckpt"),
    "od_persist_both": lambda: on_delete_variant("persist", "persist"),
    "pr_head_ckpt": lambda: pagerank_variant(True),
    "pr_lazy_pair_cnt": lambda: pagerank_variant(False),
}


def timed(build) -> float:
    t0 = time.time()
    df = build()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    # drop any persisted blocks between runs so variants don't share
    spark.catalog.clearCache()
    return dt


out: dict[str, list[float]] = {k: [] for k in VARIANTS}
# one warm pass each, then interleaved timed rounds (A B C A B C ...)
for name, build in VARIANTS.items():
    sc.setJobDescription(f"warm:{name}")
    timed(build)
for i in range(n_runs):
    for name, build in VARIANTS.items():
        sc.setJobDescription(f"run{i}:{name}")
        out[name].append(round(timed(build), 3))

summary = {
    k: {"min": min(v), "samples": v} for k, v in out.items()
}
for k, v in summary.items():
    print(f"{k}: min={v['min']} samples={v['samples']}", file=sys.stderr)
print(json.dumps(summary))
