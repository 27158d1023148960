"""Phase-level wall-clock profiling for the expensive extended queries.

Times each eager step (checkpoints, fit collects) and the final noop
write separately, so optimization targets the phase that actually
costs (guide §1: measure first).  Pure measurement — no engine change.

Usage: python tools/profile_phases.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from etl_python_spark.session import get_spark  # noqa: E402

spark = get_spark("profile_phases")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402
from etl_python_spark.operators import similarity as S  # noqa: E402
from etl_python_spark.operators import dedup as D  # noqa: E402


class T:
    def __init__(self):
        self.marks = []
        self.t0 = time.time()

    def mark(self, label):
        t = time.time()
        self.marks.append((label, t - self.t0))
        self.t0 = t

    def report(self, name):
        total = sum(d for _, d in self.marks)
        print(f"--- {name}: total {total:.2f}s")
        for label, d in self.marks:
            print(f"    {label:40s} {d:6.2f}s")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# warm-up (same as bench)
spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
sc = spark.sparkContext
spark.range(200_000).repartition(sc.defaultParallelism).select(
    F.sum(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1_000_000_007
    )
).count()


def profile_ivf_pq_search(warm):
    t = T()
    emb = S._kmeans_emb(spark, sf_dir)
    t.mark("kmeans_emb checkpoint")
    init = S._kmeans_init(emb)
    t.mark("kmeans_init collect")
    centroids = init
    for i in range(S.KMEANS_ITERS):
        assigned = S._kmeans_assign(emb, centroids)
        dims = assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
        means = (
            dims.groupBy("cluster", "pos")
            .agg(S._micro_mean(F.col("val")).alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .orderBy("cluster")
            .collect()
        )
        new_centroids = dict((r.cluster, list(r.centroid)) for r in means)
        centroids = [new_centroids.get(i, centroids[i]) for i in range(S.KMEANS_K)]
        t.mark(f"lloyd iter {i}")
    uemb = S._unit_emb(emb).localCheckpoint(eager=True)
    t.mark("unit_emb checkpoint")
    cb = S._pq_codebook(uemb, S.IVFPQ_M, S.IVFPQ_KS)
    t.mark("pq codebook init collect")
    import copy

    for i in range(S.PQ_FIT_ITERS):
        dims = S._pq_assign_sub(uemb, cb).select(
            "m", "code", F.posexplode("s").alias("pos", "val")
        )
        rows = (
            dims.groupBy("m", "code", "pos")
            .agg(S._micro_mean(F.col("val")).alias("mu"))
            .groupBy("m", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                    lambda s: s["mu"],
                ).alias("cs")
            )
            .collect()
        )
        new = {(r["m"], r["code"]): list(r["cs"]) for r in rows}
        cb = [
            [new.get((m, k), cb[m][k]) for k in range(len(cb[0]))]
            for m in range(len(cb))
        ]
        t.mark(f"pq fit iter {i}")
    shortlist = (
        S._ivf_pq_shortlist(uemb, centroids, cb, index=None)
        .filter(F.col("arank") <= S.IVF_PQ_RERANK)
        .select("q_id", "n_id", "adist")
    )
    noop(S._exact_rerank(emb, shortlist))
    t.mark("final plan (index+shortlist+rerank)")
    if not warm:
        t.report("ivf_pq_search phases")


def profile_dedup_components(warm):
    t = T()
    pairs = D.q_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    e = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("w"))
        .filter(F.col("u") != F.col("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    t.mark("pairs + edge checkpoint")
    verts = (
        e.select(F.col("u").alias("v"))
        .union(e.select(F.col("w").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    t.mark("verts checkpoint")
    for rnd in range(50):
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
            .distinct()
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
        t.mark(f"round {rnd} star steps+checkpoint")
        done = (
            small.exceptAll(e).count() == 0 and e.exceptAll(small).count() == 0
        )
        t.mark(f"round {rnd} convergence exceptAll x2")
        e = small
        if done:
            break
    non_roots = e.select(
        F.col("u").alias("doc_id"), F.col("w").alias("component_id")
    )
    roots = verts.join(
        e.select(F.col("u").alias("v")).distinct(), "v", "left_anti"
    ).select(F.col("v").alias("doc_id"), F.col("v").alias("component_id"))
    comp = non_roots.union(roots)
    from pyspark.sql import Window

    w = Window.partitionBy("component_id")
    noop(
        comp.select(
            "doc_id",
            "component_id",
            F.count("*").over(w).alias("cluster_size"),
            (F.col("doc_id") == F.col("component_id")).alias("canonical"),
        )
    )
    t.mark("final window plan")
    if not warm:
        t.report("dedup_components phases")


def profile_query(name, warm):
    from etl_python_spark.operators import all_queries

    qs = all_queries()
    t = T()
    df = qs[name](spark, sf_dir)
    t.mark("build (eager fits/checkpoints)")
    noop(df)
    t.mark("noop write (final plan)")
    if not warm:
        t.report(name)


for fn in (profile_ivf_pq_search, profile_dedup_components):
    fn(True)
    fn(False)

for q in (
    "ivf_pq_recall",
    "ann_index_on_delete",
    "ann_ivf_fitted",
    "kmeans_embeddings",
    "semantic_dedup",
    "pagerank_copurchase",
    "fuzzy_components",
    "leakage_safe_split",
    "market_basket",
    "simhash",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
):
    profile_query(q, True)
    profile_query(q, False)
