"""Interleaved A/B: rank-window probe selection (r16 form) vs the r17
array_sort slice, on the FIXED fitted model — isolates the serve-side
change from fit/host noise.  Also asserts identical output rows.

Usage: python plans/r17/probe_probesel_ab.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

deadline = time.time() + 400
while os.getloadavg()[0] > 1.0 and time.time() < deadline:
    time.sleep(5)
print(f"load at start: {os.getloadavg()}", file=sys.stderr)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_python_spark.session import get_spark  # noqa: E402

spark = get_spark(
    "probe_probesel", extra_conf={"spark.ui.showConsoleProgress": "false"}
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
spark.range(sc.defaultParallelism * 4).repartition(sc.defaultParallelism).mapInPandas(
    lambda it: it, "id long"
).count()

from etl_python_spark.operators import similarity as S  # noqa: E402

emb = S._kmeans_emb(spark, sf_dir)
centroids, uemb, cb = S._fit_ivf_pq(emb)
# fixed, checkpointed index: both variants serve from identical state
index = S._ivf_pq_index(uemb, centroids, cb).localCheckpoint(eager=True)

ks = len(cb[0])
dsub = len(cb[0][0])


def shortlist_old():
    """The r16 window+join form, reimplemented verbatim."""
    cells = F.array(
        *[
            F.struct(F.lit(k).alias("c_id"), S._dist2_lit(F.col("rv"), c).alias("d2"))
            for k, c in enumerate(centroids)
        ]
    )
    w_probe = Window.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("c_id"))
    probes = (
        uemb.filter(F.col("vec_id") < S.N_QUERY)
        .select(F.col("vec_id").alias("q_id"), F.explode(cells).alias("dc"))
        .select("q_id", F.col("dc.c_id").alias("c_id"), F.col("dc.d2").alias("d2"))
        .withColumn("rnk", F.row_number().over(w_probe))
        .filter(F.col("rnk") <= S.N_PROBE)
        .select("q_id", "c_id")
    )
    lut_arr = F.flatten(
        F.transform(
            S._cb_lit(cb),
            lambda book, m: F.transform(
                book,
                lambda c: F.floor(
                    S._dist2_hof(S._sub_m(F.col("v"), m, dsub), c) * F.lit(1e6)
                    + F.lit(0.5)
                ),
            ),
        )
    )
    luts = uemb.filter(F.col("vec_id") < S.N_QUERY).select(
        F.col("vec_id").alias("q_id"), lut_arr.alias("lut")
    )
    qside = probes.join(luts, "q_id")
    adist_micro = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda code, i: F.element_at(F.col("lut"), i * F.lit(ks) + code + 1),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    adist = (
        index.join(F.broadcast(qside), "c_id")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (adist_micro.cast("double") / F.lit(1e6)).alias("adist"),
        )
    )
    w_short = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("n_id"))
    return adist.withColumn("arank", F.row_number().over(w_short))


def shortlist_new():
    return S._ivf_pq_shortlist(uemb, centroids, cb, index=index)


def serve(build):
    shortlist = (
        build()
        .filter(F.col("arank") <= S.IVF_PQ_RERANK)
        .select("q_id", "n_id", "adist")
    )
    S._exact_rerank(emb, shortlist).write.format("noop").mode("overwrite").save()


# parity
a = sorted(map(tuple, shortlist_old().collect()))
b = sorted(map(tuple, shortlist_new().collect()))
assert a == b and a, f"shortlist diverged (old {len(a)} rows, new {len(b)})"
print("parity ok", file=sys.stderr)

out = {"old_window": [], "new_arraysort": []}
serve(shortlist_old)
serve(shortlist_new)
for i in range(n_runs):
    for name, build in (("old_window", shortlist_old), ("new_arraysort", shortlist_new)):
        sc.setJobDescription(f"run{i}:{name}")
        t0 = time.time()
        serve(build)
        out[name].append(round(time.time() - t0, 3))

summary = {k: {"min": min(v), "samples": v} for k, v in out.items()}
for k, v in summary.items():
    print(f"{k}: {v}", file=sys.stderr)
print(json.dumps(summary))
