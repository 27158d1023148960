"""Round-17 phase profile of ivf_pq_search's serve action (r16
verdict item 6): split fit / index-coding / shortlist / re-rank so
the serve optimization targets the phase that actually costs.

Usage: python plans/r17/probe_ivfpq_phases.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

deadline = time.time() + 400
while os.getloadavg()[0] > 1.0 and time.time() < deadline:
    time.sleep(5)
print(f"load at start: {os.getloadavg()}", file=sys.stderr)

from pyspark.sql import functions as F  # noqa: E402

from etl_python_spark.session import get_spark  # noqa: E402

spark = get_spark(
    "probe_ivfpq", extra_conf={"spark.ui.showConsoleProgress": "false"}
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
spark.range(sc.defaultParallelism * 4).repartition(sc.defaultParallelism).mapInPandas(
    lambda it: it, "id long"
).count()

from etl_python_spark.operators import similarity as S  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


out = {}


def phase(name, fn, n=reps):
    samples = []
    fn()  # warm
    for _ in range(n):
        t0 = time.time()
        fn()
        samples.append(round(time.time() - t0, 3))
    out[name] = {"min": min(samples), "samples": samples}
    print(f"{name}: {out[name]}", file=sys.stderr)


# Phase 1: corpus checkpoint
phase("emb_ckpt", lambda: S._kmeans_emb(spark, sf_dir), n=reps)

emb = S._kmeans_emb(spark, sf_dir)

# Phase 2: the threaded fits
def fits():
    return S._fit_ivf_pq(emb)

t0 = time.time()
centroids, uemb, cb = fits()
out["fit_first"] = round(time.time() - t0, 3)
phase("fit_warm", fits)

# Phase 3: index coding alone
phase("index_coding", lambda: noop(S._ivf_pq_index(uemb, centroids, cb)))

# Phase 4: shortlist (includes inline index coding)
phase(
    "shortlist_inline_index",
    lambda: noop(S._ivf_pq_shortlist(uemb, centroids, cb)),
)

# Phase 5: shortlist with the index pre-checkpointed (isolates the
# probe/LUT/score/rank cost from the coding scan)
idx_ckpt = S._ivf_pq_index(uemb, centroids, cb).localCheckpoint(eager=True)
phase(
    "shortlist_ckpt_index",
    lambda: noop(S._ivf_pq_shortlist(uemb, centroids, cb, index=idx_ckpt)),
)

# Phase 6: full serve = shortlist filter + exact rerank (inline index)
def serve():
    shortlist = (
        S._ivf_pq_shortlist(uemb, centroids, cb)
        .filter(F.col("arank") <= S.IVF_PQ_RERANK)
        .select("q_id", "n_id", "adist")
    )
    noop(S._exact_rerank(emb, shortlist))

phase("serve_full", serve)

print(json.dumps(out))
