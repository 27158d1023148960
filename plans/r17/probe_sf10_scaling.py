"""sf10 8-vs-32-core scaling (r16 verdict item 9): the
data-proportional flagships at /tmp/sf10 (100x bench scale), one
process per core count.  Warm pass + min of 2 (the queries run
10-100 s here, so JIT noise is proportionally small).  /tmp/sf10
carries only documents+embeddings, so the child runner warms without
the TPC-H tables.

Usage: python plans/r17/probe_sf10_scaling.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
QUERIES = [
    "minhash_lsh_pairs",
    "simhash",
    "dedup_exact",
    "dedup_components",
    "ivf_pq_search",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
deadline = time.time() + 500
while os.getloadavg()[0] > 1.0 and time.time() < deadline:
    time.sleep(5)
print("load:", os.getloadavg(), file=sys.stderr)
from pyspark.sql import functions as F
from etl_python_spark.session import get_spark
spark = get_spark("sf10_scaling", extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
spark.range(sc.defaultParallelism * 4).repartition(sc.defaultParallelism).mapInPandas(
    lambda it: it, "id long").count()
spark.range(200_000).repartition(sc.defaultParallelism).select(
    F.sum(F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 1_000_000_007)).count()
from etl_python_spark.operators import all_queries
qs = all_queries()
names = json.loads(os.environ["SF10_QUERIES"])
out = {}
for name in names:
    fn = qs[name]
    sc.setJobDescription("sf10:" + name)
    def run():
        t0 = time.time()
        fn(spark, "/tmp/sf10").write.format("noop").mode("overwrite").save()
        return time.time() - t0
    run()
    samples = [run() for _ in range(2)]
    out[name] = {"min": round(min(samples), 3),
                 "spread": round(max(samples) - min(samples), 3)}
    print(name, out[name], file=sys.stderr)
print(json.dumps(out))
"""

out_path = sys.argv[1] if len(sys.argv) > 1 else "plans/r17/sf10_scaling.json"
result = {}
for cpus in ("32", "8"):
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=cpus,
        SF10_QUERIES=json.dumps(QUERIES),
        # the sf10 corpus needs the soak harness's 16g driver heap
        # (tools/soak_sf10.py run sets the same; 8g OOMs in minhash)
        SPARK_DRIVER_MEMORY="16g",
    )
    proc = subprocess.run(
        [sys.executable, "-c", CHILD],
        env=env,
        capture_output=True,
        text=True,
        timeout=7200,
        cwd=REPO,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(proc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"cpus={cpus} leg produced no output")
    result[f"cpus{cpus}"] = json.loads(lines[-1])
    print(f"cpus={cpus}: {lines[-1]}", file=sys.stderr)
    time.sleep(90)

ratios = {
    q: round(
        result["cpus8"][q]["min"] / max(result["cpus32"][q]["min"], 1e-9), 2
    )
    for q in QUERIES
}
result["ratio_8_over_32"] = ratios
print(json.dumps(result, indent=1))
with open(out_path, "w") as fh:
    json.dump(result, fh, indent=1)
