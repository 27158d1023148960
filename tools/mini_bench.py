"""Warm min-of-N probe for individual queries — bench.py methodology
(untimed warm pass, then min of N noop-sink runs) in one tuned session,
for in-round A/B measurement of optimization candidates.

Usage: python tools/mini_bench.py [--sf DIR] [--runs N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    n_runs = 3
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--runs":
            n_runs = int(next(it))
        else:
            names.append(a)

    # bench.py's lesson (round 11/13): timings on a host still cooling
    # from a previous 32-thread run read uniformly high — wait for
    # load1 to decay before starting the JVM (load5 discounted: probes
    # run back-to-back in-round and only care about ONGOING load).
    deadline = time.time() + float(os.environ.get("SPARK_GRAFT_BENCH_WAIT", "240"))
    while os.getloadavg()[0] > 1.5 and time.time() < deadline:
        time.sleep(5)
    print(f"load at start: {os.getloadavg()}", file=sys.stderr)

    from etl_python_spark.session import get_spark
    from etl_python_spark.operators import all_queries

    spark = get_spark(
        "mini_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # same pool/digest warm-up as bench.py
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()
    sc = spark.sparkContext
    spark.range(sc.defaultParallelism * 4).repartition(
        sc.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()
    from pyspark.sql import functions as F

    spark.range(200_000).repartition(sc.defaultParallelism).select(
        F.sum(
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            % 1_000_000_007
        )
    ).count()

    out = {}
    for name in names:
        fn = qs[name]
        sc.setJobDescription(f"mini_bench:{name}")

        def run() -> float:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.time() - t0

        run()
        samples = [run() for _ in range(n_runs)]
        out[name] = {
            "min": round(min(samples), 3),
            "spread": round(max(samples) - min(samples), 3),
        }
        print(f"{name}: {out[name]['min']} (spread {out[name]['spread']})",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
