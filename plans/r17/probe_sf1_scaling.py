"""sf1 8-vs-32-core scaling evidence (r16 verdict item 9): warm
min-of-2 for the heaviest headline queries at /tmp/sf1, one process
per core count (the master is fixed at session creation).

Usage: python plans/r17/probe_sf1_scaling.py [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
QUERIES = [
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash",
    "pricing_summary",
    "ann_ivf",
    "dedup_exact",
]

out_path = sys.argv[1] if len(sys.argv) > 1 else "plans/r17/sf1_scaling.json"
result = {}
for cpus in ("32", "8"):
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=cpus,
        SPARK_GRAFT_SF_DIR="/tmp/sf1",
        SPARK_GRAFT_BENCH_WAIT="400",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "mini_bench.py"),
            "--sf",
            "/tmp/sf1",
            "--runs",
            "2",
            *QUERIES,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    result[f"cpus{cpus}"] = json.loads(line)
    print(f"cpus={cpus}: {line}", file=sys.stderr)
    time.sleep(60)  # let the host cool between core counts

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
