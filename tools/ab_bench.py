"""Same-host A/B bench for cross-round drift adjudication (round-13
verdict item 1: the banked r13 standalone read 1.65x r12's with no
plan-relevant code change — root-cause with code-vs-code on ONE host,
don't wave at it).

Runs ``bench.py`` from two checkouts INTERLEAVED (A B A B ...) so host
drift shows up as within-tree spread while a code regression shows up
as a between-tree gap.  Before every run it enforces the idle-host
conditions itself (zero stray JVMs, load1 and load5 <= 2) — it does
not rely on the tree's own gate, because older trees gate load1 only
(the exact hole that let r13 bank a cooling-host number).

Usage:
    python tools/ab_bench.py <treeA> <treeB> [reps=2] [out.json]

Each run: SPARK_GRAFT_BENCH_AB=0 (no recursive child), extended ON,
runs/queries whatever the tree's bench.py defines.  Output: one JSON
doc {"runs": [{"tree", "rep", "value", "queries", "extended", ...}]}
plus a per-query A-vs-B table on stderr for the PLAN_AUDIT writeup.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _host() -> tuple[int, float, float]:
    try:
        out = subprocess.run(
            ["pgrep", "-cx", "java"], capture_output=True, text=True
        ).stdout.strip()
        strays = int(out) if out else 0
    except (OSError, ValueError):
        strays = -1
    try:
        l1, l5, _ = os.getloadavg()
    except OSError:
        l1 = l5 = -1.0
    return strays, l1, l5


def await_idle(max_wait_s: float = 1200.0) -> dict:
    deadline = time.time() + max_wait_s
    while True:
        strays, l1, l5 = _host()
        ok = strays <= 0 and l1 <= 2.0 and l5 <= 2.0
        if ok or time.time() >= deadline:
            return {
                "strays": strays,
                "load1": round(l1, 2),
                "load5": round(l5, 2),
                "idle": ok,
            }
        time.sleep(10)


def run_tree(tree: str, rep: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_AB="0",
        SPARK_GRAFT_BENCH_WAIT="60",  # we already waited; belt only
    )
    pre = await_idle()
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=tree,
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
    except subprocess.TimeoutExpired as exc:
        # round-14 ADVICE: one hung rep must not discard every
        # completed run's results — bank an error record like the
        # returncode!=0 path and keep going
        return {
            "tree": tree,
            "rep": rep,
            "error": f"timeout after {exc.timeout}s",
            "host_before": pre,
            "wall_s": round(time.time() - t0, 1),
        }
    wall = round(time.time() - t0, 1)
    docs = []
    for l in proc.stdout.splitlines():
        if l.startswith("{"):
            try:
                docs.append(json.loads(l))
            except ValueError:
                pass
    if proc.returncode != 0 or not docs:
        return {
            "tree": tree,
            "rep": rep,
            "error": (proc.stdout + proc.stderr)[-500:],
            "host_before": pre,
        }
    # newer trees print full doc + compact tail; prefer the full one
    doc = next((d for d in reversed(docs) if "spread" in d), docs[-1])
    return {
        "tree": tree,
        "rep": rep,
        "value": doc.get("value"),
        "queries": doc.get("queries"),
        "spread": doc.get("spread"),
        "extended": doc.get("extended"),
        "extended_total": doc.get("extended_total"),
        "env": doc.get("env"),
        "host_before": pre,
        "wall_s": wall,
    }


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    out_path = sys.argv[4] if len(sys.argv) > 4 else None
    runs = []
    for rep in range(reps):
        for tree in (tree_a, tree_b):
            print(f"==> rep {rep} {tree}", file=sys.stderr, flush=True)
            runs.append(run_tree(tree, rep))
            print(
                f"    value={runs[-1].get('value')} "
                f"ext={runs[-1].get('extended_total')} "
                f"host={runs[-1].get('host_before')}",
                file=sys.stderr,
                flush=True,
            )
    doc = {"tree_a": tree_a, "tree_b": tree_b, "runs": runs}

    # per-query min-across-reps comparison table
    def best(tree: str, group: str) -> dict[str, float]:
        agg: dict[str, float] = {}
        for r in runs:
            if r["tree"] != tree or not r.get(group):
                continue
            for q, s in r[group].items():
                agg[q] = min(s, agg.get(q, 1e18))
        return agg

    for group in ("queries", "extended"):
        a, b = best(tree_a, group), best(tree_b, group)
        common = sorted(set(a) & set(b))
        if not common:
            continue
        print(f"\n{group}: best-of-reps, {tree_a} vs {tree_b}", file=sys.stderr)
        for q in common:
            ratio = b[q] / a[q] if a[q] else float("inf")
            print(
                f"  {q:32s} A={a[q]:7.2f}  B={b[q]:7.2f}  B/A={ratio:5.2f}",
                file=sys.stderr,
            )
        ta, tb = sum(a[q] for q in common), sum(b[q] for q in common)
        print(
            f"  {'TOTAL(common)':32s} A={ta:7.2f}  B={tb:7.2f}  "
            f"B/A={tb / ta:5.2f}",
            file=sys.stderr,
        )
    line = json.dumps(doc)
    if out_path:
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
