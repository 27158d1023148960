"""Physical-plan audit: sweep every queries() entry and report the
operators that matter at scale — exchanges, join strategies, cartesian
products, codegen coverage, scan pushdown.

Usage: python tools/plan_audit.py [sf_dir] [names...]

Heuristics flagged (not hard failures — some are intended):
- CartesianProduct / BroadcastNestedLoopJoin: usually a missing equi
  condition (our broadcast crossJoins against tiny query sets are the
  accepted exception).
- SortMergeJoin: fine for fact⨝fact; a smell when one side is a dim
  that should broadcast.
- scan without ReadSchema pruning (reads every column).
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COUNTED = [
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "WholeStageCodegen",
    "Generate",
    "Window",
    "HashAggregate",
    "SortAggregate",
]


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, df) -> dict:
    txt = explain_str(df)
    counts = {op: len(re.findall(rf"\b{op}\b", txt)) for op in COUNTED}
    flags = []
    if counts["CartesianProduct"]:
        flags.append("CARTESIAN")
    if counts["BroadcastNestedLoopJoin"]:
        flags.append("BNLJ")
    if counts["SortAggregate"]:
        flags.append("SORT_AGG")
    if counts["SortMergeJoin"]:
        flags.append("SMJ")
    return {"name": name, "counts": counts, "flags": flags}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from etl_python_spark.operators import all_queries
    from etl_python_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    rows = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        if name.startswith("stream_"):
            continue  # streaming queries execute eagerly on build
        try:
            rows.append(audit(name, qs[name](spark, sf_dir)))
        except Exception as exc:  # pragma: no cover
            rows.append({"name": name, "counts": {}, "flags": [f"ERROR:{exc}"]})

    hdr = ["query", "exch", "bhj", "smj", "shj", "bnlj", "cart", "wscg", "flags"]
    print("\t".join(hdr))
    for r in rows:
        c = r["counts"]
        print(
            "\t".join(
                [
                    r["name"],
                    *(
                        str(c.get(k, "-"))
                        for k in (
                            "Exchange",
                            "BroadcastHashJoin",
                            "SortMergeJoin",
                            "ShuffledHashJoin",
                            "BroadcastNestedLoopJoin",
                            "CartesianProduct",
                            "WholeStageCodegen",
                        )
                    ),
                    ",".join(r["flags"]) or "-",
                ]
            )
        )


if __name__ == "__main__":
    main()
