"""Window-debt report (round-8 verdict item 8).

With 170+ queries and a 50-slot driver window, most of the inventory's
driver verdict is several rounds stale.  This tool reads every
``CORRECTNESS_r*.json`` in the repo, computes the LATEST green driver
verdict round per query, and prints:

  * a histogram of the inventory by latest-verdict round,
  * the never-driver-verified set (must be empty after round 9 —
    enforced by ``tests/test_rotation.py``),
  * the oldest-verdict cohort, which IS the (d)/(e) rotation tier for
    the next round's ``VERIFY_PRIORITY`` (see
    ``etl_python_spark/operators/__init__.py``).

``tools/verify_round.py`` prints this as its first summary line so the
round artifacts always carry the debt picture the next rotation should
drain.  Run directly: ``python tools/window_debt.py [--json]``.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(row: object) -> bool:
    return (
        isinstance(row, dict)
        and bool(row.get("rows_match"))
        and bool(row.get("schema_match", True))
        and bool(row.get("hash_match", True))
        and not row.get("error")
    )


def latest_verdicts() -> dict[str, int]:
    """{query_name: latest round with a green driver CORRECTNESS row}."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path, encoding="utf-8") as fh:
            doc = json.load(fh)
        for name, row in doc.get("queries", doc).items():
            if _green(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def report(n_oldest: int = 50) -> dict:
    sys.path.insert(0, REPO)
    from etl_python_spark import operators

    inventory = list(operators.all_queries())
    latest = latest_verdicts()
    never = sorted(q for q in inventory if q not in latest)
    verdicted = [q for q in inventory if q in latest]
    hist = dict(sorted(Counter(latest[q] for q in verdicted).items()))
    oldest = sorted(verdicted, key=lambda q: (latest[q], q))[:n_oldest]
    return {
        "inventory": len(inventory),
        "never_driver_verified": never,
        "verdicts_by_round": hist,
        "oldest_cohort": [[q, latest[q]] for q in oldest],
    }


def summary_line() -> str:
    r = report(n_oldest=5)
    hist = " ".join(f"r{k}:{v}" for k, v in r["verdicts_by_round"].items())
    never = r["never_driver_verified"]
    head = ", ".join(q for q, _ in r["oldest_cohort"])
    return (
        f"window-debt: {r['inventory']} queries | verdicts {hist} | "
        f"never-verified {never or 'none'} | oldest: {head}"
    )


if __name__ == "__main__":
    if "--json" in sys.argv:
        print(json.dumps(report(), indent=1))
    else:
        print(summary_line())
