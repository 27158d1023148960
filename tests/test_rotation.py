"""Verdict-window rotation gate (round-6 verdict item 4).

The external driver issues correctness verdicts for the FIRST 50
``queries()`` entries only, so any query added or changed in a round
MUST occupy the window — otherwise it ships with a stale (or no)
verdict.  This test mechanizes the policy: fingerprints of every query
(function source + oracle SQL) at the round-base commit live in
``tools/queries_at_base.json``; every name whose fingerprint is new or
different at HEAD must appear in ``VERIFY_PRIORITY[:50]``.

Round playbook: regenerate the snapshot at each round's base commit
(``git worktree add <tmp> <base> && python tools/rotation_hash.py``)
and update ``tools/round_base.txt``.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_changed_queries_sit_in_the_driver_window():
    from etl_python_spark import operators
    from tools.rotation_hash import query_fingerprints

    base = json.loads((REPO / "tools" / "queries_at_base.json").read_text())
    current = query_fingerprints()

    window = [
        n
        for n in operators.VERIFY_PRIORITY
        if n in operators.all_queries()
    ][:50]

    changed = sorted(
        n for n, h in current.items() if base.get(n) != h
    )
    out_of_window = [n for n in changed if n not in window]
    assert not out_of_window, (
        f"queries changed since round base {REPO / 'tools/round_base.txt'} "
        f"but NOT in VERIFY_PRIORITY[:50] — they would keep a stale "
        f"verdict: {out_of_window}.  Rotate them into the window (or "
        f"regenerate tools/queries_at_base.json if the base moved)."
    )


def test_window_is_exactly_the_first_fifty():
    """VERIFY_PRIORITY must resolve to actual queries — a typo'd name
    silently shrinks the window."""
    from etl_python_spark import operators

    names = set(operators.all_queries())
    missing = [n for n in operators.VERIFY_PRIORITY if n not in names]
    assert not missing, f"VERIFY_PRIORITY names without a query: {missing}"
    # and the merged ordering puts the priority block first
    ordered = list(operators.all_queries())
    k = min(len(operators.VERIFY_PRIORITY), 50)
    assert ordered[:k] == list(operators.VERIFY_PRIORITY)[:k]
