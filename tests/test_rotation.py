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
    verified_path = REPO / "tools" / "offwindow_verified.json"
    verified = (
        json.loads(verified_path.read_text()) if verified_path.exists() else {}
    )

    window = [
        n
        for n in operators.VERIFY_PRIORITY
        if n in operators.all_queries()
    ][:50]

    changed = sorted(
        n for n, h in current.items() if base.get(n) != h
    )
    # A changed query is freshly verified if it is in the driver window
    # OR check_correctness --record passed it at EXACTLY this
    # fingerprint (so a later edit to the query or any transitive
    # helper invalidates the record automatically).
    stale = [
        n
        for n in changed
        if n not in window and verified.get(n) != current[n]
    ]
    assert not stale, (
        f"queries changed since round base {REPO / 'tools/round_base.txt'} "
        f"but NOT in VERIFY_PRIORITY[:50] and NOT locally re-verified at "
        f"their current fingerprint — they would carry a stale verdict: "
        f"{stale}.  Rotate them into the window, or re-run "
        f"`python tools/check_correctness.py --record /root/testdata/sf0.01 "
        f"{' '.join(stale)}` (or regenerate tools/queries_at_base.json if "
        f"the base moved)."
    )


def test_never_driver_verified_queries_outrank_round_changes():
    """Round-8 verdict item 2: the r8 window put 50 same-round new
    queries ahead of ``ml_changepoint_spine`` — a query with NO driver
    verdict in any round — which landed at slot 51 and ended the round
    unverdicted.  Invariant: a query that existed at the round base and
    has never received a green driver CORRECTNESS row must occupy a
    window slot BEFORE any query changed/created during the round.
    Changed queries at least carry builder-side ``offwindow_verified``
    records when displaced; never-verified ones have nothing.
    (This test fails on the round-8 ordering and passes on round 9's.)
    """
    import glob

    from etl_python_spark import operators
    from tools.rotation_hash import query_fingerprints

    base = json.loads((REPO / "tools" / "queries_at_base.json").read_text())
    current = query_fingerprints()

    verified_ever: set[str] = set()
    for p in glob.glob(str(REPO / "CORRECTNESS_r*.json")):
        doc = json.loads(Path(p).read_text())
        for name, row in doc.get("queries", doc).items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and not row.get("error")
            ):
                verified_ever.add(name)
    assert verified_ever, "no green driver rows parsed — file format drift?"

    window = [
        n for n in operators.VERIFY_PRIORITY if n in operators.all_queries()
    ][:50]
    idx = {n: i for i, n in enumerate(window)}

    # Debt = at the round base AND never driver-verified in any round.
    debt = sorted(n for n in base if n not in verified_ever and n in current)
    changed = sorted(n for n, h in current.items() if base.get(n) != h)

    missing = [n for n in debt if n not in idx]
    assert not missing, (
        f"queries with NO driver verdict in any CORRECTNESS_r*.json must "
        f"occupy the 50-slot window, not rely on builder-side records: "
        f"{missing}"
    )
    if debt:
        worst_debt = max(idx[n] for n in debt)
        jumped = [
            n
            for n in changed
            if n not in debt and n in idx and idx[n] < worst_debt
        ]
        assert not jumped, (
            f"changed-this-round queries {jumped} occupy window slots ahead "
            f"of never-driver-verified queries "
            f"{[n for n in debt if idx[n] == worst_debt]} — reorder "
            f"VERIFY_PRIORITY so verdict debt drains first"
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


def test_fingerprints_cover_transitive_helpers():
    """Round-7 verdict item 1: a query's fingerprint must include every
    in-package module its defining module reaches through imports, so a
    shared-helper edit flips the fingerprints of all dependent queries."""
    from tools import rotation_hash as rh

    deps = rh.transitive_modules("etl_python_spark.operators.analytics_core")
    assert "etl_python_spark.functions.numeric" in deps
    assert "etl_python_spark.sources.tables" in deps
    assert "etl_python_spark.operators.analytics_core" in deps

    deps = rh.transitive_modules("etl_python_spark.operators.dedup")
    assert "etl_python_spark.sources.tables" in deps


def test_helper_edit_flips_dependent_fingerprints(monkeypatch):
    """Simulate a shared-helper source change (patch the module-digest
    seam) and assert every query defined in a module that imports the
    helper gets a NEW fingerprint, while unrelated queries keep theirs."""
    from tools import rotation_hash as rh

    before = rh.query_fingerprints()

    helper = "etl_python_spark.functions.numeric"
    real = rh._module_digest.__wrapped__

    def fake(modname):
        if modname == helper:
            return "0" * 64  # pretend the helper's source changed
        return real(modname)

    monkeypatch.setattr(rh, "_module_digest", fake)
    after = rh.query_fingerprints()

    from etl_python_spark import operators

    flipped = {n for n in before if before[n] != after[n]}
    dependents = {
        n
        for n, fn in operators.all_queries().items()
        if helper in rh.transitive_modules(fn.__module__)
    }
    assert dependents, "numeric helper should have dependent queries"
    assert flipped == dependents
