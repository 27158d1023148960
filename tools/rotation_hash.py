"""Per-query fingerprints for the verdict-window rotation gate.

Prints {query_name: sha256(module + query-function source + oracle
SQL)} as JSON.  Run at a round-base checkout to regenerate
``tools/queries_at_base.json``; ``tests/test_rotation.py`` compares
the committed snapshot against HEAD and requires every NEW or CHANGED
query to sit inside the driver's 50-slot verification window
(``VERIFY_PRIORITY[:50]``) — mechanizing the rotation policy the
round-6 verdict asked to enforce ("a unit test asserting every QUERIES
name changed since the last round's tag appears in the first 50").

Granularity: the query function's own source plus its oracle string.
A change to a shared helper does not flip the fingerprint — rotating
for those remains the round playbook's judgment call — but every edit
to a query's own body or its oracle is caught mechanically.
"""

from __future__ import annotations

import hashlib
import inspect
import json


def query_fingerprints() -> dict[str, str]:
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from etl_python_spark import operators

    oracles = operators.all_oracles()
    out = {}
    for name, fn in operators.all_queries().items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        blob = f"{fn.__module__}\n{src}\n{oracles.get(name, '')}"
        out[name] = hashlib.sha256(blob.encode("utf-8")).hexdigest()
    return out


if __name__ == "__main__":
    print(json.dumps(query_fingerprints(), indent=1, sort_keys=True))
