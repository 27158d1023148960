"""Per-query fingerprints for the verdict-window rotation gate.

Prints {query_name: sha256(...)} as JSON.  Run at a round-base
checkout to regenerate ``tools/queries_at_base.json``;
``tests/test_rotation.py`` compares the committed snapshot against
HEAD and requires every NEW or CHANGED query to either sit inside the
driver's 50-slot verification window (``VERIFY_PRIORITY[:50]``) or
carry a fresh local verification record in
``tools/offwindow_verified.json`` (written by
``tools/check_correctness.py --record``) whose fingerprint matches
HEAD exactly.

Granularity (round-7 verdict item 1): each query's blob hashes

  * the query function's own source,
  * its oracle SQL string,
  * the FULL SOURCE of every ``etl_python_spark`` module reachable
    from the query's defining module through intra-package imports
    (transitive closure, resolved from the AST so helper modules that
    are imported but never touched at definition time still count).

So an edit to a shared helper — ``functions/numeric.py``,
``sources/tables.py``, a ``dedup.py`` utility — flips the fingerprint
of every dependent query and the rotation test forces each one back
through a fresh verdict (driver window or recorded local re-run).
Off-window verdicts are thereby fresh by construction, not by
judgment call.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import sys
from functools import lru_cache
from pathlib import Path

PACKAGE = "etl_python_spark"
REPO = Path(__file__).resolve().parent.parent


def _module_path(modname: str) -> Path | None:
    """Filesystem path of an ``etl_python_spark`` (sub)module, or None."""
    if modname != PACKAGE and not modname.startswith(PACKAGE + "."):
        return None
    rel = Path(*modname.split("."))
    for cand in (REPO / rel / "__init__.py", REPO / rel.with_suffix(".py")):
        if cand.is_file():
            return cand
    return None


def _resolve_relative(modname: str, level: int, target: str | None) -> str:
    """Resolve a ``from ..x import y`` to an absolute module name.

    ``modname`` is the importing module (never a package __init__ here
    unless it is one — handled by dropping one fewer component).
    """
    parts = modname.split(".")
    # Whether modname is a package decides how many components a
    # single leading dot strips; _module_path tells us.
    is_pkg = (_module_path(modname) or Path("")).name == "__init__.py"
    anchor = parts if is_pkg else parts[:-1]
    if level > 1:
        anchor = anchor[: len(anchor) - (level - 1)]
    base = ".".join(anchor)
    return f"{base}.{target}" if target else base


@lru_cache(maxsize=None)
def _direct_imports(modname: str) -> frozenset[str]:
    """In-package modules imported by ``modname`` (AST, not runtime)."""
    path = _module_path(modname)
    if path is None:
        return frozenset()
    tree = ast.parse(path.read_text(encoding="utf-8"))
    found: set[str] = set()

    def note(candidate: str, names: list[str] | None = None) -> None:
        # ``candidate`` may be a package; an imported NAME may itself
        # be a submodule (``from ..functions import numeric``).
        if _module_path(candidate):
            found.add(candidate)
        for n in names or []:
            sub = f"{candidate}.{n}"
            if _module_path(sub):
                found.add(sub)

    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                note(alias.name)
        elif isinstance(node, ast.ImportFrom):
            names = [a.name for a in node.names]
            if node.level:
                note(_resolve_relative(modname, node.level, node.module), names)
            elif node.module:
                note(node.module, names)
    found.discard(modname)
    return frozenset(found)


def transitive_modules(modname: str) -> list[str]:
    """Sorted transitive closure of in-package imports, incl. self."""
    seen: set[str] = set()
    stack = [modname]
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(_direct_imports(m))
    return sorted(m for m in seen if _module_path(m))


@lru_cache(maxsize=None)
def _module_digest(modname: str) -> str:
    path = _module_path(modname)
    if path is None:
        return ""
    return hashlib.sha256(path.read_bytes()).hexdigest()


def query_fingerprints() -> dict[str, str]:
    sys.path.insert(0, str(REPO))
    from etl_python_spark import operators

    oracles = operators.all_oracles()
    out = {}
    for name, fn in operators.all_queries().items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = repr(fn)
        deps = "\n".join(
            f"{m}={_module_digest(m)}"
            for m in transitive_modules(fn.__module__)
        )
        blob = f"{fn.__module__}\n{src}\n{oracles.get(name, '')}\n{deps}"
        out[name] = hashlib.sha256(blob.encode("utf-8")).hexdigest()
    return out


if __name__ == "__main__":
    print(json.dumps(query_fingerprints(), indent=1, sort_keys=True))
