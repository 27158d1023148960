"""Source-corpus fingerprints for materialized snapshots (round-11
verdict item 2).

``SPARK_GRAFT_ANN_CACHE`` / ``SPARK_GRAFT_DEDUP_CACHE`` serve whatever
snapshot sits at the cache root; before this module nothing recorded
WHICH corpus the snapshot was built from, so a reader pointed at a
stale materialization after the corpus changed would silently get
wrong (stale) results.  Now every ``materialize_*`` publish banks
:func:`corpus_fingerprint` of its source table in the txn commit's
``app_meta`` and every cached read path re-computes the fingerprint of
the corpus it is asked to serve and REFUSES on mismatch
(:class:`StaleSnapshotError`) — loud, not silently wrong.

The fingerprint is file-level metadata (relative path, byte size,
mtime_ns) of the source parquet, hashed — a driver-side ``stat`` walk,
no Spark job and no data read, so the serve-time guard costs
microseconds.  That is the plain-parquet analogue of pinning a source
table VERSION (what a Delta/Iceberg lake would bank): rewriting the
corpus in place flips size or mtime and the guard fires.  It can
false-POSITIVE (an in-place rewrite of byte-identical data refuses a
snapshot that is still semantically valid — loud and safe, rebuild to
clear) but cannot silently serve a stale snapshot after a real corpus
change short of an adversarial same-size same-mtime rewrite.  On a
txn-managed source the committed version would slot into the same
``app_meta`` key.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

META_KEY = "source_fingerprint"


class StaleSnapshotError(RuntimeError):
    """A materialized snapshot does not match the corpus it is being
    asked to serve — rebuild the materialization (or point the cache
    env var at the right snapshot root)."""


def corpus_fingerprint(sf_dir: str, table: str) -> str:
    """sha256 over (relpath, size, mtime_ns) of the table's parquet
    file(s) under ``sf_dir`` — handles both a single ``.parquet`` file
    (the testdata layout) and a Spark-written directory."""
    base = Path(sf_dir) / f"{table}.parquet"
    h = hashlib.sha256()
    if base.is_file():
        st = base.stat()
        h.update(f"{base.name}:{st.st_size}:{st.st_mtime_ns}".encode())
    elif base.is_dir():
        for p in sorted(base.rglob("*")):
            if p.is_file() and not p.name.startswith((".", "_")):
                st = p.stat()
                h.update(
                    f"{p.relative_to(base)}:{st.st_size}:{st.st_mtime_ns}".encode()
                )
    else:
        raise FileNotFoundError(f"no {table}.parquet under {sf_dir}")
    return h.hexdigest()


def check_snapshot_fresh(
    spark, snapshot_path: str, sf_dir: str, table: str
) -> None:
    """Raise :class:`StaleSnapshotError` unless the committed snapshot
    at ``snapshot_path`` was built from the corpus currently at
    ``sf_dir`` (fingerprint banked in the commit's ``app_meta``).

    A snapshot committed before this guard existed carries no
    fingerprint; that is also a refusal — an unverifiable snapshot is
    treated as stale, not trusted (rebuild once to stamp it)."""
    from .txn import read_commit

    rec = read_commit(spark, snapshot_path)
    if rec is None:
        raise FileNotFoundError(f"no committed version at {snapshot_path}")
    banked = (rec.get("app_meta") or {}).get(META_KEY)
    current = corpus_fingerprint(sf_dir, table)
    if banked != current:
        raise StaleSnapshotError(
            f"snapshot {snapshot_path} was built from a different "
            f"'{table}' corpus than {sf_dir} "
            f"(banked={str(banked)[:12]}…, serving={current[:12]}…); "
            f"re-run the materialize job against the current corpus"
        )
