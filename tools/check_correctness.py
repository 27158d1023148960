"""Local t2-style correctness gate: run every queries() entry on Spark
and its oracle_sql() on DuckDB at sf0.01, compare row count + columns +
order-insensitive canonicalized values.

Usage: python tools/check_correctness.py [--record] [sf_dir] [query ...]

``--record`` writes each PASSING query's current rotation fingerprint
to ``tools/offwindow_verified.json``.  ``tests/test_rotation.py``
accepts a changed query outside the driver's 50-slot window only when
this file records a pass at exactly the HEAD fingerprint — so an
off-window verdict is always backed by a re-run of the code as it is
now, never a stale earlier run.
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def canon(v):
    """Canonicalize a cell so Spark and DuckDB values compare equal."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # Full precision: the driver gate hashes exact values, so any
        # canonicalization looser than repr() hides engine-parity bugs
        # locally that then fail the round (round-1 lesson).
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return canon(float(v))
    if isinstance(v, datetime.datetime):
        # Microsecond precision: the driver gate hashes exact values; a
        # second-precision canon let round 2's 1-µs timestamp drift pass
        # locally and fail the round (round-3 verdict task 4).
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--record"]
    record = "--record" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as e
    from etl_python_spark.session import get_spark

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    import os

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        # /root/testdata tables are single files; soak dirs (/tmp/sf1)
        # are Spark-written DIRECTORIES of part files — glob those
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed, passed = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            sp_cols = [c.lower() for c in df.columns]
            sp_rows = df.collect()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(sp_rows)} rows, {time.time()-t0:.1f}s)")
            if len(sp_rows) == 0:
                print(f"WARN  {name}: 0 rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dk_cols = [c.lower() for c in rel.columns]
            dk_types = [str(t) for t in rel.types]
            dk_rows = rel.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            failed.append(name)
            continue
        problems = []
        # Engine-level output types the driver's hash distinguishes even
        # when values are identical (round-1 calendar_dim lesson):
        # DuckDB SUM(int) yields HUGEINT/int128, which no Spark type maps
        # to.  Treat them as failures so the oracle gets an explicit CAST.
        bad_types = [
            f"{c}:{t}"
            for c, t in zip(dk_cols, dk_types)
            if "HUGEINT" in t.upper() or "INT128" in t.upper()
        ]
        if bad_types:
            problems.append(f"oracle HUGEINT output cols {bad_types}")
        if sorted(sp_cols) != sorted(dk_cols):
            problems.append(f"cols {sorted(sp_cols)} vs {sorted(dk_cols)}")
        if len(sp_rows) != len(dk_rows):
            problems.append(f"rows {len(sp_rows)} vs {len(dk_rows)}")
        if not problems:
            a, b = rowset(sp_cols, sp_rows), rowset(dk_cols, dk_rows)
            if a != b:
                diff = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"ok    {name}: {len(sp_rows)} rows match ({time.time()-t0:.1f}s)")
            passed.append(name)

    if record and passed:
        import json
        from pathlib import Path

        from tools.rotation_hash import query_fingerprints

        fp = query_fingerprints()
        path = Path(__file__).resolve().parent / "offwindow_verified.json"
        book = json.loads(path.read_text()) if path.exists() else {}
        for name in passed:
            book[name] = fp[name]
        path.write_text(json.dumps(book, indent=1, sort_keys=True) + "\n")
        print(f"recorded {len(passed)} fingerprints -> {path}")

    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
