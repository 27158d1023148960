"""CLI job-runner session (S15 — ref Rodar Scripts Showroom.py run
shape): execute a set of named queries as one orchestrated session and
print the reference's status table.

    python -m etl_python_spark.pipelines [sf_dir] [query ...]

Defaults to the bench headline queries at /root/testdata/sf0.001.
Exit code 1 if any job errored (the reference's log-and-continue
behavior, surfaced for schedulers).
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    names = argv[2:]

    from ..operators import all_queries
    from ..session import get_spark
    from .runner import format_table, run_jobs

    qs = all_queries()
    if not names:
        import importlib
        from pathlib import Path

        # the default list lives in bench.py at the repo root, which is
        # only importable when cwd is the root — pin the root onto
        # sys.path so `python -m etl_python_spark.pipelines` works from
        # any directory
        repo_root = str(Path(__file__).resolve().parents[2])
        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        names = [
            n
            for n in importlib.import_module("bench").HEADLINE
            if n in qs
        ]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("pipelines")
    spark.sparkContext.setLogLevel("ERROR")
    results = run_jobs(
        spark,
        {n: (lambda s, f=qs[n]: f(s, sf_dir)) for n in names},
        log_path="manutencao_tecnica.log",
    )
    print(format_table(results))
    return 1 if any(r.status == "ERRO" for r in results) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
