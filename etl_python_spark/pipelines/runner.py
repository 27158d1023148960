"""Multi-job orchestrator (S15 — ref: Rodar Scripts Showroom.py:13-57).

The reference runs a fixed list of ETL scripts as subprocesses,
printing a console status table (PROCESSO | STATUS | LINHAS | TEMPO)
and appending a detailed maintenance log; a failing script does not
stop the session.  The Spark-native form runs a list of named jobs
against ONE shared SparkSession — no per-job JVM spin-up — and gets
the row count for free from an ``Observation`` riding the job's own
action (see :mod:`..sources.audit`) instead of a second count scan.

Scale note: the runner is driver-side control flow only.  Each job is
an arbitrary callable that builds and runs its own distributed plan;
nothing here touches executor-side data paths, so orchestration cost
is constant regardless of data size.
"""

from __future__ import annotations

import time
import traceback
from collections.abc import Callable, Mapping
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


@dataclass
class JobResult:
    """One row of the reference's status table."""

    name: str
    status: str  # "OK" | "ERRO"
    rows: int | None  # None when the job failed before its action
    seconds: float
    error: str | None = None  # first traceback line for the table; full text in the log


def run_jobs(
    spark: SparkSession,
    jobs: Mapping[str, Callable[[SparkSession], DataFrame | None]],
    log_path: str | None = None,
    fail_fast: bool = False,
) -> list[JobResult]:
    """Run ``jobs`` in order, recording status / row count / duration
    per job (ref console table, Rodar Scripts Showroom.py:14-45).

    Each job receives the shared session and may return a DataFrame —
    the runner then executes it with a noop write, counting rows via an
    attached ``Observation`` (one action, no extra scan).  A job that
    runs its own action (a writer) returns None and reports rows=None.

    Failures are captured, not raised (``fail_fast=False``, matching
    the reference's continue-on-error loop); the full traceback goes
    to ``log_path`` when given (ref manutencao_tecnica.log).
    """
    results: list[JobResult] = []
    log_lines: list[str] = [
        "=" * 80,
        f"SESSÃO DE MANUTENÇÃO: {datetime.now()}",
        "=" * 80,
    ]
    for name, fn in jobs.items():
        t0 = time.time()
        rows: int | None = None
        err_full = None
        err_short = None
        try:
            out = fn(spark)
            if isinstance(out, DataFrame):
                obs = Observation(f"runner_{name}")
                (
                    out.observe(obs, F.count(F.lit(1)).alias("rows"))
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                rows = int(obs.get["rows"])
            status = "OK"
        except Exception as exc:
            err_full = traceback.format_exc()
            # first line of the exception message (Spark analysis errors
            # append a multi-line plan dump after it)
            err_short = f"{type(exc).__name__}: {str(exc).splitlines()[0] if str(exc) else ''}"
            status = "ERRO"
        seconds = round(time.time() - t0, 3)
        results.append(JobResult(name, status, rows, seconds, err_short))
        log_lines += [
            f"[SCRIPT]: {name}",
            f"[STATUS]: {status}",
            f"[TEMPO]: {seconds}s",
            f"[LINHAS]: {rows if rows is not None else 'N/A'}",
        ]
        if err_full:
            log_lines.append(f"[STDERR/TRACEBACK]:\n{err_full}")
        log_lines.append("-" * 40)
        if fail_fast and status == "ERRO":
            break
    log_lines.append(f"FINAL DA SESSÃO: {datetime.now()}")
    if log_path:
        with open(log_path, "a", encoding="utf-8") as f:
            f.write("\n".join(log_lines) + "\n")
    return results


def report_df(spark: SparkSession, results: list[JobResult]) -> DataFrame:
    """Status table as a DataFrame — the queryable form of the
    reference's console print, joinable against run history."""
    return spark.createDataFrame(
        [(r.name, r.status, r.rows, r.seconds, r.error) for r in results],
        "processo string, status string, linhas long, tempo_seg double, erro string",
    )


def format_table(results: list[JobResult]) -> str:
    """The reference's minimalist console table."""
    lines = [
        f"{'PROCESSO':<25} | {'STATUS':<6} | {'LINHAS':>8} | TEMPO",
        "-" * 60,
    ]
    for r in results:
        rows = str(r.rows) if r.rows is not None else "N/A"
        lines.append(
            f"{r.name[:25]:<25} | {r.status:<6} | {rows:>8} | {r.seconds:.1f}s"
        )
    return "\n".join(lines)
