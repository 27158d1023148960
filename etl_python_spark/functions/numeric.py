"""Deterministic numeric aggregation expressions.

Money-style aggregates are computed on DECIMAL so the result does not
depend on floating-point summation order — essential both for
engine-vs-oracle comparison and for run-to-run reproducibility on a
cluster, where partial-aggregate ordering is nondeterministic across
shuffles.  The final value is surfaced as a rounded DOUBLE so the
output schema stays plain across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_DECIMAL = "decimal(18,2)"


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM of a money column → rounded double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(MONEY_DECIMAL)).cast("double"), scale)


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal SUM divided by COUNT in
    double (IEEE-754 division is correctly rounded, so both engines
    agree given identical sum and count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(MONEY_DECIMAL)).cast("double") / F.count(c), scale
    )


def cents(col: Column | str) -> Column:
    """Computed money expression → exact integer cents (BIGINT).

    ``floor(x*100 + 0.5)`` is evaluated identically by any IEEE-754
    engine, so a *derived* money value (``price * (1-discount)``)
    quantizes to the same integer everywhere.  Per-row
    ``CAST(x AS DECIMAL(18,2))`` does NOT have this property: engines
    disagree by one ulp on rounding boundaries, and cent-level drift
    accumulates over 1e8-magnitude sums.  The SQL-side twin is
    `SQL_CENTS`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def csum(col: Column | str) -> Column:
    """Engine-parity SUM of a *computed* money expression: sum exact
    integer cents, divide once at the end.  Order-independent (integer
    addition) and bit-identical across engines (single double division
    of an integer < 2^53).  Use `dsum` for raw already-2-decimal
    columns; use this for derived expressions."""
    return F.sum(cents(col)).cast("double") / F.lit(100.0)


def sql_csum(expr: str) -> str:
    """DuckDB twin of `csum` for oracle SQL strings."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * 100 + 0.5) AS BIGINT)) AS DOUBLE)"
        " / 100.0"
    )


def ratio(num: Column, den: Column, scale: int = 6) -> Column:
    """num/den with divide-by-zero → NULL (NULLIF semantics of the
    reference KPI queries, e.g. ticket médio / conversão)."""
    return F.round(num / F.nullif(den.cast("double"), F.lit(0.0)), scale)
