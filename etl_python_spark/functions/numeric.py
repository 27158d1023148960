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


def ratio(num: Column, den: Column, scale: int = 6) -> Column:
    """num/den with divide-by-zero → NULL (NULLIF semantics of the
    reference KPI queries, e.g. ticket médio / conversão)."""
    return F.round(num / F.nullif(den.cast("double"), F.lit(0.0)), scale)
