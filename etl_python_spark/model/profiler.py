"""One-pass dataset profiler + star-schema heuristics.

Re-expresses the reference's schema-discovery engine (Algoritmo de
Estruturação de Dados.py:86-255): per-column cardinality, null ratio,
uniqueness, date-likeness, key-candidacy and measure/dimension
classification — as a single Spark aggregate job (every statistic for
every column computed in one shuffle-free pass + one countDistinct
aggregate), instead of a per-column pandas loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

DATE_LIKE_THRESHOLD = 0.7  # ≥70% parseable → date-like (ref :119)
KEY_UNIQUENESS = 0.95


def profile(df: DataFrame, exact_distinct: bool = True) -> list[Row]:
    """Profile every column in one aggregate pass.

    ``exact_distinct=False`` switches to approx_count_distinct — the
    100 TB mode, where exact per-column distincts would be a full
    shuffle per column."""
    cnt_distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for fld in df.schema.fields:
        c = F.col(fld.name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"{fld.name}__nulls"))
        aggs.append(cnt_distinct(c).alias(f"{fld.name}__distinct"))
        if isinstance(fld.dataType, T.StringType):
            aggs.append(
                F.count(c.try_cast("date")).alias(f"{fld.name}__datelike")
            )
        else:
            aggs.append(F.lit(None).cast("long").alias(f"{fld.name}__datelike"))
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["__rows"] or 1

    out = []
    for fld in df.schema.fields:
        nulls = row[f"{fld.name}__nulls"]
        distinct = row[f"{fld.name}__distinct"]
        datelike = row[f"{fld.name}__datelike"]
        non_null = n - nulls
        uniq = distinct / non_null if non_null else 0.0
        is_date = (
            isinstance(fld.dataType, (T.DateType, T.TimestampType))
            or (datelike is not None and non_null and datelike / non_null >= DATE_LIKE_THRESHOLD)
        )
        is_fractional = isinstance(
            fld.dataType, (T.DoubleType, T.FloatType, T.DecimalType)
        )
        is_integral = isinstance(
            fld.dataType, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)
        )
        is_stringy = isinstance(fld.dataType, T.StringType)
        role = (
            "date"
            if is_date
            else "key"
            if uniq >= KEY_UNIQUENESS and nulls == 0 and (is_integral or is_stringy)
            else "measure"
            if is_fractional
            else "dimension"
        )
        out.append(
            Row(
                column=fld.name,
                dtype=fld.dataType.simpleString(),
                rows=n,
                nulls=nulls,
                null_ratio=round(nulls / n, 6),
                distinct=distinct,
                uniqueness=round(uniq, 6),
                date_like=bool(is_date),
                role=role,
            )
        )
    return out


def suggest_primary_key(
    df: DataFrame, max_cols: int = 2, max_rows: int = 10_000_000
) -> list[str] | None:
    """PK suggestion (ref :237-255): first single column with full
    uniqueness; else the first unique 2-column combination among key
    candidates.

    DIM-SCALE ONLY: the pair search runs one ``distinct().count()``
    job — a full shuffle — per candidate pair, which is fine for the
    dimension/catalog audits it targets and pathological pointed at a
    fact table (dozens of fact-wide shuffles).  The ``max_rows`` guard
    makes that misuse fail fast; raise it deliberately if you really
    mean it, or key-audit a fact table with one explicit
    ``groupBy(keys).count()`` instead."""
    stats = profile(df)
    n = stats[0].rows if stats else 0
    singles = [s.column for s in stats if s.distinct == n and s.nulls == 0]
    if singles:
        return [singles[0]]
    if max_cols < 2:
        return None
    if n > max_rows:
        raise ValueError(
            f"suggest_primary_key pair search is dim-scale-only: {n} rows "
            f"> max_rows={max_rows} would run a full shuffle per candidate "
            "pair; pass a larger max_rows deliberately or audit the key "
            "with an explicit groupBy(keys).count()"
        )
    candidates = [s.column for s in stats if s.uniqueness > 0.5 and s.nulls == 0]
    for i, a in enumerate(candidates):
        for b in candidates[i + 1 :]:
            if df.select(a, b).distinct().count() == n:
                return [a, b]
    return None
