"""Star-schema builder: split a flat table into fact + dimensions.

Re-expresses the fact/dim generator of the reference (Algoritmo de
Estruturação de Dados.py:570-724, ETL - CRM.py:335-366): dimension =
distinct values of a low-cardinality column (+ surrogate key), fact =
source with dimension columns replaced by the surrogate keys.

Scale shape: each dimension is built with one dropDuplicates shuffle
over only its own columns; surrogate keys are assigned with a
dimension-side window (dims are small); the fact swap is N broadcast
joins — the fact table itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dimension(df: DataFrame, cols: list[str], key_name: str) -> DataFrame:
    """Distinct combination of ``cols`` + deterministic surrogate key
    (dense ordinal by natural order, matching the reference's
    reset_index()-style ids)."""
    w = Window.orderBy(*[F.col(c).asc_nulls_last() for c in cols])
    return (
        df.select(*cols)
        .dropDuplicates(cols)
        .withColumn(key_name, F.row_number().over(w))
        .select(key_name, *cols)
    )


def build_star(
    df: DataFrame, dims: dict[str, list[str]]
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Split ``df`` into (fact, {dim_name: dim_df}).

    ``dims`` maps dimension name → its natural columns.  The fact keeps
    every non-dimension column plus one surrogate key per dimension.
    """
    dim_tables: dict[str, DataFrame] = {}
    fact = df
    for name, cols in dims.items():
        key = f"sk_{name}"
        dim = build_dimension(df, cols, key)
        dim_tables[name] = dim
        fact = fact.join(F.broadcast(dim), on=cols, how="left").drop(*cols)
    return fact, dim_tables
