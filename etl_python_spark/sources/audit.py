"""Zero-cost pipeline audits via ``pyspark.sql.Observation``.

The reference audits every transform with eager row counts and
null-profiles printed mid-pipeline (ETL - Primeiro Pedido.py:213-243,
ETL - CRM.py:313-326) — each print forcing a full materialization.
Observations attach the same metrics to the ONE action the pipeline
already runs: the aggregates ride along with the job (computed on the
executors as rows stream by), so auditing costs no extra scan at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_counts(
    df: DataFrame, name: str, null_cols: list[str] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach row count + per-column null counts.  Read
    ``observation.get`` AFTER an action has run on the returned frame.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in null_cols or []:
        metrics.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}")
        )
    return df.observe(obs, *metrics), obs


def observed_checksum(
    df: DataFrame, name: str, money_col: str
) -> tuple[DataFrame, Observation]:
    """Attach the money-sum sanity check (ref ETL - Mix de
    Produtos.py:146-148) to the pipeline's own action."""
    obs = Observation(name)
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.round(
                F.sum(F.col(money_col).cast("decimal(18,2)")).cast("double"), 2
            ).alias(f"sum_{money_col}"),
        ),
        obs,
    )
