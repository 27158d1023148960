"""Operator family: analytics queries + large-scale pipeline operators.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB-runnable ANSI SQL with the same
output column names).  ``all_queries()`` / ``all_oracles()`` merge them
for the driver entry point.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out


def _modules():
    from . import (
        analytics_core,
        analytics_joins,
        analytics_windows,
        catalog,
        dedup,
        events,
        multimodal,
        similarity,
        text,
    )
    from ..ml import forecast
    from ..streaming import file_stream

    return (
        analytics_core,
        analytics_joins,
        analytics_windows,
        catalog,
        dedup,
        events,
        multimodal,
        similarity,
        text,
        forecast,
        file_stream,
    )
