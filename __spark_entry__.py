"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the Faturamento.sql
stored-procedure semantics, SURVEY.md §3.2) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator inventory
implemented in ``etl_python_spark.operators`` (SURVEY.md §2) together
with DuckDB-equivalent oracle SQL for the t2 correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_python_spark.operators import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from etl_python_spark.operators.analytics_core import q_faturamento_rollup

    return q_faturamento_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — every ``queries()`` entry has
    one (all hashing is engine-agnostic md5-derived, so even the dedup
    /LSH family restates value-for-value)."""
    return all_oracles()
