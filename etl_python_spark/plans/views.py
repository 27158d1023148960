"""SQL surface: the analytics family as registered Spark SQL views.

The reference's warehouse layer is consumed as MySQL views/procedures
(scripts_sql/*.sql); parity means a SQL-speaking client can run the
same reports with ``spark.sql`` — each view here is the Spark-SQL
statement of an operator family, planned by the same Catalyst rules as
the DataFrame form (the test suite asserts result equality between
the two surfaces).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.tables import register_views

REPORT_VIEWS: dict[str, str] = {
    # faturamento panel (§3.2) minus the rollup row — GROUPING SETS via SQL
    "vw_faturamento": """
        SELECT CASE WHEN GROUPING(n_name) = 1 THEN 'SOMA' ELSE n_name END AS vendedor,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento,
               COUNT(o_orderkey) AS pedidos,
               COUNT(DISTINCT o_custkey) AS carteira
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        WHERE year(o_orderdate) = 1998
        GROUP BY ROLLUP (n_name)
    """,
    # W1 top-N per group
    "vw_top_customers": """
        SELECT * FROM (
          SELECT n_name, c_custkey, fat,
                 ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY fat DESC, c_custkey) AS rn
          FROM (
            SELECT n_name, c_custkey,
                   ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS fat
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name, c_custkey
          )
        ) WHERE rn <= 3
    """,
    # W2 MoM via LAG
    "vw_mom": """
        SELECT mes, faturamento,
               LAG(faturamento) OVER (ORDER BY mes) AS mes_anterior,
               ROUND((faturamento / NULLIF(LAG(faturamento) OVER (ORDER BY mes), 0.0) - 1) * 100, 4) AS var_pct
        FROM (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mes,
                 ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS faturamento
          FROM orders GROUP BY 1
        )
    """,
}


def register_report_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register base tables + report views; returns the view names."""
    register_views(spark, sf_dir)
    for name, sql in REPORT_VIEWS.items():
        spark.sql(sql).createOrReplaceTempView(name)
    return list(REPORT_VIEWS)
