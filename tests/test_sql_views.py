"""SQL surface parity: registered views return the same results as the
DataFrame-API operators."""

from etl_python_spark.plans.views import register_report_views
from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_views_register(spark):
    names = register_report_views(spark, SF_SMOKE)
    for name in names:
        assert spark.table(name).columns


def test_faturamento_view_matches_dataframe_api(spark):
    from etl_python_spark.operators.analytics_core import q_faturamento_rollup

    register_report_views(spark, SF_SMOKE)
    via_sql = spark.sql(
        "SELECT vendedor, faturamento, pedidos, carteira FROM vw_faturamento"
    )
    via_df = q_faturamento_rollup(spark, SF_SMOKE).select(
        "vendedor", "faturamento", "pedidos", "carteira"
    )
    cols = ["vendedor", "faturamento", "pedidos", "carteira"]
    assert _rows(via_sql, cols) == _rows(via_df, cols)


def test_mom_view_matches_dataframe_api(spark):
    from etl_python_spark.operators.analytics_core import q_mom_growth

    register_report_views(spark, SF_SMOKE)
    df = q_mom_growth(spark, SF_SMOKE)
    sql_cols = spark.table("vw_mom").columns
    shared = [c for c in df.columns if c in sql_cols]
    assert len(shared) >= 2
    assert _rows(spark.table("vw_mom").select(shared), shared) == _rows(
        df.select(shared), shared
    )
