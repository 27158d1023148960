"""S15 orchestrator: status/rowcount/duration per job, continue-on-
error, maintenance log (ref Rodar Scripts Showroom.py:13-57)."""

from pyspark.sql import functions as F

from etl_python_spark.pipelines import report_df, run_jobs
from etl_python_spark.pipelines.runner import format_table
from etl_python_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_run_jobs_status_rows_and_log(spark, tmp_path):
    log = str(tmp_path / "manutencao.log")

    def ok_job(s):
        return load_table(s, SF_SMOKE, "nation").filter(F.col("n_regionkey") >= 0)

    def side_effect_job(s):
        load_table(s, SF_SMOKE, "region").write.format("noop").mode(
            "overwrite"
        ).save()
        return None  # ran its own action → rows N/A

    def broken_job(s):
        return load_table(s, SF_SMOKE, "nation").select(F.col("no_such_col"))

    results = run_jobs(
        spark,
        {"venda": ok_job, "cadastro": side_effect_job, "quebrado": broken_job},
        log_path=log,
    )
    by_name = {r.name: r for r in results}
    assert [r.name for r in results] == ["venda", "cadastro", "quebrado"]
    assert by_name["venda"].status == "OK" and by_name["venda"].rows == 25
    assert by_name["cadastro"].status == "OK" and by_name["cadastro"].rows is None
    # continue-on-error: the failing job is captured, not raised
    assert by_name["quebrado"].status == "ERRO"
    assert "no_such_col" in (by_name["quebrado"].error or "")
    # robust log holds the full traceback
    text = open(log, encoding="utf-8").read()
    assert "[SCRIPT]: quebrado" in text and "no_such_col" in text
    # report is a queryable frame + printable table
    rep = report_df(spark, results)
    assert rep.filter(F.col("status") == "OK").count() == 2
    table = format_table(results)
    assert "venda" in table and "ERRO" in table


def test_run_jobs_fail_fast(spark):
    ran = []

    def a(s):
        ran.append("a")
        raise RuntimeError("boom")

    def b(s):
        ran.append("b")

    results = run_jobs(spark, {"a": a, "b": b}, fail_fast=True)
    assert [r.status for r in results] == ["ERRO"] and ran == ["a"]
