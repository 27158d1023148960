"""Payroll analytics query: the reference's calculator family run as
a set-oriented report (one pass over a derived employee frame instead
of one interactive ``input()`` per case — the Spark-first re-statement
of `Calculadora - Décimo Terceiro Salário.py`, `Calculadora - Salário
Bruto.py`; see ``functions/payroll.py`` for the scalar library and
the severance variant).

The employee frame derives deterministically from ``customer``:
salário = 1412 + |c_acctbal| (spans every INSS bracket and the teto),
meses trabalhados = c_custkey mod 12 + 1 — so the DuckDB oracle can
rebuild the identical inputs.  All money flows through fixed 2dp
rounding points and the aggregates sum exact integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents
from ..functions.payroll import (
    INSS_BRACKETS,
    INSS_TETO,
    IRRF_TABLE,
    decimo_terceiro,
)
from ..sources.tables import load_table


def q_payroll_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment 13º-salário cost report: headcount, gross,
    INSS, IRRF, and net totals — the calculator over a whole payroll
    in one scan + one K-row aggregate (no shuffle beyond the final
    hash aggregate; every per-row term is branch-free codegen)."""
    cust = load_table(spark, sf_dir, "customer")
    emp = cust.select(
        "c_mktsegment",
        # cent quantization, not ROUND: same rationale as every other
        # money fixpoint in this query (tie behavior differs by engine)
        (F.floor((F.lit(1412.0) + F.abs(F.col("c_acctbal"))) * 100 + F.lit(0.5)) / 100.0).alias("salario"),
        (F.col("c_custkey") % 12 + 1).cast("int").alias("meses"),
    )
    d13 = decimo_terceiro(F.col("salario"), F.col("meses"))
    rows = emp.select("c_mktsegment", d13.alias("d"))
    return (
        rows.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("funcionarios"),
            (F.sum(cents(F.col("d.bruto"))).cast("double") / 100.0).alias(
                "bruto_total"
            ),
            (F.sum(cents(F.col("d.inss"))).cast("double") / 100.0).alias(
                "inss_total"
            ),
            (F.sum(cents(F.col("d.irrf"))).cast("double") / 100.0).alias(
                "irrf_total"
            ),
            (
                F.sum(cents(F.col("d.total_receber"))).cast("double") / 100.0
            ).alias("liquido_total"),
        )
    )


def _sql_money(expr: str) -> str:
    """DuckDB twin of functions.payroll._money (engine-exact cents)."""
    return f"FLOOR(({expr}) * 100 + 0.5) / 100.0"


def _sql_inss_prog(v: str) -> str:
    slices = " + ".join(
        f"LEAST(GREATEST({v} - {lo}, 0), {hi - lo}) * {rate}"
        for lo, hi, rate in INSS_BRACKETS
    )
    return _sql_money(f"LEAST({slices}, {INSS_TETO})")


def _sql_irrf(base: str) -> str:
    expr = f"({base}) * {IRRF_TABLE[-1][1]} - {IRRF_TABLE[-1][2]}"
    for hi, rate, ded in reversed(IRRF_TABLE[:-1]):
        expr = f"CASE WHEN ({base}) <= {hi} THEN ({base}) * {rate} - {ded} ELSE {expr} END"
    return _sql_money(f"GREATEST({expr}, 0.0)")


def _sql_cents(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * 100 + 0.5) AS BIGINT)"


ORACLE_PAYROLL = f"""
WITH emp AS (
  SELECT c_mktsegment,
         FLOOR((1412.0 + ABS(c_acctbal)) * 100 + 0.5) / 100.0 AS salario,
         CAST(c_custkey % 12 + 1 AS INT) AS meses
  FROM customer
), d13 AS (
  SELECT c_mktsegment,
         {_sql_money('salario / 12 * meses')} AS bruto
  FROM emp
), d AS (
  SELECT c_mktsegment, bruto,
         {_sql_money('bruto / 2')} AS primeira,
         {_sql_inss_prog('bruto')} AS inss
  FROM d13
), d2 AS (
  SELECT c_mktsegment, bruto, primeira, inss,
         {_sql_irrf(_sql_money('bruto - inss'))} AS irrf
  FROM d
), d3 AS (
  SELECT c_mktsegment, bruto, inss, irrf,
         {_sql_money('primeira + ' + _sql_money('bruto - primeira - inss - irrf'))}
           AS total_receber
  FROM d2
)
SELECT c_mktsegment,
       COUNT(*) AS funcionarios,
       CAST(SUM({_sql_cents('bruto')}) AS DOUBLE) / 100.0 AS bruto_total,
       CAST(SUM({_sql_cents('inss')}) AS DOUBLE) / 100.0 AS inss_total,
       CAST(SUM({_sql_cents('irrf')}) AS DOUBLE) / 100.0 AS irrf_total,
       CAST(SUM({_sql_cents('total_receber')}) AS DOUBLE) / 100.0 AS liquido_total
FROM d3
GROUP BY 1
"""


QUERIES = {"payroll_report": q_payroll_report}
ORACLES = {"payroll_report": ORACLE_PAYROLL}
