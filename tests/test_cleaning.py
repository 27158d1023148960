"""Unit tests for the pt-BR scalar library — the edge cases visible in
the reference's procedural parsers (SURVEY.md §5)."""

import pytest
from pyspark.sql import functions as F

from etl_python_spark.functions.cleaning import (
    cnpj_check_digit_ok,
    digits_only,
    format_brl,
    normalize_text,
    parse_brl,
)
from etl_python_spark.functions.dates import (
    month_name_pt,
    month_number_from_pt,
    week_of_month,
)


def _eval(spark, col, rows, in_type="string"):
    df = spark.createDataFrame([(r,) for r in rows], f"v {in_type}")
    return [r[0] for r in df.select(col).collect()]


BRL_CASES = [
    ("R$ 1.234,56", 1234.56),
    ("1.234,56", 1234.56),
    ("1234,56", 1234.56),
    ("1234.56", 1234.56),
    ("1.234", 1234.0),
    ("1.234.567", 1234567.0),
    ("R$ 0,99", 0.99),
    ("-1.000,00", -1000.0),
    ("42", 42.0),
    ("abc", None),
    ("", None),
    (None, None),
]


def test_parse_brl(spark):
    vals = _eval(spark, parse_brl(F.col("v")), [c[0] for c in BRL_CASES])
    for (raw, want), got in zip(BRL_CASES, vals):
        assert got == pytest.approx(want) if want is not None else got is None, (
            f"parse_brl({raw!r}) = {got!r}, want {want!r}"
        )


def test_digits_only(spark):
    vals = _eval(
        spark,
        digits_only(F.col("v")),
        ["(11) 98765-4321", "12.345.678/0001-95", "abc", None],
    )
    assert vals == ["11987654321", "12345678000195", None, None]


def test_normalize_text(spark):
    vals = _eval(
        spark, normalize_text(F.col("v")), ["  são  paulo ", "x", "", None]
    )
    assert vals == ["SÃO PAULO", "X", None, None]


def test_cnpj_check_digit(spark):
    cases = [
        ("11.222.333/0001-81", True),   # valid
        ("11222333000181", True),
        ("11.222.333/0001-82", False),  # wrong dv
        ("00000000000000", False),      # repeated digits
        ("123", False),
        (None, False),
    ]
    vals = _eval(spark, cnpj_check_digit_ok(F.col("v")), [c[0] for c in cases])
    assert vals == [c[1] for c in cases]


def test_format_brl(spark):
    vals = _eval(
        spark, format_brl(F.col("v")), [1234.5, 0.0, 1234567.891], in_type="double"
    )
    assert vals == ["R$ 1.234,50", "R$ 0,00", "R$ 1.234.567,89"]


def test_month_maps(spark):
    nums = _eval(
        spark,
        month_number_from_pt(F.col("v")),
        ["JANEIRO", "dezembro", " Março ", "NOPE"],
    )
    assert nums == [1, 12, 3, None]
    names = _eval(spark, month_name_pt(F.col("v")), ["1", "12"], in_type="string")
    assert names == ["JANEIRO", "DEZEMBRO"]


def test_week_of_month(spark):
    vals = _eval(
        spark,
        week_of_month(F.to_date(F.col("v"))),
        ["2026-08-01", "2026-08-07", "2026-08-08", "2026-08-31"],
    )
    assert vals == [1, 1, 2, 5]
