"""pt-BR date/calendar expression library.

Re-expresses the reference's calendar derivations (Algoritmo de
Estruturação de Dados.py:288-476) as column expressions: pt-BR month
names, week-of-month, business-day flags — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONTH_NAMES_PT = [
    "JANEIRO", "FEVEREIRO", "MARÇO", "ABRIL", "MAIO", "JUNHO",
    "JULHO", "AGOSTO", "SETEMBRO", "OUTUBRO", "NOVEMBRO", "DEZEMBRO",
]

DOW_NAMES_PT = [
    "SEGUNDA-FEIRA", "TERÇA-FEIRA", "QUARTA-FEIRA", "QUINTA-FEIRA",
    "SEXTA-FEIRA", "SÁBADO", "DOMINGO",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def month_name_pt(col: Column | str) -> Column:
    """month number/date → UPPER pt-BR month name ('JANEIRO'…)."""
    c = _c(col)
    m = F.when(
        c.cast("string").rlike(r"^\d{1,2}$"), c.cast("string").try_cast("int")
    ).otherwise(F.month(c.cast("string").try_cast("date")))
    expr = F.lit(None).cast("string")
    for i, name in enumerate(MONTH_NAMES_PT, start=1):
        expr = F.when(m == i, F.lit(name)).otherwise(expr)
    return expr


def month_number_from_pt(col: Column | str) -> Column:
    """UPPER pt-BR month name → 1..12 (the CASE ladder of
    Faturamento.sql:12-27); unknown → NULL (caller raises, mirroring
    the reference's SIGNAL)."""
    name = F.upper(F.trim(_c(col)))
    expr = F.lit(None).cast("int")
    for i, nm in enumerate(MONTH_NAMES_PT, start=1):
        expr = F.when(name == nm, F.lit(i)).otherwise(expr)
    return expr


def week_of_month(col: Column | str) -> Column:
    """Week-of-month as ceil(day/7) — parity with the reference UDF
    (Algoritmo de Estruturação de Dados.py:288-306)."""
    return F.ceil(F.dayofmonth(_c(col)) / 7.0).cast("int")


def is_business_day(col: Column | str) -> Column:
    """Mon–Fri flag (holidays out of scope, as in the reference)."""
    return F.dayofweek(_c(col)).isin(2, 3, 4, 5, 6)
