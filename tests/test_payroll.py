"""Payroll scalar library vs hand-computed reference cases
(Calculadora - Décimo Terceiro Salário.py, Calculadora - Salário
Bruto.py, Calculadora - Rescisão Contratual.py)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_python_spark.functions.payroll import (
    decimo_terceiro,
    inss_progressivo,
    inss_simples,
    irrf_2024,
    rescisao,
    salario_liquido,
)


def _one(spark, expr, schema_rows, ddl):
    return spark.createDataFrame(schema_rows, ddl).select(expr.alias("r")).collect()


def test_inss_brackets(spark):
    rows = spark.createDataFrame(
        [(1000.0,), (1412.0,), (2000.0,), (5000.0,), (20000.0,)], "v double"
    ).select(
        inss_progressivo(F.col("v")).alias("prog"),
        inss_simples(F.col("v")).alias("simples"),
    ).collect()
    prog = [r.prog for r in rows]
    simples = [r.simples for r in rows]
    # progressive: marginal slices
    assert prog[0] == 75.0                       # 1000 * 7.5%
    assert prog[1] == 105.9                      # full first bracket
    assert prog[2] == round(1412 * 0.075 + 588 * 0.09, 2)
    assert prog[3] == round(1412 * 0.075 + 1254.68 * 0.09 + 1333.35 * 0.12 + 999.97 * 0.14, 2)
    assert prog[4] == 908.85                     # ceiling
    # simple-rate: whole value times bracket rate (ref Salário Bruto)
    assert simples[0] == 75.0
    assert simples[2] == 180.0                   # 2000 * 9%
    assert simples[3] == 700.0                   # 5000 * 14%
    assert simples[4] == 1090.04                 # teto * 14%


def test_irrf_ladder(spark):
    rows = spark.createDataFrame(
        [(2000.0,), (2500.0,), (3000.0,), (4000.0,), (10000.0,)], "b double"
    ).select(irrf_2024(F.col("b")).alias("i")).collect()
    got = [r.i for r in rows]
    assert got[0] == 0.0
    assert got[1] == round(2500 * 0.075 - 169.44, 2)
    assert got[2] == round(3000 * 0.15 - 381.44, 2)
    assert got[3] == round(4000 * 0.225 - 662.77, 2)
    assert got[4] == round(10000 * 0.275 - 896.00, 2)


def test_decimo_terceiro_breakdown(spark):
    # salário 3000, 12 meses: bruto 3000, 1ª 1500, INSS progressive,
    # IRRF on (bruto - inss), identities hold exactly
    (r,) = spark.createDataFrame([(3000.0, 12)], "s double, m int").select(
        decimo_terceiro(F.col("s"), F.col("m")).alias("d")
    ).collect()
    d = r.d
    assert d.bruto == 3000.0 and d.primeira_parcela == 1500.0
    assert d.inss == round(1412 * 0.075 + 1254.68 * 0.09 + 333.32 * 0.12, 2)
    assert d.base_irrf == round(3000.0 - d.inss, 2)
    assert d.irrf == round(d.base_irrf * 0.075 - 169.44, 2)
    assert abs(d.segunda_parcela - (d.bruto - d.primeira_parcela - d.inss - d.irrf)) < 1e-9
    assert abs(d.total_receber - (d.primeira_parcela + d.segunda_parcela)) < 1e-9
    # proportional months
    (r6,) = spark.createDataFrame([(3000.0, 6)], "s double, m int").select(
        decimo_terceiro(F.col("s"), F.col("m")).alias("d")
    ).collect()
    assert r6.d.bruto == 1500.0


def test_salario_liquido(spark):
    # ref example shape: 3000 gross, INSS on, VT on, ticket 25 × 22 days
    (r,) = spark.createDataFrame(
        [(3000.0, True, True, 25.0, 22)],
        "s double, inss boolean, vt boolean, tkt double, dias int",
    ).select(
        salario_liquido(
            F.col("s"), F.col("inss"), F.col("vt"), F.col("tkt"), F.col("dias")
        ).alias("r")
    ).collect()
    v = r.r
    assert v.desconto_inss == 360.0          # simple rate: 3000 * 12%
    assert v.desconto_vale_transporte == 180.0
    assert v.desconto_vale_refeicao == 110.0  # 25*22*0.20
    assert v.salario_liquido == 3000.0 - 360.0 - 180.0 - 110.0
    # opt-outs zero their deductions
    (r2,) = spark.createDataFrame(
        [(3000.0, False, False, 0.0, 22)],
        "s double, inss boolean, vt boolean, tkt double, dias int",
    ).select(
        salario_liquido(
            F.col("s"), F.col("inss"), F.col("vt"), F.col("tkt"), F.col("dias")
        ).alias("r")
    ).collect()
    assert r2.r.salario_liquido == 3000.0


def test_rescisao_settlement(spark):
    # admissão 01-03-2023, rescisão 20-11-2024, indenizado, 0 férias
    # vencidas, salário 3000 (abaixo da isenção IRRF < 4800)
    (r,) = spark.createDataFrame(
        [
            (
                3000.0,
                datetime.date(2023, 3, 1),
                datetime.date(2024, 11, 20),
                True,
                False,
                0.0,
            )
        ],
        "s double, adm date, res date, inden boolean, descont boolean, fv double",
    ).select(
        rescisao(
            F.col("s"), F.col("adm"), F.col("res"),
            F.col("inden"), F.col("descont"), F.col("fv"),
        ).alias("r")
    ).collect()
    v = r.r
    assert v.saldo_salario == 2000.0          # 3000/30*20
    # 13º: base Jan 1 2024 → 10 full months + day 20>=15 → 11 avos
    assert v.decimo_terceiro == 2750.0        # 3000/12*11
    # férias: anniversary Mar 1 2024 → 8 full months + 1 → 9 avos, ×4/3
    assert v.ferias_totais == 3000.0          # 3000/12*9*4/3
    assert v.aviso_recebido == 3000.0
    assert v.total_bruto == 2000 + 2750 + 3000 + 3000
    assert v.irrf == 0.0                      # isenção < 4800
    assert v.teto_emprestimo == round(v.total_bruto * 0.35, 2)
    assert v.total_liquido == round(v.total_bruto - v.teto_emprestimo, 2)
    # justa-causa style: aviso descontado reduces the net
    (r2,) = spark.createDataFrame(
        [
            (
                5000.0,
                datetime.date(2023, 3, 1),
                datetime.date(2024, 11, 20),
                False,
                True,
                1.0,
            )
        ],
        "s double, adm date, res date, inden boolean, descont boolean, fv double",
    ).select(
        rescisao(
            F.col("s"), F.col("adm"), F.col("res"),
            F.col("inden"), F.col("descont"), F.col("fv"),
        ).alias("r")
    ).collect()
    v2 = r2.r
    assert v2.aviso_recebido == 0.0 and v2.aviso_descontado == 5000.0
    assert v2.irrf == round(v2.total_bruto * 0.15, 2)  # >= 4800
    assert v2.total_liquido >= 0.0
