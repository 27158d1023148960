"""Brazilian payroll scalar library: INSS, IRRF, 13º salário,
salário líquido, rescisão — pure column expressions.

Re-expresses the reference's payroll calculators, a capability family
its repo ships but SURVEY §2 had not inventoried until round 7:

- ``Calculadora - Décimo Terceiro Salário.py`` — 13º bruto
  proporcional, 1ª/2ª parcela split, progressive INSS with the
  R$ 908.85 ceiling, IRRF 2024 ladder on (bruto − INSS);
- ``Calculadora - Salário Bruto.py`` — simple-rate INSS (whole salary
  × bracket rate, topo capped), vale-transporte 6%, vale-refeição 20%
  co-pay, salário líquido;
- ``Calculadora - Rescisão Contratual.py`` — saldo de salário, 13º
  proporcional por avos (15-day rule), férias proporcionais +1/3,
  férias vencidas +1/3, aviso prévio indenizado/descontado, the 35%
  consignado ceiling, IRRF isenção < 4800.

Semantic note (intent over bug, the SURVEY §7 rule): the reference's
progressive-INSS loop treats the official table's ABSOLUTE upper
bounds as bracket WIDTHS (`Calculadora - Décimo Terceiro
Salário.py:16-33`), which overstates the contribution between the
ceiling region and the cap; its own R$ 908.85 cap is exactly the
official 2024 table's maximum marginal sum, so the marginal-slice
implementation below reproduces the number the reference was
aiming at.  The simple-rate variant (`Calculadora - Salário
Bruto.py:29-40`) is faithful as written — the two variants genuinely
differ in the reference too.

Everything here is branch-free arithmetic over doubles quantized to
exact cents (``floor(x*100 + 0.5) / 100``) at the reference's own
rounding points — NOT ``ROUND(x, 2)``, whose half-tie behavior differs
between engines on computed doubles (the repo's established
money-parity rule, functions/numeric.py) — so the DuckDB oracle
restates every number bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _money(x: Column) -> Column:
    """Engine-exact 2dp quantization: floor(x*100 + 0.5) / 100 —
    identical in any IEEE-754 engine, unlike ROUND(double, 2) ties."""
    return F.floor(x * 100 + F.lit(0.5)) / 100.0

# Official INSS 2024 progressive table: (lower, upper, marginal rate)
INSS_BRACKETS = [
    (0.00, 1412.00, 0.075),
    (1412.00, 2666.68, 0.09),
    (2666.68, 4000.03, 0.12),
    (4000.03, 7786.02, 0.14),
]
INSS_TETO = 908.85  # the reference's cap == the table's marginal max

# IRRF 2024: (upper bound, rate, deduction); None = top bracket
IRRF_TABLE = [
    (2259.20, 0.0, 0.0),
    (2826.65, 0.075, 169.44),
    (3751.05, 0.15, 381.44),
    (4664.68, 0.225, 662.77),
    (None, 0.275, 896.00),
]


def inss_progressivo(valor: Column) -> Column:
    """Progressive INSS: marginal rate on each bracket slice, capped
    at the table ceiling, rounded 2dp (ref Calculadora - Décimo
    Terceiro Salário.py:11-33 — see the module note on its
    width-vs-bound loop)."""
    total = F.lit(0.0)
    for lo, hi, rate in INSS_BRACKETS:
        slice_ = F.least(F.greatest(valor - F.lit(lo), F.lit(0.0)), F.lit(hi - lo))
        total = total + slice_ * F.lit(rate)
    return _money(F.least(total, F.lit(INSS_TETO)))


def inss_simples(valor: Column) -> Column:
    """Simple-rate INSS: the WHOLE salary times its bracket's rate,
    top capped at teto×14% (ref Calculadora - Salário Bruto.py:29-40
    verbatim — this variant is faithful as written)."""
    expr = F.lit(round(INSS_BRACKETS[-1][1] * INSS_BRACKETS[-1][2], 4))
    for lo, hi, rate in reversed(INSS_BRACKETS):
        expr = F.when(valor <= F.lit(hi), valor * F.lit(rate)).otherwise(expr)
    return _money(expr)


def irrf_2024(base: Column) -> Column:
    """IRRF ladder on the computed base, 2dp, clamped at 0
    (ref Calculadora - Décimo Terceiro Salário.py:36-50)."""
    expr = base * F.lit(IRRF_TABLE[-1][1]) - F.lit(IRRF_TABLE[-1][2])
    for hi, rate, ded in reversed(IRRF_TABLE[:-1]):
        expr = F.when(base <= F.lit(hi), base * F.lit(rate) - F.lit(ded)).otherwise(
            expr
        )
    return _money(F.greatest(expr, F.lit(0.0)))


def decimo_terceiro(salario: Column, meses: Column) -> Column:
    """13º salário breakdown as a struct — proportional gross, the
    50% first installment, progressive INSS on the FULL gross, IRRF
    on (gross − INSS), and the second installment net of everything
    (ref Calculadora - Décimo Terceiro Salário.py:53-79)."""
    bruto = _money(salario / 12 * meses)
    primeira = _money(bruto / 2)
    inss = inss_progressivo(bruto)
    base_irrf = _money(bruto - inss)
    irrf = irrf_2024(base_irrf)
    segunda = _money(bruto - primeira - inss - irrf)
    return F.struct(
        bruto.alias("bruto"),
        primeira.alias("primeira_parcela"),
        inss.alias("inss"),
        base_irrf.alias("base_irrf"),
        irrf.alias("irrf"),
        segunda.alias("segunda_parcela"),
        _money(primeira + segunda).alias("total_receber"),
    )


def salario_liquido(
    salario: Column,
    desconta_inss: Column,
    optante_vt: Column,
    ticket_diario: Column,
    dias_uteis: Column,
) -> Column:
    """Net-salary breakdown struct: simple-rate INSS (opt-in), 6%
    vale-transporte (opt-in), 20% vale-refeição co-pay
    (ref Calculadora - Salário Bruto.py:3-60)."""
    inss = F.when(desconta_inss, inss_simples(salario)).otherwise(F.lit(0.0))
    vt = F.when(optante_vt, _money(salario * F.lit(0.06))).otherwise(F.lit(0.0))
    vr = _money(ticket_diario * dias_uteis * F.lit(0.20))
    liquido = _money(salario - inss - vt - vr)
    return F.struct(
        _money(salario).alias("salario_bruto"),
        inss.alias("desconto_inss"),
        vt.alias("desconto_vale_transporte"),
        vr.alias("desconto_vale_refeicao"),
        liquido.alias("salario_liquido"),
    )


def _avos(dt_fim: Column, dt_base: Column) -> Column:
    """Months-worked 'avos' with the 15-day rule: full months between
    base and end, plus one when the end day reaches 15 (ref
    Calculadora - Rescisão Contratual.py:22-35; relativedelta months
    + day>=15).  Spark's months_between floors to the same full-month
    count when the base is a month boundary — callers anchor bases on
    the 1st (the report query does), and the pure-date edge deltas of
    mid-month bases are a documented difference."""
    full = F.floor(F.months_between(dt_fim, dt_base)).cast("int")
    return full + F.when(F.dayofmonth(dt_fim) >= 15, 1).otherwise(0)


def rescisao(
    salario: Column,
    dt_admissao: Column,
    dt_rescisao: Column,
    aviso_indenizado: Column,
    aviso_descontado: Column,
    ferias_vencidas_meses: Column,
) -> Column:
    """Severance (rescisão) settlement struct: salary balance by days
    worked in the final month, 13º proporcional by avos since Jan 1
    (or admission), proportional vacation +1/3 since the contract
    anniversary, overdue vacation +1/3, indemnified/deducted prior
    notice, the 35% consignado ceiling, and the reference's simplified
    15% IRRF with the <4800 exemption
    (ref Calculadora - Rescisão Contratual.py:4-72)."""
    saldo = _money(salario / 30 * F.dayofmonth(dt_rescisao))

    inicio_ano = F.trunc(dt_rescisao, "year")
    base_13 = F.greatest(dt_admissao, inicio_ano)
    avos_13 = _avos(dt_rescisao, base_13)
    dec13 = _money(salario / 12 * avos_13)

    aniv = F.add_months(
        dt_admissao, 12 * (F.year(dt_rescisao) - F.year(dt_admissao))
    )
    aniv = F.when(aniv > dt_rescisao, F.add_months(aniv, -12)).otherwise(aniv)
    avos_f = _avos(dt_rescisao, aniv)
    ferias_prop = _money(salario / 12 * avos_f * F.lit(4.0 / 3.0))
    ferias_venc = _money(salario * ferias_vencidas_meses * F.lit(4.0 / 3.0))

    aviso_prov = F.when(aviso_indenizado, salario).otherwise(F.lit(0.0))
    total_bruto = _money(saldo + dec13 + ferias_prop + ferias_venc + aviso_prov)
    irrf = F.when(
        salario >= 4800, _money(total_bruto * F.lit(0.15))
    ).otherwise(F.lit(0.0))
    aviso_desc = F.when(aviso_descontado, salario).otherwise(F.lit(0.0))
    teto_35 = _money(total_bruto * F.lit(0.35))
    liquido = F.greatest(
        _money(total_bruto - irrf - aviso_desc - teto_35), F.lit(0.0)
    )
    return F.struct(
        saldo.alias("saldo_salario"),
        dec13.alias("decimo_terceiro"),
        _money(ferias_prop + ferias_venc).alias("ferias_totais"),
        aviso_prov.alias("aviso_recebido"),
        total_bruto.alias("total_bruto"),
        irrf.alias("irrf"),
        aviso_desc.alias("aviso_descontado"),
        teto_35.alias("teto_emprestimo"),
        liquido.alias("total_liquido"),
    )
