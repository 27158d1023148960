"""pt-BR scalar cleaning library — pure column expressions.

Re-expresses the reference's row-wise pandas cleaning functions as
Catalyst expressions (JVM-side, codegen'd — no Python in the hot
path):

- ``parse_brl``      : 'R$ 1.234,56' → 1234.56   (ref: ETL - Primeiro
  Pedido.py:51-76, ETL - Painel de Oportunidades.py:74-100,
  ETL - Mix de Produtos.py:70-94)
- ``digits_only``    : phone/CNPJ sanitization    (ref: ETL - CRM.py:41-52)
- ``normalize_text`` : trim+upper+collapse spaces (ref: ETL - CRM.py:35-38)
- ``cnpj_check_digit_ok`` : CNPJ mod-11 check digits (ref: cnpj_core.py:18-39)
- ``format_brl``     : display-layer 'R$ 1.234,56' (ref: Faturamento.sql:46-65)
- ``fix_mojibake``   : cp1252/UTF-8 double-encode repair
  (ref: Conversor de Formatos.py:73-136)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def digits_only(col: Column | str) -> Column:
    """Strip every non-digit; empty string → NULL."""
    out = F.regexp_replace(_c(col).cast("string"), r"[^0-9]", "")
    return F.when(out == "", F.lit(None)).otherwise(out)


def normalize_text(col: Column | str) -> Column:
    """TRIM + UPPER + collapse internal whitespace; '' → NULL."""
    out = F.upper(F.trim(F.regexp_replace(_c(col).cast("string"), r"\s+", " ")))
    return F.when(out == "", F.lit(None)).otherwise(out)


def parse_brl(col: Column | str) -> Column:
    """Parse a pt-BR money string to DOUBLE.

    Handles the ambiguity rules the reference implements procedurally:
    'R$ 1.234,56' (pt-BR), '1234.56' (already en-US), '1.234' (pt-BR
    thousands only), plain numerics, and junk → NULL.

    Decision rule (mirrors the reference's intent):
    - contains ',' → ',' is the decimal separator, '.' are thousands;
    - no ',' and a single '.' followed by exactly 3 digits at the end
      with more digits before → thousands separator (pt-BR '1.234');
    - otherwise '.' is a decimal point.
    """
    s = F.regexp_replace(_c(col).cast("string"), r"(?i)r\$", "")
    s = F.regexp_replace(s, r"[\s ]", "")
    has_comma = s.contains(",")
    # pt-BR: drop thousand dots, comma → dot
    ptbr = F.translate(F.regexp_replace(s, r"\.", ""), ",", ".")
    # no comma: '1.234' (exactly one dot, 3 trailing digits) is thousands
    thousands_only = s.rlike(r"^-?\d{1,3}(\.\d{3})+$")
    en = F.when(thousands_only, F.regexp_replace(s, r"\.", "")).otherwise(s)
    cleaned = F.when(has_comma, ptbr).otherwise(en)
    return cleaned.try_cast("double")


def format_brl(col: Column | str, prefix: bool = True) -> Column:
    """Display-layer formatting: 1234.56 → 'R$ 1.234,56'.

    Kept separate from numeric columns on purpose — the reference mixes
    display strings into result sets (Faturamento.sql:46-65); we keep
    results numeric and format only at the presentation edge.
    """
    # format_number gives '1,234.56'; translate swaps separators to pt-BR
    txt = F.translate(F.format_number(_c(col).cast("double"), 2), ",.", ".,")
    return F.concat(F.lit("R$ "), txt) if prefix else txt


def cnpj_check_digit_ok(col: Column | str) -> Column:
    """Validate CNPJ check digits (mod-11 with weights 5..2,9..2 then
    6..2,9..2) as a pure SQL expression over the 14-digit string.

    Ref semantics: cnpj_core.py:18-39 (procedural loop) — here the two
    weighted sums are unrolled into arithmetic over substrings, keeping
    validation JVM-side and codegen-friendly.
    """
    d = digits_only(col)
    ok_len = F.length(d) == 14

    def digit(i: int) -> Column:  # 1-based position
        return F.substring(d, i, 1).try_cast("int")

    w1 = [5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2]
    w2 = [6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2]

    def check(weights: list[int]) -> Column:
        total = F.lit(0)
        for i, w in enumerate(weights):
            total = total + digit(i + 1) * F.lit(w)
        rem = total % 11
        return F.when(rem < 2, F.lit(0)).otherwise(F.lit(11) - rem)

    dv1_ok = digit(13) == check(w1)
    dv2_ok = digit(14) == check(w2)
    # reject the all-same-digit degenerates the reference rejects
    not_repeated = ~d.rlike(r"^(\d)\1{13}$")
    return F.coalesce(ok_len & not_repeated & dv1_ok & dv2_ok, F.lit(False))


# Most common cp1252-decoded-as-UTF-8 mojibake pairs seen in the
# reference's repair dictionary (Conversor de Formatos.py:73-136).
_MOJIBAKE = {
    "Ã¡": "á", "Ã¢": "â", "Ã£": "ã", "Ã ": "à",
    "Ã©": "é", "Ãª": "ê", "Ã­": "í",
    "Ã³": "ó", "Ã´": "ô", "Ãµ": "õ",
    "Ãº": "ú", "Ã§": "ç",
    "Ã": "Á", "Ã‰": "É", "Ã“": "Ó", "Ãš": "Ú", "Ã‡": "Ç",
}


def fix_mojibake(col: Column | str) -> Column:
    """Chain of regexp_replace repairs for double-encoded pt-BR text."""
    out = _c(col).cast("string")
    for bad, good in _MOJIBAKE.items():
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out
