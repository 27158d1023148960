from .numeric import davg, dsum, ratio
from .cleaning import (
    cnpj_check_digit_ok,
    digits_only,
    format_brl,
    normalize_text,
    parse_brl,
)
from .dates import (
    MONTH_NAMES_PT,
    month_name_pt,
    month_number_from_pt,
    week_of_month,
)

__all__ = [
    "davg",
    "dsum",
    "ratio",
    "parse_brl",
    "format_brl",
    "digits_only",
    "normalize_text",
    "cnpj_check_digit_ok",
    "MONTH_NAMES_PT",
    "month_name_pt",
    "month_number_from_pt",
    "week_of_month",
]
