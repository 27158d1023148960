"""Enrichment clients (SURVEY.md §2.1 S11-S13): REST sources that
produce small dimension tables joined into facts (J1/J6).

Network access is isolated behind an injectable ``transport`` callable
so every pipeline is testable offline and the retry/backoff policy is
engine code, not scattered per-script.  The resulting DataFrames are
broadcast-sized dims by construction (CNPJ registries, daily FX rates,
per-UF statistics) — the join side that matters at 100 TB is the fact,
never these.
"""

from .client import FixtureTransport, RestClient
from .cnpj import cnpj_lookup_df, extract_partners, normalize_cnpj_payload
from .ibge import sidra_per_capita_df
from .ptax import ptax_rates_df

__all__ = [
    "RestClient",
    "FixtureTransport",
    "normalize_cnpj_payload",
    "extract_partners",
    "cnpj_lookup_df",
    "ptax_rates_df",
    "sidra_per_capita_df",
]
