"""CNPJ registry enrichment (S11 — ref: cnpj_core.py).

Two public registries queried in fallback order, variant key spellings
normalized with a ``pick``-over-aliases rule (ref: cnpj_core.py:251-256),
nested partner lists (``qsa``) flattened to rows (ref: :258-285).  The
fetch is driver-side — a CNPJ dim is broadcast-sized — and the result
lands as an ordinary DataFrame for a J1 broadcast enrichment join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.cleaning import digits_only  # noqa: F401  (join-side key prep)
from .client import RestClient

PROVIDER_URLS = (
    "https://publica.cnpj.ws/cnpj/{cnpj}",
    "https://brasilapi.com.br/api/cnpj/v1/{cnpj}",
)

# alias spellings per canonical field across providers
_ALIASES = {
    "razao_social": ["razao_social", "nome", "company.name"],
    "nome_fantasia": ["nome_fantasia", "fantasia", "alias"],
    "municipio": ["municipio", "cidade", "estabelecimento.cidade.nome"],
    "uf": ["uf", "estado", "estabelecimento.estado.sigla"],
    "situacao": ["situacao_cadastral", "situacao", "descricao_situacao_cadastral"],
}


def _dig(payload: object, dotted: str) -> object | None:
    cur = payload
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def pick(payload: dict, aliases: list[str]) -> object | None:
    """First non-null among candidate key spellings (supports dotted
    nesting)."""
    for key in aliases:
        val = _dig(payload, key)
        if val not in (None, ""):
            return val
    return None


def normalize_cnpj_payload(cnpj: str, payload: dict) -> dict:
    """Provider-agnostic flat record."""
    return {"cnpj": cnpj, **{f: pick(payload, a) for f, a in _ALIASES.items()}}


def extract_partners(cnpj: str, payload: dict) -> list[dict]:
    """Flatten the nested ``qsa`` partner list to one row per partner."""
    qsa = payload.get("qsa") or []
    out = []
    for p in qsa:
        if isinstance(p, dict):
            out.append(
                {
                    "cnpj": cnpj,
                    "socio": pick(p, ["nome", "nome_socio"]),
                    "qualificacao": pick(
                        p, ["qualificacao", "qual", "qualificacao_socio.descricao"]
                    ),
                }
            )
    return out


CNPJ_SCHEMA = "cnpj string, razao_social string, nome_fantasia string, municipio string, uf string, situacao string"
PARTNER_SCHEMA = "cnpj string, socio string, qualificacao string"


def cnpj_lookup_df(
    spark: SparkSession, client: RestClient, cnpjs: list[str]
) -> tuple[DataFrame, DataFrame]:
    """(companies_df, partners_df) for a batch of CNPJs.  Driver-side
    loop by design: the registry rate limit (~3 req/s) makes the fetch
    latency-bound, not compute-bound — parallelizing it across
    executors would just distribute the waiting and multiply the
    source's 429s.  The *join* against the 100 TB fact is where Spark
    earns its keep, and these outputs broadcast."""
    companies, partners = [], []
    for cnpj in cnpjs:
        payload = client.get_first([u.format(cnpj=cnpj) for u in PROVIDER_URLS])
        if payload is None:
            continue
        companies.append(normalize_cnpj_payload(cnpj, payload))
        partners.extend(extract_partners(cnpj, payload))
    return (
        spark.createDataFrame(companies or [], schema=CNPJ_SCHEMA),
        spark.createDataFrame(partners or [], schema=PARTNER_SCHEMA),
    )
