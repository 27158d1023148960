"""BACEN PTAX FX-rate source (S12 — ref: PTAX - Conversor de Moedas
BACEN.py:43-94).

One OData request per calendar year (the API caps ranges), mid-rate =
(buy+sell)/2 per quote, then the **daily mean** across intraday quotes
— the same grain the reference loads.  Output is a date-keyed rates
dim for the as-of enrichment join (J6 / q_asof_rate_enrichment).
"""

from __future__ import annotations

from collections import defaultdict
from datetime import date, datetime

from pyspark.sql import DataFrame, SparkSession

from .client import RestClient

URL_TEMPLATE = (
    "https://olinda.bcb.gov.br/olinda/servico/PTAX/versao/v1/odata/"
    "CotacaoMoedaPeriodo(moeda=@moeda,dataInicial=@ini,dataFinalCotacao=@fim)"
    "?@moeda='{currency}'&@ini='{start}'&@fim='{end}'&$format=json"
)

RATES_SCHEMA = "data date, moeda string, taxa double"


def _year_urls(currency: str, years: list[int]) -> list[str]:
    return [
        URL_TEMPLATE.format(
            currency=currency,
            start=f"01-01-{y}",
            end=f"12-31-{y}",
        )
        for y in years
    ]


def ptax_rates_df(
    spark: SparkSession, client: RestClient, currency: str, years: list[int]
) -> DataFrame:
    """Fetch per year (each with the client's retry policy), average
    intraday mid-rates per day, return the rates dim."""
    per_day: dict[tuple[date, str], list[float]] = defaultdict(list)
    for url in _year_urls(currency, years):
        payload = client.get(url)
        if not isinstance(payload, dict):
            continue
        for quote in payload.get("value", []):
            try:
                d = datetime.strptime(
                    str(quote["dataHoraCotacao"])[:10], "%Y-%m-%d"
                ).date()
                mid = (float(quote["cotacaoCompra"]) + float(quote["cotacaoVenda"])) / 2
            except (KeyError, ValueError, TypeError):
                continue
            per_day[(d, currency)].append(mid)
    rows = [
        {"data": d, "moeda": cur, "taxa": round(sum(v) / len(v), 6)}
        for (d, cur), v in sorted(per_day.items())
    ]
    return spark.createDataFrame(rows or [], schema=RATES_SCHEMA)
