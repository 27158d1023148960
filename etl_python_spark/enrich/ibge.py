"""IBGE SIDRA statistical source (S13 — ref: API Extrator Renda Per
Capita - IBGE.py:36-127).

SIDRA responses put the header in row 0 (``df.columns = df.iloc[0]``
in the reference) — here the promotion happens on the parsed JSON
before any DataFrame exists.  One request per UF, results unioned with
the UF as lineage column (the S2 multi-partition pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .client import RestClient

URL_TEMPLATE = (
    "https://apisidra.ibge.gov.br/values/t/{table}/n6/all/v/{variable}/p/last"
    "?localidades=N3[{uf}]"
)

SIDRA_SCHEMA = "uf string, localidade string, valor double"


def promote_header(rows: list[dict]) -> list[dict]:
    """SIDRA's row 0 holds display names keyed by the same codes as the
    data rows; drop it and keep code-keyed records (the stable keys)."""
    return rows[1:] if rows else []


def sidra_per_capita_df(
    spark: SparkSession, client: RestClient, table: int, variable: int, ufs: list[str]
) -> DataFrame:
    """Per-UF fetch → header promotion → union with lineage column."""
    out = []
    for uf in ufs:
        payload = client.get(URL_TEMPLATE.format(table=table, variable=variable, uf=uf))
        if not isinstance(payload, list):
            continue
        for rec in promote_header(payload):
            try:
                out.append(
                    {
                        "uf": uf,
                        "localidade": str(rec.get("D1N") or rec.get("localidade")),
                        "valor": float(str(rec.get("V")).replace(",", ".")),
                    }
                )
            except (TypeError, ValueError):
                continue
    return spark.createDataFrame(out or [], schema=SIDRA_SCHEMA)
