"""Enrichment clients offline: retry/backoff policy, provider
fallback, payload normalization, and the Spark dim outputs."""

import pytest

from etl_python_spark.enrich import (
    FixtureTransport,
    RestClient,
    cnpj_lookup_df,
    ptax_rates_df,
    sidra_per_capita_df,
)
from etl_python_spark.enrich.cnpj import extract_partners, normalize_cnpj_payload
from etl_python_spark.enrich.ptax import _year_urls


def _client(transport, **kw):
    sleeps = []
    c = RestClient(transport, sleep=sleeps.append, **kw)
    return c, sleeps


def test_retry_backoff_then_success():
    url = "https://x/1"
    calls = {"n": 0}

    def flaky(u):
        calls["n"] += 1
        return (503, None) if calls["n"] < 3 else (200, {"ok": 1})

    client, sleeps = _client(flaky)
    assert client.get(url) == {"ok": 1}
    assert calls["n"] == 3
    # pacing sleep before each try + exponential backoff between tries
    backoffs = [s for s in sleeps if s != client.pace_seconds]
    assert backoffs == [0.8, 1.6]


def test_retries_exhausted_raises():
    client, _ = _client(lambda u: (500, None), max_retries=2)
    with pytest.raises(RuntimeError, match="retries exhausted"):
        client.get("https://x/always-down")


def test_404_is_a_miss_not_an_error():
    client, _ = _client(FixtureTransport({}))
    assert client.get("https://x/nope") is None


def test_provider_fallback_order():
    t = FixtureTransport(
        {
            "https://a/11222333000181": (500, None),
            "https://b/11222333000181": (200, {"nome": "ACME"}),
        }
    )
    client = RestClient(t, max_retries=0, sleep=lambda s: None)
    payload = client.get_first(["https://a/11222333000181", "https://b/11222333000181"])
    assert payload == {"nome": "ACME"}
    assert t.calls == ["https://a/11222333000181", "https://b/11222333000181"]


def test_normalize_alias_keys_and_partners():
    payload = {
        "nome": "ACME LTDA",
        "fantasia": "ACME",
        "estabelecimento": {"cidade": {"nome": "CAMPINAS"}, "estado": {"sigla": "SP"}},
        "situacao": "ATIVA",
        "qsa": [{"nome": "ANA", "qual": "Sócia"}, {"nome_socio": "BETO"}],
    }
    rec = normalize_cnpj_payload("11222333000181", payload)
    assert rec["razao_social"] == "ACME LTDA"
    assert rec["municipio"] == "CAMPINAS"
    assert rec["uf"] == "SP"
    partners = extract_partners("11222333000181", payload)
    assert [p["socio"] for p in partners] == ["ANA", "BETO"]


def test_cnpj_lookup_df(spark):
    from etl_python_spark.enrich.cnpj import PROVIDER_URLS

    good = "11222333000181"
    t = FixtureTransport(
        {
            PROVIDER_URLS[0].format(cnpj=good): (
                200,
                {"razao_social": "ACME", "uf": "SP", "qsa": [{"nome": "ANA"}]},
            )
        }
    )
    client = RestClient(t, max_retries=0, sleep=lambda s: None)
    companies, partners = cnpj_lookup_df(spark, client, [good, "00000000000000"])
    rows = companies.collect()
    assert len(rows) == 1 and rows[0].razao_social == "ACME"
    assert partners.count() == 1


def test_ptax_daily_mean(spark):
    (url,) = _year_urls("USD", [2025])
    t = FixtureTransport(
        {
            url: (
                200,
                {
                    "value": [
                        {"dataHoraCotacao": "2025-03-10 10:00", "cotacaoCompra": 5.0, "cotacaoVenda": 5.2},
                        {"dataHoraCotacao": "2025-03-10 13:00", "cotacaoCompra": 5.2, "cotacaoVenda": 5.4},
                        {"dataHoraCotacao": "2025-03-11 10:00", "cotacaoCompra": 5.0, "cotacaoVenda": 5.0},
                        {"dataHoraCotacao": "bogus", "cotacaoCompra": "x", "cotacaoVenda": 1},
                    ]
                },
            )
        }
    )
    client = RestClient(t, max_retries=0, sleep=lambda s: None)
    df = ptax_rates_df(spark, client, "USD", [2025])
    rates = {str(r.data): r.taxa for r in df.collect()}
    assert rates == {"2025-03-10": 5.2, "2025-03-11": 5.0}


def test_sidra_header_promotion(spark):
    from etl_python_spark.enrich.ibge import URL_TEMPLATE

    url = URL_TEMPLATE.format(table=7435, variable=10824, uf="SP")
    t = FixtureTransport(
        {
            url: (
                200,
                [
                    {"D1N": "Localidade", "V": "Valor"},  # header row
                    {"D1N": "Campinas", "V": "1234,56"},
                    {"D1N": "Santos", "V": "999"},
                ],
            )
        }
    )
    client = RestClient(t, max_retries=0, sleep=lambda s: None)
    df = sidra_per_capita_df(spark, client, 7435, 10824, ["SP", "RJ"])
    rows = {r.localidade: r.valor for r in df.collect()}
    assert rows == {"Campinas": 1234.56, "Santos": 999.0}
