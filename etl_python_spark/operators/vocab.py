"""Corpus vocabulary statistics over the ``documents`` table.

`zipf_vocab_stats` is the corpus-health report a tokenizer/LM pipeline
runs before training: per-source token totals, vocabulary size,
type-token ratio, and the Zipf slope fitted over the top-K token
frequencies (natural text sits near slope -1; a corpus of boilerplate
or spam drifts far from it).  Reference anchor: the EDA family
(`EDA - Faturamento.py`, `Algoritmo de Dados (Aprimorado).py`) profiles
distributions before modeling; this is that pass for text corpora.

Exactness: token counts are exact integers; both log axes of the
Zipf fit are floor-quantized to integer micro-units BEFORE the moment
sums (ln of an exact integer is one correctly-rounded double in any
IEEE engine), so the OLS slope comes from exact BIGINT moments with
ONE final division — the engine-parity recipe the stats family uses
throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread

ZIPF_TOP_K = 100


def q_zipf_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary report: total tokens, distinct tokens,
    type-token ratio (micro-quantized), and the Zipf log-log slope
    over the top-K token frequencies (ties broken by token string so
    both engines rank identically).

    Scale shape: ONE explode + map-side-combined (source, token)
    aggregate does all data-sized work; the rank window runs over the
    vocabulary-sized relation partitioned per source, and the moment
    aggregate reduces each source's top-K to one row.  Nothing
    collects to the driver.
    """
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tok = (
        docs.select("source", F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.groupBy("source").agg(
        F.sum("cnt").alias("total_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("tok")
    )
    top = counts.select(
        "source",
        "cnt",
        F.row_number().over(w_rank).alias("rank"),
    ).filter(F.col("rank") <= ZIPF_TOP_K)
    x = F.floor(F.log(F.col("rank").cast("double")) * 1e6 + F.lit(0.5)).cast(
        "long"
    )
    y = F.floor(F.log(F.col("cnt").cast("double")) * 1e6 + F.lit(0.5)).cast(
        "long"
    )
    moments = top.select("source", x.alias("x"), y.alias("y")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope_micro = F.floor(
        (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        / F.nullif(
            (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            ),
            F.lit(0.0),
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    ttr_micro = F.floor(
        F.col("distinct_tokens").cast("double")
        / F.col("total_tokens").cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    return totals.join(moments, "source").select(
        "source",
        "total_tokens",
        "distinct_tokens",
        ttr_micro.alias("ttr_micro"),
        F.col("k").alias("zipf_k"),
        slope_micro.alias("zipf_slope_micro"),
    )


ORACLE_ZIPF = f"""
WITH tok AS (
  SELECT source, t.tok
  FROM documents,
       LATERAL (
         SELECT UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+'))
           AS tok
       ) t
  WHERE t.tok <> ''
), counts AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1, 2
), totals AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS distinct_tokens
  FROM counts GROUP BY 1
), top AS (
  SELECT source, cnt,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY cnt DESC, tok) AS rank
  FROM counts QUALIFY rank <= {ZIPF_TOP_K}
), xy AS (
  SELECT source,
         CAST(FLOOR(LN(CAST(rank AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(LN(CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
  FROM top
), moments AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM xy GROUP BY 1
)
SELECT t.source, t.total_tokens, t.distinct_tokens,
       CAST(FLOOR(CAST(t.distinct_tokens AS DOUBLE)
                  / CAST(t.total_tokens AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
         AS ttr_micro,
       m.k AS zipf_k,
       CAST(FLOOR(CAST(m.k * m.sxy - m.sx * m.sy AS DOUBLE)
                  / NULLIF(CAST(m.k * m.sxx - m.sx * m.sx AS DOUBLE), 0.0)
                  * 1e6 + 0.5) AS BIGINT) AS zipf_slope_micro
FROM totals t JOIN moments m USING (source)
"""


QUERIES = {
    "zipf_vocab_stats": q_zipf_vocab_stats,
}

ORACLES = {
    "zipf_vocab_stats": ORACLE_ZIPF,
}
