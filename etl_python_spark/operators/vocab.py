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
    aggregate does all data-sized work; the top-K rank is a
    WindowGroupLimit-pruned `row_number() <= K` (each map task keeps
    its local top-K per source before the exchange) so no task ever
    sorts a whole source's vocabulary, and the moment aggregate
    reduces each source's top-K to one row.  Nothing collects to the
    driver.
    """
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tok = (
        docs.select("source", F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
    )
    # vocabulary-sized; the totals aggregate and the rank window both
    # read it — checkpoint so the explode + (source, tok) aggregate
    # runs once.
    counts = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=True)
    totals = counts.groupBy("source").agg(
        F.sum("cnt").alias("total_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
    )
    # Single rank-limit window (r17, reverting r16's salted two-phase):
    # `row_number() <= K` plans as WindowGroupLimit Partial/Final, so
    # every map task prunes to its local top-K per source BEFORE the
    # exchange — the reducer sorts <= #map_tasks*K rows per source,
    # never a whole source's vocabulary.  The salt stage duplicated
    # that map-side prune for the price of one extra exchange + sort
    # (r16 verdict item 4: the before-plan already carried
    # WindowGroupLimit Partial).
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


def q_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth fit per source: V(N) ~ k * N^beta
    over the corpus in doc_id ingestion order (natural text sits near
    beta 0.4-0.8; beta ~ 1 means near-random tokens — a tokenizer or
    contamination smell).  The growth curve is computed WITHOUT any
    distinct-so-far scan: a token contributes a new type exactly at
    its first document (min doc_id), so per-doc new-type counts are
    one aggregate and the curve is a cumulative sum — O(corpus), not
    O(corpus x prefix).

    Exactness: the log-log fit quantizes both axes to integer
    micro-units per curve point, then accumulates the OLS moments in
    DECIMAL(38,0) (x^2 sums overflow BIGINT past ~50k curve points)
    with ONE final division.

    Scale shape: one explode + two map-side-combined aggregates do
    all data-sized work; the cumulative window and the fit run over
    the docs-sized curve partitioned per source.
    """
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    tok = (
        docs.select("source", "doc_id", F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
    )
    # ONE explode + (source, doc, tok) aggregate serves both downstream
    # aggregates (first-occurrence and per-doc token counts) — the
    # previous shape exploded the token stream twice.  min(doc_id) over
    # per-doc groups == min over raw rows, and sum(cnt) == count(*),
    # so both results are identical.
    g = (
        tok.groupBy("source", "doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    first = g.groupBy("source", "tok").agg(
        F.min("doc_id").alias("first_doc")
    )
    new_types = first.groupBy(
        "source", F.col("first_doc").alias("doc_id")
    ).agg(F.count(F.lit(1)).alias("new_types"))
    per_doc = g.groupBy("source", "doc_id").agg(
        F.sum("cnt").alias("n_toks")
    )
    curve_in = per_doc.join(new_types, ["source", "doc_id"], "left").select(
        "source",
        "doc_id",
        "n_toks",
        F.coalesce("new_types", F.lit(0)).alias("new_types"),
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = curve_in.select(
        "source",
        F.sum("n_toks").over(w_cum).alias("n_cum"),
        F.sum("new_types").over(w_cum).alias("v_cum"),
    )
    x = F.floor(
        F.log(F.col("n_cum").cast("double")) * 1e6 + F.lit(0.5)
    ).cast("long")
    y = F.floor(
        F.log(F.col("v_cum").cast("double")) * 1e6 + F.lit(0.5)
    ).cast("long")
    dec = "decimal(38,0)"
    moments = curve.select(
        "source", "n_cum", "v_cum", x.alias("x"), y.alias("y")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("pts"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.max("n_cum").alias("total_tokens"),
        F.max("v_cum").alias("vocab_size"),
    )
    pts = F.col("pts").cast(dec)
    num = (pts * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.nullif(
        (pts * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
        F.lit(0.0),
    )
    beta_micro = F.floor(num / den * F.lit(1e6) + F.lit(0.5)).cast("long")
    # intercept ln(k) = (sy - beta*sx) / pts, from the SAME quantized
    # beta so both engines subtract identical values
    logk_micro = F.floor(
        (
            F.col("sy").cast("double")
            - beta_micro.cast("double") / F.lit(1e6) * F.col("sx").cast("double")
        )
        / F.col("pts").cast("double")
        + F.lit(0.5)
    ).cast("long")
    return moments.select(
        "source",
        F.col("pts").alias("docs"),
        "total_tokens",
        "vocab_size",
        beta_micro.alias("heaps_beta_micro"),
        logk_micro.alias("heaps_logk_micro"),
    )


ORACLE_HEAPS = """
WITH tok AS (
  SELECT source, doc_id, t.tok
  FROM documents,
       LATERAL (
         SELECT UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+'))
           AS tok
       ) t
  WHERE t.tok <> ''
), first AS (
  SELECT source, tok, MIN(doc_id) AS first_doc
  FROM tok GROUP BY 1, 2
), new_types AS (
  SELECT source, first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_types
  FROM first GROUP BY 1, 2
), per_doc AS (
  SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
  FROM tok GROUP BY 1, 2
), curve AS (
  SELECT p.source,
         CAST(SUM(p.n_toks) OVER w AS BIGINT) AS n_cum,
         CAST(SUM(COALESCE(n.new_types, 0)) OVER w AS BIGINT) AS v_cum
  FROM per_doc p LEFT JOIN new_types n USING (source, doc_id)
  WINDOW w AS (PARTITION BY p.source ORDER BY p.doc_id
               ROWS UNBOUNDED PRECEDING)
), xy AS (
  SELECT source,
         CAST(FLOOR(LN(CAST(n_cum AS DOUBLE)) * 1e6 + 0.5) AS HUGEINT) AS x,
         CAST(FLOOR(LN(CAST(v_cum AS DOUBLE)) * 1e6 + 0.5) AS HUGEINT) AS y,
         n_cum, v_cum
  FROM curve
), moments AS (
  SELECT source, CAST(COUNT(*) AS HUGEINT) AS pts,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy,
         CAST(MAX(n_cum) AS BIGINT) AS total_tokens,
         CAST(MAX(v_cum) AS BIGINT) AS vocab_size
  FROM xy GROUP BY 1
), fit AS (
  SELECT *,
         CAST(FLOOR(CAST(pts * sxy - sx * sy AS DOUBLE)
                    / NULLIF(CAST(pts * sxx - sx * sx AS DOUBLE), 0.0)
                    * 1e6 + 0.5) AS BIGINT) AS heaps_beta_micro
  FROM moments
)
SELECT source,
       CAST(pts AS BIGINT) AS docs,
       total_tokens, vocab_size, heaps_beta_micro,
       CAST(FLOOR((CAST(sy AS DOUBLE)
                   - CAST(heaps_beta_micro AS DOUBLE) / 1e6
                     * CAST(sx AS DOUBLE))
                  / CAST(pts AS DOUBLE) + 0.5) AS BIGINT)
         AS heaps_logk_micro
FROM fit
"""


QUERIES = {
    "zipf_vocab_stats": q_zipf_vocab_stats,
    "heaps_vocab_growth": q_heaps_vocab_growth,
}

ORACLES = {
    "zipf_vocab_stats": ORACLE_ZIPF,
    "heaps_vocab_growth": ORACLE_HEAPS,
}
