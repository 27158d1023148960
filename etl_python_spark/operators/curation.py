"""Corpus-curation operators, part two: exact passage-level dedup,
PII scrubbing, and token-budget mixture sampling.

Training-data extension surface (SURVEY.md §7.8) beyond the reference
inventory; the closest reference analogues are its text-clean scalar
helpers (`CRM - Algorítimo de Limpeza e Edição de Dados.py`,
`ETL - CRM.py:35-52`) and blacklist filtering
(`scripts_sql/PainelSDR_Report.sql:33,52`), which stop at whole-row
operations.
These three operators act *inside* the value: duplicated passages,
embedded identifiers, and per-source token budgets.

All three are pure Catalyst expression pipelines with engine-agnostic
hashing, so DuckDB restates them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread
from .dedup import _norm_text, hash60, sql_hash60

# ---------------------------------------------------------------------------
# Exact passage dedup (duplicated k-gram occurrences, keep-first).
#
# The dedup ladder in dedup.py decides about whole documents; this
# operator finds *repeated passages* — every positional word-k-gram
# whose exact text already occurred earlier in the corpus (earlier
# doc, or earlier position in the same doc).  A doc whose text is
# mostly such re-runs is boilerplate and is dropped.  This is the
# counting half of exact-substring training-data dedup; the reference
# has no analogue (its pandas dedup is drop_duplicates on whole rows).

PASSAGE_K = 8
# Positional ordinal = doc_id * ORD_BASE + pos.  Caps documents at
# ~1.07e9 tokens and doc_ids at ~8.6e9 before BIGINT overflow — far
# beyond any real corpus row; a doc over the cap should be chunked
# upstream (rolling_chunks) anyway.
ORD_BASE = 1 << 30
DUP_FRAC_MAX = 0.5


def _positional_grams(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, gh): every positional word-k-gram, 60-bit hashed.

    Unlike corpus._kgrams this keeps positions and does NOT dedupe —
    occurrence counts are the point.  Docs shorter than k contribute
    one whole-text gram at pos 1 (same fallback rule as the shingler).
    The token array materializes in its own projection so the
    higher-order-function lambda never re-splits per element.
    """
    toked = spread(docs, "doc_id").select(
        "doc_id",
        F.split(_norm_text(F.coalesce(F.col("text"), F.lit(""))), " ").alias("toks"),
    )
    n = F.size(F.col("toks"))
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, k))
    )
    return toked.select(
        "doc_id", F.posexplode(grams).alias("pos0", "g")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        hash60(F.col("g")).alias("gh"),
    )


def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-passage stats + keep/drop decision.

    An occurrence (doc, pos) of a k-gram is *duplicate* iff the same
    gram text occurred at a smaller (doc_id, pos) — corpus order,
    keep-first.  Emits n_grams / dup_grams / dup_frac and
    ``keep = dup_frac <= DUP_FRAC_MAX``.

    Scale shape: min-aggregate per gram hash (map-side partial combine
    — each input split pre-collapses its local occurrences before the
    shuffle), then one hash join of occurrences against the first-seen
    table and one final agg by doc_id.  No window sort over the gram
    stream, no collect; skewed grams (stopword runs) land on AQE's
    skew-join splitting.  ~3 shuffles total, all keyed.
    """
    occ = _positional_grams(
        load_table(spark, sf_dir, "documents"), PASSAGE_K
    ).withColumn("ordpos", F.col("doc_id") * ORD_BASE + F.col("pos"))
    firsts = occ.groupBy("gh").agg(F.min("ordpos").alias("first_ord"))
    per_doc = (
        occ.join(firsts, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.sum((F.col("ordpos") != F.col("first_ord")).cast("int"))
            .cast("int")
            .alias("dup_grams"),
        )
    )
    dup_frac = F.col("dup_grams") / F.col("n_grams")
    return per_doc.select(
        "doc_id",
        "n_grams",
        "dup_grams",
        F.round(dup_frac, 4).alias("dup_frac"),
        (dup_frac <= DUP_FRAC_MAX).alias("keep"),
    )


ORACLE_PASSAGE_DEDUP = f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(coalesce(text,''))), '\\s+', ' ', 'g') AS t
  FROM documents
), toks AS (
  SELECT doc_id, string_split(t, ' ') AS w, t FROM norm
), occ AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) >= {PASSAGE_K}
                THEN range(1, len(w) - {PASSAGE_K} + 2)
                ELSE [CAST(1 AS BIGINT)] END) AS pos,
         unnest(CASE WHEN len(w) >= {PASSAGE_K}
                THEN list_transform(range(1, len(w) - {PASSAGE_K} + 2),
                                    i -> array_to_string(w[i:i+{PASSAGE_K}-1], ' '))
                ELSE [t] END) AS g
  FROM toks
), hashed AS (
  SELECT doc_id, {sql_hash60("g")} AS gh,
         doc_id * {ORD_BASE} + pos AS ordpos
  FROM occ
), firsts AS (
  SELECT gh, min(ordpos) AS first_ord FROM hashed GROUP BY gh
), per_doc AS (
  SELECT h.doc_id,
         COUNT(*) AS n_grams,
         SUM(CASE WHEN h.ordpos != f.first_ord THEN 1 ELSE 0 END) AS dup_grams
  FROM hashed h JOIN firsts f USING (gh)
  GROUP BY h.doc_id
)
SELECT doc_id,
       CAST(n_grams AS INT) AS n_grams,
       CAST(dup_grams AS INT) AS dup_grams,
       ROUND(CAST(dup_grams AS DOUBLE) / n_grams, 4) AS dup_frac,
       CAST(dup_grams AS DOUBLE) / n_grams <= {DUP_FRAC_MAX} AS keep
FROM per_doc
"""


def q_passage_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of exact passage dedup: every token covered by
    a *duplicate* k-gram occurrence (see :func:`q_passage_dedup`) is
    dropped and the survivors are reassembled in order.  Emits
    n_tokens / n_removed and the cleaned text ('' when the whole doc
    was a re-run).

    Scale shape: duplicate-start flags land on the token stream via a
    doc+pos-keyed left join, and coverage is one window
    ``max(flag) RANGE k-1 PRECEDING`` per doc ordered by pos — no
    per-token scan of the duplicate list, no interval self-join.  The
    reassembly is a doc-keyed sort_array(collect_list) aggregate, the
    same bounded-by-doc-size buffer every string re-aggregation has.
    """
    docs = load_table(spark, sf_dir, "documents")
    occ = _positional_grams(docs, PASSAGE_K).withColumn(
        "ordpos", F.col("doc_id") * ORD_BASE + F.col("pos")
    )
    firsts = occ.groupBy("gh").agg(F.min("ordpos").alias("first_ord"))
    dup_starts = (
        occ.join(firsts, "gh")
        .filter(F.col("ordpos") != F.col("first_ord"))
        .select("doc_id", "pos", F.lit(1).alias("dup_start"))
    )

    toked = spread(docs, "doc_id").select(
        "doc_id",
        F.split(_norm_text(F.coalesce(F.col("text"), F.lit(""))), " ").alias("toks"),
    )
    tokens = toked.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")

    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rangeBetween(-(PASSAGE_K - 1), 0)
    )
    flagged = tokens.join(dup_starts, ["doc_id", "pos"], "left").withColumn(
        "covered", F.max(F.coalesce(F.col("dup_start"), F.lit(0))).over(w)
    )
    cleaned = (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum("covered").cast("int").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("covered") == 0,
                                F.struct("pos", "tok"),
                            )
                        )
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )
    return cleaned


ORACLE_PASSAGE_SCRUB = f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(coalesce(text,''))), '\\s+', ' ', 'g') AS t
  FROM documents
), toks AS (
  SELECT doc_id, string_split(t, ' ') AS w, t FROM norm
), occ AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) >= {PASSAGE_K}
                THEN range(1, len(w) - {PASSAGE_K} + 2)
                ELSE [CAST(1 AS BIGINT)] END) AS pos,
         unnest(CASE WHEN len(w) >= {PASSAGE_K}
                THEN list_transform(range(1, len(w) - {PASSAGE_K} + 2),
                                    i -> array_to_string(w[i:i+{PASSAGE_K}-1], ' '))
                ELSE [t] END) AS g
  FROM toks
), hashed AS (
  SELECT doc_id, pos, {sql_hash60("g")} AS gh,
         doc_id * {ORD_BASE} + pos AS ordpos
  FROM occ
), firsts AS (
  SELECT gh, min(ordpos) AS first_ord FROM hashed GROUP BY gh
), dup_starts AS (
  SELECT h.doc_id, h.pos, 1 AS dup_start
  FROM hashed h JOIN firsts f USING (gh)
  WHERE h.ordpos != f.first_ord
), tokens AS (
  SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos,
         unnest(w) AS tok
  FROM toks
), flagged AS (
  SELECT t.doc_id, t.pos, t.tok,
         MAX(COALESCE(d.dup_start, 0)) OVER (
           PARTITION BY t.doc_id ORDER BY t.pos
           RANGE BETWEEN {PASSAGE_K - 1} PRECEDING AND CURRENT ROW
         ) AS covered
  FROM tokens t LEFT JOIN dup_starts d
    ON t.doc_id = d.doc_id AND t.pos = d.pos
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_tokens,
       CAST(SUM(covered) AS INT) AS n_removed,
       COALESCE(string_agg(CASE WHEN covered = 0 THEN tok END, ' ' ORDER BY pos), '')
         AS cleaned_text
FROM flagged
GROUP BY doc_id
"""


def q_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-substring spans per document — the reporting
    half of exact substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": emit the removable
    ranges, don't just score the doc).  A duplicate k-gram occurrence
    covers tokens [pos, pos+k-1]; overlapping/adjacent covers merge
    into one span (classic gaps-and-islands: a new island starts when
    the gap to the previous duplicate start exceeds k).  Emits one row
    per span with its token range, clamped to the document length.

    Scale shape: the duplicate-start stream reuses passage_dedup's
    min-aggregate + hash-join pipeline (map-side partial combine, no
    window over the full gram stream); islands are two doc-keyed
    windows over only the DUPLICATE starts (a small fraction of the
    corpus) plus one groupBy — every stage keyed by doc_id, nothing
    quadratic, no interval self-join.
    """
    return duplicated_spans(load_table(spark, sf_dir, "documents"))


def duplicated_spans(docs: DataFrame) -> DataFrame:
    """Core of :func:`q_substring_spans` over any (doc_id, text)
    relation — kept separate so the island semantics are unit-testable
    on constructed corpora."""
    occ = _positional_grams(docs, PASSAGE_K).withColumn(
        "ordpos", F.col("doc_id") * ORD_BASE + F.col("pos")
    )
    firsts = occ.groupBy("gh").agg(F.min("ordpos").alias("first_ord"))
    dup_starts = (
        occ.join(firsts, "gh")
        .filter(F.col("ordpos") != F.col("first_ord"))
        .select("doc_id", "pos")
    )

    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = dup_starts.withColumn(
        "brk",
        F.coalesce(
            (F.col("pos") - F.lag("pos", 1).over(w) > PASSAGE_K).cast("int"),
            F.lit(1),
        ),
    ).withColumn(
        "span_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )

    n_tokens = spread(docs, "doc_id").select(
        "doc_id",
        F.size(
            F.split(_norm_text(F.coalesce(F.col("text"), F.lit(""))), " ")
        ).alias("n_tokens"),
    )
    return (
        islands.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").cast("int").alias("start_pos"),
            (F.max("pos") + PASSAGE_K - 1).alias("end_raw"),
            F.count(F.lit(1)).cast("int").alias("n_dup_grams"),
        )
        .join(n_tokens, "doc_id")
        .select(
            "doc_id",
            "span_id",
            "start_pos",
            F.least(F.col("end_raw"), F.col("n_tokens")).cast("int").alias("end_pos"),
            (
                F.least(F.col("end_raw"), F.col("n_tokens"))
                - F.col("start_pos")
                + 1
            ).cast("int").alias("span_tokens"),
            "n_dup_grams",
        )
    )


ORACLE_SUBSTRING_SPANS = f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(coalesce(text,''))), '\\s+', ' ', 'g') AS t
  FROM documents
), toks AS (
  SELECT doc_id, string_split(t, ' ') AS w, t FROM norm
), occ AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) >= {PASSAGE_K}
                THEN range(1, len(w) - {PASSAGE_K} + 2)
                ELSE [CAST(1 AS BIGINT)] END) AS pos,
         unnest(CASE WHEN len(w) >= {PASSAGE_K}
                THEN list_transform(range(1, len(w) - {PASSAGE_K} + 2),
                                    i -> array_to_string(w[i:i+{PASSAGE_K}-1], ' '))
                ELSE [t] END) AS g
  FROM toks
), hashed AS (
  SELECT doc_id, pos, {sql_hash60("g")} AS gh,
         doc_id * {ORD_BASE} + pos AS ordpos
  FROM occ
), firsts AS (
  SELECT gh, min(ordpos) AS first_ord FROM hashed GROUP BY gh
), dup_starts AS (
  SELECT h.doc_id, h.pos
  FROM hashed h JOIN firsts f USING (gh)
  WHERE h.ordpos != f.first_ord
), islands AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev_pos IS NULL OR pos - prev_pos > {PASSAGE_K}
             THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS span_id
  FROM (
    SELECT doc_id, pos,
           LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev_pos
    FROM dup_starts
  )
), n_tok AS (
  SELECT doc_id, len(w) AS n_tokens FROM toks
)
SELECT i.doc_id,
       CAST(i.span_id AS INT) AS span_id,
       CAST(MIN(i.pos) AS INT) AS start_pos,
       CAST(LEAST(MAX(i.pos) + {PASSAGE_K} - 1, ANY_VALUE(n.n_tokens)) AS INT)
         AS end_pos,
       CAST(LEAST(MAX(i.pos) + {PASSAGE_K} - 1, ANY_VALUE(n.n_tokens))
            - MIN(i.pos) + 1 AS INT) AS span_tokens,
       CAST(COUNT(*) AS INT) AS n_dup_grams
FROM islands i JOIN n_tok n USING (doc_id)
GROUP BY i.doc_id, i.span_id
"""


# ---------------------------------------------------------------------------
# PII scrubbing: mask embedded numeric identifiers.
#
# Standard pre-training scrub: any digit run of PII_MIN_RUN+ characters
# is an identifier (account number, document id, phone); mask it but
# keep the last 2 digits for joinability audits.  Patterns are kept to
# the RE2-compatible subset (no lookaround) so the Spark (java.util
# .regex) and DuckDB (RE2) executions are textually provable equal —
# greedy '{4,}' quantifiers resolve identically in both.

PII_MIN_RUN = 6
# '[0-9]{4,}([0-9]{2})': >=6-digit run, greedy head + captured last 2.
_ID_MASK_PATTERN = r"[0-9]{4,}([0-9]{2})"
_ID_RUN_PATTERN = r"[0-9]{6,}"
_MASK = "###"


def mask_numeric_ids(col, keep_tail: bool = True):
    """Column expr: every >=6-digit run becomes '###' (+ its last two
    digits when keep_tail).  Reusable scrubber for any string column."""
    if keep_tail:
        return F.regexp_replace(col, _ID_MASK_PATTERN, f"{_MASK}$1")
    return F.regexp_replace(col, _ID_RUN_PATTERN, _MASK)


def q_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrub numeric identifiers from customer names.

    Emits the masked value plus audit columns: how many id runs were
    masked, total digit count, and whether the row carried any long id.

    Scale shape: stateless per-row regex projections — zero shuffle,
    composes with scan pushdown, stable under repartitioning.
    """
    cust = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    # split with limit -1 keeps trailing empties — matches DuckDB's
    # regexp_split_to_array, so run counting agrees between engines
    n_runs = (F.size(F.split(name, _ID_RUN_PATTERN, -1)) - 1).cast("int")
    n_digits = (
        F.length(name) - F.length(F.regexp_replace(name, r"[0-9]", ""))
    ).cast("int")
    return cust.select(
        "c_custkey",
        mask_numeric_ids(name).alias("masked_name"),
        n_runs.alias("n_id_runs"),
        n_digits.alias("n_digits"),
        (n_runs > 0).alias("has_long_id"),
    )


ORACLE_PII_MASK = f"""
SELECT c_custkey,
       regexp_replace(c_name, '{_ID_MASK_PATTERN}', '{_MASK}\\1', 'g') AS masked_name,
       CAST(len(regexp_split_to_array(c_name, '{_ID_RUN_PATTERN}')) - 1 AS INT) AS n_id_runs,
       CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS INT) AS n_digits,
       len(regexp_split_to_array(c_name, '{_ID_RUN_PATTERN}')) - 1 > 0 AS has_long_id
FROM customer
"""


# ---------------------------------------------------------------------------
# Token-budget mixture sampling.
#
# Corpus mixing by token budget rather than row rate (the complement
# of sample_stratified): each source contributes at most a fixed token
# budget, filled greedily in deterministic hash-priority order.  The
# budget is split across fixed shards so every (source, shard) window
# is independent — the 100 TB shape, where a single per-source cumsum
# would serialize one reducer per source.

MIX_SHARDS = 8
MIX_BUDGET_PER_SHARD = 100  # tokens; total per source = 8 * 100


def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-(source, shard) token-budget fill.

    Docs are ordered by an engine-agnostic hash priority (salted so it
    is independent of the shard hash); a doc is kept while the budget
    has room *before* it — so the first doc of a shard is always kept
    even if it alone overflows the budget (standard greedy fill).

    Scale shape: one window shuffle keyed by (source, shard); shards
    bound each partition's sort to corpus_size / (sources * shards)
    regardless of source skew.  Tokens are whitespace-word counts
    (token_count's cheap path).
    """
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tok = F.size(F.split(_norm_text(F.coalesce(F.col("text"), F.lit(""))), " "))
    sized = docs.select(
        "doc_id",
        "source",
        tok.cast("int").alias("n_tokens"),
        (hash60(F.col("doc_id").cast("string")) % MIX_SHARDS).cast("int").alias("shard"),
        hash60(F.concat(F.lit("prio|"), F.col("doc_id").cast("string"))).alias("prio"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("prio", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return sized.select(
        "doc_id",
        "source",
        "shard",
        "n_tokens",
        cum.cast("long").alias("cum_tokens"),
        ((cum - F.col("n_tokens")) < MIX_BUDGET_PER_SHARD).alias("keep"),
    )


ORACLE_TOKEN_BUDGET_MIX = f"""
WITH sized AS (
  SELECT doc_id, source,
         len(string_split(regexp_replace(lower(trim(coalesce(text,''))), '\\s+', ' ', 'g'), ' ')) AS n_tokens,
         {sql_hash60("CAST(doc_id AS VARCHAR)")} % {MIX_SHARDS} AS shard,
         {sql_hash60("'prio|' || CAST(doc_id AS VARCHAR)")} AS prio
  FROM documents
), filled AS (
  SELECT doc_id, source, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY prio, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM sized
)
SELECT doc_id, source, CAST(shard AS INT) AS shard, CAST(n_tokens AS INT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       cum_tokens - n_tokens < {MIX_BUDGET_PER_SHARD} AS keep
FROM filled
"""


# ---------------------------------------------------------------------------
# The composed end-to-end curation pipeline: the order a real corpus
# run applies the stages, with the FIRST failing stage as the per-doc
# reason.  Every stage is one of the already-oracled operators, and
# the oracle composes their oracle SQL verbatim as subqueries — the
# composition itself is what this query verifies.


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc final curation decision: benchmark holdout → quality
    rules → passage-level dedup → 13-gram decontamination → stratified
    sampling; ``stage`` names the first stage that rejected the doc
    ('kept' if none did).

    Scale shape: inherits each component's audited plan (they are
    called, not re-derived); the composition adds only doc_id-keyed
    joins, which at lake scale co-locate on the corpus partitioning.
    """
    from .corpus import BENCH_MOD, q_decontaminate, q_sample_stratified
    from .text import q_quality_filter

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ql = q_quality_filter(spark, sf_dir).select("doc_id", F.col("manter").alias("q_ok"))
    pdp = q_passage_dedup(spark, sf_dir).select("doc_id", F.col("keep").alias("d_ok"))
    dec = q_decontaminate(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("contaminated")
    )
    smp = q_sample_stratified(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("sampled")
    )
    joined = (
        docs.join(ql, "doc_id")
        .join(pdp, "doc_id")
        .join(dec, "doc_id", "left")
        .join(smp, "doc_id", "left")
    )
    stage = (
        F.when(F.col("doc_id") % BENCH_MOD == 0, F.lit("benchmark"))
        .when(~F.col("q_ok"), F.lit("quality"))
        .when(~F.col("d_ok"), F.lit("duplicate"))
        .when(F.coalesce(F.col("contaminated"), F.lit(False)), F.lit("contaminated"))
        .when(F.col("sampled").isNull(), F.lit("sampled_out"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(
        "doc_id", stage.alias("stage"), (stage == "kept").alias("manter")
    )


def _oracle_curation_pipeline() -> str:
    from .corpus import (
        BENCH_MOD,
        ORACLE_DECONTAMINATE,
        ORACLE_SAMPLE_STRATIFIED,
    )
    from .text import ORACLE_QUALITY_FILTER

    return f"""
WITH ql AS ({ORACLE_QUALITY_FILTER}),
pdp AS ({ORACLE_PASSAGE_DEDUP}),
dec AS ({ORACLE_DECONTAMINATE}),
smp AS ({ORACLE_SAMPLE_STRATIFIED}),
staged AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {BENCH_MOD} = 0 THEN 'benchmark'
              WHEN NOT ql.manter THEN 'quality'
              WHEN NOT pdp.keep THEN 'duplicate'
              WHEN dec.doc_id IS NOT NULL THEN 'contaminated'
              WHEN smp.doc_id IS NULL THEN 'sampled_out'
              ELSE 'kept' END AS stage
  FROM documents d
  JOIN ql ON d.doc_id = ql.doc_id
  JOIN pdp ON d.doc_id = pdp.doc_id
  LEFT JOIN dec ON d.doc_id = dec.doc_id
  LEFT JOIN smp ON d.doc_id = smp.doc_id
)
SELECT doc_id, stage, stage = 'kept' AS manter FROM staged
"""


def q_dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate contamination matrix: for every
    unordered source pair, how many near-dup pairs (exact Jaccard,
    the dedup.py ladder) span it, plus each source's total dup
    involvement share — the report that tells a curation pipeline
    WHICH feeds re-publish each other before it picks per-source
    sampling weights.

    Scale shape: the pair graph (orders of magnitude below the
    corpus) joins the doc→source map twice; the map is projected to
    two columns so at lake scale it broadcasts or co-locates on
    doc_id, and the matrix aggregate runs on source²-bounded rows.
    Sources are canonically ordered (src_a <= src_b) so the matrix is
    upper-triangular with within-source pairs on the diagonal."""
    from .dedup import dedup_pairs

    pairs = dedup_pairs(spark, sf_dir)
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
    )
    sb = src.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
    )
    labeled = pairs.join(sa, "doc_a").join(sb, "doc_b")
    matrix = (
        labeled.select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    total = Window.partitionBy()
    return matrix.select(
        "src_a",
        "src_b",
        "n_pairs",
        (F.col("src_a") == F.col("src_b")).alias("within"),
        F.floor(
            F.col("n_pairs").cast("double")
            / F.sum("n_pairs").over(total).cast("double")
            * 1e6
            + F.lit(0.5)
        ).cast("long").alias("share_micro"),
    )


def _oracle_dedup_source_matrix() -> str:
    from .dedup import _SQL_PAIRS_BODY

    return (
        "WITH "
        + _SQL_PAIRS_BODY
        + """
, labeled AS (
  SELECT LEAST(da.source, db.source) AS src_a,
         GREATEST(da.source, db.source) AS src_b
  FROM pairs p
  JOIN documents da ON p.doc_a = da.doc_id
  JOIN documents db ON p.doc_b = db.doc_id
), matrix AS (
  SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM labeled GROUP BY 1, 2
)
SELECT src_a, src_b, n_pairs, src_a = src_b AS within,
       CAST(FLOOR(CAST(n_pairs AS DOUBLE)
                  / CAST(SUM(n_pairs) OVER () AS DOUBLE) * 1e6 + 0.5)
            AS BIGINT) AS share_micro
FROM matrix
"""
    )


QUERIES = {
    "dedup_source_matrix": q_dedup_source_matrix,
    "passage_dedup": q_passage_dedup,
    "passage_scrub": q_passage_scrub,
    "substring_spans": q_substring_spans,
    "pii_mask": q_pii_mask,
    "token_budget_mix": q_token_budget_mix,
    "curation_pipeline": q_curation_pipeline,
}

ORACLES = {
    "dedup_source_matrix": _oracle_dedup_source_matrix(),
    "passage_dedup": ORACLE_PASSAGE_DEDUP,
    "passage_scrub": ORACLE_PASSAGE_SCRUB,
    "substring_spans": ORACLE_SUBSTRING_SPANS,
    "pii_mask": ORACLE_PII_MASK,
    "token_budget_mix": ORACLE_TOKEN_BUDGET_MIX,
}
ORACLES["curation_pipeline"] = _oracle_curation_pipeline()
