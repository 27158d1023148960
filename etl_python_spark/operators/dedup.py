"""Deduplication operators over the ``documents`` table.

Four tiers, matching the standard training-data pipeline ladder:

- exact        : hash-groupBy on a normalized fingerprint (1 shuffle)
- ngram-jaccard: shingle inverted index → candidate pairs → exact
                 Jaccard (the shuffle is on shingles, never on pairs —
                 no O(n²) stage; hot shingles capped)
- minhash-lsh  : k minhashes → bands → bucket join → verify (rows-only
                 oracle: hash functions are engine-specific)
- simhash      : 64-bit weighted bit votes, hamming buckets

At 100 TB the first two are the workhorses: both are single-shuffle
shapes keyed by content hash / shingle, which partitions evenly for
natural text.  LSH banding bounds candidate-pair growth; the
``max_df`` cap drops degenerate shingles (stopword runs) that would
otherwise produce quadratic bucket blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread

SHINGLE_K = 3  # words per shingle
MAX_DF = 100  # drop shingles occurring in more docs (stop-shingles)
MINHASH_K = 32
LSH_BANDS = 8  # 8 bands × 4 rows


def _norm_text(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def _shingles(col):
    """Distinct k-word shingles of the normalized text (JVM lambda).

    NOTE: prefer :func:`with_shingles` in plans — it materializes the
    token array in its own projection first.  Higher-order-function
    lambdas run outside whole-stage codegen, so an inline ``split``
    here would be re-evaluated per element (measured ~5× slowdown)."""
    toks = F.split(_norm_text(col), " ")
    return _shingles_from_tokens(toks)


def _shingles_from_tokens(toks):
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - SHINGLE_K + 1, F.lit(1)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            *[F.element_at(toks, i + j) for j in range(SHINGLE_K)],
        ),
    )
    return F.array_distinct(
        F.when(n >= SHINGLE_K, sh).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def with_shingles(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, sh) with the token split materialized once
    per row before the shingle lambda touches it.

    The scan is repartitioned to the session's parallelism first: the
    shingle pass is CPU-bound per row (regex + split + k-gram
    assembly), and a small parquet file arrives as ONE input split —
    without this the whole corpus shingles on a single core (measured
    13 s → <1 s at sf0.1 on local[32]).  At lake scale the same line
    protects against few-large-files layouts; the ~10 MB-per-core
    shuffle it costs is noise next to the CPU win.

    Consumers must explode with ``explode_outer`` + an isNotNull
    filter: plain ``explode`` makes InferFiltersFromGenerate add a
    ``size(sh) > 0`` predicate that predicate-pushdown then re-inlines
    *below* this exchange — the whole shingle expression re-evaluates
    on the unsplit scan partition, single-core (the 13 s above was
    exactly this)."""
    toked = spread(docs, "doc_id").select(
        "doc_id", F.split(_norm_text(F.col("text")), " ").alias("toks")
    )
    return toked.select(
        "doc_id",
        _shingles_from_tokens(F.col("toks")).alias("sh"),
    )


# ---------------------------------------------------------------------------
# Exact dedup: fingerprint → keep lowest doc_id per group
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per distinct normalized text: canonical (min) doc_id and
    duplicate count.  Single hash-aggregate shuffle on the md5 key —
    the partial aggregate computes the md5, so without spread() that
    regex+hash pass runs on the unsplit scan partition."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.select("doc_id", F.md5(_norm_text(F.col("text"))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copias"),
        )
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_copias
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup pairs via shingle inverted index
# ---------------------------------------------------------------------------

def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs sharing ≥1 shingle, scored with exact Jaccard
    |A∩B| / (|A|+|B|−|A∩B|), threshold 0.2.

    Plan shape — the shingle pipeline is computed ONCE and there is no
    self-join at all:
    - shingle once, carry |doc| (``size(sh)``) through the explode;
    - groupBy shingle collecting the (doc, size) posting list; the
      document-frequency stop-shingle cap is just ``size(docs)`` on
      the collected list (a self-join formulation would re-execute the
      whole shingle subtree per side — measured, Catalyst does NOT
      reuse the exchange across the join's two branches);
    - pairs are generated inside each posting list with array lambdas
      (i<j index walk), bounded by MAX_DF ⇒ ≤ MAX_DF²/2 pairs per
      shingle, then exploded and counted: |A∩B| = co-occurrence.
    Two shuffles total (shingle groupBy, pair groupBy); cost is Σ df²
    over retained shingles — capped by MAX_DF."""
    docs = load_table(spark, sf_dir, "documents")
    with_sh = with_shingles(docs)
    sh = with_sh.select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode_outer("sh").alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    posting = (
        sh.groupBy("shingle")
        .agg(F.collect_list(F.struct("doc_id", "n_sh")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= MAX_DF))
        .select(F.array_sort("docs").alias("docs"))
    )
    n = F.size("docs")
    pair_list = F.flatten(
        F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + 2, F.greatest(n - i - 1, F.lit(0))),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    x["n_sh"].alias("size_a"),
                    y["doc_id"].alias("doc_b"),
                    y["n_sh"].alias("size_b"),
                ),
            ),
        )
    )
    co = (
        posting.select(F.explode(pair_list).alias("p"))
        .groupBy(
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
            F.col("p.size_a").alias("size_a"),
            F.col("p.size_b").alias("size_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    return co.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
            4,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= 0.2)


_SQL_SHINGLES = f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
), toks AS (
  SELECT doc_id, string_split(t, ' ') AS w, t FROM norm
), sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(w) >= {SHINGLE_K}
         THEN list_transform(range(1, len(w) - {SHINGLE_K} + 2),
                             i -> array_to_string(w[i:i+{SHINGLE_K}-1], ' '))
         ELSE [t] END)) AS shingle
  FROM toks
)
"""

ORACLE_NGRAM_JACCARD = (
    _SQL_SHINGLES
    + f"""
, sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
kept AS (SELECT s.doc_id, s.shingle FROM sh s JOIN df ON s.shingle = df.shingle WHERE df.df <= {MAX_DF}),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT co.doc_a, co.doc_b,
       ROUND(CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE), 4) AS jaccard
FROM co
JOIN sizes sa ON co.doc_a = sa.doc_id
JOIN sizes sb ON co.doc_b = sb.doc_id
WHERE ROUND(CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE), 4) >= 0.2
"""
)


# ---------------------------------------------------------------------------
# MinHash + LSH banding (rows-only check: hash fns are engine-specific)
# ---------------------------------------------------------------------------

def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MinHash signatures + LSH banding, verified
    with exact Jaccard ≥ 0.2 over shingle sets.

    k=32 xxhash64-based minhashes per doc, computed from the exploded
    shingle table with a hash aggregate (map-side partial MIN combine —
    the signature build is one shuffle keyed by doc, carrying 32
    longs per row, never the shingle text).  Banding explodes the
    signature into 8 (band, hash) keys; docs sharing a band bucket are
    candidates (shuffle keyed by band hash, so bucket sizes — not n —
    drive cost).  Candidates carry only ids; the shingle arrays are
    joined back just for the final exact-Jaccard verification of the
    (small) candidate set."""
    docs = load_table(spark, sf_dir, "documents")
    with_sh = with_shingles(docs)
    sh = with_sh.select("doc_id", F.explode_outer("sh").alias("shingle")).filter(
        F.col("shingle").isNotNull()
    )

    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh_{i}")
            for i in range(MINHASH_K)
        ]
    )

    rows_per_band = MINHASH_K // LSH_BANDS
    band_cols = []
    for b in range(LSH_BANDS):
        cols = [
            F.col(f"mh_{i}")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("h"))
        )
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.h").alias("h"))

    a = banded.select(F.col("doc_id").alias("doc_a"), "band", "h")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band", "h")
    cand = (
        a.join(b, ["band", "h"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )

    sh_a = with_sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = with_sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        verified.select(
            "doc_a",
            "doc_b",
            F.round(inter / union.cast("double"), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


# ---------------------------------------------------------------------------
# SimHash (rows-only)
# ---------------------------------------------------------------------------

def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: explode distinct tokens, hash each
    ONCE, and take 64 map-side bit-vote sums in a single hash
    aggregate keyed by doc — votes[i] = Σ ±1 by bit i of the token
    hash; simhash bit_i = votes[i] > 0.

    This is the same shape as the MinHash signature build (partial
    aggregation combines votes before the doc-keyed shuffle, which
    carries 64 ints per row).  The previous formulation — an
    ``aggregate`` lambda folding a 64-wide array per token — allocated
    an array per token per row and ran ~2× slower; higher-order
    lambdas also sit outside whole-stage codegen."""
    return simhash_signatures(spread(load_table(spark, sf_dir, "documents"), "doc_id"))


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash long) — see :func:`q_simhash`."""
    toks = docs.select(
        "doc_id",
        F.explode_outer(F.array_distinct(F.split(_norm_text(F.col("text")), " "))).alias(
            "tok"
        ),
    ).filter(F.col("tok").isNotNull())
    hashed = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"v_{i}")
            for i in range(64)
        ]
    )
    simhash = F.lit(0).cast("long")
    for i in range(64):
        bit = F.when(F.col(f"v_{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        simhash = simhash.bitwiseOR(F.shiftleft(bit.cast("long"), i))
    return votes.select("doc_id", simhash.alias("simhash"))


SIMHASH_BANDS = 4  # 4 × 16-bit bands: catches all pairs with hamming ≤ 3
HAMMING_T = 3


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ 3, found with the
    pigeonhole banding trick: split the 64-bit signature into 4
    16-bit bands — any pair within distance 3 agrees exactly on at
    least one band, so candidates come from a band-keyed self-join
    (shuffle on (band, 16-bit key); bucket sizes, not n², drive cost)
    and are verified with one ``bit_count(a XOR b)``.  Signatures are
    engine-hash-derived → rows-only correctness check."""
    sig = simhash_signatures(spread(load_table(spark, sf_dir, "documents"), "doc_id"))
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "key"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "key"
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"))
        .filter(F.col("hamming") <= HAMMING_T)
        .dropDuplicates(["doc_a", "doc_b"])
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash": q_simhash,
    "simhash_neardup": q_simhash_neardup,
}

ORACLES = {
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "ngram_jaccard_pairs": ORACLE_NGRAM_JACCARD,
    # minhash_lsh_pairs / simhash: engine-specific hashing → rows-only check
}
