"""Deduplication operators over the ``documents`` table.

Four tiers, matching the standard training-data pipeline ladder:

- exact        : hash-groupBy on a normalized fingerprint (1 shuffle)
- ngram-jaccard: shingle inverted index → candidate pairs → exact
                 Jaccard (the shuffle is on shingles, never on pairs —
                 no O(n²) stage; hot shingles capped)
- minhash-lsh  : k minhashes → bands → bucket join → verify (fully
                 value-oracled: every hash is md5-derived, see below)
- simhash      : 60-bit weighted bit votes, hamming buckets
- endgame      : connected components → per-doc keep/drop decision
                 (min-id canonical, or quality-aware keep-the-fullest)
- operations   : incremental new-batch-vs-snapshot classification;
                 LSH precision/recall audit vs the exact ground truth

At 100 TB the first two are the workhorses: both are single-shuffle
shapes keyed by content hash / shingle, which partitions evenly for
natural text.  LSH banding bounds candidate-pair growth; the
``max_df`` cap drops degenerate shingles (stopword runs) that would
otherwise produce quadratic bucket blow-up.
"""

from __future__ import annotations

import functools
import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread

SHINGLE_K = 3  # words per shingle
MAX_DF = 100  # drop shingles occurring in more docs (stop-shingles)
MINHASH_K = 32
LSH_BANDS = 8  # 8 bands × 4 rows

# Engine-agnostic hashing: every signature below is derived from the
# first 15 hex chars of md5 (a 60-bit integer both Spark and DuckDB
# compute identically), so the oracle can replicate the FULL pipeline —
# no engine-specific xxhash anywhere in the dedup family.
HASH_P = 1_000_000_007  # prime modulus; keeps (a*h+b) inside 63 bits
_rng = random.Random(20240813)
MINHASH_A = [_rng.randrange(1, HASH_P) for _ in range(MINHASH_K)]
MINHASH_B = [_rng.randrange(0, HASH_P) for _ in range(MINHASH_K)]


def hash60(col: Column) -> Column:
    """60-bit deterministic string hash: md5 hex prefix as BIGINT.
    SQL twin: ``('0x'||substring(md5(x),1,15))::BIGINT`` (DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    return f"('0x'||substring(md5({expr}),1,15))::BIGINT"


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

def _materialize(df: DataFrame, persist_mode: str) -> DataFrame:
    """Compute-once sharing for a relation read by multiple branches:
    ``"checkpoint"`` (bench default) eagerly localCheckpoints —
    fastest, but executor-local and NOT fault-tolerant (a lost
    executor fails the job, lineage is truncated); ``"persist"`` uses
    ``persist(MEMORY_AND_DISK)`` — the production default on a
    long-lived cluster: same sharing, and a lost block recomputes from
    lineage instead of failing the job."""
    if persist_mode == "checkpoint":
        return df.localCheckpoint(eager=True)
    if persist_mode == "persist":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    raise ValueError(
        f"persist_mode must be 'checkpoint' or 'persist', got {persist_mode!r}"
    )


def hashed_shingle_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, n_sh, h): one row per distinct shingle occurrence,
    with the shingle 60-bit-hashed so everything downstream (df
    counts, posting lists, co-occurrence joins) moves 8-byte longs
    instead of k-word strings, and |doc| carried through the explode.
    The oracle computes the SAME hashes, so Jaccard over the hashed
    universe stays value-exact barring md5 collisions (~2^-60) — the
    minhash pipeline already leans on the identical argument."""
    with_sh = with_shingles(docs)
    sh = with_sh.select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode_outer("sh").alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    return sh.select("doc_id", "n_sh", hash60(F.col("shingle")).alias("h"))

def q_ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, persist_mode: str = "checkpoint"
) -> DataFrame:
    """Candidate pairs sharing ≥1 shingle, scored with exact Jaccard
    |A∩B| / (|A|+|B|−|A∩B|), threshold 0.2.

    Plan shape — the corpus is scanned and shingled exactly ONCE and
    no aggregation buffer ever holds a posting list:
    - :func:`hashed_shingle_stream` builds (doc_id, n_sh, h) in one
      pass and is materialized (``persist_mode`` as in
      :func:`_materialize`), so the df-count branch and the pair
      branch read the same partitions instead of re-running the regex
      shingler (round-6 fix: the unmaterialized shape re-executed the
      shingle subtree on the count branch — the same double-pass
      minhash shed in round 5);
    - document-frequency pass FIRST: ``groupBy(h).count()``
      (fixed-width partial aggregate), keep shingles with df in
      [2, MAX_DF], semi-join back.  The df cap drops degenerate hot
      shingles ("de de de…" at corpus scale) before any pair exists,
      bounding pair fan-out at MAX_DF²/2 per shingle;
    - co-occurrence counts come from a hash-keyed self-EQUI-join of
      the filtered stream (a.h = b.h, doc_a < doc_b) + pair groupBy:
      |A∩B| = number of shared shingle hashes.  This join stays in
      whole-stage codegen and AQE skew-splits any residual hot key —
      measured 2× faster than the earlier per-posting array-lambda
      explosion, which ran in the interpreted higher-order-function
      path and buffered each posting list in an ObjectHashAggregate
      (round-6 change; the DuckDB oracle was already in join form).
      It is NOT a doc×doc self-join: the key is the shingle hash, and
      the df cap bounds each key's match set.
    Three shuffles over 8-byte hash keys (df count, pair join, pair
    groupBy); cost is Σ df² over retained shingles, capped by MAX_DF.
    ``tests/test_plan_discipline.py`` pins the df-filter-before-pairs
    ordering and the single corpus pass."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _materialize(hashed_shingle_stream(docs), persist_mode)
    kept = (
        sh.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= MAX_DF))
        .select("h")
    )
    keptrows = sh.join(kept, "h", "left_semi")
    return _jaccard_from_counts(_pair_counts(keptrows))


def _pair_counts(keptrows: DataFrame) -> DataFrame:
    """PRE-threshold co-occurrence relation over kept shingle rows:
    (doc_a, doc_b, size_a, size_b, inter) with inter = shared kept
    shingle count — the hash-keyed self-equi-join + pair aggregate of
    :func:`q_ngram_jaccard_pairs`, split out because the incremental
    pair update adjusts THIS relation (jaccard is a pure projection of
    it)."""
    a = keptrows.select(
        "h", F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("size_a")
    )
    b = keptrows.select(
        "h", F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("size_b")
    )
    return (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count("*").alias("inter"))
    )


def _jaccard_from_counts(counts: DataFrame) -> DataFrame:
    """(doc_a, doc_b, jaccard ≥ 0.2) from the pre-threshold counts."""
    return counts.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
            4,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= 0.2)


# CTE body shared by the ngram/minhash/components oracles; emitted
# after a "WITH " or "WITH RECURSIVE " prefix chosen by the consumer.
# ``src_where`` scopes the source corpus (e.g. the on-delete oracle's
# survivor predicate) via an explicit parameter — NOT a post-hoc
# string replace on the built body, which would silently depend on
# the norm CTE holding the only "FROM documents" occurrence
# (round-12 ADVICE; the ANN fit CTEs' ``fit_where`` pattern).
def _sql_shingles_body(src_where: str = "") -> str:
    return f"""norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents{src_where}
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

_SQL_SHINGLES_BODY = _sql_shingles_body()

_SQL_SHINGLES = "WITH " + _SQL_SHINGLES_BODY


def _sql_pairs_body(src_where: str = "") -> str:
    return (
        _sql_shingles_body(src_where)
        + f"""
, hsh AS (SELECT doc_id, {sql_hash60('shingle')} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
df AS (SELECT h, COUNT(*) AS df FROM hsh GROUP BY 1),
kept AS (SELECT s.doc_id, s.h FROM hsh s JOIN df ON s.h = df.h WHERE df.df <= {MAX_DF}),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT co.doc_a, co.doc_b,
         ROUND(CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE), 4) AS jaccard
  FROM co
  JOIN sizes sa ON co.doc_a = sa.doc_id
  JOIN sizes sb ON co.doc_b = sb.doc_id
  WHERE ROUND(CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE), 4) >= 0.2
)
"""
    )


_SQL_PAIRS_BODY = _sql_pairs_body()

ORACLE_NGRAM_JACCARD = "WITH " + _SQL_PAIRS_BODY + "SELECT doc_a, doc_b, jaccard FROM pairs"

ORACLE_DEDUP_COMPONENTS = (
    "WITH RECURSIVE "
    + _SQL_PAIRS_BODY
    + """
, verts AS (SELECT doc_a AS v FROM pairs UNION SELECT doc_b FROM pairs),
undirected AS (
  SELECT doc_a AS u, doc_b AS w FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT e.u AS v, reach.r FROM undirected e JOIN reach ON e.w = reach.v
),
comp AS (SELECT v AS doc_id, MIN(r) AS component_id FROM reach GROUP BY v)
SELECT c.doc_id, c.component_id,
       COUNT(*) OVER (PARTITION BY c.component_id) AS cluster_size,
       c.doc_id = c.component_id AS canonical
FROM comp c
"""
)

ORACLE_DEDUP_KEEP = (
    "WITH RECURSIVE "
    + _SQL_PAIRS_BODY
    + """
, verts AS (SELECT doc_a AS v FROM pairs UNION SELECT doc_b FROM pairs),
undirected AS (
  SELECT doc_a AS u, doc_b AS w FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT e.u AS v, reach.r FROM undirected e JOIN reach ON e.w = reach.v
),
comp AS (SELECT v AS doc_id, MIN(r) AS component_id FROM reach GROUP BY v)
SELECT d.doc_id,
       COALESCE(c.doc_id = c.component_id, TRUE) AS manter,
       c.component_id
FROM documents d LEFT JOIN comp c USING (doc_id)
"""
)


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the pair graph
# (the dedup endgame — pairs alone don't dedupe; clusters pick the
#  canonical survivor.  Public algorithm family: iterative min-label
#  propagation / Hash-to-Min style CC-on-MapReduce.)
# ---------------------------------------------------------------------------

# Kernel switch (round-8 verdict item 6).  Warm A/B on the near-dup
# pair graph (fresh session each, min of warm runs — PLAN_AUDIT.md):
# sf0.1 min_label 2.08 s vs star 2.57 s; sf1 (10x, replica-chained
# clusters) min_label 14.1 s vs star 10.0 s.  The crossover is round
# count: min_label pays O(diameter) rounds and the sf1 corpus chains
# replicas into deeper clusters — exactly what a multi-source corpus
# does at 100 TB — while the alternating large-star/small-star
# contraction halves depth per round (O(log diameter); a 200-deep
# path graph converges in <20 star rounds but needs ~199 min-label
# rounds, pinned in tests/test_invariants.py).  Star is therefore the
# scale default; min_label remains the cheaper kernel for graphs
# known to be shallow.  Equality of the two kernels is pinned on real
# pair graphs and deep chains.
CC_ALGORITHM = "star"

# Rounds the most recent connected_components() call took to converge
# — observability for the O(log diameter) claim (round-14 verdict item
# 3: the sf10 soak asserts the star kernel's round count stays flat at
# 10x corpus).  Set by both kernels on successful convergence.
LAST_CC_ROUNDS: int = 0


def connected_components(
    edges: DataFrame, max_iter: int = 50, algorithm: str | None = None
) -> DataFrame:
    """(doc_a, doc_b) undirected edges → (doc_id, component_id) with
    component_id = MIN doc_id reachable.

    ``algorithm`` picks the kernel (default :data:`CC_ALGORITHM`):

    * ``min_label`` — iterative min-label propagation: each round
      every vertex adopts the minimum label among itself and its
      neighbors; convergence in ≤ graph-diameter rounds (near-dup
      clusters are shallow — dup clusters of depth > ~5 are rare, and
      ``max_iter`` bounds the worst case).  Each round is one join +
      one aggregate, all keyed shuffles; the convergence check rides
      the same aggregate via a driver-side count of changed labels
      (one scalar per round, no data collected).
    * ``star`` — alternating large-star/small-star contraction
      (public MapReduce-CC family, Kiveris et al. 2014): each round
      hangs strictly-larger neighbors off the neighborhood minimum
      (large-star) then contracts the remaining edges onto it
      (small-star), halving component depth per round — O(log
      diameter) rounds for deep chains.

    Both kernels checkpoint per round to truncate lineage and fail
    loudly on non-convergence (a silent partial result would split
    components)."""
    if (algorithm or CC_ALGORITHM) == "star":
        return _cc_star(edges, max_iter)
    adj = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("w"))
        .union(edges.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("w")))
        .distinct()
    )
    # Materialize the edge list ONCE: it sits on the probe side of
    # every propagation round's join, and without this each round
    # re-executes the entire upstream pair-generation pipeline (at ~sf1
    # that was ~3x the pair cost paid again — measured 46 s → 17 s for
    # the component query in the sf1 soak).  localCheckpoint also
    # truncates the lineage the per-round checkpoints would otherwise
    # drag along.
    adj = adj.localCheckpoint(eager=True)
    labels = (
        adj.select(F.col("u").alias("v")).distinct().withColumn("lbl", F.col("v"))
    )
    changed = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neighbor_min = (
            adj.join(labels, adj.u == labels.v)
            .groupBy("w")
            .agg(F.min("lbl").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.v == neighbor_min.w, "left")
            .select(
                "v",
                F.least(F.col("lbl"), F.coalesce("nmin", "lbl")).alias("lbl"),
                (F.coalesce("nmin", "lbl") < F.col("lbl")).cast("int").alias("chg"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.agg(F.sum("chg")).first()[0] or 0
        labels = new_labels.select("v", "lbl")
        if changed == 0:
            break
    if changed != 0:
        # A silent non-converged result would split components (and emit
        # clusters with no canonical member) — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(pair-graph diameter exceeds the iteration budget); raise max_iter"
        )
    global LAST_CC_ROUNDS
    LAST_CC_ROUNDS = rounds
    return labels.select(F.col("v").alias("doc_id"), F.col("lbl").alias("component_id"))


def _cc_star(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Alternating large-star/small-star connected components.

    Large-star (keyed on each vertex u over its symmetric
    neighborhood): every strictly larger neighbor re-attaches to
    m = min(N(u) ∪ {u}).  Small-star (keyed on the larger endpoint of
    each edge): all smaller neighbors and u itself attach to the
    neighborhood minimum.  Each pair of steps at least halves the
    depth of every tree, so convergence takes O(log diameter) rounds;
    at the fixed point the edge set is a star per component — (v,
    root) for every non-root v — which IS the label table.

    Scale shape: both steps are one groupBy + one keyed join on the
    current edge set (which only shrinks toward star form — no
    vertex-count blowup); each round is ONE job — the exact
    symmetric-difference aggregate that both materializes the round's
    lazy-checkpointed edge set and returns the convergence scalar
    (bounded driver traffic: one long).  Skew note: after one
    round every high-degree hub IS a component minimum, so its edges
    key on distinct smaller vertices, not one hot key."""
    e = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("w"))
        .filter(F.col("u") != F.col("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # verts is consumed ONLY by the final roots anti-join — keep it a
    # lazy plan over the initial edge checkpoint instead of paying an
    # eager materialization job for a relation the loop never reads
    # (guide §1.2: don't compute ahead of need).
    verts = (
        e.select(F.col("u").alias("v"))
        .union(e.select(F.col("w").alias("v")))
        .distinct()
    )
    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star: attach strictly larger neighbors to the minimum
        sym = e.union(e.select(F.col("w").alias("u"), F.col("u").alias("w")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("w").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )
        # no intermediate distinct: the small-star min-aggregate is
        # duplicate-insensitive and the round's final distinct dedups
        # the output, so the exchange the distinct cost bought nothing
        # (guide §2.4: remove shuffles outright)
        large = (
            sym.join(mins, "u")
            .filter(F.col("w") > F.col("u"))
            .select(F.col("w").alias("u"), F.col("m").alias("w"))
        )
        # small-star: key on the larger endpoint, contract onto the min
        se = large.select(
            F.greatest("u", "w").alias("u"), F.least("u", "w").alias("w")
        )
        mins2 = se.groupBy("u").agg(F.min("w").alias("m"))
        joined = se.join(mins2, "u")
        # LAZY local checkpoint (r17): the convergence aggregate below
        # is now the round's ONLY job — its map side computes `small`
        # (persisting it as the local checkpoint en route) and the
        # reduce side returns the diff count, fusing what r16 ran as
        # two jobs per round (eager materialization + separate check;
        # guide §1.2).  Interleaved idle-host A/B on the two benched
        # CC consumers: dedup_components 5.77 s (eager) → 4.09 s
        # (fused), fuzzy_components 4.28 → 4.07
        # (plans/r17/probe_cc_ab.json; identical rows asserted in the
        # same probe).
        small = (
            joined.filter(F.col("w") != F.col("m"))
            .select(F.col("w").alias("u"), F.col("m").alias("w"))
            .union(mins2.select("u", F.col("m").alias("w")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # exact fixed-point check (no hash shortcut: an early stop on a
        # collision would silently split components).  Both sides are
        # distinct by construction, so symmetric-difference emptiness
        # is ONE aggregate — every (u, w) group must hold exactly one
        # row from each side — instead of the former two exceptAll
        # jobs (same exactness, one shuffle).
        n_diff = (
            small.select("u", "w").unionAll(e.select("u", "w"))
            .groupBy("u", "w")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") != 2)
            .limit(1)
            .count()
        )
        if n_diff == 0:
            e = small
            converged = True
            break
        e = small
    if not converged:
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iter} "
            "rounds; raise max_iter"
        )
    global LAST_CC_ROUNDS
    LAST_CC_ROUNDS = rounds
    # star form: every non-root appears exactly once as u; roots only as w
    non_roots = e.select(
        F.col("u").alias("doc_id"), F.col("w").alias("component_id")
    )
    roots = verts.join(
        e.select(F.col("u").alias("v")).distinct(), "v", "left_anti"
    ).select(F.col("v").alias("doc_id"), F.col("v").alias("component_id"))
    return non_roots.union(roots)


# ---------------------------------------------------------------------------
# Materialized dedup endgame (round-9 verdict item 3 / round-10 item 5)
#
# Four queries (dedup_keep_best, dedup_keep_canonical, leakage_safe_split,
# dedup_source_matrix) share the same expensive upstream: shingles → pair
# graph → connected components.  Inline recomputation is the DRIVER
# CONTRACT default (each queries() entry is self-contained and its
# oracle restates the full ladder), but a production corpus job — and
# the sf1 soak — computes the pair graph and the component table ONCE,
# publishes them through the transactional parquet layer
# (sources/txn.py: atomic snapshot publish, time travel, readers never
# see a partial table), and points every endgame query at the
# materialization via SPARK_GRAFT_DEDUP_CACHE=<txn root>.  Results are
# byte-identical by construction: the cached relations are the exact
# (doc_a, doc_b) / (doc_id, component_id) rows the inline path feeds
# to the same downstream plan (pinned by tests/test_invariants.py).
# ---------------------------------------------------------------------------

DEDUP_CACHE_ENV = "SPARK_GRAFT_DEDUP_CACHE"
_CACHE_PAIRS = "pairs"
_CACHE_COMPONENTS = "components"
# round-12 additions: the intermediate state the INCREMENTAL refresh
# needs (see refresh_dedup_endgame_incremental)
_CACHE_SIZES = "sizes"          # (doc_id, n_sh) — every indexed doc
_CACHE_POSTINGS = "postings"    # (doc_id, n_sh, h) for df ≤ MAX_DF shingles
_CACHE_DF = "df"                # (h, df) — every distinct shingle
_CACHE_COUNTS = "counts"        # pre-threshold (doc_a, doc_b, sizes, inter)


def _dedup_cache_root() -> str | None:
    import os

    return os.environ.get(DEDUP_CACHE_ENV) or None


def dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b) near-dup pair graph — the txn materialization
    when ``SPARK_GRAFT_DEDUP_CACHE`` is set, else computed inline."""
    root = _dedup_cache_root()
    if root:
        from ..sources.fingerprint import check_snapshot_fresh
        from ..sources.txn import txn_read

        # staleness guard (round-11 verdict item 2): refuse to serve a
        # pair graph built from a different documents corpus
        check_snapshot_fresh(
            spark, f"{root}/{_CACHE_PAIRS}", sf_dir, "documents"
        )
        return txn_read(spark, f"{root}/{_CACHE_PAIRS}").select(
            "doc_a", "doc_b"
        )
    return q_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")


def dedup_component_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component_id) labels for every doc in ≥1 pair — the
    txn materialization when ``SPARK_GRAFT_DEDUP_CACHE`` is set, else
    the CC kernel over :func:`dedup_pairs`."""
    root = _dedup_cache_root()
    if root:
        from ..sources.fingerprint import check_snapshot_fresh
        from ..sources.txn import txn_read

        check_snapshot_fresh(
            spark, f"{root}/{_CACHE_COMPONENTS}", sf_dir, "documents"
        )
        return txn_read(spark, f"{root}/{_CACHE_COMPONENTS}").select(
            "doc_id", "component_id"
        )
    return connected_components(dedup_pairs(spark, sf_dir))


def materialize_dedup_endgame(
    spark: SparkSession, sf_dir: str, root: str
) -> dict[str, int]:
    """Compute the pair graph and its component labels ONCE and
    publish both as transactional tables under ``root`` (atomic
    rename publish; a reader racing the refresh sees the previous
    snapshot, never a mix).  Returns {table: committed version}.

    At 100 TB this is the nightly index-build job; the endgame
    queries become pair-graph-sized joins against these snapshots
    instead of each re-running shingling + CC (~3× the family cost at
    sf1, measured in SOAK_r11)."""
    from ..sources.fingerprint import META_KEY, corpus_fingerprint
    from ..sources.txn import txn_write

    # banked in every commit's app_meta; the cached read paths verify
    # it against the corpus they are pointed at and refuse on mismatch
    meta = {
        META_KEY: corpus_fingerprint(sf_dir, "documents"),
        "source_table": "documents",
        "sf_dir": sf_dir,
    }

    # one shingle pass feeds everything (the q_ngram_jaccard_pairs
    # plan, unrolled so the intermediate state can be published too —
    # the incremental refresh consumes it instead of re-shingling)
    docs = load_table(spark, sf_dir, "documents")
    sh = _materialize(hashed_shingle_stream(docs), "checkpoint")
    df = sh.groupBy("h").agg(F.count("*").alias("df"))
    df = _materialize(df, "checkpoint")
    postings = sh.join(df.filter(F.col("df") <= MAX_DF), "h", "left_semi")
    kept = sh.join(
        df.filter((F.col("df") >= 2) & (F.col("df") <= MAX_DF)),
        "h",
        "left_semi",
    )
    counts = _materialize(_pair_counts(kept), "checkpoint")
    pairs = _jaccard_from_counts(counts).select("doc_a", "doc_b")
    pairs = pairs.localCheckpoint(eager=True)  # CC reuses it below

    w = lambda frame, name: txn_write(  # noqa: E731
        spark, frame, f"{root}/{name}", app_meta=meta
    )
    versions = {
        _CACHE_SIZES: w(sh.select("doc_id", "n_sh").distinct(), _CACHE_SIZES),
        _CACHE_POSTINGS: w(postings, _CACHE_POSTINGS),
        _CACHE_DF: w(df, _CACHE_DF),
        _CACHE_COUNTS: w(counts, _CACHE_COUNTS),
        _CACHE_PAIRS: w(pairs, _CACHE_PAIRS),
    }
    comp = connected_components(pairs)
    versions[_CACHE_COMPONENTS] = w(comp, _CACHE_COMPONENTS)
    return versions


# ---------------------------------------------------------------------------
# Incremental dedup-endgame maintenance (round 12).
#
# New documents arrive; instead of re-shingling the whole corpus, the
# pair graph is updated with delta-sized work.  The subtlety is the
# document-frequency cap: a base shingle that GAINS delta occurrences
# can cross MAX_DF, at which point every base pair that counted it
# must LOSE that contribution — pair-graph maintenance is adds AND
# exact adjustments, not just appends.  The update is provably exact:
#
# * a shingle with base df = 1 that becomes kept only ever connects
#   its single base doc to delta docs — covered by the delta join;
# * a shingle with base df > MAX_DF stays over the cap forever (df is
#   monotone under growth) — never re-enters;
# * base-base pairs therefore only ever lose intersection counts, and
#   the loss is exactly the co-occurrence of cap-crossing shingles —
#   a bounded computation (each such shingle had df ≤ MAX_DF).
#
# ``q_dedup_pairs_incremental`` states the identity as a driver query
# (oracle = the full-corpus pair SQL); ``refresh_dedup_endgame_
# incremental`` runs the same kernel against the txn-materialized
# state and republishes — byte-identical to a from-scratch rebuild on
# the grown corpus (tests/test_incremental_maintenance.py).
# ---------------------------------------------------------------------------

# The "newly arrived" document slice for the driver query: 10%.
DOC_DELTA_MOD, DOC_DELTA_REM = 10, 9


def _incremental_pair_counts(
    base_sh: DataFrame,
    base_df: DataFrame,
    base_counts: DataFrame,
    delta_sh: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The delta-sized pair-graph update.  Inputs: the base shingle
    rows (at least every row whose shingle has base df ≤ MAX_DF), the
    full base df relation, the PRE-threshold base pair counts, and the
    delta docs' shingle rows.  Returns ``(counts_new, adjusted_delta,
    df_changed)``:

    * ``counts_new`` — the exact pre-threshold counts of the GROWN
      corpus (adjusted base-base pairs with inter > 0, plus every pair
      involving a delta doc);
    * ``adjusted_delta`` — only the rows that CHANGED vs base_counts
      (for merge-style publication), including inter = 0 tombstones;
    * ``df_changed`` — updated (h, df) rows for shingles the delta
      touched.

    Shape at 100 TB: delta_df is delta-sized; the cap-crossing
    adjustment touches ≤ MAX_DF rows per crossing shingle; the delta
    pair join runs over base rows semi-joined to the delta's shingle
    hashes — every stage is delta-proportional, never corpus×corpus."""
    delta_df = delta_sh.groupBy("h").agg(F.count("*").alias("d_df"))
    df_changed = (
        base_df.join(delta_df, "h", "right")
        .select(
            "h",
            (F.coalesce(F.col("df"), F.lit(0)) + F.col("d_df")).alias("df"),
        )
        # delta-touched shingles only; consumed by df_new AND the
        # cap-crossing probe — checkpoint or the base_df⋈delta_df join
        # (and delta_df's aggregate) re-executes per consumer.
        .localCheckpoint(eager=True)
    )
    # full new df relation (only needed as a membership filter below;
    # shingles the delta never touched keep their banked df)
    df_new = base_df.join(delta_df.select("h"), "h", "left_anti").unionByName(
        df_changed
    )
    kept_new = df_new.filter(
        (F.col("df") >= 2) & (F.col("df") <= MAX_DF)
    ).select("h")

    # base-kept shingles pushed over the cap by the delta: subtract
    # their co-occurrence from the banked base-base counts
    dropped = (
        base_df.filter((F.col("df") >= 2) & (F.col("df") <= MAX_DF))
        .join(df_changed.filter(F.col("df") > MAX_DF), "h", "left_semi")
        .select("h")
    )
    # ≤ MAX_DF² rows per cap-crossing shingle; feeds the adjustment
    # join AND its anti-join complement — one checkpoint, two reads.
    sub = (
        _pair_counts(base_sh.join(dropped, "h", "left_semi"))
        .select("doc_a", "doc_b", F.col("inter").alias("minus"))
        .localCheckpoint(eager=True)
    )
    adjusted_delta = base_counts.join(sub, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "size_a",
        "size_b",
        (F.col("inter") - F.col("minus")).alias("inter"),
    )
    adjusted = base_counts.join(
        sub.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti"
    ).unionByName(adjusted_delta)

    # pairs involving a delta doc, counted over the grown kept rows —
    # base side pruned to the delta's shingle hashes first (delta-
    # proportional, and the hot-hash set is broadcastable)
    delta_ids = delta_sh.select("doc_id").distinct()
    hot_h = delta_sh.select("h").distinct()
    all_rows = (
        base_sh.join(F.broadcast(hot_h), "h", "left_semi")
        .unionByName(delta_sh)
        .join(kept_new, "h", "left_semi")
    )
    flagged = all_rows.join(
        F.broadcast(delta_ids.withColumn("is_new", F.lit(True))),
        "doc_id",
        "left",
    ).select(
        "doc_id", "n_sh", "h", F.coalesce("is_new", F.lit(False)).alias("is_new")
    )
    d = flagged.filter(F.col("is_new")).select(
        "h", F.col("doc_id").alias("doc_d"), F.col("n_sh").alias("size_d")
    )
    o = flagged.select(
        "h",
        F.col("doc_id").alias("doc_o"),
        F.col("n_sh").alias("size_o"),
        "is_new",
    )
    joined = d.join(o, "h").filter(
        (~F.col("is_new") & (F.col("doc_o") != F.col("doc_d")))
        | (F.col("is_new") & (F.col("doc_o") > F.col("doc_d")))
    )
    delta_counts = (
        joined.select(
            F.least("doc_d", "doc_o").alias("doc_a"),
            F.greatest("doc_d", "doc_o").alias("doc_b"),
            F.when(F.col("doc_d") < F.col("doc_o"), F.col("size_d"))
            .otherwise(F.col("size_o"))
            .alias("size_a"),
            F.when(F.col("doc_d") < F.col("doc_o"), F.col("size_o"))
            .otherwise(F.col("size_d"))
            .alias("size_b"),
        )
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count("*").alias("inter"))
    )
    counts_new = adjusted.filter(F.col("inter") > 0).unionByName(delta_counts)
    return counts_new, adjusted_delta.unionByName(delta_counts), df_changed


def q_dedup_pairs_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup pair maintenance, stated as a relation:
    the corpus splits into a base (90%) and newly-arrived delta docs
    (doc_id % 10 == 9); the base's inverted index, df table, and
    pre-threshold pair counts stand in for the banked state
    (:func:`materialize_dedup_endgame` publishes exactly these), and
    the delta is folded in with :func:`_incremental_pair_counts` —
    delta-sized joins plus the exact cap-crossing adjustment, never a
    full re-shingle.  Output = (doc_a, doc_b, jaccard): the oracle is
    the FULL-corpus pair SQL, so a hash match proves the incremental
    update reproduces the from-scratch pair graph value-for-value —
    including pairs whose jaccard changed or vanished when a shared
    shingle crossed MAX_DF."""
    docs = load_table(spark, sf_dir, "documents")
    is_delta = (F.col("doc_id") % DOC_DELTA_MOD) == DOC_DELTA_REM
    base_sh = _materialize(
        hashed_shingle_stream(docs.filter(~is_delta)), "checkpoint"
    )
    delta_sh = _materialize(
        hashed_shingle_stream(docs.filter(is_delta)), "checkpoint"
    )
    # The two banked-state stand-ins each feed 2-3 joins inside
    # _incremental_pair_counts; materialized once, exactly like the
    # txn-published tables they model (refresh_dedup_endgame_
    # incremental reads the real banked copies).
    base_df = (
        base_sh.groupBy("h")
        .agg(F.count("*").alias("df"))
        .localCheckpoint(eager=True)
    )
    base_kept = base_sh.join(
        base_df.filter((F.col("df") >= 2) & (F.col("df") <= MAX_DF)),
        "h",
        "left_semi",
    )
    counts_new, _, _ = _incremental_pair_counts(
        base_sh,
        base_df,
        _pair_counts(base_kept).localCheckpoint(eager=True),
        delta_sh,
    )
    return _jaccard_from_counts(counts_new)


# The "taken down" slice for the on-delete identity query: 10% of the
# corpus (doc_id % 10 == 3), disjoint from the growth delta's % 10 == 9.
DOC_DEL_MOD, DOC_DEL_REM = 10, 3


def _decremental_pair_counts(
    surv_sh: DataFrame,
    base_df: DataFrame,
    base_counts: DataFrame,
    removed_ids: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The delete-side pair-graph update — the mirror of
    :func:`_incremental_pair_counts`.  Inputs: the SURVIVING corpus's
    shingle rows, the banked (pre-delete) df relation and pre-threshold
    pair counts, and the removed doc ids.  Returns ``(counts_new,
    changed, df_changed)``:

    * ``counts_new`` — exact pre-threshold counts of the SHRUNK corpus;
    * ``changed`` — rows to MERGE-publish: inter = 0 tombstones for
      every pair touching a removed doc, plus every survivor pair a
      cap-RECROSS changed (including brand-new pairs that previously
      shared only over-cap shingles);
    * ``df_changed`` — (h, df) rows whose document frequency moved
      (vanished shingles carry df = 0 — inert under the range filters
      every consumer applies).

    Why this is exact: a survivor pair's banked inter counts shared
    shingles with base df ∈ [2, MAX_DF]; deletion only LOWERS df, and
    a shared shingle's df cannot drop below 2 while both sharers
    survive — so every banked contribution stands, and the only new
    contributions come from shingles that fall back INSIDE the cap
    (base df > MAX_DF, new df ≤ MAX_DF): the cap-recross set, whose
    survivor co-occurrences are recomputed directly (bounded by the
    new df ≤ MAX_DF).  Pairs touching a removed doc drop whole.

    Cost shape at 100 TB: the df recount and recross filter need ONE
    pass over the surviving corpus's shingles (a takedown is a
    corpus-scan-class operation in any engine that must prove removal)
    — but the quadratic-ish pair work stays bounded: dropped pairs are
    an anti-join on the banked pair graph, and recross additions touch
    ≤ MAX_DF postings per recrossing shingle.  Keeping UNCAPPED
    postings in the snapshot would make even the df recount
    delta-sized at the price of storing the full (doc, shingle)
    stream; the one-pass design was chosen to keep snapshot storage
    proportional to the capped posting lists."""
    # df_new feeds both the df_changed diff and the cap-recross filter
    # — one survivor-shingle aggregation, not one per consumer (the
    # takedown's one corpus-scan-class pass; guide §5).  df-table-
    # sized rows, the same relation the refresh path publishes anyway.
    df_new = (
        surv_sh.groupBy("h")
        .agg(F.count("*").alias("df"))
        .localCheckpoint(eager=True)
    )
    # every shingle whose df moved (vanished -> 0); publication rows
    df_changed = (
        base_df.withColumnRenamed("df", "df_old")
        .join(df_new, "h", "left")
        .select("h", F.coalesce("df", F.lit(0)).alias("df"), "df_old")
        .filter(F.col("df") != F.col("df_old"))
        .select("h", "df")
    )
    # cap recross: outside the window before, inside it now
    recross = (
        base_df.filter(F.col("df") > MAX_DF)
        .select("h")
        .join(df_new.filter(F.col("df") <= MAX_DF), "h", "left_semi")
    )
    rem_a = removed_ids.select(F.col("doc_id").alias("doc_a"))
    rem_b = removed_ids.select(F.col("doc_id").alias("doc_b"))
    dropped = base_counts.join(rem_a, "doc_a", "left_semi").unionByName(
        base_counts.join(rem_b, "doc_b", "left_semi").join(
            rem_a, "doc_a", "left_anti"
        )
    )
    surv = base_counts.join(rem_a, "doc_a", "left_anti").join(
        rem_b, "doc_b", "left_anti"
    )
    add = _pair_counts(surv_sh.join(recross, "h", "left_semi"))
    s = surv.select(
        "doc_a",
        "doc_b",
        F.col("size_a").alias("sa_s"),
        F.col("size_b").alias("sb_s"),
        F.col("inter").alias("i_s"),
    )
    a = add.select(
        "doc_a",
        "doc_b",
        F.col("size_a").alias("sa_a"),
        F.col("size_b").alias("sb_a"),
        F.col("inter").alias("i_a"),
    )
    merged = s.join(a, ["doc_a", "doc_b"], "full_outer").select(
        "doc_a",
        "doc_b",
        F.coalesce("sa_s", "sa_a").alias("size_a"),
        F.coalesce("sb_s", "sb_a").alias("size_b"),
        (
            F.coalesce("i_s", F.lit(0)) + F.coalesce("i_a", F.lit(0))
        ).alias("inter"),
    )
    counts_new = merged.filter(F.col("inter") > 0)
    tombstones = dropped.select(
        "doc_a", "doc_b", "size_a", "size_b", F.lit(0).alias("inter")
    )
    changed = tombstones.unionByName(
        merged.join(a.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi")
    )
    return counts_new, changed, df_changed


def q_dedup_pairs_on_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Takedown-side near-dup pair maintenance, stated as a relation:
    the FULL corpus's inverted index, df table, and pre-threshold pair
    counts stand in for the banked state, a 10% slice
    (doc_id % 10 == 3) is deleted, and the pair graph is updated with
    :func:`_decremental_pair_counts` — dropped pairs by anti-join,
    cap-RECROSS additions recomputed exactly, one survivor shingle
    pass, never a from-scratch pair regeneration.  Output = (doc_a,
    doc_b, jaccard) of the shrunk corpus; the oracle is the direct
    pair SQL over the SURVIVORS, so a hash match proves the
    decremental update reproduces the from-scratch result
    value-for-value — including pairs that exist only because a shared
    shingle fell back under MAX_DF when its other holders were purged.
    See :func:`refresh_dedup_endgame_on_delete` for the txn form."""
    docs = load_table(spark, sf_dir, "documents")
    is_removed = (F.col("doc_id") % DOC_DEL_MOD) == DOC_DEL_REM
    base_sh = _materialize(hashed_shingle_stream(docs), "checkpoint")
    # base_df stands in for the txn-read df snapshot; it feeds TWO
    # executed consumers here (the kept-filter semi-join and the
    # cap-recross probe), so one checkpoint saves a corpus-shingle
    # re-aggregation (guide §5).  The banked pair counts stay LAZY
    # (r17, reverting r16): this query consumes only ``counts_new``,
    # whose single executed reader of base_counts is the survivor
    # anti-join — the r16 eager checkpoint materialized the FULL
    # pre-delete pair table (including rows only the discarded
    # ``changed`` output needs) for one consumer, and the idle-host
    # A/B read 4.74 s (ckpt) vs 3.64 s (lazy)
    # (plans/r17/probe_ckpt_ab.json).
    base_df = (
        base_sh.groupBy("h")
        .agg(F.count("*").alias("df"))
        .localCheckpoint(eager=True)
    )
    base_kept = base_sh.join(
        base_df.filter((F.col("df") >= 2) & (F.col("df") <= MAX_DF)),
        "h",
        "left_semi",
    )
    removed_ids = docs.filter(is_removed).select("doc_id")
    surv_sh = base_sh.join(removed_ids, "doc_id", "left_anti")
    counts_new, _, _ = _decremental_pair_counts(
        surv_sh,
        base_df,
        _pair_counts(base_kept),
        removed_ids,
    )
    return _jaccard_from_counts(counts_new)


def refresh_dedup_endgame_on_delete(
    spark: SparkSession, sf_dir: str, root: str
) -> dict[str, int]:
    """Takedown refresh after docs were PURGED from the corpus: detect
    the removed ids (banked ``sizes`` anti-join the corpus), re-count
    shingle dfs with one pass over the surviving corpus (the removed
    docs' text is gone, so their df contributions can only be inferred
    from what remains — see the cost note on
    :func:`_decremental_pair_counts`), update the pair graph with
    delta-sized drop/recross work, relabel only touched components,
    and republish with the shrunk corpus's fingerprint.  Returns
    {table: FINAL serving version} — a table touched by more than one
    commit in this refresh (postings: delete then merge; df/counts:
    merge then tombstone compaction) reports the last one, which is
    the version readers serve.  The removed-id set stays a DataFrame
    end-to-end (:func:`~..sources.txn.txn_delete_keys` — a bulk purge
    of millions of ids never builds an ``isin`` literal or a driver
    list; round-12 verdict item 2).  Byte-identity with a
    from-scratch rebuild on the shrunk corpus is pinned by
    tests/test_incremental_maintenance.py."""
    from ..sources.fingerprint import META_KEY, corpus_fingerprint
    from ..sources.txn import (
        txn_delete_keys,
        txn_delete_where,
        txn_merge_upsert,
        txn_read,
        txn_write,
    )

    meta = {
        META_KEY: corpus_fingerprint(sf_dir, "documents"),
        "source_table": "documents",
        "sf_dir": sf_dir,
        "op": "delete_refresh",
    }

    docs = load_table(spark, sf_dir, "documents")
    sizes = txn_read(spark, f"{root}/{_CACHE_SIZES}")
    # pinned once: the anti-join feeds the decremental counts AND both
    # key-frame deletes — never collected to the driver
    removed_ids = (
        sizes.select("doc_id")
        .distinct()
        .join(docs.select("doc_id"), "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    has_removed = bool(removed_ids.limit(1).count())

    base_df = txn_read(spark, f"{root}/{_CACHE_DF}")
    base_counts = txn_read(spark, f"{root}/{_CACHE_COUNTS}").filter(
        F.col("inter") > 0
    )
    base_pairs = txn_read(spark, f"{root}/{_CACHE_PAIRS}").select(
        "doc_a", "doc_b"
    )
    base_labels = txn_read(spark, f"{root}/{_CACHE_COMPONENTS}").select(
        "doc_id", "component_id"
    )

    surv_sh = _materialize(hashed_shingle_stream(docs), "checkpoint")
    counts_new, changed, df_changed = _decremental_pair_counts(
        surv_sh, base_df, base_counts, removed_ids
    )
    counts_new = _materialize(counts_new, "checkpoint")
    pairs_new = _jaccard_from_counts(counts_new).select("doc_a", "doc_b")
    pairs_new = pairs_new.localCheckpoint(eager=True)
    labels_new = _incremental_components(base_labels, base_pairs, pairs_new)

    # postings: removed docs' rows go; recross shingles' surviving
    # rows (now inside the cap) come in
    recross_postings = surv_sh.join(
        base_df.filter(F.col("df") > MAX_DF).select("h"), "h", "left_semi"
    ).join(
        df_changed.filter(F.col("df") <= MAX_DF).select("h"), "h", "left_semi"
    )
    versions = {}
    if has_removed:
        versions[_CACHE_SIZES] = txn_delete_keys(
            spark,
            f"{root}/{_CACHE_SIZES}",
            removed_ids,
            on=["doc_id"],
            app_meta=meta,
        )
        # interim version — the recross merge below supersedes it
        txn_delete_keys(
            spark,
            f"{root}/{_CACHE_POSTINGS}",
            removed_ids,
            on=["doc_id"],
            app_meta=meta,
        )
    else:  # nothing to purge: re-bank the fingerprint only
        for name in (_CACHE_SIZES, _CACHE_POSTINGS):
            versions[name] = txn_write(
                spark,
                txn_read(spark, f"{root}/{name}"),
                f"{root}/{name}",
                app_meta=meta,
            )
    versions[_CACHE_POSTINGS] = txn_merge_upsert(
        spark,
        recross_postings,
        f"{root}/{_CACHE_POSTINGS}",
        keys=["doc_id", "h"],
        app_meta=meta,
    )
    versions[_CACHE_DF] = txn_merge_upsert(
        spark, df_changed, f"{root}/{_CACHE_DF}", keys=["h"], app_meta=meta
    )
    versions[_CACHE_COUNTS] = txn_merge_upsert(
        spark,
        changed,
        f"{root}/{_CACHE_COUNTS}",
        keys=["doc_a", "doc_b"],
        app_meta=meta,
    )
    versions[_CACHE_PAIRS] = txn_write(
        spark, pairs_new, f"{root}/{_CACHE_PAIRS}", app_meta=meta
    )
    versions[_CACHE_COMPONENTS] = txn_write(
        spark, labels_new, f"{root}/{_CACHE_COMPONENTS}", app_meta=meta
    )
    # tombstone compaction: repeated delete cycles accumulate df=0
    # rows in the df cache and inter=0 rows in the counts cache —
    # both read-filtered by every consumer (the counts read above is
    # ``inter > 0``; a df=0 shingle's future growth re-merges from
    # zero either way), so physically dropping them is
    # correctness-neutral and keeps the caches from growing with
    # dead rows across refresh cycles.
    for name, dead in ((_CACHE_DF, "df <= 0"), (_CACHE_COUNTS, "inter <= 0")):
        v = txn_delete_where(spark, f"{root}/{name}", dead, app_meta=meta)
        versions[name] = max(versions[name], v)
    return versions


ORACLE_DEDUP_PAIRS_ON_DELETE = (
    "WITH "
    + _sql_pairs_body(
        f" WHERE doc_id % {DOC_DEL_MOD} <> {DOC_DEL_REM}"
    )
    + "SELECT doc_a, doc_b, jaccard FROM pairs"
)


def _incremental_components(
    base_labels: DataFrame, base_pairs: DataFrame, new_pairs: DataFrame
) -> DataFrame:
    """Exact (doc_id, component_id = min reachable) labels of the NEW
    pair graph, recomputing ONLY the components the edge diff touches.

    Edge diff = added ∪ removed pairs.  A component none of whose
    members touch a changed edge keeps its banked labels verbatim
    (every surviving edge inside it is unchanged, and new edges cannot
    reach it without making it touched); everything else — members of
    touched components plus never-labeled (new) docs — re-runs the
    star CC kernel over its slice of the new graph.  Removed edges are
    handled for free: the touched subgraph is rebuilt from the NEW
    graph, so splits fall out of the recompute (incremental CC under
    deletions is unsound any other way).  Work is proportional to the
    touched subgraph, not the corpus."""
    added = new_pairs.join(base_pairs, ["doc_a", "doc_b"], "left_anti")
    removed = base_pairs.join(new_pairs, ["doc_a", "doc_b"], "left_anti")
    changed_docs = (
        added.unionByName(removed)
        .select(F.col("doc_a").alias("doc_id"))
        .unionByName(
            added.unionByName(removed).select(F.col("doc_b").alias("doc_id"))
        )
        .distinct()
    )
    touched_comps = (
        base_labels.join(changed_docs, "doc_id")
        .select("component_id")
        .distinct()
    )
    touched_docs = base_labels.join(
        touched_comps, "component_id", "left_semi"
    ).select("doc_id")
    # recompute scope: touched members + docs with no banked label
    # (newly arrived).  Closure: an edge with one endpoint in scope has
    # both (an unchanged edge lies inside one base component; a changed
    # edge made both endpoints' components touched).
    labeled = base_labels.select("doc_id")
    in_scope = touched_docs.unionByName(
        new_pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(new_pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .join(labeled, "doc_id", "left_anti")
    )
    sub_edges = new_pairs.join(
        in_scope.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
    ).unionByName(
        new_pairs.join(
            in_scope.select(F.col("doc_id").alias("doc_b")),
            "doc_b",
            "left_semi",
        )
    ).distinct()
    frozen = base_labels.join(touched_comps, "component_id", "left_anti")
    return frozen.unionByName(
        connected_components(sub_edges.select("doc_a", "doc_b"))
    ).select("doc_id", "component_id")


def refresh_dedup_endgame_incremental(
    spark: SparkSession, sf_dir: str, root: str
) -> dict[str, int]:
    """Incremental endgame refresh after the corpus GREW: detect the
    new docs (anti-join against the banked ``sizes`` table), shingle
    ONLY them, fold them into the pair graph with
    :func:`_incremental_pair_counts` (delta-sized joins + the exact
    MAX_DF cap-crossing adjustment), update the component labels with
    :func:`_incremental_components` (touched components only), and
    republish — every commit re-banks the grown corpus's fingerprint
    so the staleness guard accepts it.  Returns {table: new version}.

    Publication strategy per table: ``sizes``/``postings``/``df``/
    ``counts`` are txn MERGEs of only the changed rows (delta docs'
    rows, touched shingles' dfs, adjusted pair counts — counts keeps
    inter = 0 tombstones, which are inert: a pair with no shared kept
    shingles can never be re-subtracted); ``pairs`` and ``components``
    are full snapshot writes — they are pair-graph-sized (orders of
    magnitude below the corpus) and genuinely shrink when jaccard
    falls below threshold or a component splits, which a keyed upsert
    cannot express.  Byte-identity with a from-scratch rebuild on the
    grown corpus is pinned by tests/test_incremental_maintenance.py."""
    from ..sources.fingerprint import META_KEY, corpus_fingerprint
    from ..sources.txn import txn_merge_upsert, txn_read, txn_write

    meta = {
        META_KEY: corpus_fingerprint(sf_dir, "documents"),
        "source_table": "documents",
        "sf_dir": sf_dir,
        "op": "incremental_refresh",
    }

    sizes = txn_read(spark, f"{root}/{_CACHE_SIZES}")
    base_df = txn_read(spark, f"{root}/{_CACHE_DF}")
    postings = txn_read(spark, f"{root}/{_CACHE_POSTINGS}")
    base_counts = txn_read(spark, f"{root}/{_CACHE_COUNTS}")
    base_pairs = txn_read(spark, f"{root}/{_CACHE_PAIRS}").select(
        "doc_a", "doc_b"
    )
    base_labels = txn_read(spark, f"{root}/{_CACHE_COMPONENTS}").select(
        "doc_id", "component_id"
    )

    docs = load_table(spark, sf_dir, "documents")
    new_docs = docs.join(sizes.select("doc_id"), "doc_id", "left_anti")
    delta_sh = _materialize(hashed_shingle_stream(new_docs), "checkpoint")

    counts_new, counts_changed, df_changed = _incremental_pair_counts(
        postings, base_df, base_counts, delta_sh
    )
    counts_new = _materialize(counts_new, "checkpoint")
    pairs_new = _jaccard_from_counts(counts_new).select("doc_a", "doc_b")
    pairs_new = pairs_new.localCheckpoint(eager=True)  # CC + diff reuse it
    labels_new = _incremental_components(base_labels, base_pairs, pairs_new)

    # postings gains only delta rows of shingles still under the cap
    # (an over-cap shingle never re-enters — df is monotone)
    delta_postings = delta_sh.join(
        df_changed.filter(F.col("df") <= MAX_DF), "h", "left_semi"
    )
    versions = {
        _CACHE_SIZES: txn_merge_upsert(
            spark,
            delta_sh.select("doc_id", "n_sh").distinct(),
            f"{root}/{_CACHE_SIZES}",
            keys=["doc_id"],
            app_meta=meta,
        ),
        _CACHE_POSTINGS: txn_merge_upsert(
            spark,
            delta_postings,
            f"{root}/{_CACHE_POSTINGS}",
            keys=["doc_id", "h"],
            app_meta=meta,
        ),
        _CACHE_DF: txn_merge_upsert(
            spark,
            df_changed,
            f"{root}/{_CACHE_DF}",
            keys=["h"],
            app_meta=meta,
        ),
        _CACHE_COUNTS: txn_merge_upsert(
            spark,
            counts_changed,
            f"{root}/{_CACHE_COUNTS}",
            keys=["doc_a", "doc_b"],
            app_meta=meta,
        ),
        _CACHE_PAIRS: txn_write(
            spark, pairs_new, f"{root}/{_CACHE_PAIRS}", app_meta=meta
        ),
        _CACHE_COMPONENTS: txn_write(
            spark, labels_new, f"{root}/{_CACHE_COMPONENTS}", app_meta=meta
        ),
    }
    return versions


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the exact-Jaccard pair graph: every doc
    in at least one pair, its component (min reachable doc_id), and
    the cluster size — the table a dedup job joins back to keep one
    canonical doc per cluster."""
    comp = dedup_component_labels(spark, sf_dir)
    w = Window.partitionBy("component_id")
    return comp.select(
        "doc_id",
        "component_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("component_id")).alias("canonical"),
    )


def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame a corpus job actually executes: the per-doc
    keep/drop decision.  Docs in no near-dup cluster keep; inside a
    cluster only the canonical (min reachable doc_id) member keeps.
    One left join of the corpus ids against the (cluster-members-only)
    component table — at 100 TB the component side is pair-graph-sized,
    orders of magnitude below the corpus, so AQE broadcasts it and the
    corpus is never shuffled."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # canonical is a pure projection of the label table (doc_id ==
    # component_id) — going through q_dedup_components dragged the
    # cluster_size window (+ its exchange) into the plan only to drop
    # the column (guide §1.2: don't compute things you throw away)
    comp = dedup_component_labels(spark, sf_dir).select(
        "doc_id",
        "component_id",
        (F.col("doc_id") == F.col("component_id")).alias("canonical"),
    )
    return docs.join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("canonical", F.lit(True)).alias("manter"),
        "component_id",
    )


SPLIT_FOLDS = 5


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/validation fold assignment: every document
    gets a fold in [0, SPLIT_FOLDS), but near-duplicate documents are
    assigned BY CLUSTER — the whole connected component lands in one
    fold, so a validation split can never contain a near-copy of a
    training document (the contamination mode exact-hash splits miss).

    The fold key is the cluster's component id (min reachable doc_id)
    for clustered docs and the doc's own id otherwise, pushed through
    the engine-agnostic :func:`hash60` with a purpose salt so the
    assignment is independent of the shard/export placements that use
    the same hash family.

    Scale shape: one left join of the corpus ids against the
    pair-graph-sized component table (orders of magnitude below the
    corpus — AQE broadcasts it; the corpus is never shuffled), then a
    pure per-row hash projection.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # the cluster_size window of q_dedup_components was dead weight
    # here — only the labels are consumed (guide §1.2)
    comp = dedup_component_labels(spark, sf_dir)
    group = F.coalesce("component_id", "doc_id")
    fold = (
        hash60(F.concat(F.lit("split:"), group.cast("string")))
        % SPLIT_FOLDS
    ).cast("int")
    return docs.join(comp, "doc_id", "left").select(
        "doc_id",
        group.alias("group_id"),
        F.col("component_id").isNotNull().alias("clustered"),
        fold.alias("fold"),
    )


ORACLE_LEAKAGE_SPLIT = (
    "WITH RECURSIVE "
    + _SQL_PAIRS_BODY
    + f"""
, verts AS (SELECT doc_a AS v FROM pairs UNION SELECT doc_b FROM pairs),
undirected AS (
  SELECT doc_a AS u, doc_b AS w FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT e.u AS v, reach.r FROM undirected e JOIN reach ON e.w = reach.v
),
comp AS (SELECT v AS doc_id, MIN(r) AS component_id FROM reach GROUP BY v)
SELECT d.doc_id,
       COALESCE(c.component_id, d.doc_id) AS group_id,
       c.component_id IS NOT NULL AS clustered,
       CAST({sql_hash60("'split:' || CAST(COALESCE(c.component_id, d.doc_id) AS VARCHAR)")}
            % {SPLIT_FOLDS} AS INT) AS fold
FROM documents d LEFT JOIN comp c USING (doc_id)
"""
)


# ---------------------------------------------------------------------------
# MinHash + LSH banding (engine-agnostic hashes → full value oracle)
# ---------------------------------------------------------------------------

def _band_key(cols) -> Column:
    """Fold a band's minhashes into one bucket key with a polynomial
    accumulator mod HASH_P (same fold in the oracle SQL)."""
    return functools.reduce(
        lambda acc, c: (acc * 131 + c) % HASH_P, cols, F.lit(0).cast("long")
    )


def _sql_band_key(names) -> str:
    expr = "0"
    for n in names:
        expr = f"(({expr}) * 131 + {n}) % {HASH_P}"
    return expr


def q_minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str, persist_mode: str = "checkpoint"
) -> DataFrame:
    """Near-dup pairs via MinHash signatures + LSH banding, verified
    with exact Jaccard ≥ 0.2 over hashed shingle sets.

    ``persist_mode`` picks how the shared per-doc relation is
    materialized: ``"checkpoint"`` (default, the bench shape) uses an
    eager ``localCheckpoint`` — fastest, but executor-local and NOT
    fault-tolerant (a lost executor fails the job, lineage is
    truncated); ``"persist"`` uses ``persist(MEMORY_AND_DISK)`` — the
    production default on a long-lived cluster: same compute-once
    sharing, and a lost block is recomputed from lineage instead of
    failing the job.  Both return identical rows.

    k=32 universal-hash minhashes per doc — mh_i = min over shingles of
    (a_i·H + b_i) mod P, where H is the engine-agnostic 60-bit md5
    hash.  The corpus is scanned and shingled exactly ONCE: a single
    doc-keyed hash aggregate produces both the 32-long signature (map-
    side partial MIN combine) and the doc's distinct hashed-shingle set
    (``collect_set(h)`` — 8 bytes per shingle, strictly smaller than
    re-shuffling shingle text), and that relation is localCheckpointed
    so the banding branch and the verification branch read the same
    materialized partitions instead of re-running the regex shingler.
    (Round 4 pruned with a semi-join + second shingle pass; the second
    scan doubled local latency — BENCH_r04 3.77 s vs 1.89 s baseline —
    and at 100 TB it re-reads the whole corpus.  This shape reads it
    once, full stop.)  Banding folds each 4-row band into a bucket key;
    docs sharing a band bucket are candidates (shuffle keyed by band
    key, so bucket sizes — not n — drive cost); candidates carry ids
    only, and verification joins the ids back to the checkpointed
    per-doc sets.  Jaccard over the 60-bit hashed sets equals Jaccard
    over the shingle strings barring md5 collisions, and the DuckDB
    oracle computes the SAME hashed sets, so the value oracle stays
    exact."""
    docs = load_table(spark, sf_dir, "documents")
    with_sh = with_shingles(docs)
    sh = with_sh.select("doc_id", F.explode_outer("sh").alias("shingle")).filter(
        F.col("shingle").isNotNull()
    )

    h = (hash60(F.col("shingle")) % HASH_P).alias("h")
    per_doc = (
        sh.select("doc_id", h)
        .groupBy("doc_id")
        .agg(
            *[
                F.min(
                    (F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i])) % HASH_P
                ).alias(f"mh_{i}")
                for i in range(MINHASH_K)
            ],
            F.collect_set("h").alias("hset"),
        )
    )
    # Materialize once; both branches below read these partitions.
    # Per-invocation cost (each bench run recomputes — no cross-run
    # cache flattery); size is docs × (32 longs + hashed set).
    per_doc = _materialize(per_doc, persist_mode)

    rows_per_band = MINHASH_K // LSH_BANDS
    band_cols = []
    for b in range(LSH_BANDS):
        cols = [
            F.col(f"mh_{i}")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), _band_key(cols).alias("h"))
        )
    banded = per_doc.select(
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

    sh_a = per_doc.select(F.col("doc_id").alias("doc_a"), F.col("hset").alias("hs_a"))
    sh_b = per_doc.select(F.col("doc_id").alias("doc_b"), F.col("hset").alias("hs_b"))
    verified = cand.join(sh_a, "doc_a").join(sh_b, "doc_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        verified.select(
            "doc_a",
            "doc_b",
            F.round(inter / union.cast("double"), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


_ROWS_PER_BAND = MINHASH_K // LSH_BANDS

_SQL_MINHASH_AGGS = ",\n         ".join(
    f"MIN(({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {HASH_P}) AS mh_{i}"
    for i in range(MINHASH_K)
)

_SQL_BAND_SELECTS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, "
    + _sql_band_key(
        [f"mh_{i}" for i in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND)]
    )
    + " AS h FROM sig"
    for b in range(LSH_BANDS)
)

# MinHash CTE chain from ``sh`` to the verified pair set ``mh_pairs``
# — shared by the standalone oracle below and the recall-audit oracle
# (CTE names are disjoint from _SQL_PAIRS_BODY's, so both chains can
# hang off one shingle body).
_SQL_MINHASH_BODY = f"""
, hashed AS (
  SELECT doc_id, {sql_hash60('shingle')} % {HASH_P} AS h FROM sh
), sig AS (
  SELECT doc_id,
         {_SQL_MINHASH_AGGS}
  FROM hashed GROUP BY doc_id
), banded AS (
  {_SQL_BAND_SELECTS}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.h = b.h
  WHERE a.doc_id < b.doc_id
), doc_sh AS (
  SELECT doc_id, list(DISTINCT h) AS hset FROM hashed GROUP BY doc_id
), mh_pairs AS (
  SELECT c.doc_a, c.doc_b,
         ROUND(CAST(len(list_intersect(sa.hset, sb.hset)) AS DOUBLE)
               / CAST(len(sa.hset) + len(sb.hset)
                      - len(list_intersect(sa.hset, sb.hset)) AS DOUBLE), 4)
           AS jaccard
  FROM cand c
  JOIN doc_sh sa ON c.doc_a = sa.doc_id
  JOIN doc_sh sb ON c.doc_b = sb.doc_id
  WHERE ROUND(CAST(len(list_intersect(sa.hset, sb.hset)) AS DOUBLE)
              / CAST(len(sa.hset) + len(sb.hset)
                     - len(list_intersect(sa.hset, sb.hset)) AS DOUBLE), 4) >= 0.2
)
"""

ORACLE_MINHASH_LSH = (
    _SQL_SHINGLES
    + _SQL_MINHASH_BODY
    + "SELECT doc_a, doc_b, jaccard FROM mh_pairs"
)


def doc_hsets(docs: DataFrame) -> DataFrame:
    """(doc_id, hset) — the distinct 60-bit hashed-shingle set per
    document, as pure per-row projections (no aggregation, so it runs
    unchanged on streaming frames).  The shared vocabulary between the
    per-row streaming band build (:func:`minhash_band_stream`) and the
    batch-side overflow compaction
    (:func:`etl_python_spark.streaming.file_stream.neardup_overflow_compaction`):
    both sides derive the SAME integer set for a doc, so exact-Jaccard
    verification in either engine yields identical values."""
    toked = docs.select(
        "doc_id", F.split(_norm_text(F.col("text")), " ").alias("toks")
    )
    hset = F.array_distinct(
        F.transform(
            _shingles_from_tokens(F.col("toks")),
            lambda s: hash60(s) % HASH_P,
        )
    )
    return toked.select("doc_id", hset.alias("hset"))


def minhash_band_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, hset, band, key) computed PER ROW — pure projections
    (shingle → hash → per-band MinHash fold), no aggregation, so the
    same expression tree runs unchanged on a STREAMING frame (the
    batch :func:`q_minhash_lsh_pairs` reaches identical values through
    an explode + groupBy because its verification branch also needs
    the doc-keyed hset relation; per-row HOFs are the
    streaming-compatible restatement):

    * ``hset``   — distinct 60-bit hashed shingles mod HASH_P,
    * ``key``    — the band's polynomial fold of its MINHASH_K/LSH_BANDS
      row minhashes, where minhash_i = MIN over hset of
      (a_i·h + b_i) mod P.

    Docs sharing (band, key) are near-dup candidates; the streaming
    consumer (``streaming.file_stream.stream_neardup``) keeps bucket
    membership in state and verifies exact Jaccard over the carried
    hsets."""
    with_hset = doc_hsets(docs)
    mh = [
        F.array_min(
            F.transform(
                F.col("hset"),
                lambda h: (F.lit(MINHASH_A[i]) * h + F.lit(MINHASH_B[i]))
                % HASH_P,
            )
        )
        for i in range(MINHASH_K)
    ]
    rpb = MINHASH_K // LSH_BANDS
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            _band_key(mh[b * rpb : (b + 1) * rpb]).alias("key"),
        )
        for b in range(LSH_BANDS)
    ]
    return with_hset.select(
        "doc_id", "hset", F.explode(F.array(*band_structs)).alias("bk")
    ).select("doc_id", "hset", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


# ---------------------------------------------------------------------------
# SimHash (engine-agnostic 60-bit signature → full value oracle)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 60  # bits of the md5-derived token hash → signature width


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document: explode distinct tokens, hash each
    ONCE with the engine-agnostic md5-prefix hash, and take 60
    map-side bit-vote sums in a single hash aggregate keyed by doc —
    votes[i] = Σ ±1 by bit i of the token hash; simhash bit_i =
    votes[i] > 0.

    This is the same shape as the MinHash signature build (partial
    aggregation combines votes before the doc-keyed shuffle, which
    carries 60 ints per row).  An ``aggregate`` lambda folding a
    60-wide array per token allocated an array per token per row and
    ran ~2× slower; higher-order lambdas also sit outside whole-stage
    codegen.  60 bits (not 64) keeps the signature and every shift
    inside signed-BIGINT range in BOTH engines, so the DuckDB oracle
    reproduces it exactly."""
    return simhash_signatures(spread(load_table(spark, sf_dir, "documents"), "doc_id"))


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash long) — see :func:`q_simhash`."""
    toks = docs.select(
        "doc_id",
        F.explode_outer(F.array_distinct(F.split(_norm_text(F.col("text")), " "))).alias(
            "tok"
        ),
    ).filter(F.col("tok").isNotNull())
    hashed = toks.select("doc_id", hash60(F.col("tok")).alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"v_{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    simhash = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v_{i}") > 0, F.lit(1)).otherwise(F.lit(0))
        simhash = simhash.bitwiseOR(F.shiftleft(bit.cast("long"), i))
    return votes.select("doc_id", simhash.alias("simhash"))


_SQL_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN v_{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)"
    for i in range(SIMHASH_BITS)
)

_SQL_SIMHASH_VOTES = ",\n         ".join(
    f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{i}"
    for i in range(SIMHASH_BITS)
)

_SQL_SIMHASH_SIG = f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
), toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(t, ' '))) AS tok FROM norm
), hashed AS (
  SELECT doc_id, {sql_hash60('tok')} AS h FROM toks
), votes AS (
  SELECT doc_id,
         {_SQL_SIMHASH_VOTES}
  FROM hashed GROUP BY doc_id
), sig AS (
  SELECT doc_id, CAST({_SQL_SIMHASH_BITS} AS BIGINT) AS simhash FROM votes
)
"""

ORACLE_SIMHASH = _SQL_SIMHASH_SIG + "SELECT doc_id, simhash FROM sig"


SIMHASH_BANDS = 4  # 4 × 15-bit bands: catches all pairs with hamming ≤ 3
HAMMING_T = 3


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """**AUDIT-ONLY operator — not a production pair generator.**
    :func:`q_simhash_recall_audit` measures it against exact-Jaccard
    ground truth at precision ≈ 0.002 (sf0.01) / 0.0002 (sf0.1) /
    0.006 (sf1) and recall ≈ 0.21: document-level hamming ≤ 3 on a
    60-bit unweighted-token SimHash does not coincide with the
    Jaccard ≥ 0.2 near-dup regime on this corpus at ANY tested scale
    (re-measured rounds 9-11; the round-10/11 verdict fence).  MinHash
    +LSH (:func:`q_minhash_lsh_pairs`, measured recall ~1.0) is the
    production path; this query stays implemented, oracled, and benched
    as the comparison point the audit quantifies.

    Mechanics (correct as specified): pairs by SimHash hamming
    distance ≤ 3 via the pigeonhole banding trick — split the 60-bit
    signature into 4 15-bit bands; any pair within distance 3 agrees
    exactly on at least one band, so candidates come from a band-keyed
    self-join (shuffle on (band, 15-bit key); bucket sizes, not n²,
    drive cost) and are verified with one ``bit_count(a XOR b)``.
    Signatures are engine-agnostic (md5-derived), so the oracle
    replicates the whole pipeline."""
    sig = simhash_signatures(spread(load_table(spark, sf_dir, "documents"), "doc_id"))
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", 15 * b)
                        .bitwiseAND(F.lit(0x7FFF))
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
        .select("doc_a", "doc_b", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int").alias("hamming"))
        .filter(F.col("hamming") <= HAMMING_T)
        .dropDuplicates(["doc_a", "doc_b"])
    )


# ---------------------------------------------------------------------------
# Incremental dedup: a new batch against an existing corpus snapshot
# ---------------------------------------------------------------------------

def incremental_dedup(base: DataFrame, incoming: DataFrame) -> DataFrame:
    """Classify every incoming document against an existing corpus
    snapshot: ``dup_within`` (a lower-id incoming row has the same
    normalized-text hash), ``dup_base`` (first incoming occurrence, but
    the hash already exists in the snapshot), or ``new`` — the daily
    ingest step of a continuously-crawled corpus.

    Scale shape: both the within-batch window and the snapshot join
    key on ``content_hash``, so Catalyst reuses ONE hash shuffle of
    the incoming batch for both steps; the snapshot side is reduced to
    distinct hashes before the join (a 100 TB snapshot contributes
    only its fingerprint column through an exchange, and Spark's
    runtime bloom-filter injection —
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` — prunes
    definite-new hashes before that shuffle).  No collect, no
    driver-side membership set."""
    h = F.md5(_norm_text(F.col("text")))
    base_h = base.select(h.alias("content_hash")).distinct().withColumn(
        "in_base", F.lit(True)
    )
    inc = incoming.select("doc_id", h.alias("content_hash"))
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    ranked = inc.withColumn("rn", F.row_number().over(w))
    status = (
        F.when(F.col("rn") > 1, F.lit("dup_within"))
        .when(F.col("in_base"), F.lit("dup_base"))
        .otherwise(F.lit("new"))
    )
    return ranked.join(base_h, "content_hash", "left").select(
        "doc_id", "content_hash", status.alias("status")
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: snapshot = doc_id % 10 < 8 (the corpus already
    ingested), incoming = the remaining 20% (today's batch)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return incremental_dedup(
        docs.filter(F.col("doc_id") % 10 < 8),
        docs.filter(F.col("doc_id") % 10 >= 8),
    )


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: inside each near-dup cluster
    keep the member with the MOST tokens (tie → lowest doc_id) instead
    of the min-id member — the curation policy that keeps the fullest
    copy of a boilerplate-trimmed page rather than an arbitrary one.

    Same scale shape as :func:`q_dedup_keep_canonical`: the score
    window runs only over cluster MEMBERS (pair-graph-sized), never
    the corpus; the corpus contributes one projected column and one
    left join that AQE broadcasts."""
    # narrow (doc_id, n_tokens) label table; the member join and the
    # final left join both read it — checkpoint so the corpus is
    # tokenized once, not once per consumer.
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id",
        F.size(F.split(_norm_text(F.col("text")), " ")).alias("n_tokens"),
    ).localCheckpoint(eager=True)
    # labels only — q_dedup_components' cluster_size window is unused
    comp = dedup_component_labels(spark, sf_dir)
    members = comp.join(docs, "doc_id")
    w = Window.partitionBy("component_id").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    best = members.withColumn("rnk", F.row_number().over(w))
    return docs.join(
        best.select("doc_id", "component_id", "rnk"), "doc_id", "left"
    ).select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("rnk") == 1, F.lit(True)).alias("manter"),
        "component_id",
    )


ORACLE_DEDUP_KEEP_BEST = (
    "WITH RECURSIVE "
    + _SQL_PAIRS_BODY
    + """
, verts AS (SELECT doc_a AS v FROM pairs UNION SELECT doc_b FROM pairs),
undirected AS (
  SELECT doc_a AS u, doc_b AS w FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT e.u AS v, reach.r FROM undirected e JOIN reach ON e.w = reach.v
),
comp AS (SELECT v AS doc_id, MIN(r) AS component_id FROM reach GROUP BY v),
scored AS (
  SELECT doc_id,
         len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))
           AS n_tokens
  FROM documents
),
ranked AS (
  SELECT c.doc_id, c.component_id, s.n_tokens,
         ROW_NUMBER() OVER (PARTITION BY c.component_id
           ORDER BY s.n_tokens DESC, c.doc_id ASC) AS rnk
  FROM comp c JOIN scored s USING (doc_id)
)
SELECT s.doc_id, CAST(s.n_tokens AS INT) AS n_tokens,
       COALESCE(r.rnk = 1, TRUE) AS manter,
       r.component_id
FROM scored s LEFT JOIN ranked r USING (doc_id)
"""
)


ORACLE_INCREMENTAL_DEDUP = """
WITH hashed AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM documents
), base AS (
  SELECT DISTINCT h FROM hashed WHERE doc_id % 10 < 8
), inc AS (
  SELECT doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
  FROM hashed WHERE doc_id % 10 >= 8
)
SELECT i.doc_id, i.h AS content_hash,
       CASE WHEN i.rn > 1 THEN 'dup_within'
            WHEN b.h IS NOT NULL THEN 'dup_base'
            ELSE 'new' END AS status
FROM inc i LEFT JOIN base b ON i.h = b.h
"""


# ---------------------------------------------------------------------------
# Approximation audit: MinHash+LSH vs the exact-Jaccard ground truth
# ---------------------------------------------------------------------------

def q_minhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure, don't guess: precision/recall of the MinHash+LSH pair
    generator against the exact inverted-index Jaccard pairs as ground
    truth — the audit that justifies (or re-tunes) the band/row
    configuration before trusting the approximate path at 100 TB,
    where only the approximate path is affordable.  One full-outer
    join of the two pair sets on (doc_a, doc_b) and a single count
    aggregate; both inputs are the already-bounded pair relations,
    never the corpus."""
    ex = q_ngram_jaccard_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(True).alias("in_ex")
    )
    mh = q_minhash_lsh_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(True).alias("in_mh")
    )
    j = mh.join(ex, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("in_mh", F.lit(False)).alias("in_mh"),
        F.coalesce("in_ex", F.lit(False)).alias("in_ex"),
    )
    tp = F.sum((F.col("in_mh") & F.col("in_ex")).cast("int")).cast("bigint")
    fp = F.sum((F.col("in_mh") & ~F.col("in_ex")).cast("int")).cast("bigint")
    fn = F.sum((~F.col("in_mh") & F.col("in_ex")).cast("int")).cast("bigint")
    return j.agg(
        tp.alias("tp"), fp.alias("fp"), fn.alias("fn")
    ).select(
        "tp",
        "fp",
        "fn",
        F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 4)
        .alias("precision"),
        F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 4)
        .alias("recall"),
    )


ORACLE_MINHASH_RECALL = (
    "WITH "
    + _SQL_PAIRS_BODY
    + _SQL_MINHASH_BODY
    + """
, j AS (
  SELECT m.doc_a IS NOT NULL AS in_mh, e.doc_a IS NOT NULL AS in_ex
  FROM mh_pairs m FULL OUTER JOIN pairs e
    ON m.doc_a = e.doc_a AND m.doc_b = e.doc_b
), agg AS (
  SELECT CAST(SUM(CASE WHEN in_mh AND in_ex THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN in_mh AND NOT in_ex THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN NOT in_mh AND in_ex THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM j
)
SELECT tp, fp, fn,
       ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 4) AS precision,
       ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 4) AS recall
FROM agg
"""
)


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "dedup_pairs_incremental": q_dedup_pairs_incremental,
    "dedup_pairs_on_delete": q_dedup_pairs_on_delete,
    "dedup_components": q_dedup_components,
    "dedup_keep_canonical": q_dedup_keep_canonical,
    "leakage_safe_split": q_leakage_safe_split,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash": q_simhash,
    "simhash_neardup": q_simhash_neardup,
    "incremental_dedup": q_incremental_dedup,
    "dedup_keep_best": q_dedup_keep_best,
    "minhash_recall_audit": q_minhash_recall_audit,
}

_SQL_SIMHASH_BANDS = "\n  UNION ALL ".join(
    f"SELECT doc_id, simhash, {b} AS band, (simhash >> {15 * b}) & 32767 AS key FROM sig"
    for b in range(SIMHASH_BANDS)
)

ORACLE_SIMHASH_NEARDUP = (
    _SQL_SIMHASH_SIG
    + f"""
, banded AS (
  {_SQL_SIMHASH_BANDS}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_T}
"""
)

def q_simhash_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash twin of :func:`q_minhash_recall_audit` (round-9
    audit symmetry): precision/recall of the hamming-banded SimHash
    pair generator against the exact inverted-index Jaccard pairs —
    the number that says what the 60-bit signature actually buys
    before anyone swaps it in for the (costlier) MinHash path at
    100 TB.  Same shape: one full-outer join of two already-bounded
    pair relations + a single count fold."""
    ex = q_ngram_jaccard_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(True).alias("in_ex")
    )
    sh = q_simhash_neardup(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(True).alias("in_sh")
    )
    j = sh.join(ex, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("in_sh", F.lit(False)).alias("in_sh"),
        F.coalesce("in_ex", F.lit(False)).alias("in_ex"),
    )
    tp = F.sum((F.col("in_sh") & F.col("in_ex")).cast("int")).cast("bigint")
    fp = F.sum((F.col("in_sh") & ~F.col("in_ex")).cast("int")).cast("bigint")
    fn = F.sum((~F.col("in_sh") & F.col("in_ex")).cast("int")).cast("bigint")
    return j.agg(tp.alias("tp"), fp.alias("fp"), fn.alias("fn")).select(
        "tp",
        "fp",
        "fn",
        F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 4)
        .alias("precision"),
        F.round(F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), 4)
        .alias("recall"),
    )


def _oracle_simhash_recall() -> str:
    """Compose the Jaccard-pairs CTE body with the SimHash signature
    body: the latter's ``norm``/``toks`` CTE names collide with the
    former's (different definitions), so they are renamed — each
    replace is count-asserted to fail loudly if either body drifts."""
    body = _SQL_SIMHASH_SIG
    for old, new, times in (
        ("\nWITH norm AS", "\n, sh_norm AS", 1),
        ("FROM norm\n", "FROM sh_norm\n", 1),
        ("), toks AS", "), sh_toks AS", 1),
        ("FROM toks", "FROM sh_toks", 1),
    ):
        assert body.count(old) == times, (old, body.count(old))
        body = body.replace(old, new)
    return (
        "WITH "
        + _SQL_PAIRS_BODY
        + body
        + f"""
, banded AS (
  {_SQL_SIMHASH_BANDS}
), sh_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
    AND bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_T}
), j AS (
  SELECT s.doc_a IS NOT NULL AS in_sh, e.doc_a IS NOT NULL AS in_ex
  FROM sh_pairs s FULL OUTER JOIN pairs e
    ON s.doc_a = e.doc_a AND s.doc_b = e.doc_b
), agg AS (
  SELECT CAST(SUM(CASE WHEN in_sh AND in_ex THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN in_sh AND NOT in_ex THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN NOT in_sh AND in_ex THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM j
)
SELECT tp, fp, fn,
       ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 4) AS precision,
       ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 4) AS recall
FROM agg
"""
    )


QUERIES["simhash_recall_audit"] = q_simhash_recall_audit

ORACLES = {
    "simhash_recall_audit": _oracle_simhash_recall(),
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "ngram_jaccard_pairs": ORACLE_NGRAM_JACCARD,
    # the incremental update must reproduce the FULL-corpus pair graph
    # value-for-value — same oracle text as ngram_jaccard_pairs
    "dedup_pairs_incremental": ORACLE_NGRAM_JACCARD,
    "dedup_pairs_on_delete": ORACLE_DEDUP_PAIRS_ON_DELETE,
    "dedup_components": ORACLE_DEDUP_COMPONENTS,
    "dedup_keep_canonical": ORACLE_DEDUP_KEEP,
    "leakage_safe_split": ORACLE_LEAKAGE_SPLIT,
    "minhash_lsh_pairs": ORACLE_MINHASH_LSH,
    "simhash": ORACLE_SIMHASH,
    "simhash_neardup": ORACLE_SIMHASH_NEARDUP,
    "incremental_dedup": ORACLE_INCREMENTAL_DEDUP,
    "dedup_keep_best": ORACLE_DEDUP_KEEP_BEST,
    "minhash_recall_audit": ORACLE_MINHASH_RECALL,
}
