"""Fuzzy (edit-distance) entity matching with q-gram prefix filtering.

The reference cleans free-typed Brazilian entity fields with
normalize-then-exact De-Para maps (``Algoritmo de Estruturação de
Dados.py``, the De-Para family — SURVEY §2.7).  This module adds the
operator that family reaches for when normalization is NOT enough:
match dirty strings against a clean dimension within Levenshtein
distance K, at scale, WITHOUT the all-pairs product.

Plan (AllPairs/EDJoin prefix filtering, Xiao et al., VLDB 2008):

1. extract q-grams (q=3) from both sides — narrow transform+explode,
   stays in codegen;
2. rank each string's distinct grams by one GLOBAL frequency order
   (rarest first; ties broken by the gram string).  If
   ed(a, b) <= K, the two strings disagree on at most q*K grams, so
   the first q*K+1 grams of each — under ANY shared total order —
   must intersect: joining on kept grams is candidate-complete.  The
   order only shapes candidate COUNT (rare grams give short postings),
   never correctness, because of step 4;
3. equi-join probe prefixes × clean prefixes on the gram (hash join
   keyed on the gram — the only shuffle touching both relations),
   dedup candidate pairs;
4. verify exactly: length band |len(a)-len(b)| <= K, then
   ``levenshtein(a, b) <= K`` (JVM builtin) — so the output equals
   the brute-force all-pairs result, which is exactly what the
   DuckDB oracle computes.

Scale: the prefix keeps q*K+1 = 7 grams per string, so candidate
volume is bounded by posting-list lengths.  A degenerate corpus
(every string sharing one rare gram) skews the candidate join on
that gram's key — dropping the gram would break candidate
completeness, so the mitigation is the join-level one: AQE's skew
join (`spark.sql.adaptive.skewJoin`, on by default in the session)
splits the hot gram's partition at runtime without changing results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

Q = 3  # gram width
K = 2  # edit-distance threshold
PREFIX = Q * K + 1  # prefix-filter length: candidate-complete for ed<=K
PROBE_MOD = 10  # deterministic probe sample (keeps the brute oracle feasible)


def gram_explode(df: DataFrame, id_cols: list[str], s_col: str) -> DataFrame:
    """(ids..., s) -> one row per distinct q-gram of s (strings shorter
    than Q produce no rows, hence no candidates — callers match them
    by other means)."""
    return df.filter(F.length(s_col) >= Q).select(
        *id_cols,
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length({s_col}) - {Q} + 1),"
                    f" i -> substring({s_col}, i, {Q}))"
                )
            )
        ).alias("gram"),
    )


def prefix_grams(grams: DataFrame, freq: DataFrame, id_col: str) -> DataFrame:
    """Keep each string's PREFIX rarest grams under the shared global
    (freq, gram) order.  Grams unseen in the freq table rank rarest
    (freq 0)."""
    ranked = grams.join(F.broadcast(freq), "gram", "left").withColumn(
        "gfreq", F.coalesce(F.col("gfreq"), F.lit(0))
    )
    w = Window.partitionBy(id_col).orderBy(F.asc("gfreq"), F.asc("gram"))
    return (
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PREFIX)
        .drop("rk", "gfreq")
    )


def fuzzy_match(probes: DataFrame, names: DataFrame) -> DataFrame:
    """Match probes(probe_id, dirty) to names(name) with ed <= K.

    Candidate-complete prefix-filtered join + exact verify; the output
    equals brute force (the oracle computes exactly that)."""
    # the clean-dimension gram relation feeds BOTH the frequency
    # aggregate and the prefix ranking, and freq feeds both sides'
    # rankings — checkpoint each once (dimension-sized) or the clean
    # explode subtree re-executes per consumer.
    clean_grams = gram_explode(
        names.select(F.col("name"), F.col("name").alias("s")), ["name"], "s"
    ).localCheckpoint(eager=True)
    freq = (
        clean_grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gfreq"))
        .localCheckpoint(eager=True)
    )
    clean_pref = prefix_grams(clean_grams, freq, "name")

    probe_grams = gram_explode(probes, ["probe_id", "dirty"], "dirty")
    probe_pref = prefix_grams(probe_grams, freq, "probe_id")

    cand = (
        probe_pref.join(clean_pref, "gram")
        .select("probe_id", "dirty", "name")
        # dirty is functionally dependent on probe_id — including it in
        # the distinct keys keeps the dedup a hash aggregate (first()
        # would force a SortAggregate)
        .dropDuplicates(["probe_id", "dirty", "name"])
    )
    return cand.filter(
        (F.abs(F.length("dirty") - F.length("name")) <= F.lit(K))
        & (F.levenshtein("dirty", "name") <= F.lit(K))
    ).select(
        "probe_id",
        "dirty",
        "name",
        F.levenshtein("dirty", "name").cast("int").alias("dist"),
    )


def fuzzy_self_pairs(strings: DataFrame) -> DataFrame:
    """All unordered pairs (a < b) with ed <= K within ONE string set
    — exactly ``fuzzy_match(strings, strings)`` filtered to
    ``probe < name``, but the gram explode, the frequency table and
    the PREFIX-rarest window run ONCE over the set instead of twice
    over two copies of the identical relation (the self-match case;
    guide §1.2 "don't compute things you throw away").  The shared
    prefix-gram relation is checkpointed because both join sides
    consume it; the candidate set and the exact verify are unchanged,
    so the output rows are identical."""
    grams = gram_explode(strings, ["s"], "s")
    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gfreq"))
    pref = prefix_grams(grams, freq, "s").localCheckpoint(eager=True)
    cand = (
        pref.select(F.col("s").alias("a"), "gram")
        .join(
            pref.select(F.col("s").alias("b"), F.col("gram").alias("gram_b")),
            F.col("gram") == F.col("gram_b"),
        )
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    return cand.filter(
        (F.abs(F.length("a") - F.length("b")) <= F.lit(K))
        & (F.levenshtein("a", "b") <= F.lit(K))
    ).select(
        "a", "b", F.levenshtein("a", "b").cast("int").alias("dist")
    )


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant match of perturbed part names back to the clean
    part-name dimension.

    The dirty side is DERIVED deterministically from the data (one
    character deleted at position p_partkey mod length — the same
    expression the oracle computes), so both engines corrupt the same
    strings and the result is guaranteed non-trivial: every probe
    recovers its source name at distance 1, plus any true
    near-collisions.  The probe side is the deterministic 1-in-10
    p_partkey sample so the oracle's brute-force verify stays feasible
    at sf0.1; the Spark path needs no such cap."""
    p = load_table(spark, sf_dir, "part")
    cut = "cast(p_partkey % length(p_name) as int)"
    probes = p.filter(F.col("p_partkey") % PROBE_MOD == 0).select(
        F.col("p_partkey").alias("probe_id"),
        F.concat(
            F.expr(f"substring(p_name, 1, {cut})"),
            F.expr(f"substring(p_name, {cut} + 2, length(p_name))"),
        ).alias("dirty"),
    )
    names = p.select(F.col("p_name").alias("name")).distinct()
    return fuzzy_match(probes, names)


ORACLE_FUZZY_MATCH = f"""
WITH probes AS (
  SELECT p_partkey AS probe_id,
         SUBSTRING(p_name, 1, CAST(p_partkey % LENGTH(p_name) AS INT))
         || SUBSTRING(p_name,
                      CAST(p_partkey % LENGTH(p_name) AS INT) + 2,
                      LENGTH(p_name)) AS dirty
  FROM part WHERE p_partkey % {PROBE_MOD} = 0
), names AS (
  SELECT DISTINCT p_name AS name FROM part
)
SELECT p.probe_id, p.dirty, n.name,
       CAST(levenshtein(p.dirty, n.name) AS INT) AS dist
FROM probes p JOIN names n
  ON ABS(LENGTH(p.dirty) - LENGTH(n.name)) <= {K}
 AND levenshtein(p.dirty, n.name) <= {K}
"""


def q_fuzzy_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: cluster the union of clean part names and
    their perturbed variants (the q_fuzzy_match probe set — a dirty
    population that GROWS with scale) into entities by transitive
    ed <= K similarity.  Pipeline = the prefix-filtered self-similarity
    join (never all-pairs) feeding min-label-propagation connected
    components (dedup.connected_components — the shared CC kernel);
    the entity id is the lexicographically smallest member string.
    Singletons keep themselves as their entity (cluster_size 1), so
    the output covers the full population — the join-back shape a
    harmonization job needs.
    """
    from .dedup import connected_components

    p = load_table(spark, sf_dir, "part")
    cut = "cast(p_partkey % length(p_name) as int)"
    dirty = p.filter(F.col("p_partkey") % PROBE_MOD == 0).select(
        F.concat(
            F.expr(f"substring(p_name, 1, {cut})"),
            F.expr(f"substring(p_name, {cut} + 2, length(p_name))"),
        ).alias("s")
    )
    strings = (
        p.select(F.col("p_name").alias("s")).unionAll(dirty).distinct()
    )
    strings = strings.localCheckpoint(eager=True)

    pairs = fuzzy_self_pairs(strings)

    comp = connected_components(
        pairs.select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    )
    out = strings.join(
        comp, strings["s"] == comp["doc_id"], "left"
    ).select(
        "s", F.coalesce("component_id", F.col("s")).alias("entity_id")
    )
    w = Window.partitionBy("entity_id")
    return out.select(
        "s",
        "entity_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("s") == F.col("entity_id")).alias("canonical"),
    )


ORACLE_FUZZY_COMPONENTS = f"""
WITH RECURSIVE strings AS (
  SELECT DISTINCT s FROM (
    SELECT p_name AS s FROM part
    UNION ALL
    SELECT SUBSTRING(p_name, 1, CAST(p_partkey % LENGTH(p_name) AS INT))
           || SUBSTRING(p_name,
                        CAST(p_partkey % LENGTH(p_name) AS INT) + 2,
                        LENGTH(p_name))
    FROM part WHERE p_partkey % {PROBE_MOD} = 0
  )
), pairs AS (
  SELECT a.s AS u, b.s AS w
  FROM strings a JOIN strings b
    ON a.s < b.s
   AND ABS(LENGTH(a.s) - LENGTH(b.s)) <= {K}
   AND levenshtein(a.s, b.s) <= {K}
), verts AS (
  SELECT u AS v FROM pairs UNION SELECT w FROM pairs
), undirected AS (
  SELECT u, w FROM pairs UNION SELECT w, u FROM pairs
), reach AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT e.u AS v, reach.r FROM undirected e JOIN reach ON e.w = reach.v
), comp AS (
  SELECT v, MIN(r) AS component_id FROM reach GROUP BY v
)
SELECT st.s,
       COALESCE(c.component_id, st.s) AS entity_id,
       COUNT(*) OVER (PARTITION BY COALESCE(c.component_id, st.s))
         AS cluster_size,
       st.s = COALESCE(c.component_id, st.s) AS canonical
FROM strings st LEFT JOIN comp c ON st.s = c.v
"""


QUERIES = {
    "fuzzy_match": q_fuzzy_match,
    "fuzzy_components": q_fuzzy_components,
}

ORACLES = {
    "fuzzy_match": ORACLE_FUZZY_MATCH,
    "fuzzy_components": ORACLE_FUZZY_COMPONENTS,
}
