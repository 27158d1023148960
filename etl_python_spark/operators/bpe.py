"""Distributed BPE tokenizer training: learn the top-K merge rules
from the corpus by iterative pair counting.

Training-data extension surface (SURVEY.md §7.8 item 8); the reference
has no tokenizer-training analogue (its closest text surface is the
pandas cleaning scripts).  The classic algorithm (Sennrich et al.
2016, public): start from character-level symbols, repeatedly count
adjacent symbol pairs across the weighted vocabulary and merge the
most frequent pair.  Spark shape: the pair count of every iteration is
a distributed hash aggregate over the (distinct-word, count)
vocabulary; ONLY the 1-row argmax comes to the driver per iteration —
the same kilobyte-scale round trip every Lloyd's/BPE implementation
does.  Merges apply as a ``replace`` over the space-separated symbol
string, which resolves non-overlapping left-to-right identically in
Spark and DuckDB (probed: ' a a a ' → ' aa a ' in both), so the whole
K-iteration training run restates as generated per-iteration CTEs and
is fully value-oracled — the kmeans-oracle pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread
from .dedup import _norm_text

BPE_MERGES = 8


def _word_vocab(docs: DataFrame) -> DataFrame:
    """(w, n): distinct whitespace words with occurrence counts."""
    return (
        spread(docs, "doc_id")
        .select(
            F.explode(
                F.split(_norm_text(F.coalesce(F.col("text"), F.lit(""))), " ")
            ).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )


def _char_spaced(col):
    """'hello' → ' h e l l o ' (leading + trailing space, so every
    symbol occurrence — first and last included — matches the padded
    ' a b ' search pattern)."""
    return F.concat(F.lit(" "), F.regexp_replace(col, "(.)", "$1 "))


def _adjacent_pairs(s_col):
    """Space-separated symbol string → array of 'a b' adjacent-pair
    strings (empty for single-symbol words)."""
    syms = F.split(F.trim(s_col), " ")
    n = F.size(syms)
    idx = F.sequence(F.lit(1), n - 1)
    pairs = F.transform(
        idx,
        lambda i: F.concat(
            F.element_at(syms, i), F.lit(" "), F.element_at(syms, i + 1)
        ),
    )
    return F.when(n >= 2, pairs).otherwise(F.array().cast("array<string>"))


def bpe_train(
    docs: DataFrame,
    k: int = BPE_MERGES,
    rematerialize_every: int = 64,
) -> list[tuple[int, str, str, int]]:
    """Learn k merge rules; returns [(rank, 'a b', 'ab', count)].

    Each iteration runs one distributed pair-count aggregate over the
    cached vocabulary and collects exactly one row (the argmax, ties
    broken by pair text so the run is engine-agnostic); the merge is
    applied lazily as a string ``replace`` on the symbol column, so
    iteration i+1's count job evaluates a chain of replaces.

    Unbounded, that chain is the quadratic trap of every iterative
    plan: at iteration i the job re-evaluates i replace expressions
    over the base relation, so K=10k merges would pay O(K²) replace
    evaluations and a K-deep Catalyst plan.  ``rematerialize_every``
    bounds both: every N merges the current symbol table is
    localCheckpointed (materialized, lineage severed), so plan depth
    never exceeds N and each symbol evaluates ≤ N pending replaces —
    the standard checkpoint cadence real tokenizer trainers use.
    The merge sequence is byte-identical for any N (checkpointing
    changes where evaluation happens, never its result; pinned by
    test_bpe_rematerialization_invariant)."""
    sp = docs.select(_char_spaced(F.col("w")).alias("s"), "n")
    sp = sp.persist()
    merges: list[tuple[int, str, str, int]] = []
    cur = sp
    ckpt = None
    for rank in range(1, k + 1):
        top = (
            cur.select(F.explode(_adjacent_pairs(F.col("s"))).alias("p"), "n")
            .groupBy("p")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("p"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0].p, int(top[0].c)
        merged = pair.replace(" ", "")
        merges.append((rank, pair, merged, cnt))
        cur = cur.select(
            F.replace(
                F.col("s"), F.lit(f" {pair} "), F.lit(f" {merged} ")
            ).alias("s"),
            "n",
        )
        if rematerialize_every and rank % rematerialize_every == 0:
            cur = cur.localCheckpoint(eager=True)
            if ckpt is not None:
                ckpt.unpersist()
            ckpt = cur
    sp.unpersist()
    return merges


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing BPE training query: the learned merge table."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(_word_vocab(docs))
    return spark.createDataFrame(
        merges, "rank int, pair string, merged string, cnt long"
    )


def _oracle_bpe_ctes(k: int = BPE_MERGES) -> str:
    """The WITH-chain shared by the train and encode oracles: vocab,
    char-spaced symbols, and per-iteration (pair count, argmax, merge
    application) CTEs ending at ``sp_{k}`` / ``top_{k}``."""
    parts = [
        """
WITH words AS (
  SELECT w, COUNT(*) AS n FROM (
    SELECT unnest(string_split(regexp_replace(lower(trim(coalesce(text,''))), '\\s+', ' ', 'g'), ' ')) AS w
    FROM documents
  ) WHERE w != '' GROUP BY w
), sp_0 AS (
  SELECT w, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS s, n FROM words
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""
, pc_{i} AS (
  SELECT p, SUM(n) AS c FROM (
    SELECT unnest(list_transform(range(1, len(sy)), j -> sy[j] || ' ' || sy[j+1])) AS p, n
    FROM (SELECT string_split(trim(s), ' ') AS sy, n FROM sp_{i-1})
  ) GROUP BY p
), top_{i} AS (
  SELECT p, c, replace(p, ' ', '') AS m FROM pc_{i} ORDER BY c DESC, p ASC LIMIT 1
), sp_{i} AS (
  SELECT sp.w, replace(sp.s, ' ' || t.p || ' ', ' ' || t.m || ' ') AS s, sp.n
  FROM sp_{i-1} sp CROSS JOIN top_{i} t
)"""
        )
    return "".join(parts)


def _oracle_bpe_train(k: int = BPE_MERGES) -> str:
    selects = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS rank, p AS pair, m AS merged, CAST(c AS BIGINT) AS cnt FROM top_{i}"
        for i in range(1, k + 1)
    )
    return _oracle_bpe_ctes(k) + "\n" + selects


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit→apply composition: train the BPE merges, tokenize the
    VOCABULARY once through the merge chain (the way real tokenizers
    encode — per distinct word, not per occurrence), then join the
    per-word symbol counts back onto the corpus word stream for
    per-doc BPE token counts.

    Scale shape: the merge chain evaluates over the distinct-word
    vocabulary (corpus-vocabulary-sized, not corpus-sized); the
    per-doc rollup is one join keyed on the word plus one doc-keyed
    aggregate.  At lake scale the vocabulary side broadcast-joins for
    any natural-language corpus (vocab ≪ corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = _word_vocab(docs)
    merges = bpe_train(vocab, BPE_MERGES)
    s = _char_spaced(F.col("w"))
    for _rank, pair, merged, _cnt in merges:
        s = F.replace(s, F.lit(f" {pair} "), F.lit(f" {merged} "))
    vocab_sym = vocab.select(
        "w", F.size(F.split(F.trim(s), " ")).alias("n_sym")
    )
    doc_words = (
        spread(docs, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.split(_norm_text(F.coalesce(F.col("text"), F.lit(""))), " ")
            ).alias("w"),
        )
        .filter(F.length("w") > 0)
    )
    return (
        doc_words.join(vocab_sym, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum("n_sym").cast("int").alias("bpe_tokens"),
        )
    )


ORACLE_BPE_ENCODE = (
    _oracle_bpe_ctes()
    + f"""
, vocab_sym AS (
  SELECT w, len(string_split(trim(s), ' ')) AS n_sym FROM sp_{BPE_MERGES}
), doc_words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split(regexp_replace(lower(trim(coalesce(text,''))), '\\s+', ' ', 'g'), ' ')) AS w
    FROM documents
  ) WHERE w != ''
)
SELECT d.doc_id,
       CAST(COUNT(*) AS INT) AS n_words,
       CAST(SUM(v.n_sym) AS INT) AS bpe_tokens
FROM doc_words d JOIN vocab_sym v USING (w)
GROUP BY d.doc_id
"""
)


QUERIES = {"bpe_train": q_bpe_train, "bpe_encode": q_bpe_encode}
ORACLES = {"bpe_train": _oracle_bpe_train(), "bpe_encode": ORACLE_BPE_ENCODE}
