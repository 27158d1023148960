"""BPE trainer semantics on the classic Sennrich et al. vocabulary:
merge order and counts are hand-checkable, ties break lexically."""

from etl_python_spark.operators.bpe import bpe_train


def test_bpe_train_sennrich_example(spark):
    vocab = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "w string, n long",
    )
    merges = bpe_train(vocab, k=3)
    # 'e s' and 's t' both count 9 (newest 6 + widest 3): lexical
    # tie-break picks 'e s'; then 'es t' -> 'est' at 9; then 'l o'
    # and 'o w' tie at 7 -> 'l o'.
    assert merges == [
        (1, "e s", "es", 9),
        (2, "es t", "est", 9),
        (3, "l o", "lo", 7),
    ]


def test_bpe_train_single_char_vocab_stops(spark):
    vocab = spark.createDataFrame([("a", 3), ("b", 2)], "w string, n long")
    assert bpe_train(vocab, k=4) == []


def test_bpe_encode_bounds(spark):
    """Each word encodes to at least 1 and at most len(word) symbols,
    so per-doc: n_words <= bpe_tokens <= total word chars; and merges
    actually compress (some doc has bpe_tokens < chars)."""
    from tests.conftest import SF_SMOKE
    from etl_python_spark.operators.bpe import q_bpe_encode
    from etl_python_spark.operators.text import QUERIES as TEXT_QUERIES

    enc = {r.doc_id: r for r in q_bpe_encode(spark, SF_SMOKE).collect()}
    tc = {r.doc_id: r for r in TEXT_QUERIES["token_count"](spark, SF_SMOKE).collect()}
    compressed = 0
    for doc_id, r in enc.items():
        assert r.n_words <= r.bpe_tokens, r
        chars = tc[doc_id].n_chars_norm if hasattr(tc[doc_id], "n_chars_norm") else None
        if chars is not None:
            assert r.bpe_tokens <= chars
        compressed += r.bpe_tokens < r.n_words * 10
    assert compressed


def test_bpe_rematerialization_invariant(spark):
    """Checkpointing the symbol table every N merges (the bounded-
    plan-depth path for large K) yields the EXACT same merge table as
    the unchunked chain — including across several checkpoint
    boundaries (K > 2N)."""
    vocab = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("wide", 1)],
        "w string, n long",
    )
    unchunked = bpe_train(vocab, k=8, rematerialize_every=0)
    chunked = bpe_train(vocab, k=8, rematerialize_every=3)
    assert len(unchunked) == 8
    assert chunked == unchunked
