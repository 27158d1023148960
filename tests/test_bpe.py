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
