"""Semantic edge cases for the curation operators (passage dedup, PII
masking, token-budget mixing); engine-parity runs in test_queries_smoke
and tools/check_correctness.py."""

from pyspark.sql import functions as F

from etl_python_spark.operators.curation import (
    MIX_BUDGET_PER_SHARD,
    PASSAGE_K,
    _positional_grams,
    mask_numeric_ids,
    q_token_budget_mix,
)
from tests.conftest import SF_SMOKE


def test_positional_grams_counts_and_fallback(spark):
    nine = " ".join("abcdefghi")  # 9 tokens -> 2 overlapping 8-grams
    df = spark.createDataFrame(
        [(1, nine), (2, "short doc"), (3, None)], "doc_id long, text string"
    )
    occ = _positional_grams(df, PASSAGE_K).collect()
    by_doc = {}
    for r in occ:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    assert sorted(by_doc[1]) == [1, 2]
    # short and NULL docs fall back to one whole-text gram at pos 1
    assert by_doc[2] == [1]
    assert by_doc[3] == [1]


def test_positional_grams_keep_first_within_doc(spark):
    # 16 identical tokens -> 9 positional 8-grams, all the same text;
    # only the pos-1 occurrence is first, the rest are duplicates
    df = spark.createDataFrame([(7, " ".join(["x"] * 16))], "doc_id long, text string")
    occ = _positional_grams(df, PASSAGE_K)
    firsts = occ.groupBy("gh").agg(F.min("pos").alias("p"))
    assert occ.count() == 9
    assert firsts.count() == 1
    assert firsts.collect()[0].p == 1


def test_mask_numeric_ids_variants(spark):
    df = spark.createDataFrame(
        [
            ("acct 123456789 end",),
            ("no long ids 123 here",),
            ("two 111111 and 222222222",),
        ],
        "s string",
    )
    tail = [r.m for r in df.select(mask_numeric_ids(F.col("s")).alias("m")).collect()]
    assert tail == [
        "acct ###89 end",
        "no long ids 123 here",
        "two ###11 and ###22",
    ]
    full = [
        r.m
        for r in df.select(
            mask_numeric_ids(F.col("s"), keep_tail=False).alias("m")
        ).collect()
    ]
    assert full == ["acct ### end", "no long ids 123 here", "two ### and ###"]


def test_token_budget_mix_greedy_invariants(spark):
    rows = q_token_budget_mix(spark, SF_SMOKE).collect()
    groups = {}
    for r in rows:
        groups.setdefault((r.source, r.shard), []).append(r)
    mixed_groups = 0
    for grp in groups.values():
        for r in grp:
            assert r.keep == (r.cum_tokens - r.n_tokens < MIX_BUDGET_PER_SHARD), r
        # the window is gapless: the least cum_tokens row starts at 0,
        # so the first doc of every shard is kept
        first = min(grp, key=lambda r: r.cum_tokens)
        assert first.cum_tokens == first.n_tokens and first.keep
        if any(r.keep for r in grp) and any(not r.keep for r in grp):
            mixed_groups += 1
    # the budget actually bites: a solid share of groups keep some
    # docs and drop others (groups are small at sf0.001, so a group
    # can also be all-kept when its docs fit the budget)
    assert mixed_groups > len(groups) / 4


def test_semantic_dedup_leader_rule(spark):
    """SemDeDup leader-by-id invariants: keep iff no duplicate
    neighbor; each cluster's lowest-id vector has no lower-id
    neighbors, so it always survives with null max_cos."""
    from etl_python_spark.operators.similarity import q_semantic_dedup

    rows = q_semantic_dedup(spark, SF_SMOKE).collect()
    assert rows
    leaders = {}
    for r in rows:
        assert r.keep == (r.n_dups == 0), r
        if r.cluster not in leaders or r.vec_id < leaders[r.cluster].vec_id:
            leaders[r.cluster] = r
    for r in leaders.values():
        assert r.keep and r.max_cos is None, r


def test_curation_pipeline_stage_order(spark):
    """The composed pipeline reports the FIRST failing stage: every
    benchmark doc (doc_id % 20 == 0) says 'benchmark' regardless of
    later stages, and kept docs must also appear in the sampler's
    output."""
    from etl_python_spark.operators.corpus import q_sample_stratified
    from etl_python_spark.operators.curation import q_curation_pipeline

    rows = q_curation_pipeline(spark, SF_SMOKE).collect()
    assert {r.stage for r in rows} >= {"benchmark", "kept"}
    sampled = {r.doc_id for r in q_sample_stratified(spark, SF_SMOKE).collect()}
    for r in rows:
        if r.doc_id % 20 == 0:
            assert r.stage == "benchmark", r
        assert r.manter == (r.stage == "kept"), r
        if r.stage == "kept":
            assert r.doc_id in sampled


def test_passage_scrub_consistent_with_dedup(spark):
    """Scrub and dedup agree doc-by-doc: a doc loses tokens iff it has
    duplicate grams, a fully-duplicated doc scrubs to '', and an
    untouched doc round-trips its normalized text."""
    from etl_python_spark.operators.curation import (
        q_passage_dedup,
        q_passage_scrub,
    )

    dd = {r.doc_id: r for r in q_passage_dedup(spark, SF_SMOKE).collect()}
    removed_any = 0
    for r in q_passage_scrub(spark, SF_SMOKE).collect():
        d = dd[r.doc_id]
        assert (r.n_removed > 0) == (d.dup_grams > 0), (r, d)
        assert 0 <= r.n_removed <= r.n_tokens
        if d.dup_frac == 1.0:
            assert r.cleaned_text == "", r
        if r.n_removed == 0:
            assert len(r.cleaned_text.split(" ")) == r.n_tokens
        removed_any += r.n_removed > 0
    assert removed_any  # the planted near-dup clones actually scrub


def test_pack_manifest_fills_every_sequence(spark):
    """Manifest invariants vs pack_sequences: every sequence is
    exactly SEQ_LEN tokens full except each shard's final one, and
    segment bounds tile the sequence without gaps or overlaps."""
    from etl_python_spark.operators.corpus import SEQ_LEN, q_pack_manifest

    rows = q_pack_manifest(spark, SF_SMOKE).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, seqs in by_shard.items():
        seqs.sort(key=lambda r: r.seq)
        assert [r.seq for r in seqs] == list(range(len(seqs)))  # gapless
        for i, r in enumerate(seqs):
            segs = []
            for ent in r.manifest.split(","):
                doc, ab = ent.split(":")
                a, b = map(int, ab.split("-"))
                segs.append((a, b))
            assert len(segs) == r.n_docs
            assert sum(b - a + 1 for a, b in segs) == r.filled
            # tiling: starts at 0, contiguous, ends at filled-1
            assert segs[0][0] == 0
            for (a1, b1), (a2, b2) in zip(segs, segs[1:]):
                assert a2 == b1 + 1
            assert segs[-1][1] == r.filled - 1
            if i < len(seqs) - 1:
                assert r.filled == SEQ_LEN, r


def test_incremental_dedup_statuses(spark):
    """Constructed batch: within-dup beats base-dup for non-first rows;
    first occurrence of a base hash is dup_base; unseen text is new."""
    from etl_python_spark.operators.dedup import incremental_dedup

    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [
            (10, "alpha  beta "),   # normalizes to a base hash -> dup_base
            (11, "alpha beta"),     # second incoming copy -> dup_within
            (12, "delta"),          # unseen -> new
            (13, "delta"),          # within-dup of an otherwise-new text
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.status for r in incremental_dedup(base, incoming).collect()}
    assert out == {10: "dup_base", 11: "dup_within", 12: "new", 13: "dup_within"}


def test_nll_micro_rounding_ties_match_duckdb(spark, duck):
    """Regression for the sf0.1 lm_perplexity divergence: doc means
    landing EXACTLY on a 4dp half boundary must round identically in
    Spark and DuckDB.  Constructed sums: -K/(100·n) = 2.5, 3.5 (exact
    integer-half ties) plus an off-tie control."""
    from etl_python_spark.operators.corpus import nll_from_micro

    rows = [
        # doc 1: n=2, K=-500 -> -K/(100*2)=2.5 -> away-from-zero -> 3 -> 0.0003
        (1, -250), (1, -250),
        # doc 2: n=2, K=-700 -> 3.5 -> 4 -> 0.0004
        (2, -350), (2, -350),
        # doc 3: off-tie control: K=-123456, n=3 -> 411.52 -> 412 -> 0.0412
        (3, -41152), (3, -41152), (3, -41152),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lp_micro long")
    got = {r.doc_id: (r.n_words, r.nll) for r in nll_from_micro(df).collect()}
    assert got == {1: (2, 0.0003), 2: (2, 0.0004), 3: (3, 0.0412)}

    duck.execute("CREATE OR REPLACE TEMP TABLE t (doc_id BIGINT, lp_micro BIGINT)")
    duck.executemany("INSERT INTO t VALUES (?, ?)", rows)
    dk = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            "SELECT doc_id, CAST(COUNT(*) AS INT), "
            "ROUND(CAST(-SUM(lp_micro) AS DOUBLE) / (COUNT(*) * 100.0)) / 10000.0 "
            "FROM t GROUP BY doc_id"
        ).fetchall()
    }
    assert dk == got


def test_duplicated_spans_merge_and_clamp(spark):
    from etl_python_spark.operators.curation import duplicated_spans

    # Doc 1 is the keep-first original: 30 distinct tokens t0..t29.
    # Doc 2 repeats tokens t0..t11 (12 tokens -> duplicate 8-gram
    # starts at pos 1..5, one merged span [1, 12]), then 10 unique
    # tokens, then t18..t29 again (12 dup tokens at the tail -> a
    # SECOND span, clamped to the doc's last token).
    base = [f"t{i}" for i in range(30)]
    d2 = base[:12] + [f"u{i}" for i in range(10)] + base[18:]
    df = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(d2))], "doc_id long, text string"
    )
    spans = {
        (r.doc_id, r.span_id): r for r in duplicated_spans(df).collect()
    }
    # doc 1 is first-seen everywhere: no spans at all
    assert not any(d == 1 for d, _ in spans)
    assert set(spans) == {(2, 1), (2, 2)}
    s1, s2 = spans[(2, 1)], spans[(2, 2)]
    # overlapping dup starts 1..5 merge into one maximal span of the
    # 12 duplicated tokens
    assert (s1.start_pos, s1.end_pos, s1.span_tokens, s1.n_dup_grams) == (
        1, 12, 12, 5,
    )
    # tail span: dup starts 23..27 cover tokens 23..34, clamped to the
    # 34-token doc, so end_pos stays in range
    assert (s2.start_pos, s2.end_pos, s2.span_tokens, s2.n_dup_grams) == (
        23, 34, 12, 5,
    )


def test_duplicated_spans_gap_rule(spark):
    from etl_python_spark.operators.curation import (
        PASSAGE_K,
        duplicated_spans,
    )

    # Two dup regions separated by a gap of exactly PASSAGE_K stay ONE
    # island (windows touch); a gap of PASSAGE_K+1 splits them.  Build
    # docs whose duplicate 8-gram starts sit at pos 1 and pos 1+gap by
    # repeating two disjoint 8-token runs from the original.
    run_a = [f"a{i}" for i in range(PASSAGE_K)]
    run_b = [f"b{i}" for i in range(PASSAGE_K)]
    orig = run_a + run_b + [f"z{i}" for i in range(20)]

    def probe(n_fill):
        fill = [f"f{i}" for i in range(n_fill)]
        dup = run_a + fill + run_b
        df = spark.createDataFrame(
            [(1, " ".join(orig)), (2, " ".join(dup))],
            "doc_id long, text string",
        )
        return sorted(
            (r.span_id, r.start_pos, r.end_pos)
            for r in duplicated_spans(df).filter("doc_id = 2").collect()
        )

    # gap = K: starts at 1 and 1+K  -> pos diff K  -> merged
    assert len(probe(0)) == 1
    # gap = K+1: starts at 1 and 2+K -> pos diff K+1 -> two spans
    assert len(probe(1)) == 2


def test_leakage_safe_split_groups_clusters(spark, tmp_path):
    """Near-duplicate documents must land in the SAME fold (split by
    component, not by doc), singletons key on their own id, and every
    fold is in range."""
    from etl_python_spark.operators.dedup import (
        SPLIT_FOLDS,
        q_leakage_safe_split,
    )

    dup_a = "the quick brown fox jumps over the lazy dog again and again"
    dup_b = "pack my box with five dozen liquor jugs before the dawn comes"
    rows = [
        (1, dup_a), (2, dup_a), (3, dup_a),      # cluster {1,2,3}
        (10, dup_b), (11, dup_b),                # cluster {10,11}
        (20, "completely unrelated text one"),   # singletons
        (21, "another unrelated piece of text"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {r.doc_id: r for r in q_leakage_safe_split(
        spark, str(tmp_path)
    ).collect()}
    assert len(out) == 7
    assert out[1].fold == out[2].fold == out[3].fold
    assert out[10].fold == out[11].fold
    assert out[1].group_id == 1 and out[10].group_id == 10
    assert out[1].clustered and out[11].clustered
    assert not out[20].clustered and out[20].group_id == 20
    assert all(0 <= r.fold < SPLIT_FOLDS for r in out.values())
