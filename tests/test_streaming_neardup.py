"""Streaming MinHash+LSH near-dup dedup (round-9 verdict item 6):

- batch-equivalence: the drained stream_neardup result matches the
  batch q_minhash_lsh_pairs rows exactly at sf0.001;
- cross-batch state: a near-duplicate arriving in a LATER micro-batch
  (maxFilesPerTrigger=1) still pairs with the earlier member — bucket
  membership lives in GroupState, not in per-batch recomputation.
"""

import glob
import os
import shutil
import time
import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_stream_neardup_matches_batch_minhash(spark):
    from etl_python_spark.operators.dedup import q_minhash_lsh_pairs
    from etl_python_spark.streaming.file_stream import stream_neardup

    batch = _canon(
        q_minhash_lsh_pairs(spark, SF_SMOKE).select("doc_a", "doc_b", "jaccard")
    )
    stream = _canon(stream_neardup(spark, SF_SMOKE))
    assert stream == batch
    assert batch, "sf0.001 should contain near-dup pairs"


def test_neardup_pairs_cross_micro_batches(spark, tmp_path):
    """doc 1 arrives in batch 0, its near-copy doc 2 in batch 1: the
    pair must still be emitted (stateful bucket membership)."""
    from etl_python_spark.operators.dedup import minhash_band_stream
    from etl_python_spark.streaming.file_stream import (
        finish_neardup,
        neardup_pairs_stream,
    )

    src = tmp_path / "docs_src"
    src.mkdir()
    text = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through the quiet green field until the sun goes down"
    )

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        staging = str(tmp_path / f"_stg_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        dest = str(src / f"{name}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (mtime, mtime))

    now = time.time()
    write_file("b0", [(1, text), (7, "something entirely different here")], now - 60)
    write_file("b1", [(2, text + " extra")], now)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = neardup_pairs_stream(minhash_band_stream(stream))
    name = f"neardup_{uuid.uuid4().hex[:8]}"
    ckpt = str(tmp_path / "ckpt")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    # two batches ran (one file per trigger)
    assert len(q.recentProgress) >= 2
    result = finish_neardup(spark.table(name))
    rows = {(r.doc_a, r.doc_b) for r in result.collect()}
    assert (1, 2) in rows, f"cross-batch near-dup pair missing: {rows}"
    assert all(7 not in pair for pair in rows)


def test_hot_bucket_state_is_bounded_and_compaction_restores_pairs(
    spark, tmp_path
):
    """Round-11 verdict item 4: a hot LSH bucket (many docs, one band
    key — here N exact copies, the worst case: they collide in ALL
    bands) must NOT grow stream state without bound.  Pins:

    - the bucket freezes at ``max_members``: every overflow marker's
      stored-size field (written by the state function itself) equals
      the cap — state never held more than ``cap`` members;
    - overflow markers exist for exactly the ``N - cap`` docs past the
      cap, in every band;
    - stream pairs ∪ overflow compaction == the unbounded result (all
      C(N,2) copy pairs at jaccard 1.0, none involving the decoy).
    """
    import uuid as _uuid

    from etl_python_spark.operators.dedup import minhash_band_stream
    from etl_python_spark.streaming.file_stream import (
        finish_neardup,
        neardup_overflow_compaction,
        neardup_pairs_stream,
    )

    cap, n_copies = 4, 12
    text = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through the quiet green field until the sun goes down"
    )
    rows = [(i, text) for i in range(1, n_copies + 1)]
    rows.append((99, "an entirely unrelated decoy document about ships"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    src = tmp_path / "hot_src"
    docs.coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    out = neardup_pairs_stream(minhash_band_stream(stream), max_members=cap)
    name = f"hot_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hot_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    drained = spark.table(name)

    markers = drained.filter(F.col("inter") < 0).collect()
    assert markers, "cap never engaged — hot bucket test is vacuous"
    # state never exceeded the cap (size recorded inside the state fn)
    assert {m.doc_b for m in markers} == {cap}
    # every band's bucket froze: N - cap overflow docs × 8 bands
    assert len(markers) == (n_copies - cap) * 8
    overflow_docs = {m.doc_a for m in markers}
    assert len(overflow_docs) == n_copies - cap and 99 not in overflow_docs

    stream_pairs = drained.filter(F.col("inter") >= 0).select(
        "doc_a", "doc_b", "inter", "size_a", "size_b"
    )
    # stream alone is missing the overflow×overflow pairs
    got_stream = {
        (r.doc_a, r.doc_b) for r in finish_neardup(stream_pairs).collect()
    }
    expected = {
        (a, b)
        for a in range(1, n_copies + 1)
        for b in range(a + 1, n_copies + 1)
    }
    assert got_stream < expected

    full = finish_neardup(
        stream_pairs.unionByName(neardup_overflow_compaction(drained, docs))
    )
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in full.collect()}
    assert got == {(a, b, 1.0) for a, b in expected}


def test_capped_stream_equals_unbounded_on_random_corpus(spark, tmp_path):
    """Property: for ANY corpus and ANY cap, capped-stream pairs ∪
    overflow compaction == the unbounded stream's pairs (the policy's
    correctness is by construction — this pins it against a corpus
    with mixed exact copies, perturbed near-dups, and unique docs,
    where buckets overflow at different depths per band)."""
    import random
    import uuid as _uuid

    from etl_python_spark.operators.dedup import minhash_band_stream
    from etl_python_spark.streaming.file_stream import (
        finish_neardup,
        neardup_overflow_compaction,
        neardup_pairs_stream,
    )

    rng = random.Random(1207)
    words = [f"w{i}" for i in range(60)]
    rows, doc_id = [], 0
    for g in range(6):
        base = " ".join(rng.choices(words, k=25))
        copies = rng.randint(1, 8)
        for c in range(copies):
            doc_id += 1
            text = base if c == 0 or rng.random() < 0.5 else (
                base + " " + rng.choice(words)
            )
            rows.append((doc_id, text))
    for _ in range(5):  # unique decoys
        doc_id += 1
        rows.append((doc_id, " ".join(rng.choices(words, k=25))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = tmp_path / "rand_src"
    docs.coalesce(2).write.mode("overwrite").parquet(str(src))

    def pairs_with_cap(cap):
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )
        out = neardup_pairs_stream(minhash_band_stream(stream), max_members=cap)
        name = f"rand_{cap}_{_uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        drained = spark.table(name)
        stream_pairs = drained.filter(F.col("inter") >= 0).select(
            "doc_a", "doc_b", "inter", "size_a", "size_b"
        )
        merged = stream_pairs.unionByName(
            neardup_overflow_compaction(drained, docs)
        )
        rows_ = finish_neardup(merged).collect()
        n_overflow = drained.filter(F.col("inter") < 0).count()
        return {(r.doc_a, r.doc_b, r.jaccard) for r in rows_}, n_overflow

    truth, ov0 = pairs_with_cap(0)  # 0 disables the cap
    assert ov0 == 0 and truth, "ground-truth run must be uncapped, non-empty"
    for cap in (1, 3):
        got, n_overflow = pairs_with_cap(cap)
        assert n_overflow > 0, f"cap {cap} never engaged — vacuous"
        assert got == truth, f"cap {cap}: capped∪compaction != unbounded"
