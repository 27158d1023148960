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
