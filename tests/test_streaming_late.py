"""Watermark semantics in append-mode windowed aggregation, driven
through the file source batch-by-batch (maxFilesPerTrigger=1 under
availableNow):

- a window is emitted exactly once, when the watermark passes its end;
- a late row arriving AFTER its window was finalized+evicted is
  dropped (the append-mode guarantee) — no duplicate emission, no
  count drift;
- windows the watermark hasn't passed are not emitted at all.

(A row that is late-but-before-finalization is *not* guaranteed to be
dropped — Spark aggregates it; asserting that would pin undefined
behavior.)"""

import glob
import os
import shutil
import time
import uuid

from pyspark.sql import functions as F


def test_late_row_for_finalized_window_is_dropped(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "ts string, user_id long").select(
            F.to_timestamp("ts").alias("ts"), "user_id"
        )
        staging = str(tmp_path / f"_stg_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        dest = str(src / f"{name}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (mtime, mtime))

    now = time.time()
    # batch 0: 10:00-window gets one row; max ts 12:00 → wm 11:00 after
    write_file("f1", [("2026-01-01 10:30:00", 1), ("2026-01-01 12:00:00", 2)], now - 100)
    # batch 1: advances wm to 11:30 → 10:00-window (end 11:00) finalizes
    write_file("f2", [("2026-01-01 12:30:00", 4)], now - 50)
    # batch 2: 10:45 is late for the already-finalized window → dropped
    write_file("f3", [("2026-01-01 10:45:00", 5), ("2026-01-01 13:30:00", 6)], now)

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("inicio"), "n")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    by_start = {}
    for r in rows:
        by_start.setdefault(str(r.inicio), []).append(r.n)
    # finalized exactly once, count untouched by the late row
    assert by_start.get("2026-01-01 10:00:00") == [1], by_start
    # unfinalized windows (12:00 end 13:00, 13:00 end 14:00 > wm 12:30)
    # must not have been emitted
    assert "2026-01-01 12:00:00" not in by_start, by_start
    assert "2026-01-01 13:00:00" not in by_start, by_start


def test_dedup_within_watermark_drops_in_window_dups(spark, tmp_path):
    """dropDuplicatesWithinWatermark guarantees: a duplicate key
    arriving within the watermark delay of the first occurrence is
    dropped (exactly-one emission), and distinct keys always emit.
    (A re-occurrence AFTER state expiry may or may not be re-emitted —
    state cleanup is bounded-state plumbing, not an observable
    contract — so that is deliberately not pinned.)"""
    import glob
    import os
    import shutil
    import time
    import uuid

    src = tmp_path / "dedup_src"
    src.mkdir()

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "ts string, k string").select(
            F.to_timestamp("ts").alias("ts"), "k"
        )
        staging = str(tmp_path / f"_stg_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        dest = str(src / f"{name}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (mtime, mtime))

    now = time.time()
    # batch 0: key A first seen; batch 1: duplicate A 10 min later
    # (inside the 1 h delay) → dropped
    write_file("f1", [("2026-01-01 10:00:00", "A")], now - 100)
    write_file("f2", [("2026-01-01 10:10:00", "A")], now - 50)
    # batch 2: watermark jumps to 23:00 (expires A's state), then
    # batch 3 re-emits A far outside the original window
    write_file("f3", [("2026-01-02 00:00:00", "B")], now - 25)
    write_file("f4", [("2026-01-02 00:30:00", "A")], now)

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
        .select("k", "ts")
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted((r.k, str(r.ts)) for r in spark.table(name).collect())
    # the in-window duplicate (10:10) was dropped: the first A emitted
    # exactly once, and never with the duplicate's timestamp
    a_rows = [ts for k, ts in rows if k == "A" and ts.startswith("2026-01-01")]
    assert a_rows == ["2026-01-01 10:00:00"], rows
    # distinct keys always emit
    assert ("B", "2026-01-02 00:00:00") in rows, rows


def test_dedup_reemit_after_watermark_expiry(spark, tmp_path):
    """Pins the single-microbatch assumption the stream_dedup_exact
    oracle documents (file_stream.py, ORACLE_STREAM_DEDUP comment):
    under a multi-batch source (maxFilesPerTrigger=1), a key recurring
    AFTER its watermark state expired is re-emitted, so the stream
    output becomes a strict SUPERSET of batch DISTINCT.  The driver's
    events source drains as one file today; if a testdata regeneration
    ever splits it into several files, the oracle hash breaks through
    exactly this mechanism — this test is the tripwire that names it."""
    import glob
    import os
    import shutil
    import time
    import uuid

    src = tmp_path / "reemit_src"
    src.mkdir()

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, "ts string, k string").select(
            F.to_timestamp("ts").alias("ts"), "k"
        )
        staging = str(tmp_path / f"_stg_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        dest = str(src / f"{name}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (mtime, mtime))

    now = time.time()
    # batch 0: A first seen.  batch 1: watermark jumps a day ahead
    # (10:00 + 1 h delay < new watermark).  batch 2: eviction runs
    # under the advanced watermark (cleanup lags one batch — the
    # watermark updates at batch END, and in-batch dup checks see
    # state before cleanup).  batch 3: A recurs → no state left →
    # RE-EMITTED.
    write_file("f1", [("2026-01-01 10:00:00", "A")], now - 100)
    write_file("f2", [("2026-01-02 00:00:00", "B")], now - 75)
    write_file("f3", [("2026-01-02 00:05:00", "C")], now - 50)
    write_file("f4", [("2026-01-02 00:30:00", "A")], now)

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
        .select("k", "ts")
    )
    name = f"reemit_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_reemit"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted((r.k, str(r.ts)) for r in spark.table(name).collect())
    # A emitted TWICE — once per expiry window — while batch DISTINCT
    # over the key column alone would keep one: strict superset.
    assert rows == [
        ("A", "2026-01-01 10:00:00"),
        ("A", "2026-01-02 00:30:00"),
        ("B", "2026-01-02 00:00:00"),
        ("C", "2026-01-02 00:05:00"),
    ], rows


def test_stream_upsert_sink_last_writer_wins(spark, tmp_path):
    """foreachBatch CDC sink: two landing files replay as two ordered
    micro-batches; the state table ends at the per-user argmax because
    the split is by time (every batch-1 row outdates batch-0)."""
    from pyspark.sql import Window

    from tests.conftest import SF_SMOKE
    from etl_python_spark.sources.tables import load_table
    from etl_python_spark.streaming.file_stream import stream_upsert_sink

    ev = load_table(spark, SF_SMOKE, "events")
    cut = F.lit("2024-01-15").cast("timestamp")
    landing = tmp_path / "landing"
    landing.mkdir()
    now = time.time()
    for i, flt in enumerate([F.col("ts") < cut, F.col("ts") >= cut]):
        staging = str(tmp_path / f"_stg_upsert_{i}")
        ev.filter(flt).coalesce(1).write.mode("overwrite").parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        dest = str(landing / f"f{i}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (now - 100 + i * 10, now - 100 + i * 10))

    target = str(tmp_path / "state")
    stream_upsert_sink(spark, str(landing), target)

    got = {
        (r.user_id, r.event_id)
        for r in spark.read.parquet(target).select("user_id", "event_id").collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    expected = {
        (r.user_id, r.event_id)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
        .collect()
    }
    assert got == expected and len(got) > 0


def test_stream_upsert_sink_checkpoint_exactly_once(spark, tmp_path):
    """With a stable checkpoint, a re-run over an unchanged landing
    dir replays NOTHING (target file set untouched), and a run after a
    new file arrives processes only that file."""
    from pyspark.sql import Window

    from etl_python_spark.streaming.file_stream import stream_upsert_sink

    landing = tmp_path / "landing_eo"
    landing.mkdir()
    now = time.time()

    def land(name, rows, mtime):
        df = spark.createDataFrame(
            rows, "ts string, user_id long, event_id long, event_type string, value double, props string"
        ).select(F.to_timestamp("ts").alias("ts"), "user_id", "event_id", "event_type", "value", "props")
        staging = str(tmp_path / f"_stg_eo_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        dest = str(landing / f"{name}.parquet")
        shutil.copy(part, dest)
        os.utime(dest, (mtime, mtime))

    land("a", [("2024-01-01 10:00:00", 1, 100, "view", 1.0, "{}"),
               ("2024-01-01 11:00:00", 2, 101, "view", 2.0, "{}")], now - 100)

    target = str(tmp_path / "state_eo")
    ckpt = str(tmp_path / "ckpt_eo")
    stream_upsert_sink(spark, str(landing), target, checkpoint_dir=ckpt)

    def file_set():
        return {
            (f, os.path.getmtime(os.path.join(target, f)))
            for f in os.listdir(target)
            if not f.startswith(("_", "."))
        }

    first = file_set()
    # unchanged landing + same checkpoint -> zero reprocessing
    stream_upsert_sink(spark, str(landing), target, checkpoint_dir=ckpt)
    assert file_set() == first

    # a new file arrives: only it is processed; user 1's newer row wins
    land("b", [("2024-01-02 09:00:00", 1, 200, "purchase", 9.0, "{}")], now - 50)
    stream_upsert_sink(spark, str(landing), target, checkpoint_dir=ckpt)
    got = {(r.user_id, r.event_id) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 200), (2, 101)}


def test_stream_hll_oracle_constants_match_batch_params():
    """The streaming HLL oracle hardcodes the sketch geometry; keep it
    pinned to the batch constants so a p-change cannot silently skew
    one of the two."""
    from etl_python_spark.operators.events import HLL_M, _HLL_WBITS
    from etl_python_spark.streaming.file_stream import ORACLE_STREAM_HLL

    scale = _HLL_WBITS + 1
    assert f"% {HLL_M}" in ORACLE_STREAM_HLL
    assert f"// {HLL_M}" in ORACLE_STREAM_HLL
    assert f"<< ({scale} - m_j)" in ORACLE_STREAM_HLL
    assert f"{float(1 << scale)}" in ORACLE_STREAM_HLL
    assert f"{2.5 * HLL_M}" in ORACLE_STREAM_HLL


def test_stream_psi_identical_periods_is_zero(spark, tmp_path):
    """The same value histogram on both sides of the period split must
    yield term 0 in every bucket — the streaming aggregate over the
    current period and the static reference aggregate see identical
    distributions."""
    import datetime as dt

    from etl_python_spark.streaming.file_stream import stream_psi_drift

    rows = []
    k = 0
    for day in (5, 20):  # one timestamp per side of the Jan-16 split
        for v in [10.0, 150.0, 320.0, 480.0] * 5:
            rows.append((k, dt.datetime(2024, 1, day, 12, 0), k, "view", v, "{}"))
            k += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = stream_psi_drift(spark, str(tmp_path)).collect()
    assert len(out) > 0
    assert all(r.term_micro == 0 and r.psi_micro == 0 for r in out)
    assert all(r.a_raw == r.b_raw for r in out)
