"""Z-order layout writer: multi-dimensional footer-stats pruning.

The claim under test: laid out along the Morton curve, EVERY z-order
column gets tight per-file parquet min/max ranges, so predicates on
any of them prune most files — which a single-column range sort
cannot do (its secondary columns span the full domain in every file).
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in glob.glob(path + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        vals = [
            (md.row_group(i).column(c).statistics.min,
             md.row_group(i).column(c).statistics.max)
            for i in range(md.num_row_groups)
            for c in range(md.num_columns)
            if md.row_group(i).column(c).path_in_schema == col
        ]
        out.append((min(lo for lo, _ in vals), max(hi for _, hi in vals)))
    return out


def test_write_zordered_prunes_both_dimensions(spark, tmp_path):
    from etl_python_spark.sources.writers import write_range_sorted, write_zordered

    # 128x128 grid: both dims uniform, deliberately uncorrelated
    df = (
        spark.range(0, 128 * 128)
        .select(
            (F.col("id") % 128).alias("x"),
            (F.col("id") / 128).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    zpath = str(tmp_path / "zorder")
    rpath = str(tmp_path / "rsort")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    write_range_sorted(df, rpath, ["x"], n_files=16)

    full = 127
    zx, zy = _file_ranges(zpath, "x"), _file_ranges(zpath, "y")
    assert len(zx) == 16
    # Z-order: BOTH dims bounded per file.  A contiguous Morton range
    # crossing a quadrant boundary can have a bounding box a few times
    # its cell count (inherent to the curve), so the bound is loose —
    # the sharp claims are the pruning counts below.
    for (xlo, xhi), (ylo, yhi) in zip(zx, zy):
        area = (xhi - xlo + 1) * (yhi - ylo + 1)
        assert area <= (128 * 128) / 16 * 6, (xlo, xhi, ylo, yhi)
    # most files are tight in y (a pure x-sort makes this 0 of 16)
    assert sum(1 for lo, hi in zy if hi - lo < full) >= 12
    # a point predicate on y alone prunes most z-ordered files
    y_probe = 64
    z_hits = sum(1 for lo, hi in zy if lo <= y_probe <= hi)
    assert z_hits <= 8

    # range-sort on x: x tight, y spans the WHOLE domain in every file
    ry = _file_ranges(rpath, "y")
    assert all(hi - lo == full for lo, hi in ry)
    r_hits = sum(1 for lo, hi in ry if lo <= y_probe <= hi)
    assert r_hits == 16  # no pruning on the secondary dimension

    # content survives the layout rewrite
    assert spark.read.parquet(zpath).count() == 128 * 128


def test_write_zordered_skewed_distribution_fills_buckets(spark, tmp_path):
    """Rank quantization (approxQuantile), not min/max scaling: a
    heavily skewed column still spreads across files instead of
    collapsing into one bucket."""
    from etl_python_spark.sources.writers import write_zordered

    df = spark.range(0, 10_000).select(
        (F.col("id") * F.col("id")).alias("x"),  # quadratic skew
        (F.col("id") % 100).alias("y"),
    )
    path = str(tmp_path / "zskew")
    write_zordered(df, path, ["x", "y"], n_files=8)
    ranges = _file_ranges(path, "x")
    assert len(ranges) == 8
    # every file holds a proper sub-range of x (no single file owns
    # the whole skewed domain)
    full_lo = min(lo for lo, _ in ranges)
    full_hi = max(hi for _, hi in ranges)
    assert sum(1 for lo, hi in ranges if (lo, hi) == (full_lo, full_hi)) == 0


def test_txn_compact_zorder_layout(spark, tmp_path):
    """Transactional OPTIMIZE ZORDER: txn_compact(zorder_by=...) lays
    the live snapshot along the Morton curve with the same pruning
    payoff as write_zordered, under the atomic commit (old snapshot
    readable until publish; time travel intact)."""
    from etl_python_spark.sources import txn

    df = (
        spark.range(0, 128 * 128)
        .select(
            (F.col("id") % 128).alias("x"),
            (F.col("id") / 128).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    path = str(tmp_path / "ztbl")
    txn.txn_write(spark, df, path)
    v = txn.txn_compact(spark, path, n_files=16, zorder_by=["x", "y"])
    assert v == 2

    rec = txn.read_commit(spark, path)
    assert rec["zorder_by"] == ["x", "y"]
    (zdir,) = rec["dirs"]
    zy = _file_ranges(f"{path}/{zdir}", "y")
    assert len(zy) == 16
    # the secondary dimension is bounded per file: a y point probe
    # prunes most files (an unordered compact gives 0 pruning)
    y_probe = 64
    assert sum(1 for lo, hi in zy if lo <= y_probe <= hi) <= 8
    # content identical, history intact
    assert txn.txn_read(spark, path).count() == 128 * 128
    assert txn.txn_read(spark, path, version=1).count() == 128 * 128


def test_txn_compact_zorder_within_partitions(spark, tmp_path):
    """On a partitioned txn table the optimize clusters WITHIN each
    partition dir: partition column intact on read, z-pruning holds
    per partition."""
    from etl_python_spark.sources import txn

    df = (
        spark.range(0, 2 * 64 * 64)
        .select(
            (F.col("id") % 2).cast("string").alias("p"),
            ((F.col("id") / 2).cast("long") % 64).alias("x"),
            (F.col("id") / 128).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    path = str(tmp_path / "zpart")
    txn.txn_write(spark, df, path, partition_by="p")
    txn.txn_compact(spark, path, n_files=8, zorder_by=["x", "y"])

    out = txn.txn_read(spark, path)
    assert out.count() == 2 * 64 * 64
    assert {r.p for r in out.select("p").distinct().collect()} == {"0", "1"}
    rec = txn.read_commit(spark, path)
    (zdir,) = rec["dirs"]
    # per partition dir, the secondary dim is bounded per file
    import glob as _glob

    for p in ("0", "1"):
        files = _glob.glob(f"{path}/{zdir}/p={p}/part-*.parquet")
        assert len(files) >= 2
        ranges = []
        import pyarrow.parquet as pq

        for f in files:
            md = pq.ParquetFile(f).metadata
            los, his = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == "y":
                        los.append(col.statistics.min)
                        his.append(col.statistics.max)
            ranges.append((min(los), max(his)))
        probe = 32
        hits = sum(1 for lo, hi in ranges if lo <= probe <= hi)
        assert hits < len(ranges), (p, ranges)
