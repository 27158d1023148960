"""Sinks: parquet staging with audit, pt-BR CSV, JSON docs, JDBC,
idempotent period upsert.

Re-expresses the reference's load layer (SURVEY.md §2.1 S6-S10, S14):
- staging overwrite loads (DROP+DDL+batched insert) → declarative
  ``mode('overwrite')`` writers with partitioning;
- the DELETE-period + INSERT idempotent upsert
  (ETL - Análise Preditiva ... Machine Learning.py:186-207) →
  dynamic partition overwrite (only the affected partitions rewrite);
- pt-BR CSV export (ETL - CRM.py:273: sep=';', utf-8-sig);
- JSON document output (JSON_ARRAYAGG shape, Belmicro/JSON Resposta 1).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _hadoop_rename(fs, src, dst) -> bool:
    """Seam around FileSystem.rename so tests can inject a failed
    rename and exercise compact_table's restore path."""
    return fs.rename(src, dst)


def write_staging(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    audit: bool = False,
) -> int | None:
    """Full-replace staging load (the reference's DROP+recreate).
    ``audit=True`` reproduces the reference's row-count diagnostics
    (ETL - Venda B2B.py:216-241) with a single count."""
    n = df.count() if audit else None
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    if audit:
        log.info("staging load %s: %s rows", path, n)
    return n


def upsert_period(
    df: DataFrame,
    path: str,
    partition_col: str,
    spark: SparkSession,
) -> None:
    """Idempotent DELETE-period + INSERT: dynamic partition overwrite
    replaces exactly the partitions present in ``df`` and leaves the
    rest untouched — the Spark-native form of the reference's
    per-prediction-date upsert.  At 100 TB this touches only the
    affected partition directories.

    The dynamic mode is passed as a per-write DataFrameWriter option —
    never set on the shared session, where it would silently turn every
    later ``write_staging(..., partition_by=...)`` full-replace into a
    partial overwrite that leaves stale partitions behind."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def merge_upsert(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str | None = None,
) -> None:
    """Row-keyed MERGE (the Delta ``MERGE INTO`` the SURVEY names) on a
    plain parquet table: target rows whose key matches a source row are
    replaced, unmatched source rows are inserted, everything else is
    left byte-identical.

    Strategy — copy-on-write, the same physical shape Delta/Iceberg
    MERGE executes (minus the transaction log):

    - **partitioned** (``partition_col``): enumerate the partitions the
      source touches (one tiny distinct), read ONLY those partitions
      (partition pruning at the scan), drop their matched keys with a
      keyed anti-join, union the source, and dynamic-partition-
      overwrite — cost scales with touched partitions, never the
      table.  This is the only sane shape at 100 TB.
    - **unpartitioned**: same merge, full-table rewrite.  Documented
      boundary: without a transactional table format there is no
      sub-file replace; point real lakes at a partitioned layout (or a
      table format whose MERGE is this same keyed shuffle plus a log).

    The merged frame is localCheckpointed before the write because the
    write overwrites the very files the plan reads (Spark refuses the
    read-overwrite cycle otherwise).  Idempotent: re-running the same
    merge is a no-op in content terms.

    Source rows with a NULL ``partition_col`` merge into the null
    partition (``__HIVE_DEFAULT_PARTITION__``) like any other value:
    its existing unmatched rows are read back and kept.

    Caveat (shared with every partition-scoped MERGE, Delta included
    when the key isn't the partition): if a key MOVES partitions — the
    source carries it under a new ``partition_col`` value — the old
    row survives in its untouched partition and the key is duplicated.
    Use a partition column that is stable per key (entity partitioning)
    or include the key's old partition in the source."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        write_staging(
            source, path, partition_by=[partition_col] if partition_col else None
        )
        return

    target = spark.read.parquet(path)
    source = source.select(*target.columns)  # align column order
    if partition_col:
        touched = [
            r[0] for r in source.select(partition_col).distinct().collect()
        ]
        non_null = [v for v in touched if v is not None]
        # isin() is three-valued: a NULL partition value never matches,
        # so a plain isin(touched) filter would drop the target's
        # null-partition rows from `kept` while dynamic overwrite still
        # rewrites __HIVE_DEFAULT_PARTITION__ — silently deleting the
        # unmatched keys that lived there.  Match NULL explicitly.
        cond = (
            F.col(partition_col).isin(non_null) if non_null else F.lit(False)
        )
        if len(non_null) < len(touched):
            cond = cond | F.col(partition_col).isNull()
        target = target.filter(cond)
    kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
    merged = kept.unionByName(source).localCheckpoint(eager=True)
    if partition_col:
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    else:
        merged.write.mode("overwrite").parquet(path)


def write_csv_ptbr(df: DataFrame, path: str) -> None:
    """pt-BR CSV: ';' separator, plain UTF-8 (distributed, multi-part).
    For the reference's Excel-facing single-file export with a BOM
    (utf-8-sig, ETL - CRM.py:273) use :func:`export_csv_ptbr_file` —
    a BOM cannot be prepended to arbitrary part files of a distributed
    write."""
    df.write.mode("overwrite").options(
        header=True, sep=";", encoding="UTF-8"
    ).csv(path)


def export_csv_ptbr_file(df: DataFrame, file_path: str, max_rows: int = 1_000_000) -> int:
    """Presentation-edge pt-BR CSV: ONE local file, ';' separator,
    UTF-8 **with BOM** (utf-8-sig) so Excel pt-BR renders accents —
    the exact convention of ETL - CRM.py:273.  Driver-side by design
    (report export, like the Excel sink); the row cap keeps fact
    tables out."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"single-file CSV export is a presentation sink; result has "
            f">{max_rows} rows — aggregate first or use write_csv_ptbr"
        )
    import csv

    with open(file_path, "w", encoding="utf-8-sig", newline="") as fh:
        w = csv.writer(fh, delimiter=";")
        w.writerow(df.columns)
        w.writerows([list(r) for r in rows])
    return len(rows)


def write_json_docs(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def aggregate_to_json(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """JSON_ARRAYAGG(JSON_OBJECT(...)) analogue: one JSON array of row
    objects per group (ref ScriptsSQL - Belmicro/JSON Resposta 1.sql:18-28)."""
    payload_cols = [c for c in df.columns if c not in group_cols]
    # array_sort: collect_list order is undefined after a shuffle —
    # sorting (field-wise struct compare) makes the JSON reproducible
    return df.groupBy(*group_cols).agg(
        F.to_json(
            F.array_sort(
                F.collect_list(F.struct(*[F.col(c) for c in payload_cols]))
            )
        ).alias("payload_json")
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
    create_table_column_types: str | None = None,
) -> None:
    """JDBC sink (S6/S7): the connector handles DDL, batching and
    transactions that the reference hand-rolled; explicit column types
    via ``createTableColumnTypes`` replace the manual DDL generator."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .mode(mode)
    )
    if create_table_column_types:
        writer = writer.option("createTableColumnTypes", create_table_column_types)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Bucketed + sorted table write: both sides of a recurring
    fact⨝fact equi-join stored with the same bucketing skip the
    shuffle entirely at read time (Spark matches HashPartitioning from
    bucket metadata), which at 100 TB turns the dominant exchange of
    every downstream join/aggregation on that key into a free scan
    property.  ``sortBy`` additionally lets sort-merge join skip its
    sorts."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_excel_report(
    df: DataFrame,
    path: str,
    sheet_name: str = "Relatorio",
    max_rows: int = 100_000,
    number_formats: dict[str, str] | None = None,
    col_widths: dict[str, float] | None = None,
    autosize: bool = True,
    images: list[dict] | None = None,
) -> None:
    """Excel report sink (S9 — ref: EDA - Faturamento.py:87-123,
    Gerador de Ranking de Vendas.py:48-67): presentation-layer export
    of a SMALL result frame at the edge, written with the stdlib xlsx
    codec (:mod:`.xlsx` — no openpyxl needed).  The result-size cap is
    the engine-side contract: nobody funnels a fact table through the
    driver.

    Styling mirrors what the reference's report sinks set on every
    export: ``number_formats`` maps column → Excel format code (money
    columns default to ``#,##0.00`` — any DecimalType column — when
    not given), ``col_widths`` pins explicit widths, and ``autosize``
    sizes unpinned columns from the rendered content (capped at 60
    chars), with a bold header row; ``images`` is a list of
    anchored-picture specs (``{"cell", "data", "ext", "width",
    "height"}``) embedded into the sheet (ref Base de Produtos Mais
    Vendidos.py:139-145)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"excel export is a presentation sink; result has >{max_rows} rows — "
            "aggregate first or use write_staging/write_csv_ptbr"
        )
    from pyspark.sql.types import DecimalType

    from . import xlsx

    formats = dict(number_formats or {})
    for f in df.schema.fields:
        if isinstance(f.dataType, DecimalType) and f.name not in formats:
            formats[f.name] = "#,##0.00"
    widths = dict(col_widths or {})
    if autosize:
        for ci, name in enumerate(df.columns):
            if name in widths:
                continue
            content = max(
                [len(name)] + [len(str(r[ci])) for r in rows if r[ci] is not None]
            )
            widths[name] = min(60, content + 2)
    xlsx.write_xlsx(
        path,
        {sheet_name: (df.columns, [list(r) for r in rows])},
        styles={
            sheet_name: {
                "formats": formats,
                "widths": widths,
                "bold_header": True,
            }
        },
        images={sheet_name: images} if images else None,
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    shards: int,
    shard_key: str = "doc_id",
    fmt: str = "parquet",
) -> None:
    """Curated-corpus export in the layout a training dataloader
    expects: one ``shard=K/`` directory per shard, each holding
    exactly the rows whose ``hash60(shard_key) % shards`` is K — the
    SAME explicit placement :func:`operators.corpus.q_shard_balance`
    audits, so the balance report measures the real export (a plain
    ``repartition(n, col)`` would place by Spark's internal Murmur3
    instead, and the audit would be modeling a mapping the files
    don't follow).  Deterministic and reproducible across runs and
    cluster sizes.  ``fmt`` is ``"parquet"`` (default) or ``"json"``
    (JSONL, one doc per line — the interchange format most tokenizer
    pipelines read).

    Scale shape: one hash-partition exchange routes each shard value
    to a single task, then ``partitionBy`` splits the task's rows
    into per-shard directories — one file per shard, no driver
    collection, no global sort.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    from ..operators.dedup import hash60

    sharded = df.withColumn(
        "shard",
        (hash60(F.col(shard_key).cast("string")) % shards).cast("int"),
    ).repartition(shards, F.col("shard"))
    sharded.write.mode("overwrite").partitionBy("shard").format(fmt).save(path)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — the lake-maintenance job that keeps a
    continuously-appended table scannable: rewrite a parquet directory
    into size-targeted files and atomically swap it in (write to a
    sibling temp dir, delete + rename — the same move-based commit the
    parquet committer uses).

    - **unpartitioned**: target file count = ceil(total_bytes /
      target_file_bytes), one ``repartition(n)`` exchange.  A no-op
      (stats only, no rewrite) when the table already has ≤ that many
      files — compaction must be safe to run on a schedule.
    - **partitioned**: ``repartition(partition_cols)`` hash-routes each
      partition's rows to one task → one file per partition value
      (small-file count collapses from files×partitions to
      partitions).  Size-splitting within a huge partition is the
      writer's ``maxRecordsPerFile`` knob, deliberately not re-derived
      here.

    Returns ``{"files_before", "files_after", "bytes", "rewritten"}``.

    The swap is rename-ORIGINAL-to-backup → rename-tmp-into-place →
    delete-backup: the table path is absent only between the two
    renames (metadata ops, microseconds), a failed second rename
    restores the backup so the path is never left missing, and a
    crash inside the window strands full data in ``__compact_bak`` —
    recoverable by hand-renaming it back (vs the previous
    delete-then-rename ordering, where a crash lost the original
    outright).  Still not a reader-safe publish: a reader racing the
    swap can hit the absent-path microsecond — schedule in the
    maintenance window, or use :func:`..txn.txn_compact`, whose
    commit-log publish has no unsafe window at all.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def data_files():
        out = []
        it = fs.listFiles(hpath, True)
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if not name.startswith(("_", ".")):
                out.append((str(st.getPath()), st.getLen()))
        return out

    files = data_files()
    total = sum(sz for _, sz in files)
    df = spark.read.parquet(path)
    if partition_by:
        n_target = None
        compacted = df.repartition(*[F.col(c) for c in partition_by])
    else:
        import math

        n_target = max(1, math.ceil(total / target_file_bytes))
        if n_target >= len(files):
            return {
                "files_before": len(files),
                "files_after": len(files),
                "bytes": total,
                "rewritten": False,
            }
        compacted = df.repartition(n_target)

    tmp = path.rstrip("/") + "__compact_tmp"
    writer = compacted.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)

    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    bak = path.rstrip("/") + "__compact_bak"
    bak_path = jvm.org.apache.hadoop.fs.Path(bak)
    fs.delete(bak_path, True)  # stale backup from an earlier crash
    if not _hadoop_rename(fs, hpath, bak_path):
        raise IOError(f"compact_table: backup rename {path} -> {bak} failed")
    if not _hadoop_rename(fs, tmp_path, hpath):
        _hadoop_rename(fs, bak_path, hpath)  # restore the original
        raise IOError(
            f"compact_table: rename {tmp} -> {path} failed; original restored"
        )
    fs.delete(bak_path, True)
    after = len(data_files())
    return {
        "files_before": len(files),
        "files_after": after,
        "bytes": total,
        "rewritten": True,
    }


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Layout-for-data-skipping writer: range-partition the rows on
    ``sort_cols`` and sort within each task before writing, so every
    output file covers a DISJOINT key range and its parquet footer
    min/max statistics prune whole files at scan time — a point
    predicate on the sort key reads ONE file instead of all of them
    (Spark evaluates ``PushedFilters`` against row-group stats).

    This is the poor-man's clustering/Z-ORDER for a plain parquet
    lake: one range exchange (samples the key distribution to build
    balanced boundaries) + an in-task sort, no global sort.  For
    multi-dimensional skipping a real Z-ORDER interleave is the
    upgrade; for a single dominant predicate column this layout is
    optimal and a 100 TB scan's first defense."""
    cols = [F.col(c) for c in sort_cols]
    ranged = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    ranged.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


ZORDER_BITS = 8  # 256 rank buckets per dimension — file-level skipping
                 # needs far fewer distinct values than files


def _zorder_key(bucket_cols: list, bits: int = ZORDER_BITS):
    """Bit-interleave per-dimension bucket ids into one Morton (Z-curve)
    key — pure JVM shift/mask expressions, whole-stage-codegen."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, col in enumerate(bucket_cols):
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit, b * len(bucket_cols) + d)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int,
    bits: int = ZORDER_BITS,
    rel_error: float = 0.001,
) -> None:
    """Multi-dimensional data-skipping layout — the Z-ORDER upgrade
    :func:`write_range_sorted`'s docstring promises: rows are laid out
    along a Morton curve over the rank-quantized ``zorder_cols``, so
    EVERY one of the columns gets tight per-file parquet min/max
    footer ranges and point/range predicates on ANY of them prune most
    files (a single-column range sort gives one column tight ranges
    and leaves the others spanning the full domain in every file).

    Mechanics, all scale-safe:

    1. per column, ``approxQuantile`` computes 2^bits - 1 rank
       boundaries (driver-side KBs; rank buckets — not min/max linear
       scaling — so a skewed distribution still fills all buckets);
    2. each row's bucket id is a balanced NESTED-``when`` binary
       search over the boundary literals — O(log B) comparisons per
       row inside whole-stage codegen (a flat higher-order
       ``filter`` over the 255-boundary array ran interpreted at
       O(B) per row and cost 34 s for a 6M-row 2-dim write; the
       tree halves that to ~18 s, the rest being the range
       partitioner's sampling pass plus the in-task sort);
    3. bucket bits interleave into one Morton key (shift/mask
       expressions), and the write is one
       ``repartitionByRange(zkey)`` + in-task sort — the same single
       exchange as the 1-D layout writer.

    Numeric (and date via cast) columns only; string dimensions
    should be dictionary-encoded to ids upstream."""
    arranged = zorder_layout(df, zorder_cols, n_files, bits, rel_error)
    arranged.write.mode("overwrite").parquet(path)


def zorder_layout(
    df: DataFrame,
    zorder_cols: list[str],
    n_files: int,
    bits: int = ZORDER_BITS,
    rel_error: float = 0.001,
    extra_partition_cols: list[str] | None = None,
) -> DataFrame:
    """The Morton arrangement of :func:`write_zordered` WITHOUT the
    write: rank-quantize each dimension (approxQuantile boundaries,
    nested-when binary search), interleave into one z-key, range-
    partition and in-task sort on it.  Factored out so any sink —
    including :func:`txn.txn_compact`'s transactional OPTIMIZE — can
    apply the layout and keep its own commit semantics.

    ``extra_partition_cols`` prefix the range partitioning and sort
    (for Hive-partitioned outputs: rows cluster per partition dir
    first, z-ordered within it)."""
    quantiles = [i / (1 << bits) for i in range(1, 1 << bits)]
    boundaries = {
        c: df.approxQuantile(c, quantiles, rel_error) for c in zorder_cols
    }

    def bucket_expr(c: str):
        bs = sorted(set(boundaries[c]))
        v = F.col(c).cast("double")

        # bucket id = largest boundary index i with bs[i] <= value,
        # clamped to 0 below the first boundary.  0-based on purpose:
        # a 1-based id would give only the max values a lone high bit
        # and the Morton tail file would collect that sparse
        # row/column from every quadrant (an L-shaped bounding box
        # spanning the whole domain).
        def tree(lo: int, hi: int):
            if lo == hi:
                return F.lit(lo)
            mid = (lo + hi + 1) // 2
            return (
                F.when(v >= F.lit(float(bs[mid])), tree(mid, hi))
                .otherwise(tree(lo, mid - 1))
            )

        return tree(0, len(bs) - 1).cast("long")

    zkey = _zorder_key([bucket_expr(c) for c in zorder_cols], bits)
    lead = [F.col(c) for c in (extra_partition_cols or [])]
    return (
        df.withColumn("__zkey", zkey)
        .repartitionByRange(n_files, *lead, F.col("__zkey"))
        .sortWithinPartitions(*lead, "__zkey")
        .drop("__zkey")
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """ORC sink (native Spark writer — no extra package): columnar
    layout with per-stripe min/max/bloom statistics, the interchange
    format for Hive/Trino-side consumers of this engine's output.
    Same predicate-pushdown contract as the parquet sink: Catalyst
    pushes filters into the ORC scan (``PushedFilters`` in explain)
    and stripe stats prune at read time — the roundtrip test pins
    both directions."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
