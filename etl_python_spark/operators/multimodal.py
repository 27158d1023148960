"""Multimodal (image/audio/video) column operators.

Media is modeled the way a 100 TB training-data lake stores it: an
opaque ``binary`` payload column plus typed metadata, processed with
Arrow-batched ``mapInPandas`` so decode/feature-extraction runs
vectorized per partition and never funnels through the driver.  The
reference has no media layer (its closest analogue is embedding
product images into Excel reports, ``Base de Produtos Mais
Vendidos.py:101-148``); this module is part of the training-data
extension surface (SURVEY.md §7.8).

Because no image/audio codec libraries ship in this container, the
actual codec call is isolated behind :func:`decode_media_real` — a
registry keyed by (modality, container magic).  Uncompressed 24-bit
BMP decodes with a pure-Python parser, so the real-codec path
EXECUTES everywhere (tests drive real bytes through it, including via
``mapInPandas``); PNG/JPEG slot in through PIL where it exists, and
unknown containers raise ``NotImplementedError``.  The corpus
pipelines still run a **deterministic fake decoder** over the real
bytes (the test corpus payloads are text, not images).  Everything
around the seam — binary columns through parquet scans, Arrow batch
shape, output schema, per-modality partitioning — is real and is what
the scale design depends on.

Test media derives deterministically from ``documents``: payload =
UTF-8 bytes of ``text``, modality = ``doc_id % 3`` → image/audio/video.
That keeps the metadata query fully DuckDB-oracle-checkable (byte
lengths, SHA-256, magic prefix) with zero fixture files.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MODALITIES = ["image", "audio", "video"]
FRAME_SIZE = 64  # bytes per fake "video frame"
MAX_FRAMES = 8


def as_media(docs: DataFrame) -> DataFrame:
    """documents → (media_id, modality, payload binary, n_bytes).

    In production this is the parquet scan of the media lake itself;
    the payload column stays opaque bytes end to end (never decoded
    into a JVM string), so partition sizing is governed by
    ``spark.sql.files.maxPartitionBytes`` exactly as for any blob
    table.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    ).withColumn("n_bytes", F.length("payload"))


class DecodedImage:
    """Minimal decoded image with the PIL surface the pipelines touch
    (``.size``, ``.getpixel``); rows are top-down (r, g, b) tuples."""

    def __init__(self, width: int, height: int, rows: list[list[tuple]]):
        self.size = (width, height)
        self._rows = rows

    def getpixel(self, xy: tuple[int, int]) -> tuple:
        x, y = xy
        return self._rows[y][x]


def decode_bmp(payload: bytes) -> DecodedImage:
    """Pure-Python decoder for uncompressed 24-bit BMP (the simplest
    real container: BITMAPFILEHEADER + BITMAPINFOHEADER + BGR rows,
    4-byte-padded, bottom-up unless height < 0).  Exists so the
    real-codec seam executes in codec-less containers — anything
    fancier (compression, other depths) belongs to a real codec lib."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    _, width, height, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP is wired (bpp={bpp}, compression={comp})"
        )
    bottom_up = height > 0
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    # Bounds validation: Python slices never raise, so without this a
    # truncated payload (or a data_off pointing past the end) would
    # silently yield short/empty pixel tuples and plausible-looking
    # dims over garbage — fail loudly instead.
    if width <= 0 or h <= 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    if data_off < 54 or data_off + stride * h > len(payload):
        raise ValueError(
            f"truncated BMP: need {data_off + stride * h} bytes "
            f"({width}x{h}, stride {stride}, data at {data_off}), "
            f"payload has {len(payload)}"
        )
    rows = []
    for r in range(h):
        src = h - 1 - r if bottom_up else r
        base = data_off + src * stride
        rows.append(
            [
                tuple(payload[base + 3 * x : base + 3 * x + 3][::-1])  # BGR → RGB
                for x in range(width)
            ]
        )
    return DecodedImage(width, h, rows)


def _decode_image_pil(payload: bytes):  # pragma: no cover — PIL absent here
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "this container decode requires PIL; not installed here"
        ) from exc
    return Image.open(io.BytesIO(payload))


# The real-codec registry: (container magic → decoder) per modality.
# Production swaps in PIL / torchaudio / pyav entries; the BMP entry is
# pure Python so the seam is executable (and tested) everywhere.
MEDIA_CODECS: dict[str, list[tuple[bytes, object]]] = {
    "image": [
        (b"BM", decode_bmp),
        (b"\x89PNG\r\n\x1a\n", _decode_image_pil),
        (b"\xff\xd8\xff", _decode_image_pil),
    ],
}


def decode_media_real(payload: bytes, modality: str):
    """The real-codec seam: sniff the container magic and dispatch to
    the registered decoder.  Raises ``NotImplementedError`` for
    modalities/containers with no codec wired — pipelines that must
    not decode use the metadata/fake-feature paths instead."""
    for magic, codec in MEDIA_CODECS.get(modality, []):
        if payload[: len(magic)] == magic:
            return codec(payload)
    raise NotImplementedError(
        f"no codec wired for modality={modality!r}, container {payload[:4]!r}"
    )


DECODED_DIMS_SCHEMA = "media_id long, width int, height int"


def decode_dims_real(df: DataFrame) -> DataFrame:
    """Real-decode pass: (media_id, payload) → per-object dimensions
    via ``mapInPandas`` calling :func:`decode_media_real` per object —
    the production shape for a decode stage (Arrow ships opaque bytes
    to Python, the codec runs per partition, nothing touches the
    driver).  Unknown containers fail the task loudly rather than
    emitting nulls; filter by magic upstream to route mixed lakes."""

    def dims(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_media_real(bytes(payload), "image")
                out.append((int(media_id), img.size[0], img.size[1]))
            yield pd.DataFrame(out, columns=["media_id", "width", "height"])

    return df.mapInPandas(dims, DECODED_DIMS_SCHEMA)


# ---------------------------------------------------------------------------
# Typed metadata over the binary column — fully oracled
# ---------------------------------------------------------------------------

def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-object typed metadata computed JVM-side on the payload
    bytes: size, content digest, container "magic" prefix.  All
    whole-stage-codegen expressions over one scan — the template for
    any cheap metadata pass (dedup by digest, corrupt-object sweep)
    that must not decode.

    The magic prefix is hex of the first 4 *characters'* bytes (not a
    raw byte slice) so the DuckDB oracle — whose substring is
    character-based and cannot slice blobs — states the identical
    value.
    """
    media = as_media(spread(load_table(spark, sf_dir, "documents"), "doc_id"))
    return media.select(
        "media_id",
        "modality",
        "n_bytes",
        F.sha2(F.col("payload"), 256).alias("digest"),
        F.lower(
            F.hex(F.encode(F.substring(F.decode("payload", "utf-8"), 1, 4), "utf-8"))
        ).alias("magic"),
    )


ORACLE_MULTIMODAL_METADATA = """
SELECT doc_id AS media_id,
       ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS digest,
       lower(hex(encode(substring(text, 1, 4)))) AS magic
FROM documents
"""


# ---------------------------------------------------------------------------
# Feature extraction — Arrow-batched mapInPandas over the bytes
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = (
    "media_id long, modality string, width int, height int, channels int, "
    "mean_byte double, byte_entropy double"
)


def extract_features(df: DataFrame) -> DataFrame:
    """(media_id, modality, payload) → per-object feature row via
    ``mapInPandas``: each Arrow batch is decoded column-wise with
    numpy (no per-row Python loop over bytes — ``frombuffer`` is
    zero-copy).  The fake decoder derives dims/stats deterministically
    from the payload; :func:`decode_media_real` is the production
    swap-in.
    """

    def features(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n_rows = len(pdf)
            if n_rows == 0:
                continue
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n_rows)
            flat = (
                np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
                if lens.sum()
                else np.zeros(0, dtype=np.int64)
            )
            # whole-batch vectorization: per-row byte histograms in ONE
            # bincount by offsetting each row's bytes into its own
            # 256-wide band (row_idx*256 + byte) — no per-row loop
            row_idx = np.repeat(np.arange(n_rows), lens)
            hist = np.bincount(row_idx * 256 + flat, minlength=n_rows * 256).reshape(
                n_rows, 256
            ).astype(np.float64)
            safe_n = np.maximum(lens, 1).astype(np.float64)
            p = hist / safe_n[:, None]
            with np.errstate(divide="ignore", invalid="ignore"):
                ent = -np.nansum(np.where(p > 0, p * np.log2(p), 0.0), axis=1)
            mean_byte = (hist @ np.arange(256.0)) / safe_n
            mean_byte[lens == 0] = 0.0
            ent[lens == 0] = 0.0
            side = np.maximum(1, np.sqrt(lens).astype(np.int64))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "modality": pdf["modality"].to_numpy(),
                    "width": side.astype(np.int32),
                    "height": np.maximum(1, lens // side).astype(np.int32),
                    "channels": np.where(pdf["modality"].to_numpy() == "audio", 1, 3).astype(
                        np.int32
                    ),
                    "mean_byte": mean_byte,
                    "byte_entropy": ent,
                }
            )

    return df.mapInPandas(features, FEATURES_SCHEMA)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature rows for every media object, then a per-modality
    roll-up (count, avg entropy) — the shape of a corpus-quality
    dashboard feed.  The Python stage sees only (id, modality,
    payload); projection happens before the exchange so Arrow ships
    no unused columns."""
    media = as_media(spread(load_table(spark, sf_dir, "documents"), "doc_id"))
    feats = extract_features(media.select("media_id", "modality", "payload"))
    # Round-12 hardening (the last triaged ROUND(AVG(double)) site —
    # the class that flipped ivf_pq_search in round 10): quantize each
    # per-doc feature ONCE to integer micro-units, sum exactly in
    # BIGINT, and divide a single time at the end.  The per-doc floats
    # are engine-identical (mean_byte is one IEEE division of exact
    # integers; entropy's summation-order ulps are absorbed by the 6dp
    # quantization), so the aggregate can no longer flip a 4dp boundary
    # as partial-sum order shifts.
    mb_micro = F.floor(F.col("mean_byte") * F.lit(1e6) + F.lit(0.5))
    ent_micro = F.floor(F.col("byte_entropy") * F.lit(1e6) + F.lit(0.5))
    agg = feats.groupBy("modality").agg(
        F.count("*").alias("n_objects"),
        F.sum(mb_micro).alias("mb_s"),
        F.sum(ent_micro).alias("ent_s"),
        F.max("width").alias("max_width"),
    )
    n = F.col("n_objects").cast("double")
    return agg.select(
        "modality",
        "n_objects",
        F.round(F.col("mb_s").cast("double") / n / F.lit(1e6), 4).alias(
            "avg_mean_byte"
        ),
        F.round(F.col("ent_s").cast("double") / n / F.lit(1e6), 4).alias(
            "avg_entropy"
        ),
        "max_width",
    )


# Full value oracle (round-3 verdict task 5): the fake decoder is
# deterministic arithmetic over the payload bytes, and the test corpus
# is pure ASCII (verified: octet_length(encode(text)) == length(text)
# for every row at sf0.01 and sf0.1), so char-addressed ascii(substring)
# enumerates exactly the UTF-8 bytes numpy sees.  mean_byte is an exact
# integer sum in both engines (< 2^53, exact in float64); entropy terms
# are identical float64 ops with only summation order differing
# (~1e-16), absorbed by ROUND(..., 4).
ORACLE_MEDIA_FEATURES = """
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS text,
         length(coalesce(text, '')) AS n
  FROM documents
),
bytes AS (
  SELECT doc_id, n,
         ascii(substring(text, CAST(i AS INT), 1)) AS b
  FROM (SELECT doc_id, n, text, unnest(range(1, n + 1)) AS i FROM d)
),
hist AS (
  SELECT doc_id, n, b, COUNT(*) AS c FROM bytes GROUP BY doc_id, n, b
),
per_doc AS (
  SELECT doc_id, n,
         SUM(c * b) * 1.0 / n AS mean_byte,
         -SUM((c * 1.0 / n) * log2(c * 1.0 / n)) AS entropy,
         GREATEST(1, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)) AS width
  FROM hist
  GROUP BY doc_id, n
),
-- left join back to d: an empty/NULL payload yields no bytes rows
-- (range(1, 1) is empty) so the doc would vanish from per_doc, while
-- the decoder emits mean_byte=0 / entropy=0 / width=1 for it
-- per-doc micro-unit quantization (round-12: the integer micro-unit
-- rule — sum exact BIGINTs, divide once at the end, so partial-sum
-- order can never flip the 4dp output boundary)
all_docs AS (
  SELECT d.doc_id,
         CAST(FLOOR(coalesce(p.mean_byte, 0.0) * 1000000.0 + 0.5)
              AS BIGINT) AS mb_micro,
         CAST(FLOOR(coalesce(p.entropy, 0.0) * 1000000.0 + 0.5)
              AS BIGINT) AS ent_micro,
         coalesce(p.width, 1) AS width
  FROM d LEFT JOIN per_doc p USING (doc_id)
)
SELECT ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
       COUNT(*) AS n_objects,
       ROUND(CAST(SUM(mb_micro) AS DOUBLE) / COUNT(*) / 1000000.0, 4)
         AS avg_mean_byte,
       ROUND(CAST(SUM(ent_micro) AS DOUBLE) / COUNT(*) / 1000000.0, 4)
         AS avg_entropy,
       CAST(MAX(width) AS INT) AS max_width
FROM all_docs
GROUP BY 1
"""


RESIZE_TARGET = 4096  # bytes after downsampling


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample pass over the payload bytes: every k-th byte
    with k = ceil(n/target) — the deterministic stand-in for a real
    image resample (the PIL call would slot into the same
    ``mapInPandas`` seam; numpy strided slicing is zero-copy per
    batch).  The output is a real (smaller) binary column; the oracle
    re-states the size arithmetic — resized_len = ceil(n/k) — which
    pins that the Python stage processed every row with the right
    stride."""
    media = as_media(spread(load_table(spark, sf_dir, "documents"), "doc_id"))

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload or b"", dtype=np.uint8)
                n = int(b.size)
                k = max(1, -(-n // RESIZE_TARGET))  # ceil(n/target)
                small = b[::k].tobytes()
                rows.append((int(mid), n, k, small, len(small)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "stride", "resized", "resized_len"],
            )

    out = media.select("media_id", "payload").mapInPandas(
        resize, "media_id long, n_bytes int, stride int, resized binary, resized_len int"
    )
    return out.select("media_id", "n_bytes", "stride", "resized_len")


ORACLE_MEDIA_RESIZE = f"""
WITH m AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
  FROM documents
), s AS (
  SELECT media_id, n_bytes,
         GREATEST(1, CAST(ceil(CAST(n_bytes AS DOUBLE) / {RESIZE_TARGET}) AS INT)) AS stride
  FROM m
)
SELECT media_id, CAST(n_bytes AS INT) AS n_bytes, stride,
       CAST(CASE WHEN n_bytes = 0 THEN 0
                 ELSE ceil(CAST(n_bytes AS DOUBLE) / stride) END AS INT) AS resized_len
FROM s
"""


# ---------------------------------------------------------------------------
# Frame sampling — binary slicing + explode, oracled arithmetic
# ---------------------------------------------------------------------------

def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride frame sampling over "video" payloads: explode a
    frame index per object, slice the real bytes per frame
    (``substring`` on binary is byte-addressed JVM-side), emit typed
    frame rows.  The explode multiplies rows before any shuffle, so at
    scale the frame table inherits the scan's partitioning — no
    repartition needed until a downstream group-by.

    Frame payloads are sliced for real (and measured via
    ``length``) but only arithmetic columns are exposed, keeping the
    oracle blob-free."""
    media = as_media(load_table(spark, sf_dir, "documents")).filter(
        F.col("modality") == "video"
    )
    n_frames = F.least(
        F.floor(F.col("n_bytes") / FRAME_SIZE).cast("int"), F.lit(MAX_FRAMES)
    )
    # sequence(0, -1) yields a *descending* array, not empty — guard
    # zero-frame payloads before the explode
    frames = (
        media.withColumn("n_frames", n_frames)
        .filter(F.col("n_frames") >= 1)
        .select(
            "media_id",
            "n_bytes",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_no"),
            F.col("payload"),
        )
    )
    frame_bytes = F.substring(
        F.col("payload"), F.col("frame_no") * FRAME_SIZE + 1, F.lit(FRAME_SIZE)
    )
    return frames.select(
        "media_id",
        "frame_no",
        (F.col("frame_no") * FRAME_SIZE).alias("byte_offset"),
        F.length(frame_bytes).alias("frame_len"),
    )


ORACLE_FRAME_SAMPLE = f"""
WITH media AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes
  FROM documents
  WHERE CAST(doc_id % 3 AS INT) = 2
),
framed AS (
  SELECT media_id, n_bytes,
         unnest(range(0, LEAST(CAST(floor(n_bytes / {FRAME_SIZE}) AS INT), {MAX_FRAMES}))) AS frame_no
  FROM media
)
SELECT media_id, CAST(frame_no AS INT) AS frame_no,
       CAST(frame_no * {FRAME_SIZE} AS INT) AS byte_offset,
       CAST(LEAST({FRAME_SIZE}, n_bytes - frame_no * {FRAME_SIZE}) AS INT) AS frame_len
FROM framed
"""


QUERIES = {
    "multimodal_metadata": q_multimodal_metadata,
    "media_features": q_media_features,
    "media_resize": q_media_resize,
    "frame_sample": q_frame_sample,
}

ORACLES = {
    "multimodal_metadata": ORACLE_MULTIMODAL_METADATA,
    "media_features": ORACLE_MEDIA_FEATURES,
    "media_resize": ORACLE_MEDIA_RESIZE,
    "frame_sample": ORACLE_FRAME_SAMPLE,
}
