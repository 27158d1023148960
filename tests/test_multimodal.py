"""Multimodal plumbing: binary payload columns, Arrow-batched feature
extraction, frame slicing, and the real-codec stub seam."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from etl_python_spark.operators import multimodal as mm
from etl_python_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_as_media_binary_column(spark):
    media = mm.as_media(load_table(spark, SF_SMOKE, "documents"))
    assert isinstance(media.schema["payload"].dataType, BinaryType)
    row = media.filter(F.col("n_bytes") > 0).first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert len(row.payload) == row.n_bytes
    assert row.modality in mm.MODALITIES


def test_extract_features_deterministic(spark):
    media = mm.as_media(load_table(spark, SF_SMOKE, "documents")).limit(20)
    feats = mm.extract_features(media.select("media_id", "modality", "payload"))
    rows = {r.media_id: r for r in feats.collect()}
    again = {
        r.media_id: r
        for r in mm.extract_features(
            media.select("media_id", "modality", "payload")
        ).collect()
    }
    assert rows.keys() == again.keys()
    for k in rows:
        assert rows[k] == again[k]
        assert 0.0 <= rows[k].mean_byte <= 255.0
        assert rows[k].byte_entropy >= 0.0
        assert rows[k].channels == (1 if rows[k].modality == "audio" else 3)


def test_frame_sample_slices_real_bytes(spark):
    frames = mm.QUERIES["frame_sample"](spark, SF_SMOKE)
    rows = frames.collect()
    assert rows
    assert all(0 < r.frame_len <= mm.FRAME_SIZE for r in rows)
    assert all(r.byte_offset == r.frame_no * mm.FRAME_SIZE for r in rows)


def test_decode_real_unknown_container_raises():
    # video has no codec wired anywhere yet, and an image payload with
    # an unknown magic must fail loudly regardless of installed libs
    with pytest.raises(NotImplementedError):
        mm.decode_media_real(b"\x00\x01", "video")
    with pytest.raises(NotImplementedError):
        mm.decode_media_real(b"\x00\x01", "image")


def _encode_bmp(pixels: list[list[tuple]]) -> bytes:
    """Minimal uncompressed 24-bit BMP encoder (test-side twin of the
    pure-Python decoder): top-down pixel rows in, standard bottom-up
    BGR file out."""
    import struct

    h = len(pixels)
    w = len(pixels[0])
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(pixels):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        body += line + b"\x00" * (stride - len(line))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def test_decode_real_bmp_executes_everywhere():
    """The real-codec seam actually runs: a 3×2 uncompressed BMP round
    trips through decode_media_real with exact pixel values (BGR→RGB,
    bottom-up rows, 4-byte padding all exercised)."""
    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
    ]
    img = mm.decode_media_real(_encode_bmp(pixels), "image")
    assert img.size == (3, 2)
    for y, row in enumerate(pixels):
        for x, px in enumerate(row):
            assert img.getpixel((x, y)) == px


def test_decode_bmp_truncation_fails_loudly():
    """Bounds validation: a truncated payload, a data offset pointing
    past the end, or nonsense dimensions must raise — Python slices
    would otherwise silently yield short pixel rows and plausible dims
    over garbage."""
    import struct

    good = _encode_bmp([[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (10, 11, 12)]])
    assert mm.decode_bmp(good).size == (2, 2)
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_bmp(good[:-3])  # body cut short
    # data_off pointing past the end of the payload
    bad_off = good[:10] + struct.pack("<I", len(good) + 40) + good[14:]
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_bmp(bad_off)
    # zero-width image
    bad_w = good[:18] + struct.pack("<i", 0) + good[22:]
    with pytest.raises(ValueError, match="dimensions"):
        mm.decode_bmp(bad_w)


def test_decode_dims_real_through_spark(spark):
    """Real decode through the Spark plumbing: BMP payloads in a binary
    column, decoded per Arrow batch by mapInPandas via the same
    decode_media_real entry point."""
    rows = [
        (i, _encode_bmp([[(i, i, i)] * (i + 1)] * 2))  # (i+1)×2 images
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: (r.width, r.height) for r in mm.decode_dims_real(df).collect()}
    assert got == {i: (i + 1, 2) for i in range(5)}
