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


def test_decode_real_is_a_stub():
    # video has no codec wired anywhere yet
    with pytest.raises(NotImplementedError):
        mm.decode_media_real(b"\x00\x01", "video")
    if not _has_pil():
        with pytest.raises(NotImplementedError):
            mm.decode_media_real(b"\x00\x01", "image")


def _has_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pil(), reason="PIL not installed in this container")
def test_decode_real_image_with_codec():
    """Exercises the real-codec seam where PIL exists (skips here):
    a 1×1 PNG decodes through the same entry point the fake decoder
    stands in for, pinning the seam's contract (payload bytes in,
    image object with .size out)."""
    import base64

    # smallest valid 1x1 black PNG
    png = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGNg"
        "YGBgAAAABQABh6FO1AAAAABJRU5ErkJggg=="
    )
    img = mm.decode_media_real(png, "image")
    assert img.size == (1, 1)
