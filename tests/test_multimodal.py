"""Multimodal plumbing tests: binary payload transport through
mapInPandas, frame sampling, and the documented decoder stub."""

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.llm.multimodal import (
    attach_fake_payload,
    decode_media,
    extract_media_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world", 11), (2, "abc", 3), (3, "", 0)],
        "doc_id long, text string, n_chars long",
    )
    return attach_fake_payload(docs)


def test_payload_is_binary_with_typed_metadata(media):
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    assert schema["media_format"] == "string"
    assert schema["n_frames"] == "int"


def test_extract_media_features(media):
    rows = {r["doc_id"]: r for r in extract_media_features(media).collect()}
    assert rows[1]["n_bytes"] == 11
    assert rows[1]["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert rows[1]["byte_mean"] == pytest.approx(sum(b"hello world") / 11)
    assert rows[3]["n_bytes"] == 0 and rows[3]["byte_mean"] == 0.0


def test_sample_frames_even_spacing(media):
    got = sample_frames(media, n_samples=4).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["sample_no"], r["frame_idx"]))
    # doc 2: n_chars=3 -> n_frames=4 -> idx = floor(i*4/4) = i
    assert sorted(by_doc[2]) == [(0, 0), (1, 1), (2, 2), (3, 3)]
    # every idx in range [0, n_frames)
    nf = {r["doc_id"]: r["n_frames"] for r in media.select("doc_id", "n_frames").collect()}
    for doc, pairs in by_doc.items():
        assert all(0 <= idx < nf[doc] for _, idx in pairs)
        assert len(pairs) == 4


def test_decode_media_audio_is_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "audio/wav")


def _make_png(width, height, pixel_fn, channels=3, row_filter=0):
    """Minimal stdlib PNG writer (8-bit, non-interlaced): each scanline
    carries `row_filter` (0=None or 1=Sub, encoded accordingly) so the
    decoder's unfilter paths really execute."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype, payload):
        c = ctype + payload
        return struct.pack(">I", len(payload)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    raw = bytearray()
    for y in range(height):
        row = bytearray()
        for x in range(width):
            row += bytes(pixel_fn(x, y))
        if row_filter == 0:
            raw.append(0)
            raw += row
        else:  # Sub-filter the row: store deltas against the left pixel
            raw.append(1)
            enc = bytearray(row)
            for i in range(len(row) - 1, channels - 1, -1):
                enc[i] = (row[i] - row[i - channels]) & 0xFF
            raw += enc
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_media_decodes_real_png():
    png = _make_png(5, 3, lambda x, y: (x * 10, y * 20, 7))
    out = decode_media(png, "image/png")
    assert (out["width"], out["height"], out["channels"]) == (5, 3, 3)
    # spot-check a pixel: (x=2, y=1) -> (20, 20, 7)
    off = (1 * 5 + 2) * 3
    assert out["pixels"][off : off + 3] == bytes([20, 20, 7])


def test_decode_media_unfilters_sub_rows():
    png = _make_png(4, 4, lambda x, y: (x * 30 + 5, 200 - y * 3, x + y), row_filter=1)
    plain = _make_png(4, 4, lambda x, y: (x * 30 + 5, 200 - y * 3, x + y), row_filter=0)
    assert decode_media(png, "image/png")["pixels"] == decode_media(
        plain, "image/png"
    )["pixels"]


def test_extract_image_features_end_to_end(spark):
    """A generated PNG rides the binary column through the Arrow
    boundary and comes back with DECODED width/height — the real-image
    path of the multimodal plumbing."""
    from etl_pipelines_spark.llm.multimodal import extract_image_features

    rows = [
        (1, _make_png(6, 4, lambda x, y: (x, y, 100))),
        (2, _make_png(2, 2, lambda x, y: (255, 0, 0), row_filter=1)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").withColumn(
        "media_format", F.lit("image/png")
    )
    got = {r["doc_id"]: r for r in extract_image_features(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (6, 4, 3)
    assert (got[2]["width"], got[2]["height"]) == (2, 2)
    assert got[2]["mean_pixel"] == pytest.approx((255 + 0 + 0) / 3)
    # a custom id column keeps its name in the output schema
    renamed = extract_image_features(
        df.withColumnRenamed("doc_id", "img_id"), id_col="img_id"
    )
    assert renamed.columns[0] == "img_id"
    assert renamed.count() == 2


def test_resize_media_scale_factors(media):
    from etl_pipelines_spark.llm.multimodal import resize_media

    rows = {r["doc_id"]: r for r in resize_media(media, 224, 224).collect()}
    r = rows[1]  # "hello world" -> 11 bytes -> src 12x12
    assert (r["src_w"], r["src_h"]) == (12, 12)
    assert r["scale_x"] == 224 / 12 and r["scale_y"] == 224 / 12
    assert r["n_bytes_out"] == 224 * 224 * 3
    assert set(rows) == {1, 2, 3}
