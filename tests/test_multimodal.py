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


def test_decode_media_is_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "image/png")


def test_resize_media_scale_factors(media):
    from etl_pipelines_spark.llm.multimodal import resize_media

    rows = {r["doc_id"]: r for r in resize_media(media, 224, 224).collect()}
    r = rows[1]  # "hello world" -> 11 bytes -> src 12x12
    assert (r["src_w"], r["src_h"]) == (12, 12)
    assert r["scale_x"] == 224 / 12 and r["scale_y"] == 224 / 12
    assert r["n_bytes_out"] == 224 * 224 * 3
    assert set(rows) == {1, 2, 3}
