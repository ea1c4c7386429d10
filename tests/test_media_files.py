"""Media-file ingestion: binaryFile source -> multimodal decode."""

import pytest

from etl_pipelines_spark.llm.multimodal import (
    encode_png,
    encode_wav,
    encode_y4m,
)
from etl_pipelines_spark.sources.media_files import (
    ingest_media_dir,
    read_media_files,
)


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    px = bytes((3 * x + 5 * y) % 256 for y in range(4) for x in range(6))
    (d / "a.png").write_bytes(encode_png(6, 4, px))
    (d / "b.wav").write_bytes(encode_wav([100, -100] * 4, sample_rate=8000))
    (d / "c.y4m").write_bytes(
        encode_y4m(4, 2, [bytes(range(8)), bytes([10] * 8)])
    )
    (d / "notes.txt").write_bytes(b"not media")
    sub = d / "nested"
    sub.mkdir()
    (sub / "d.png").write_bytes(encode_png(2, 2, bytes([9, 9, 9, 9])))
    return str(d)


def test_read_media_files_contract(spark, media_dir):
    rows = {r["file_name"]: r for r in read_media_files(spark, media_dir).collect()}
    assert set(rows) == {"a.png", "b.wav", "c.y4m", "notes.txt", "nested/d.png"}
    assert rows["a.png"]["media_format"] == "image/png"
    assert rows["b.wav"]["media_format"] == "audio/wav"
    assert rows["c.y4m"]["media_format"] == "video/y4m"
    assert rows["notes.txt"]["media_format"] == "application/octet-stream"
    assert rows["notes.txt"]["n_bytes"] == 9
    # media_id: deterministic, unique, non-negative
    ids = [r["media_id"] for r in rows.values()]
    assert len(set(ids)) == 5 and all(i >= 0 for i in ids)
    again = {r["file_name"]: r["media_id"] for r in read_media_files(spark, media_dir).collect()}
    assert again == {k: r["media_id"] for k, r in rows.items()}


def test_read_media_files_glob_prunes_listing(spark, media_dir):
    got = read_media_files(spark, media_dir, glob="*.png")
    assert sorted(r["file_name"] for r in got.collect()) == ["a.png", "nested/d.png"]


def test_ingest_media_dir_decodes_every_modality(spark, media_dir):
    out = ingest_media_dir(spark, media_dir)
    imgs = {r["width"]: r for r in out["images"].collect()}
    assert set(imgs) == {6, 2}
    assert imgs[6]["height"] == 4 and imgs[6]["channels"] == 1
    aud = out["audio"].collect()
    assert len(aud) == 1
    assert aud[0]["sample_rate"] == 8000 and aud[0]["n_samples"] == 8
    assert aud[0]["rms"] == pytest.approx(100.0)
    vid = out["video"].collect()
    assert {r["frame_idx"] for r in vid} == {0, 1}
    by_idx = {r["frame_idx"]: r["luma_mean"] for r in vid}
    assert by_idx[0] == pytest.approx(sum(range(8)) / 8)
    assert by_idx[1] == 10.0
    # the unknown-format file rides "files" but is never decoded
    assert out["files"].count() == 5


def test_ingest_skips_undecodable_formats(spark, tmp_path):
    # a compressed-codec file rides "files" but never reaches a decoder
    (tmp_path / "clip.mp4").write_bytes(b"\x00\x00\x00\x18ftypmp42data")
    (tmp_path / "a.png").write_bytes(encode_png(2, 2, bytes(4)))
    out = ingest_media_dir(spark, str(tmp_path))
    assert out["files"].count() == 2
    assert out["video"].count() == 0  # mp4 not routed to the Y4M parser
    assert out["images"].count() == 1
