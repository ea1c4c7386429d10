"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (mirrors how a 100 TB training-data pipeline carries media):
- image/audio/video bytes live in an opaque `binary` column; typed
  metadata (format, n_frames, sample rate, ...) lives in ordinary typed
  columns next to it, so predicates/pruning never touch the payload.
- decode / feature-extract runs as Arrow-batched `mapInPandas`: the
  payload crosses to Python once per batch, never per row, and the
  output schema is declared up front so Catalyst can prune around it.
- frame/sample selection is a pure DataFrame op (sequence + explode) —
  no Python in that path at all.

The actual image/audio decoders (PIL / librosa / pyav) are NOT in this
container, so `decode_media` is a clearly-marked stub; the deterministic
byte-level features below keep the full plumbing testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = "doc_id long, n_bytes long, sha256 string, byte_mean double"


def attach_fake_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media payload: the utf-8 bytes of `text_col`
    as a `binary` column plus typed metadata. Stands in for real image/
    audio bytes in tests (the container ships no media fixtures)."""
    return (
        df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
        .withColumn("media_format", F.lit("fake/raw"))
        .withColumn("n_frames", (F.col("n_chars") % 100 + 1).cast("int"))
    )


def decode_media(payload: bytes, media_format: str):  # pragma: no cover - stub
    """Decode an image/audio/video payload into arrays.

    STUB: the real implementation dispatches on media_format to PIL /
    librosa / pyav, none of which exist in this container. The Spark
    side (binary column transport, Arrow batching, declared output
    schema) is real and tested via the byte-level features instead.
    """
    raise NotImplementedError(
        "media decoders are not installed; use extract_media_features for "
        "the byte-level plumbing path"
    )


def extract_media_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Deterministic byte-level features (length, sha256, mean byte value)
    stand in for a real decoder; swapping in `decode_media` changes only
    the inner loop, not the Spark plan. Input is pruned to exactly
    (id, payload) before the Python boundary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "byte_mean": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    n_samples: int = 4,
    id_col: str = "doc_id",
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Evenly-spaced frame selection: for each media row emit n_samples
    rows with the frame index to decode. Pure JVM-side (sequence +
    explode) — the selection never touches the payload bytes, so at
    scale the decoder UDF only ever sees the frames it must decode.

    frame_idx = floor(sample_no * n_frames / n_samples), clamped by
    construction to [0, n_frames).
    """
    return (
        df.select(
            id_col,
            F.col(n_frames_col),
            F.explode(F.sequence(F.lit(0), F.lit(n_samples - 1))).alias("sample_no"),
        )
        .withColumn(
            "frame_idx",
            F.floor(
                F.col("sample_no") * F.col(n_frames_col) / F.lit(n_samples)
            ).cast("long"),
        )
        .select(id_col, "sample_no", "frame_idx")
    )


RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, dst_w int, dst_h int, "
    "scale_x double, scale_y double, n_bytes_out long"
)


def resize_media(
    df: DataFrame,
    dst_w: int,
    dst_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing over mapInPandas: metadata (synthetic source
    dims derived deterministically from the payload) plus the scale
    factors a real resampler would apply. The pixel resample itself
    belongs in `decode_media` (stubbed — no imaging libs in this
    container); n_bytes_out models the dst_w*dst_h*3 RGB buffer so
    downstream sizing logic is testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(len)
            src_w = (n % 640 + 1).astype("int32")
            src_h = (n % 480 + 1).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "src_w": src_w,
                    "src_h": src_h,
                    "dst_w": dst_w,
                    "dst_h": dst_h,
                    "scale_x": dst_w / src_w,
                    "scale_y": dst_h / src_h,
                    "n_bytes_out": [dst_w * dst_h * 3] * len(pdf),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZE_SCHEMA)
