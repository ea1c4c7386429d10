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

Images decode for REAL: `decode_media` uses PIL when importable and
falls back to a pure-stdlib PNG decoder (zlib inflate + scanline
unfiltering) otherwise, driven end-to-end by `extract_image_features`.
Audio/video decoders (librosa / pyav) are NOT in this container and
stay a clearly-marked stub; the deterministic byte-level features keep
that plumbing testable end-to-end too.
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_decode_stdlib(data: bytes) -> dict:
    """Pure-stdlib PNG decoder (struct + zlib): 8-bit greyscale/RGB/
    grey+alpha/RGBA, non-interlaced, all five scanline filters
    (None/Sub/Up/Average/Paeth per the PNG spec). Exists so the image
    path is REAL even where PIL is absent; PIL, when importable, takes
    precedence and covers every other format."""
    import struct
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = channels = None
    idat = b""
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if bit_depth != 8 or interlace != 0:
                raise NotImplementedError(
                    "stdlib PNG path handles 8-bit non-interlaced images only"
                )
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise NotImplementedError("palette PNGs need PIL")
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(height):
        f = raw[p]
        p += 1
        row = bytearray(raw[p : p + stride])
        p += stride
        if f == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pt = a + b - c
                pa, pb, pc = abs(pt - a), abs(pt - b), abs(pt - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"invalid PNG filter byte {f}")
        out += row
        prev = row
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(out),
    }


def decode_media(payload: bytes, media_format: str) -> dict:
    """Decode a media payload into {width, height, channels, pixels}.

    Images are REAL: PIL when importable (any format), else a stdlib
    PNG decoder (`_png_decode_stdlib`) for image/png. Audio/video stay
    a clearly-marked stub — librosa/pyav are not in this container —
    and the Spark side (binary transport, Arrow batching, declared
    output schema) is identical whichever inner decoder runs.
    """
    data = bytes(payload)
    is_image = media_format.startswith("image/") or data[:8] == _PNG_MAGIC
    if is_image:
        try:
            import io

            from PIL import Image  # optional dependency

            img = Image.open(io.BytesIO(data))
            img.load()
            if img.mode == "P":
                # palette mode: tobytes() would return lookup-table
                # INDICES, silently yielding nonsense intensities (the
                # stdlib path rejects palette PNGs loudly instead) —
                # expand to real samples first
                img = img.convert(
                    "RGBA" if "transparency" in img.info else "RGB"
                )
            return {
                "width": img.width,
                "height": img.height,
                "channels": len(img.getbands()),
                "pixels": img.tobytes(),
            }
        except ImportError:
            if data[:8] == _PNG_MAGIC:
                return _png_decode_stdlib(data)
            raise NotImplementedError(
                f"decoding {media_format!r} needs PIL (not installed); "
                "only PNG has a stdlib fallback"
            ) from None
    raise NotImplementedError(
        "audio/video decoders (librosa/pyav) are not installed; use "
        "extract_media_features for the byte-level plumbing path"
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


def extract_image_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    format_col: str = "media_format",
) -> DataFrame:
    """Arrow-batched REAL image decoding over a binary column:
    `decode_media` per payload (PIL or the stdlib PNG path), emitting
    decoded dimensions and the mean pixel value. Same plan shape as
    extract_media_features — input pruned to (id, payload, format)
    before the Python boundary, output schema declared up front."""
    schema = (
        f"{id_col} long, width int, height int, channels int, mean_pixel double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_media(p, f)
                for p, f in zip(pdf[payload_col], pdf[format_col])
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "channels": [d["channels"] for d in decoded],
                    "mean_pixel": [
                        float(sum(d["pixels"])) / len(d["pixels"])
                        if d["pixels"]
                        else 0.0
                        for d in decoded
                    ],
                }
            )

    return df.select(id_col, payload_col, format_col).mapInPandas(
        run, schema=schema
    )


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
