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
Audio decodes for REAL too: PCM WAV via the stdlib `wave` module
(`extract_audio_features` emits decoded sample rate / duration / RMS /
zero-crossings). Video: uncompressed Y4M (YUV4MPEG2) parses for real —
header + per-frame luma planes — while compressed codecs (h264 etc.,
which need pyav/ffmpeg not present in this container) remain a
clearly-marked stub. `resize_images` does REAL nearest/bilinear pixel
resampling (numpy) over decoded images; the deterministic byte-level
features in `extract_media_features` keep the plumbing testable even
for payloads with no real codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from etl_pipelines_spark.operators.partitioning import spread_narrow as _spread
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


def _wav_decode_stdlib(data: bytes) -> dict:
    """Pure-stdlib PCM WAV decoder (`wave` + numpy frombuffer): returns
    {sample_rate, n_channels, n_samples, samples} where samples is an
    int numpy array of shape (n_samples, n_channels). 8-bit unsigned
    and 16/32-bit signed PCM; compressed WAV (µ-law etc.) raises from
    `wave` itself."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(data), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        sample_rate = w.getframerate()
        n_samples = w.getnframes()
        frames = w.readframes(n_samples)
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sampwidth)
    if dtype is None:
        raise NotImplementedError(f"{8 * sampwidth}-bit PCM not supported")
    samples = np.frombuffer(frames, dtype=dtype).astype(np.int64)
    if sampwidth == 1:  # 8-bit WAV is unsigned, centre at 0
        samples = samples - 128
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": n_samples,
        "samples": samples.reshape(n_samples, n_channels),
    }


_Y4M_MAGIC = b"YUV4MPEG2 "


def _y4m_decode_stdlib(data: bytes) -> dict:
    """Pure-stdlib Y4M (YUV4MPEG2) parser: stream header, then one raw
    YUV frame per FRAME marker. Returns {width, height, n_frames,
    frames} where frames is a list of luma (Y) planes as bytes —
    chroma subsampling only changes the chroma plane size we skip
    over. Uncompressed-only by format definition, so this is a REAL
    video decode path with no codec dependency."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    hdr_end = data.index(b"\n")
    width = height = None
    chroma = "420"
    for tok in data[len(_Y4M_MAGIC) : hdr_end].split(b" "):
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok[1:].decode("ascii")
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    y_size = width * height
    if chroma.startswith("420"):
        chroma_size = 2 * ((width + 1) // 2) * ((height + 1) // 2)
    elif chroma.startswith("422"):
        chroma_size = 2 * ((width + 1) // 2) * height
    elif chroma.startswith("444"):
        chroma_size = 2 * y_size
    elif chroma == "mono":
        chroma_size = 0
    else:
        raise NotImplementedError(f"Y4M chroma mode {chroma!r}")
    frames = []
    pos = hdr_end + 1
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = data.index(b"\n", pos) + 1
        frames.append(data[pos : pos + y_size])
        if len(frames[-1]) != y_size:
            raise ValueError("truncated Y4M frame")
        pos += y_size + chroma_size
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }


def decode_media(payload: bytes, media_format: str) -> dict:
    """Decode a media payload into a typed dict per modality.

    Images are REAL: PIL when importable (any format), else a stdlib
    PNG decoder (`_png_decode_stdlib`) for image/png →
    {width, height, channels, pixels}. Audio is REAL for PCM WAV
    (stdlib `wave`) → {sample_rate, n_channels, n_samples, samples}.
    Video is REAL for uncompressed Y4M → {width, height, n_frames,
    frames}. Compressed audio/video codecs (mp3/h264/…, which need
    librosa/pyav not present in this container) stay a clearly-marked
    stub — the Spark side (binary transport, Arrow batching, declared
    output schema) is identical whichever inner decoder runs.
    """
    data = bytes(payload)
    is_image = media_format.startswith("image/") or data[:8] == _PNG_MAGIC
    # image formats dispatch FIRST: some image containers are RIFF too
    # (WebP), and PIL must keep handling them — only non-image RIFF
    # payloads sniff as WAV
    if not is_image and (
        media_format.startswith("audio/")
        or (data[:4] == b"RIFF" and data[8:12] == b"WAVE")
    ):
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return _wav_decode_stdlib(data)
        raise NotImplementedError(
            f"audio format {media_format!r} needs librosa/soundfile "
            "(not installed); PCM WAV decodes via the stdlib path"
        )
    if not is_image and (
        media_format.startswith("video/") or data[:10] == _Y4M_MAGIC
    ):
        if data[:10] == _Y4M_MAGIC:
            return _y4m_decode_stdlib(data)
        raise NotImplementedError(
            f"video format {media_format!r} needs pyav/ffmpeg "
            "(not installed); uncompressed Y4M decodes via the stdlib path"
        )
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
        f"no decoder for media format {media_format!r}; use "
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

    return _spread(df.select(id_col, payload_col)).mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)


def extract_image_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    format_col: str = "media_format",
) -> DataFrame:
    """Arrow-batched REAL image decoding over a binary column:
    `decode_media` per payload (PIL or the stdlib PNG path), emitting
    decoded dimensions and the mean pixel value. Same plan shape as
    extract_media_features — input pruned to (id, payload, format)
    before the Python boundary, output schema declared up front."""
    run = _image_features_run(id_col, payload_col, format_col)
    return _spread(df.select(id_col, payload_col, format_col)).mapInPandas(
        run, schema=_IMAGE_FEATURE_SCHEMA.format(id=id_col)
    )


_IMAGE_FEATURE_SCHEMA = (
    "{id} long, width int, height int, channels int, mean_pixel double"
)


def _image_features_run(id_col: str, payload_col: str, format_col: str):
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

    return run


def encode_png(
    width: int, height: int, pixels: bytes, channels: int = 1, row_filter: int = 1
) -> bytes:
    """Pure-stdlib PNG encoder (struct + zlib), the inverse of
    `_png_decode_stdlib`: 8-bit grey/RGB/grey+alpha/RGBA, None or Sub
    scanline filtering. Sub is the default so every decode of an
    encoded payload exercises real unfiltering, not a memcpy."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        c = ctype + payload
        return (
            struct.pack(">I", len(payload))
            + c
            + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)
        )

    stride = width * channels
    raw = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        if row_filter == 0:
            raw.append(0)
            raw += row
        else:
            raw.append(1)
            enc = bytearray(row)
            for i in range(stride - 1, channels - 1, -1):
                enc[i] = (row[i] - row[i - channels]) & 0xFF
            raw += enc
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Stdlib PCM WAV encoder (16-bit signed mono)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def encode_y4m(width: int, height: int, luma_frames: list[bytes]) -> bytes:
    """Stdlib Y4M encoder: C420 stream with neutral chroma planes."""
    out = bytearray(f"YUV4MPEG2 W{width} H{height} F25:1 C420\n".encode())
    chroma = bytes([128]) * (2 * ((width + 1) // 2) * ((height + 1) // 2))
    for plane in luma_frames:
        out += b"FRAME\n" + plane + chroma
    return bytes(out)


def synthetic_media_payloads(
    df: DataFrame, kind: str, id_col: str = "doc_id", size_col: str = "n_chars"
) -> DataFrame:
    """Deterministic REAL media payloads derived from (id, size):
    encode each row as an actual PNG / PCM WAV / Y4M stream whose
    content follows a closed-form pixel/sample formula — so a SQL
    oracle can recompute what a real decode must recover, putting the
    encoder→decoder round-trip inside the cross-engine correctness
    gate. Formulas (all arithmetic stays inside one byte / int16, no
    wraparound, so the closed forms are mod-free):

    - image: w = size%24+2, h = size%16+2, grey pixel(x, y) =
      3x + 5y + id%97 (Sub-filtered PNG: decode must really unfilter).
    - audio: n = (size%50)*2+4 samples at 16 kHz, s_i = sign_i*(A+i)
      with A = id%50+1 and sign alternating -/+ — RMS and the
      zero-crossing count have exact closed forms.
    - video: w=4, h=2, F = size%6+2 frames, luma(x, y, f) =
      3x + 7y + 11f + id%64.
    """
    if kind not in ("image", "audio", "video"):
        raise ValueError(f"unknown synthetic media kind {kind!r}")
    run = _synthetic_media_run(kind, id_col, size_col)
    return _spread(df.select(id_col, size_col)).mapInPandas(
        run, schema=f"{id_col} long, payload binary, media_format string"
    )


def _synthetic_media_run(kind: str, id_col: str, size_col: str):
    """The synthesis batch generator behind `synthetic_media_payloads`,
    exposed so `synthetic_media_features` can CHAIN it into the decode
    generator inside one Python task (guide §4.1: every mapInPandas
    stage pays a full JVM->Python->JVM round trip of the payload
    bytes; encode->decode composed in one pass crosses them never)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, size in zip(
                pdf[id_col].astype("int64"), pdf[size_col].astype("int64")
            ):
                if kind == "image":
                    w, h = int(size % 24 + 2), int(size % 16 + 2)
                    base = int(doc_id % 97)
                    px = bytes(
                        3 * x + 5 * y + base for y in range(h) for x in range(w)
                    )
                    payload, fmt = encode_png(w, h, px), "image/png"
                elif kind == "audio":
                    n = int(size % 50) * 2 + 4
                    amp = int(doc_id % 50) + 1
                    samples = [
                        (i % 2 * 2 - 1) * (amp + i) for i in range(n)
                    ]
                    payload, fmt = encode_wav(samples), "audio/wav"
                else:
                    nf = int(size % 6 + 2)
                    base = int(doc_id % 64)
                    frames = [
                        bytes(
                            3 * x + 7 * y + 11 * f + base
                            for y in range(2)
                            for x in range(4)
                        )
                        for f in range(nf)
                    ]
                    payload, fmt = encode_y4m(4, 2, frames), "video/y4m"
                rows.append({id_col: doc_id, "payload": payload, "media_format": fmt})
            yield pd.DataFrame(rows, columns=[id_col, "payload", "media_format"])

    return run


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    format_col: str = "media_format",
) -> DataFrame:
    """Arrow-batched REAL audio decoding over a binary column: PCM WAV
    payloads decode via `decode_media` (stdlib `wave`), emitting the
    decoded stream parameters plus the two classic signal features —
    RMS amplitude and the zero-crossing count of the first channel.
    Same plan contract as the image path: input pruned to (id, payload,
    format) before the Python boundary, output schema declared."""
    run = _audio_features_run(id_col, payload_col, format_col)
    return _spread(df.select(id_col, payload_col, format_col)).mapInPandas(
        run, schema=_AUDIO_FEATURE_SCHEMA.format(id=id_col)
    )


_AUDIO_FEATURE_SCHEMA = (
    "{id} long, sample_rate int, n_channels int, n_samples long, "
    "duration_s double, rms double, zero_crossings long"
)


def _audio_features_run(id_col: str, payload_col: str, format_col: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                id_col: pdf[id_col].astype("int64"),
                "sample_rate": [], "n_channels": [], "n_samples": [],
                "duration_s": [], "rms": [], "zero_crossings": [],
            }
            for p, fmt in zip(pdf[payload_col], pdf[format_col]):
                d = decode_media(p, fmt)
                ch0 = d["samples"][:, 0]
                out["sample_rate"].append(d["sample_rate"])
                out["n_channels"].append(d["n_channels"])
                out["n_samples"].append(d["n_samples"])
                out["duration_s"].append(d["n_samples"] / d["sample_rate"])
                out["rms"].append(
                    float(np.sqrt(np.mean(np.square(d["samples"], dtype=np.float64))))
                    if d["n_samples"]
                    else 0.0
                )
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.signbit(ch0[1:]) != np.signbit(ch0[:-1])))
                )
            yield pd.DataFrame(out)

    return run


def extract_video_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    format_col: str = "media_format", n_samples: int = 4,
) -> DataFrame:
    """Arrow-batched REAL video decoding over a binary column: Y4M
    payloads parse via `decode_media`, then the evenly-spaced frame
    rule (same formula as `sample_frames`: floor(i * n_frames / n)) is
    applied INSIDE the decoder loop so only the selected frames' luma
    planes are touched. Emits one row per (doc, sampled frame) with the
    frame's mean luma — the decode side of the sample_frames plan."""
    run = _video_features_run(id_col, payload_col, format_col, n_samples)
    return _spread(df.select(id_col, payload_col, format_col)).mapInPandas(
        run, schema=_VIDEO_FEATURE_SCHEMA.format(id=id_col)
    )


_VIDEO_FEATURE_SCHEMA = (
    "{id} long, width int, height int, n_frames int, "
    "frame_idx long, luma_mean double"
)


def _video_features_run(
    id_col: str, payload_col: str, format_col: str, n_samples: int
):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p, fmt in zip(
                pdf[id_col].astype("int64"), pdf[payload_col], pdf[format_col]
            ):
                d = decode_media(p, fmt)
                nf = d["n_frames"]
                for i in sorted({i * nf // n_samples for i in range(n_samples) if nf}):
                    plane = d["frames"][i]
                    rows.append(
                        {
                            id_col: doc_id,
                            "width": d["width"],
                            "height": d["height"],
                            "n_frames": nf,
                            "frame_idx": i,
                            "luma_mean": float(sum(plane)) / len(plane),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "n_frames", "frame_idx", "luma_mean"
                ],
            )

    return run


def synthetic_media_features(
    df: DataFrame,
    kind: str,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    n_samples: int = 4,
) -> DataFrame:
    """The encode -> decode round trip (synthetic_media_payloads then
    extract_*_features) composed into ONE mapInPandas stage: the synth
    generator's output batches feed the decode generator directly
    inside the same Python task, so the binary payloads never cross
    the Python/JVM boundary at all (round 12, guide §4.1 — each
    mapInPandas stage pays a full JVM->Python->JVM Arrow round trip;
    the intermediate payload column was serialized out and straight
    back in). The round trip itself is unchanged — real PNG/WAV/Y4M
    bytes are produced and genuinely decoded — and each member's
    output is bit-identical (same generators, chained)."""
    synth = _synthetic_media_run(kind, id_col, size_col)
    if kind == "image":
        extract = _image_features_run(id_col, "payload", "media_format")
        schema = _IMAGE_FEATURE_SCHEMA
    elif kind == "audio":
        extract = _audio_features_run(id_col, "payload", "media_format")
        schema = _AUDIO_FEATURE_SCHEMA
    else:
        extract = _video_features_run(id_col, "payload", "media_format", n_samples)
        schema = _VIDEO_FEATURE_SCHEMA
    return _spread(df.select(id_col, size_col)).mapInPandas(
        lambda batches: extract(synth(batches)), schema=schema.format(id=id_col)
    )


def resize_images(
    df: DataFrame,
    dst_w: int,
    dst_h: int,
    method: str = "nearest",
    id_col: str = "doc_id",
    payload_col: str = "payload",
    format_col: str = "media_format",
) -> DataFrame:
    """REAL image resampling over mapInPandas: each payload decodes via
    `decode_media`, resamples to (dst_w, dst_h) with numpy — nearest
    (the index-gather every vision pipeline's fast path uses) or
    bilinear (align-corners=False, the torchvision/PIL convention) —
    and the resized RGB/grey bytes return as a binary column next to
    the decoded source dims. The per-image work is pure vectorized
    numpy: no per-pixel Python loops."""
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown resize method {method!r}")
    schema = (
        f"{id_col} long, src_w int, src_h int, channels int, "
        "resized binary, mean_pixel double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def resample(d: dict) -> np.ndarray:
            w, h, c = d["width"], d["height"], d["channels"]
            img = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, c)
            if method == "nearest":
                ys = np.minimum((np.arange(dst_h) + 0.5) * h / dst_h, h - 1).astype(int)
                xs = np.minimum((np.arange(dst_w) + 0.5) * w / dst_w, w - 1).astype(int)
                return img[ys[:, None], xs[None, :]]
            # bilinear, align-corners=False: src = (dst + 0.5) * scale - 0.5
            sy = np.clip((np.arange(dst_h) + 0.5) * h / dst_h - 0.5, 0, h - 1)
            sx = np.clip((np.arange(dst_w) + 0.5) * w / dst_w - 0.5, 0, w - 1)
            y0 = np.floor(sy).astype(int)
            x0 = np.floor(sx).astype(int)
            y1 = np.minimum(y0 + 1, h - 1)
            x1 = np.minimum(x0 + 1, w - 1)
            fy = (sy - y0)[:, None, None]
            fx = (sx - x0)[None, :, None]
            img = img.astype(np.float64)
            top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
            bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
            return np.clip(
                np.rint(top * (1 - fy) + bot * fy), 0, 255
            ).astype(np.uint8)

        for pdf in batches:
            rows = []
            for doc_id, p, fmt in zip(
                pdf[id_col].astype("int64"), pdf[payload_col], pdf[format_col]
            ):
                d = decode_media(p, fmt)
                out = resample(d)
                rows.append(
                    {
                        id_col: doc_id,
                        "src_w": d["width"],
                        "src_h": d["height"],
                        "channels": d["channels"],
                        "resized": out.tobytes(),
                        "mean_pixel": float(out.mean()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "src_w", "src_h", "channels", "resized", "mean_pixel"
                ],
            )

    return _spread(df.select(id_col, payload_col, format_col)).mapInPandas(run, schema=schema)


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

    return _spread(df.select(id_col, payload_col)).mapInPandas(run, schema=RESIZE_SCHEMA)
