"""Media-file ingestion: directories of image/audio/video files read
as binary columns via Spark's built-in `binaryFile` source.

This is the on-disk front door of the multimodal path (llm/multimodal):
at 100 TB a media corpus lives as millions of files in an object store;
`binaryFile` lists them distributed, streams each file's bytes into a
`content` binary column, and carries (path, length, modificationTime)
as ordinary typed columns — so size/recency predicates prune BEFORE any
payload is read (the source pushes `length`/`modificationTime` filters
at file-listing time), and the decode UDFs downstream only ever see the
files that survive. The reference has no media path; this follows its
S-series source discipline (declared schema, typed metadata next to
opaque payloads).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension -> media_format; unknown extensions fall through to
# application/octet-stream so a stray file never fails the scan
_EXT_FORMATS = {
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "wav": "audio/wav",
    "y4m": "video/y4m",
    "mp4": "video/mp4",
}


def read_media_files(
    spark: SparkSession,
    path: str,
    glob: str = "*",
    recursive: bool = True,
) -> DataFrame:
    """Read a directory of media files into the multimodal contract:
    (media_id, file_name, media_format, n_bytes, modified_at, payload).

    media_id is a deterministic 63-bit hash of the RELATIVE file path
    (stable across re-ingestion and across mount points — the absolute
    prefix would change between clusters). Format derives from the
    extension; payload is the raw bytes. Filter on n_bytes /
    modified_at BEFORE any decode: those predicates prune at listing
    time without reading file contents.
    """
    base = os.path.abspath(path).rstrip("/") + "/"
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
    )
    rel = F.replace(
        F.col("path"), F.lit(f"file:{base}"), F.lit("")
    )
    ext = F.lower(F.element_at(F.split(rel, r"\."), -1))
    fmt_map = F.create_map(
        *[F.lit(x) for kv in _EXT_FORMATS.items() for x in kv]
    )
    return df.select(
        F.xxhash64(rel).bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF)).alias("media_id"),
        rel.alias("file_name"),
        F.coalesce(fmt_map[ext], F.lit("application/octet-stream")).alias(
            "media_format"
        ),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified_at"),
        F.col("content").alias("payload"),
    )


def ingest_media_dir(
    spark: SparkSession, path: str, glob: str = "*"
) -> dict[str, DataFrame]:
    """One-call media ingestion: read the directory, split per modality
    on media_format, and run the REAL decoders over each split —
    images through extract_image_features, audio through
    extract_audio_features, video through extract_video_features.
    Returns {"files", "images", "audio", "video"} frames. Unknown
    formats stay in "files" only (no decode attempted), so a mixed
    directory never fails ingestion.
    """
    from etl_pipelines_spark.llm.multimodal import (
        extract_audio_features,
        extract_image_features,
        extract_video_features,
    )

    files = read_media_files(spark, path, glob)
    # route only formats the decoders can actually handle: PNG always,
    # JPEG only when PIL is importable, WAV and Y4M via the stdlib
    # paths — compressed codecs (mp4 etc.) stay in "files" undecoded,
    # keeping the "a mixed directory never fails ingestion" contract
    try:
        import PIL  # noqa: F401

        image_formats = ["image/png", "image/jpeg"]
    except ImportError:
        image_formats = ["image/png"]
    fmt = F.col("media_format")
    return {
        "files": files,
        "images": extract_image_features(
            files.filter(fmt.isin(image_formats)), id_col="media_id"
        ),
        "audio": extract_audio_features(
            files.filter(fmt == "audio/wav"), id_col="media_id"
        ),
        "video": extract_video_features(
            files.filter(fmt == "video/y4m"), id_col="media_id"
        ),
    }
