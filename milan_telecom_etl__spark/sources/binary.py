"""binaryFile source — media ingestion for the multimodal family.

`spark.read.format("binaryFile")` yields (path, modificationTime,
length, content) per file with the payload as a binary column — the
zero-dependency way to land images/audio/video into the MEDIA schema.
Partition discovery, pathGlobFilter, and predicate pushdown on the
metadata columns (length!) all work; payload bytes are only
materialized for rows that survive, so "skip everything over 50 MB"
never reads the large files' contents.

Scale notes: one task per file by default (binary files don't split) —
for millions of small media files, compact into larger carrier formats
upstream or raise spark.sql.files.maxPartitionBytes so Spark coalesces
many small files per task; for huge files, the per-file task IS the
right granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension → modality for the MEDIA schema
_MODALITY = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def read_media_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Ingest a directory of media files into the MEDIA shape:
    (media_id, modality, payload, mime_type, source_path, n_bytes).
    media_id is a deterministic 60-bit hash of the file path (stable
    across runs and cluster sizes — no monotonically_increasing_id);
    the size cap filters on the LENGTH metadata column so oversized
    payloads are never read."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    modality = F.coalesce(
        *[F.when(ext == e, F.lit(m)) for e, m in _MODALITY.items()],
        F.lit("binary"),
    )
    return df.select(
        F.conv(F.substring(F.md5(F.col("path")), 1, 15), 16, 10)
        .cast("long")
        .alias("media_id"),
        modality.alias("modality"),
        F.col("content").alias("payload"),
        F.concat(F.lit("application/"), ext).alias("mime_type"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
    )
