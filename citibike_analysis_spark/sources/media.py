"""Binary media ingestion for multimodal columns (SURVEY.md §7
"multimodal columns").

Spark's native ``binaryFile`` source reads whole files as rows of
(path, modificationTime, length, content) with predicate pushdown on the
file METADATA columns — so a length gate (skip corrupt zero-byte files,
cap giant outliers) prunes at the file-listing level before any payload
bytes move. ``to_media`` adapts those rows to the engine's MEDIA_SCHEMA
(operators/multimodal.py): content-addressed id, media type from the
file extension, payload untouched, typed metadata struct left null for
the decode stage to fill (decode kernels are injected — see
operators.multimodal.extract_features).

Scale notes: one row per file is the right granularity for media (files
are the natural unit of decode work); ``maxPartitionBytes`` sizes tasks
by byte volume, so a mix of 10 KB thumbnails and 100 MB videos still
load-balances. Payloads must NEVER be shuffled — every downstream
operator here keys on ``content_id`` and carries the payload only
through narrow stages (enforced by the multimodal operators' design,
tested in tests/test_multimodal_transforms.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → media_type for the common container formats
_EXT_TYPES = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "webp": "image", "bmp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "mkv": "video", "webm": "video", "avi": "video", "mov": "video",
}


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Whole-file scan → (path, modificationTime, length, content).

    ``glob`` filters by filename pattern at listing time;
    ``max_bytes`` pushes a length predicate into the source (metadata
    pushdown — oversized files are skipped without reading a byte).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= F.lit(max_bytes))
    return df


def to_media(files: DataFrame) -> DataFrame:
    """binaryFile rows → MEDIA_SCHEMA rows.

    content_id is the payload sha1 (content-addressed: byte-identical
    files dedup downstream regardless of path); media_type comes from
    the extension, 'unknown' otherwise; meta stays null until a decode
    kernel fills it.
    """
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    type_expr = F.lit("unknown")
    for e, t in _EXT_TYPES.items():
        type_expr = F.when(ext == e, F.lit(t)).otherwise(type_expr)
    return files.select(
        F.sha1(F.col("content")).alias("content_id"),
        type_expr.alias("media_type"),
        F.col("content").alias("payload"),
        F.lit(None)
        .cast(
            "struct<width:int,height:int,n_channels:int,duration_ms:bigint,codec:string>"
        )
        .alias("meta"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
    )
