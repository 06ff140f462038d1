"""Multimodal column plumbing (north-star, SURVEY.md §7 stage 7).

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct — the schema, partition sizing, Arrow batch
shape, and ``mapInPandas`` UDF signatures are the real, tested part.
Actual codecs (PIL/ffmpeg/torchaudio) are not in this environment, so
the decode kernel is pluggable: production injects a real decoder; the
default raises ``NotImplementedError``; tests inject
:func:`fake_decode_image` (deterministic, shape-correct).

Scale notes baked into the design:

- feature extraction is ``mapInPandas`` (Arrow batches, iterator API) —
  no per-row Python, no shuffle; it pipelines with the scan;
- binary payloads never enter a shuffle: derive features first, carry
  ``content_id`` forward and join features back by id if needed;
- ``spark.sql.files.maxPartitionBytes`` (not row count) governs task
  sizing because payloads dominate row width.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every binary payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_channels", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def default_decode(payload: bytes, media_type: str) -> "list[float]":
    """Decode kernel placeholder — inject a real codec in production."""
    raise NotImplementedError(
        "no media codecs in this environment; inject a decode kernel "
        "(e.g. PIL/ffmpeg-backed) via extract_features(decode=...)"
    )


def fake_decode_image(payload: bytes, media_type: str) -> "list[float]":
    """Deterministic stand-in decoder: 8-dim feature from payload bytes.

    Shape-compatible with a real embedding head so the Spark-side
    plumbing (batching, schema, join-back) is exercised for real.
    """
    import hashlib

    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(
    media: DataFrame,
    decode: Callable[[bytes, str], "list[float]"] = default_decode,
    batch_size_hint: int = 64,
) -> DataFrame:
    """payload → (content_id, n_bytes, payload_sha, feature) via mapInPandas.

    Arrow moves columnar batches; the iterator signature lets a real
    decoder amortize model setup per partition (load once, stream
    batches). Output drops the payload: downstream joins/shuffles carry
    ids + features only.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [
                decode(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "content_id": pdf["content_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "payload_sha": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_dedup(features: DataFrame) -> DataFrame:
    """Exact byte-level media dedup on the content hash (no payload shuffle)."""
    return features.groupBy("payload_sha").agg(
        F.min("content_id").alias("canonical_id"), F.count("*").alias("dup_count")
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_channels", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """payload → resized payload + updated meta, via mapInPandas.

    The resize kernel is pluggable like the decode kernel (production:
    PIL/opencv; default raises; tests inject a deterministic fake). The
    Spark-side contract is what's tested: meta.width/height are REWRITTEN
    to the target dims (stale meta after transform is the classic
    multimodal-pipeline bug), other meta fields carry through, and output
    partitioning follows input (narrow op, no shuffle).
    """

    def _no_kernel(payload: bytes, w: int, h: int) -> bytes:
        raise NotImplementedError(
            "no image codecs in this environment; inject resize=..."
        )

    kernel = resize or _no_kernel

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                {**(m if isinstance(m, dict) else m.asDict()),
                 "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {
                    "content_id": pdf["content_id"],
                    "payload": [
                        kernel(bytes(p), width, height) for p in pdf["payload"]
                    ],
                    "meta": metas,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("content_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    extract: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Video payload → one row per sampled frame (UDTF shape: mapInPandas
    emitting more rows than it consumes).

    Frames are sampled every ``every_ms`` over ``meta.duration_ms``,
    capped at ``max_frames`` per video — the cap bounds the row fan-out
    so one long video cannot blow up a task's output (the multimodal
    analog of the shingle document-frequency cap). The frame-extract
    kernel is pluggable (production: ffmpeg seek+decode; default raises;
    tests inject a deterministic fake).
    """

    def _no_kernel(payload: bytes, ms: int) -> bytes:
        raise NotImplementedError(
            "no video codecs in this environment; inject extract=..."
        )

    kernel = extract or _no_kernel

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "content_id": [], "frame_idx": [], "frame_ms": [], "frame": []
            }
            for cid, payload, meta in zip(
                pdf["content_id"], pdf["payload"], pdf["meta"]
            ):
                m = meta if isinstance(meta, dict) else meta.asDict()
                duration = int(m.get("duration_ms") or 0)
                n = min(max_frames, max(duration // every_ms, 0) + 1)
                for i in range(n):
                    ms = i * every_ms
                    out["content_id"].append(cid)
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(ms)
                    out["frame"].append(kernel(bytes(payload), ms))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
