"""Resize / frame-sample multimodal transform tests (SURVEY.md §7,
operators/multimodal.py): the Spark-side contracts — schema, meta
rewrite, bounded row fan-out, kernel injection — with deterministic fake
kernels standing in for the absent codecs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from citibike_analysis_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    resize_images,
    sample_frames,
)


def _media(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _img(cid, payload, w=640, h=480):
    return (cid, "image", payload, Row(
        width=w, height=h, n_channels=3, duration_ms=None, codec="png"))


def _vid(cid, payload, duration_ms):
    return (cid, "video", payload, Row(
        width=1280, height=720, n_channels=3, duration_ms=duration_ms, codec="h264"))


def test_resize_rewrites_meta_and_applies_kernel(spark):
    # kernels are defined IN the test: module-level test functions pickle
    # by reference and Spark workers cannot import test modules
    def fake_resize(payload: bytes, w: int, h: int) -> bytes:
        return bytes([w % 256, h % 256]) + payload[:4]

    df = _media(spark, [_img("a", b"imagebytes"), _img("b", b"other", 100, 50)])
    out = {r["content_id"]: r for r in
           resize_images(df, 32, 24, resize=fake_resize).collect()}
    for r in out.values():
        assert (r["meta"]["width"], r["meta"]["height"]) == (32, 24)  # rewritten
        assert r["meta"]["codec"] == "png"  # untouched fields carry through
    assert bytes(out["a"]["payload"]) == bytes([32, 24]) + b"imag"


def test_resize_without_kernel_raises(spark):
    df = _media(spark, [_img("a", b"x")])
    with pytest.raises(Exception, match="NotImplementedError|inject"):
        resize_images(df, 8, 8).collect()


def test_frame_sampling_counts_and_cap(spark):
    def fake_frame(payload: bytes, ms: int) -> bytes:
        return ms.to_bytes(4, "big") + payload[:2]

    df = _media(spark, [
        _vid("short", b"v1", duration_ms=2500),    # 0,1000,2000 → 3 frames
        _vid("long", b"v2", duration_ms=3_600_000),  # capped at max_frames
        _vid("zero", b"v3", duration_ms=0),        # still 1 frame at t=0
    ])
    out = sample_frames(df, every_ms=1000, max_frames=8, extract=fake_frame)
    counts = {r["content_id"]: r["n"] for r in
              out.groupBy("content_id").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"short": 3, "long": 8, "zero": 1}
    first = out.filter("content_id = 'short' AND frame_idx = 1").first()
    assert first["frame_ms"] == 1000
    assert bytes(first["frame"]) == (1000).to_bytes(4, "big") + b"v1"


def test_resize_default_kernel_runs_end_to_end_on_ppm(spark):
    # r04 VERDICT #9: the default kernel must run with NO injected code —
    # PIL when importable, else the pure-numpy binary-PPM path. The
    # fixture is a 4x2 P6 image with distinct pixel values; nearest-
    # neighbor downscale to 2x1 must pick rows/cols deterministically.
    import numpy as np

    from citibike_analysis_spark.operators.multimodal import (
        ppm_decode,
        ppm_encode,
    )

    pix = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    payload = ppm_encode(pix)
    # codec round-trip sanity
    back, w, h = ppm_decode(payload)
    assert (w, h) == (4, 2) and (back == pix).all()

    df = _media(spark, [_img("a", payload, w=4, h=2)])
    out = resize_images(df, 2, 1).collect()[0]
    assert (out["meta"]["width"], out["meta"]["height"]) == (2, 1)
    rp, rw, rh = ppm_decode(bytes(out["payload"]))
    assert (rw, rh) == (2, 1)
    # nearest-neighbor with integer map: rows [0], cols [0, 2]
    assert (rp == pix[[0]][:, [0, 2]]).all()


def test_ppm_decoder_rejects_non_ppm_and_parses_comments(spark):
    import numpy as np
    import pytest as _pytest

    from citibike_analysis_spark.operators.multimodal import ppm_decode

    with _pytest.raises(ValueError, match="P6"):
        ppm_decode(b"JFIF....")
    # comment lines between header fields are legal PPM
    pix = np.zeros((1, 2, 3), dtype=np.uint8)
    payload = b"P6\n# a comment\n2 1\n255\n" + pix.tobytes()
    back, w, h = ppm_decode(payload)
    assert (w, h) == (2, 1) and (back == pix).all()
