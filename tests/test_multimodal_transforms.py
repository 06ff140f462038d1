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
    # PIL when importable (PNG out, PIL's own resample), else the
    # pure-numpy binary-PPM path. This test must stay green in BOTH
    # environments (review finding: the original version asserted PPM
    # bytes and exact nearest-neighbor pixels, so merely installing
    # Pillow would have turned it red), so it branches on importability
    # and asserts only the per-branch contract; the deterministic pixel
    # map is pinned by test_ppm_resize_nearest_neighbor_deterministic.
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
    raw = bytes(out["payload"])
    try:
        from PIL import Image
    except ImportError:
        Image = None
    if Image is not None:
        import io

        img = Image.open(io.BytesIO(raw))
        assert img.size == (2, 1)
    else:
        rp, rw, rh = ppm_decode(raw)
        assert (rw, rh) == (2, 1)
        # nearest-neighbor with integer map: rows [0], cols [0, 2]
        assert (rp == pix[[0]][:, [0, 2]]).all()


def test_ppm_resize_nearest_neighbor_deterministic():
    # the codec-free branch, exercised directly so its exact pixel map
    # stays pinned even in environments where PIL takes the default path
    import numpy as np

    from citibike_analysis_spark.operators.multimodal import (
        ppm_decode,
        ppm_encode,
        ppm_resize,
    )

    pix = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    rp, rw, rh = ppm_decode(ppm_resize(ppm_encode(pix), 2, 1))
    assert (rw, rh) == (2, 1)
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


def test_resize_and_frames_tolerate_null_meta(spark, tmp_path):
    # review finding: to_media leaves meta NULL ("for the decode stage
    # to fill") and nothing guarantees that stage ran — None.asDict()
    # crashed the documented ingest -> transform pipeline on its first
    # row in both resize_images and sample_frames
    import numpy as np

    from citibike_analysis_spark.operators.multimodal import (
        ppm_decode,
        ppm_encode,
        sample_frames,
    )
    from citibike_analysis_spark.sources.media import (
        read_binary_files,
        to_media,
    )

    pix = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    (tmp_path / "img.ppm").write_bytes(ppm_encode(pix))
    media = to_media(read_binary_files(spark, str(tmp_path)))
    assert media.select("meta").first()["meta"] is None  # the precondition

    out = resize_images(media, 2, 1).collect()
    assert len(out) == 1
    assert (out[0]["meta"]["width"], out[0]["meta"]["height"]) == (2, 1)
    _, rw, rh = ppm_decode(bytes(out[0]["payload"]))
    assert (rw, rh) == (2, 1)

    # null meta → duration 0 → exactly one frame at t=0
    frames = sample_frames(
        media, extract=lambda payload, ms: payload[:4]
    ).collect()
    assert len(frames) == 1 and frames[0]["frame_ms"] == 0
