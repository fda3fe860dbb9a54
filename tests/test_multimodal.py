"""Multimodal plumbing: schema, Arrow batch shape, deterministic features."""

from __future__ import annotations

import pytest

from cfht2caom2_spark.multimodal import (FEATURE_DIM, MEDIA_SCHEMA,
                                         _fake_features, extract_features,
                                         frame_sample_plan)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes 1", ("image/png", 64, 48, None)),
        (2, "image", b"\x89PNG fake bytes 2", ("image/png", 32, 32, None)),
        (3, "video", b"\x00\x00ftyp fake", ("video/mp4", 640, 480, 3500)),
        (4, "audio", None, ("audio/wav", None, None, 2000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_shape_and_determinism(media, spark):
    out = extract_features(media).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id[1]["feature"]) == FEATURE_DIM
    assert by_id[4]["feature"] is None and by_id[4]["payload_sha256"] is None
    # deterministic across runs
    out2 = extract_features(media).collect()
    assert {r["media_id"]: r["feature"] for r in out2} == \
           {r["media_id"]: r["feature"] for r in out}
    # and matches the pure kernel
    import numpy as np
    assert np.allclose(by_id[1]["feature"],
                       _fake_features(b"\x89PNG fake bytes 1"))


def test_real_backend_is_clearly_stubbed(media):
    import pandas as pd

    from cfht2caom2_spark.multimodal import _decode_real
    with pytest.raises(NotImplementedError):
        _decode_real(b"x", "image")


def test_resize_images(media):
    import numpy as np

    from cfht2caom2_spark.multimodal import (_bilinear_resize, _fake_pixels,
                                             resize_images)

    out = {r["media_id"]: r for r in resize_images(media, 16, 12).collect()}
    # images resized: payload is the 12x16 raw grid, meta updated
    assert len(out[1]["payload"]) == 16 * 12
    assert (out[1]["meta"]["width"], out[1]["meta"]["height"]) == (16, 12)
    # matches the pure kernel byte-for-byte
    want = _bilinear_resize(_fake_pixels(b"\x89PNG fake bytes 1", 64, 48), 16, 12)
    assert bytes(out[1]["payload"]) == want.tobytes()
    # non-image / empty rows pass through untouched
    assert bytes(out[3]["payload"]) == b"\x00\x00ftyp fake"
    assert out[4]["payload"] is None
    # identity resize reproduces the source grid exactly (align-corners)
    src = _fake_pixels(b"abc", 8, 6)
    assert np.array_equal(_bilinear_resize(src, 8, 6), src)


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # 3500 ms video sampled at 1000 ms -> ts 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]
