"""Real image codec + the multimodal ``fake=False`` seam.

The decode/resize ``mapInPandas`` kernels previously dead-ended in
``NotImplementedError`` without PIL; ``operators/imagecodec.py`` makes
``fake=False`` executable with a pure-stdlib PNG/BMP codec (PIL-first
when installed).  These tests run REAL image bytes through the same
Arrow kernels the fake path uses.
"""

from __future__ import annotations

import numpy as np
import pytest

from mqtt_message_pump_spark.operators.imagecodec import (
    decode_bmp,
    decode_image,
    decode_png,
    encode_bmp,
    encode_png,
    nearest_resize,
    sniff_format,
)


def _rgb(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# --------------------------------------------------------------- codec unit

def test_png_roundtrip_rgb():
    img = _rgb(7, 5)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_roundtrip_gray_and_rgba():
    gray = _rgb(4, 6)[:, :, :1]
    assert np.array_equal(decode_png(encode_png(gray)), gray)
    rgba = np.dstack([_rgb(3, 3), np.full((3, 3), 128, np.uint8)])
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_scanline_filters_decode(ftype):
    """Every PNG filter type (None/Sub/Up/Average/Paeth) unfilters back to
    the original pixels -- the encoder can emit any filter so each decode
    branch is exercised against ground truth."""
    img = _rgb(9, 4, seed=ftype)
    assert np.array_equal(decode_png(encode_png(img, filter_type=ftype)), img)


def test_png_palette_decode():
    """Hand-built color-type-3 (palette) PNG resolves indices via PLTE."""
    import struct
    import zlib

    from mqtt_message_pump_spark.operators.imagecodec import (
        PNG_SIG,
        _png_chunk,
    )

    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)  # 2x3
    scanlines = b"".join(b"\x00" + row.tobytes() for row in idx)
    png = (
        PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", palette.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), palette[idx])


def test_bmp_roundtrip_and_orientation():
    img = _rgb(5, 3, seed=9)
    data = encode_bmp(img)
    assert sniff_format(data) == "bmp"
    assert np.array_equal(decode_bmp(data), img)
    # width not a multiple of 4 exercises row padding
    img2 = _rgb(2, 5, seed=10)
    assert np.array_equal(decode_bmp(encode_bmp(img2)), img2)


def test_decode_image_dispatch_and_errors():
    img = _rgb(3, 3)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    for junk in (b"", b"JFIF not supported", b"\x89PNG\r\n\x1a\nGARBAGE"):
        with pytest.raises(ValueError):
            decode_image(junk)


def test_nearest_resize_semantics():
    img = np.arange(4 * 4 * 1, dtype=np.uint8).reshape(4, 4, 1)
    # 2x downsample picks rows/cols 0 and 2 (floor(i*src/dst))
    small = nearest_resize(img, 2, 2)
    assert np.array_equal(small[:, :, 0], img[::2, ::2, 0])
    # upsample replicates neighbors, shape contract (height, width)
    up = nearest_resize(img, 8, 6)
    assert up.shape == (6, 8, 1)


# ---------------------------------------------------- fake=False Spark seam

def _media_df(spark, imgs: dict[int, bytes], extra=()):
    """MEDIA_SCHEMA frame with real image bytes + optional corrupt rows."""
    from mqtt_message_pump_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        (mid, bytearray(data), ("image", "png", 0, 0, 0, len(data)))
        for mid, data in imgs.items()
    ]
    rows += [
        (mid, bytearray(data), ("image", "junk", 0, 0, 0, len(data)))
        for mid, data in extra
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_features_real_path(spark):
    """fake=False decodes REAL PNG/BMP bytes through the same mapInPandas
    kernel; features equal the stripe-sum over decoded pixel bytes, and a
    corrupt row isolates to decoded_ok=False instead of failing the task."""
    from mqtt_message_pump_spark.operators.multimodal import (
        _fake_feature,
        decode_features,
    )

    img0, img1 = _rgb(6, 5, seed=1), _rgb(4, 4, seed=2)
    df = _media_df(
        spark,
        {0: encode_png(img0), 1: encode_bmp(img1)},
        extra=[(2, b"not an image at all")],
    )
    out = {
        r.media_id: r
        for r in decode_features(df, fake=False).collect()
    }
    assert out[0].decoded_ok and out[1].decoded_ok
    assert not out[2].decoded_ok
    np.testing.assert_allclose(
        out[0].feature, _fake_feature(img0.tobytes()).tolist()
    )
    np.testing.assert_allclose(
        out[1].feature, _fake_feature(img1.tobytes()).tolist()
    )
    assert out[2].feature == [0.0] * 16


def test_resize_images_real_path(spark):
    """fake=False: decode -> nearest-neighbor pixel resample -> PNG
    re-encode, all inside the Arrow kernel; output decodes back to
    exactly the locally-computed resample, corrupt rows to a black frame."""
    from mqtt_message_pump_spark.operators.multimodal import resize_images

    img = _rgb(12, 10, seed=3)
    df = _media_df(
        spark, {0: encode_png(img)}, extra=[(1, b"\x00\x01corrupt")]
    )
    out = {
        r.media_id: r
        for r in resize_images(df, width=4, height=3, fake=False).collect()
    }
    assert out[0].width == 4 and out[0].height == 3
    got = decode_image(bytes(out[0].content))
    assert np.array_equal(got, nearest_resize(img, 4, 3))
    black = decode_image(bytes(out[1].content))
    assert black.shape == (3, 4, 3) and not black.any()


def test_fake_default_unchanged(spark):
    """The registered default stays fake=True (oracle-checked stripe sums
    over raw payload bytes) -- the real codec is opt-in."""
    from mqtt_message_pump_spark.operators.multimodal import (
        _fake_feature,
        decode_features,
        synth_media_df,
    )

    df = synth_media_df(spark, n=6)
    rows = decode_features(df).collect()
    assert all(r.decoded_ok for r in rows)
    payload = {r.media_id: bytes(r.content) for r in df.collect()}
    for r in rows:
        np.testing.assert_allclose(
            r.feature, _fake_feature(payload[r.media_id]).tolist()
        )


def test_codec_roundtrip_plans_are_scale_shaped(spark, sf_dir):
    """Structural plan guards for the real-codec keys: the image
    round-trip is two chained map-only Arrow stages with ZERO exchanges;
    the audio round-trip shuffles exactly once -- the (media, frame)
    aggregate -- with a map-side partial before it, so the shuffle
    carries frames, never samples."""
    from mqtt_message_pump_spark.plans import QUERIES

    img_plan = (
        QUERIES["q_media_codec_roundtrip"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in img_plan
    assert img_plan.count("MapInPandas") == 2

    audio_plan = (
        QUERIES["q_audio_codec_roundtrip"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exchanges = [
        ln for ln in audio_plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1
    # partial aggregate sits below the exchange (map-side combine)
    assert "partial_sum" in audio_plan or "HashAggregate(keys" in audio_plan
    assert audio_plan.index("HashAggregate") < audio_plan.index("Exchange")


def test_png_gray_alpha_two_channel_roundtrip():
    """Colortype-4 (gray+alpha, 2 channels) encodes and decodes -- the
    resize real path must survive LA-mode inputs instead of KeyError-ing
    the whole Arrow task."""
    la = np.dstack(
        [_rgb(4, 5, seed=11)[:, :, 0], np.full((4, 5), 200, np.uint8)]
    )
    assert np.array_equal(decode_png(encode_png(la)), la)
    from mqtt_message_pump_spark.operators.imagecodec import nearest_resize as nr

    assert decode_png(encode_png(nr(la, 3, 2))).shape == (2, 3, 2)
