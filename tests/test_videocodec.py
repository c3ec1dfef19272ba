"""Real video-container codec (pure-python GIF/LZW) + the video
``fake=False`` seam."""

from __future__ import annotations

import numpy as np
import pytest

from mqtt_message_pump_spark.operators.videocodec import (
    decode_gif_frames,
    encode_gif,
    sniff_gif,
)


def _frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w), np.uint8) for _ in range(n)]


def test_gif_multiframe_roundtrip():
    frames = _frames(4, 6, 9)
    gif = encode_gif(frames)
    assert sniff_gif(gif)
    dec = decode_gif_frames(gif)
    assert len(dec) == 4
    for d, f in zip(dec, frames):
        assert d.shape == (6, 9, 3)
        # gray palette: index == value on every channel
        assert np.array_equal(d[:, :, 0], f)
        assert np.array_equal(d[:, :, 0], d[:, :, 2])


def test_gif_large_frame_exercises_clear_resets_and_subblocks():
    """A frame big enough that the LZW stream spans many 255-byte
    sub-blocks and multiple clear-code resets still round-trips."""
    [frame] = _frames(1, 64, 64, seed=5)
    assert np.array_equal(
        decode_gif_frames(encode_gif([frame]))[0][:, :, 0], frame
    )


def test_gif_decoder_handles_real_lzw_table_growth():
    """The decoder must decode streams whose LZW table actually GROWS
    (our encoder never grows it) -- a constant-color frame compressed by
    a table-building encoder is simulated by hand-packing repeated
    sequences; simplest equivalent check: decode our stream after
    stripping no clears is covered, so here assert the KwKwK-capable
    path via a crafted two-symbol stream."""
    from mqtt_message_pump_spark.operators.videocodec import _unpack_lzw

    # min_code=2: clear=4, eoi=5, width starts at 3.
    # stream: CLEAR, 1, 1 -> table grows with b'\x11' (KwKwK on code 6)
    codes = [4, 1, 6, 5]
    acc = n = 0
    out = bytearray()
    width = 3
    for c in codes:
        acc |= c << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    assert _unpack_lzw(bytes(out), 2) == [1, 1, 1]


def test_gif_errors():
    for junk in (b"", b"notagif", b"GIF89a\x00"):
        with pytest.raises(ValueError):
            decode_gif_frames(junk)
    frames = _frames(1, 2, 2)
    with pytest.raises(ValueError):
        encode_gif([])
    with pytest.raises(ValueError):
        encode_gif([frames[0], np.zeros((3, 3), np.uint8)])


def test_decode_video_frames_real_vs_fake(spark):
    """fake=False parses REAL multi-frame GIFs through the same
    mapInPandas kernel; packing byte chunks as gray frames makes
    real == fake pixel streams, and corrupt rows vanish."""
    from mqtt_message_pump_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_video_frames,
    )

    w, h = 8, 2
    payloads = {3: bytes(range(40)), 4: b"abcdefgh" * 5}

    def to_frames(raw):
        pad = (-len(raw)) % (w * h)
        return list(
            np.frombuffer(raw + b"\x00" * pad, np.uint8).reshape(-1, h, w)
        )

    rows_fake = [
        (mid, bytearray(raw), ("video", "raw", 0, 0, 0, len(raw)))
        for mid, raw in payloads.items()
    ]
    rows_real = [
        (
            mid,
            bytearray(encode_gif(to_frames(raw))),
            ("video", "gif", 0, 0, 0, 0),
        )
        for mid, raw in payloads.items()
    ] + [(5, bytearray(b"GIF89a-corrupt"), ("video", "gif", 0, 0, 0, 14))]

    fake = decode_video_frames(
        spark.createDataFrame(rows_fake, MEDIA_SCHEMA), width=w, height=h
    ).collect()
    real = decode_video_frames(
        spark.createDataFrame(rows_real, MEDIA_SCHEMA),
        width=w,
        height=h,
        fake=False,
    ).collect()
    key = lambda rs: sorted((r.media_id, r.frame, r.pos, r.px) for r in rs)
    assert key(fake) == key(real)
    assert not any(r.media_id == 5 for r in real)
    # frame indexing: payload 3 has 40 bytes -> ceil(40/16) = 3 frames
    assert max(r.frame for r in real if r.media_id == 3) == 2


def test_video_roundtrip_plan_is_scale_shaped(spark, sf_dir):
    """One hash exchange (the frame aggregate), partial below it."""
    from mqtt_message_pump_spark.plans import QUERIES

    plan = (
        QUERIES["q_video_codec_roundtrip"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1
    assert plan.index("HashAggregate") < plan.index("Exchange")
    assert plan.count("MapInPandas") == 2
