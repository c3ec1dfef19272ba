"""Real audio codec (stdlib WAV) + the audio ``fake=False`` seam."""

from __future__ import annotations

import numpy as np
import pytest

from mqtt_message_pump_spark.operators.audiocodec import (
    decode_wav,
    encode_wav,
    sniff_wav,
)


def test_wav_roundtrip_mono_pcm16():
    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    data = encode_wav(samples, rate=8000)
    assert sniff_wav(data)
    got, rate = decode_wav(data)
    assert rate == 8000
    assert np.array_equal(got, samples)


def test_wav_multichannel_takes_channel0():
    import io
    import wave

    stereo = np.array([[1, -1], [2, -2], [3, -3]], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(stereo.astype("<i2").tobytes())
    got, rate = decode_wav(buf.getvalue())
    assert np.array_equal(got, np.array([1, 2, 3], dtype=np.int16))
    assert rate == 44100


def test_wav_errors():
    for junk in (b"", b"not audio", b"RIFF1234WAVEgarbage"):
        with pytest.raises(ValueError):
            decode_wav(junk)


def test_decode_audio_samples_real_vs_fake(spark):
    """fake=False parses REAL WAV containers through the same mapInPandas
    kernel; packing byte values as PCM16 makes real == fake sample
    streams, and a corrupt row vanishes instead of failing the task."""
    from mqtt_message_pump_spark.operators.multimodal import (
        decode_audio_samples,
    )

    payloads = {7: b"hello audio world", 8: b"x" * 120}
    rows_fake = [
        (mid, bytearray(raw), ("audio", "raw", 0, 0, 0, len(raw)))
        for mid, raw in payloads.items()
    ]
    rows_real = [
        (
            mid,
            bytearray(
                encode_wav(np.frombuffer(raw, np.uint8).astype(np.int16))
            ),
            ("audio", "wav", 0, 0, 0, 0),
        )
        for mid, raw in payloads.items()
    ] + [(9, bytearray(b"corrupt bytes"), ("audio", "wav", 0, 0, 0, 13))]

    from mqtt_message_pump_spark.operators.multimodal import MEDIA_SCHEMA

    fake = decode_audio_samples(
        spark.createDataFrame(rows_fake, MEDIA_SCHEMA), fake=True
    ).collect()
    real = decode_audio_samples(
        spark.createDataFrame(rows_real, MEDIA_SCHEMA), fake=False
    ).collect()
    key = lambda rs: sorted((r.media_id, r.pos, r.sample) for r in rs)
    assert key(fake) == key(real)
    assert len(fake) == sum(len(v) for v in payloads.values())
    assert not any(r.media_id == 9 for r in real)  # corrupt row isolated
