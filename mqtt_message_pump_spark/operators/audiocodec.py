"""Minimal real audio codec for the multimodal audio seam.

Companion to ``operators.imagecodec``: makes the audio side of the
``fake=False`` decode path executable in a bare container using only the
stdlib ``wave`` module (RIFF/WAVE, PCM16) -- the bootstrap format every
audio toolchain can emit.  Production swaps ``decode_wav`` for
soundfile/ffmpeg via the same signature; the Spark-side plumbing
(``multimodal.decode_audio_samples`` -> JVM frame aggregation) is
identical either way.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def sniff_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono PCM16 samples -> WAV container bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (mono int16 sample array, sample rate).  Multi-channel
    input is downmixed by taking channel 0 (deterministic, codec-agnostic).
    Raises ``ValueError`` on non-WAV or non-PCM16 payloads."""
    if not sniff_wav(bytes(data)):
        raise ValueError("not a RIFF/WAVE payload")
    try:
        with wave.open(io.BytesIO(bytes(data)), "rb") as w:
            nch, sw, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"corrupt WAV: {e}") from e
    if sw != 2:
        raise ValueError(f"only PCM16 supported (sampwidth={sw})")
    arr = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        arr = arr.reshape(-1, nch)[:, 0]
    return arr, rate
