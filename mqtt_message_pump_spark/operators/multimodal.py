"""Multimodal column support: images/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas functions.

Design (the part that must be right at 100 TB):

- The storage schema keeps media as ``binary`` plus a metadata struct
  (modality, format, width/height/duration, byte length).  Parquet stores
  binaries row-group-compressed; metadata predicates (modality = 'image',
  width >= 64) push down WITHOUT touching the bytes because Parquet column
  pruning skips the binary column entirely for metadata-only queries.
- Decode / resize / frame-sample run as ``mapInPandas`` stages: Arrow
  moves the binary batches to Python zero-copy; each batch is a pandas
  DataFrame so vectorized libs (PIL/opencv/ffmpeg) work batch-at-a-time.
- Every kernel has TWO codec paths: ``fake=True`` (the registered
  default) uses deterministic byte conventions so each seam carries an
  exact DuckDB oracle; ``fake=False`` runs REAL codecs -- PIL-first
  image decode with a pure-python PNG/BMP fallback
  (``operators.imagecodec``), stdlib WAV (``operators.audiocodec``),
  and full GIF/LZW for multi-frame video (``operators.videocodec``) --
  with per-row corrupt-input isolation instead of task failure.  The
  ``q_*_codec_roundtrip`` keys value-check the real paths end to end.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_METADATA),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decoded_ok", T.BooleanType()),
    ]
)


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payload = compressed
    pseudo-pixels) for exercising the plumbing without codec libraries."""
    rows = []
    for i in range(n):
        raw = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8
        content = zlib.compress(raw)
        modality = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                bytearray(content),
                (modality, "fake", 32 + i % 8, 32, 1000 * (i % 5), len(content)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(content: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decode->embed: feature[j] is the
    sum of the payload bytes at positions p with p % FEATURE_DIM == j
    (a striped byte histogram).  Replace with PIL/torchvision in
    production.

    Deliberately plain integer arithmetic rather than a seeded RNG: the
    stripe sums are expressible in ANSI SQL over the same bytes, so the
    registered decode query carries a full DuckDB oracle -- the seam's
    output is value-checked end to end, not just row-counted.  The sums
    stay exact in float32 for payloads up to ~128 KiB (255 * len / 16 <
    2^24); larger payloads belong to a real codec anyway."""
    arr = np.frombuffer(content, dtype=np.uint8)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    return (
        arr.reshape(-1, FEATURE_DIM).sum(axis=0, dtype=np.int64)
        .astype(np.float32)
    )


def decode_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Binary -> feature vector via ``mapInPandas`` (Arrow batches).

    ``fake=True`` (the registered default): deterministic stripe-sum over
    the RAW payload bytes -- fully DuckDB-oracle-able.  ``fake=False``:
    REAL decode through ``operators.imagecodec`` (PIL when installed,
    else the pure-python PNG/BMP decoder), then the same stripe-sum over
    the DECODED pixel bytes; rows whose bytes don't decode get a zero
    feature with ``decoded_ok=False`` instead of failing the Arrow batch
    task (corrupt-row isolation, same policy as the sink path B4).
    Batch shape: the iterator yields one pandas DataFrame per Arrow
    batch, so per-batch library setup is amortized.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from mqtt_message_pump_spark.operators.imagecodec import (
                decode_image,
            )
        for batch in batches:
            feats, oks = [], []
            for b in batch["content"]:
                raw = b"" if b is None else bytes(b)
                if fake:
                    feats.append(_fake_feature(raw))
                    oks.append(True)
                    continue
                try:
                    pixels = decode_image(raw)
                    feats.append(_fake_feature(pixels.tobytes()))
                    oks.append(True)
                except (ValueError, zlib.error, struct.error, IndexError, KeyError):
                    feats.append(np.zeros(FEATURE_DIM, dtype=np.float32))
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "feature": [f.tolist() for f in feats],
                    "decoded_ok": oks,
                }
            )

    return df.select("media_id", "content").mapInPandas(decode, DECODED_SCHEMA)


AUDIO_SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("pos", T.LongType()),
        T.StructField("sample", T.LongType()),
    ]
)


def decode_audio_samples(df: DataFrame, fake: bool = True) -> DataFrame:
    """Binary -> one row per PCM sample via ``mapInPandas``: the audio
    decode seam feeding the JVM-side frame aggregation (windowed energy,
    VAD, loudness -- see ``plans.multimodal.q_audio_energy``).

    ``fake=True``: each payload byte read as an unsigned 8-bit sample
    (the oracle-able convention).  ``fake=False``: REAL WAV parsing via
    ``operators.audiocodec`` (stdlib ``wave``; production swaps in
    soundfile/ffmpeg through the same gate); undecodable payloads emit
    no samples instead of failing the batch task.

    Scale shape: map-only Arrow expansion (numpy concatenation per
    batch, no per-sample python loop); everything downstream of the
    samples -- framing, sums -- stays JVM-side, so the aggregate
    partial-combines map-side and the shuffle carries frames, not
    samples."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from mqtt_message_pump_spark.operators.audiocodec import (
                decode_wav,
            )
        for batch in batches:
            mids, poss, vals = [], [], []
            for mid, b in zip(batch["media_id"], batch["content"]):
                raw = b"" if b is None else bytes(b)
                if fake:
                    samples = np.frombuffer(raw, dtype=np.uint8)
                else:
                    try:
                        samples, _rate = decode_wav(raw)
                    except ValueError:
                        continue  # corrupt-row isolation, B4 policy
                n = len(samples)
                mids.append(np.full(n, mid, dtype=np.int64))
                poss.append(np.arange(n, dtype=np.int64))
                vals.append(samples.astype(np.int64))
            if not mids:
                continue
            yield pd.DataFrame(
                {
                    "media_id": np.concatenate(mids),
                    "pos": np.concatenate(poss),
                    "sample": np.concatenate(vals),
                }
            )

    return df.select("media_id", "content").mapInPandas(
        decode, AUDIO_SAMPLES_SCHEMA
    )


VIDEO_PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame", T.IntegerType()),
        T.StructField("pos", T.LongType()),
        T.StructField("px", T.LongType()),
    ]
)


def decode_video_frames(
    df: DataFrame, width: int = 32, height: int = 4, fake: bool = True
) -> DataFrame:
    """Binary -> one row per (frame, pixel) via ``mapInPandas``: the
    video decode seam feeding JVM-side per-frame aggregation (the
    video twin of :func:`decode_audio_samples`).

    ``fake=True``: payload bytes chunked into width*height frames (the
    oracle-able convention, zero-padded tail).  ``fake=False``: REAL
    container parsing via ``operators.videocodec`` (pure-python GIF/LZW;
    PyAV/ffmpeg swap in through the same gate) -- one output frame per
    image block, channel-0 pixel values; undecodable payloads emit
    nothing (corrupt-row isolation)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from mqtt_message_pump_spark.operators.videocodec import (
                decode_gif_frames,
            )
        per_frame = width * height
        for batch in batches:
            mids, fids, poss, vals = [], [], [], []
            for mid, b in zip(batch["media_id"], batch["content"]):
                raw = b"" if b is None else bytes(b)
                if fake:
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    pad = (-len(arr)) % per_frame
                    if pad:
                        arr = np.concatenate(
                            [arr, np.zeros(pad, dtype=np.uint8)]
                        )
                    frames = arr.reshape(-1, per_frame)
                else:
                    try:
                        frames = np.stack(
                            [
                                f[:, :, 0].reshape(-1)
                                for f in decode_gif_frames(raw)
                            ]
                        )
                    except (ValueError, struct.error, IndexError):
                        continue  # corrupt-row isolation, B4 policy
                n_f, n_px = frames.shape
                mids.append(np.full(n_f * n_px, mid, dtype=np.int64))
                fids.append(
                    np.repeat(np.arange(n_f, dtype=np.int32), n_px)
                )
                poss.append(np.tile(np.arange(n_px, dtype=np.int64), n_f))
                vals.append(frames.reshape(-1).astype(np.int64))
            if not mids:
                continue
            yield pd.DataFrame(
                {
                    "media_id": np.concatenate(mids),
                    "frame": np.concatenate(fids),
                    "pos": np.concatenate(poss),
                    "px": np.concatenate(vals),
                }
            )

    return df.select("media_id", "content").mapInPandas(
        decode, VIDEO_PIXELS_SCHEMA
    )


def metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation: modality histogram + byte totals.  Never
    reads the binary column (verify with .explain: ReadSchema excludes
    ``content``)."""
    return (
        df.groupBy(F.col("meta.modality").alias("modality"))
        .agg(
            F.count("*").alias("n"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.avg("meta.width").alias("avg_width"),
        )
    )


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: expand each video row into frame
    timestamps (sequence + explode -- JVM-side), to be decoded per-frame
    downstream.  Decode itself is the stubbed mapInPandas stage."""
    videos = df.filter(F.col("meta.modality") == "video")
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return videos.select(
        "media_id",
        F.explode(ts).alias("frame_ms"),
        "content",
    )

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame, width: int = 16, height: int = 16, fake: bool = True
) -> DataFrame:
    """Image resize via ``mapInPandas`` (Arrow batches): the standard
    pre-training normalization step (decode -> resample to a fixed
    resolution -> re-encode).  Only image rows are selected, and only the
    columns the resampler needs are shipped through Arrow -- metadata
    stays JVM-side.

    With ``fake=True`` (the registered default) the "resample" is a
    deterministic byte resample (nearest-neighbor over the payload,
    giving exactly width*height output bytes) so the plumbing -- schema,
    batch iteration, column pruning, output sizing -- is real and
    testable without PIL/opencv, and the output is DuckDB-oracle-able.
    ``fake=False`` is the REAL path: decode via ``operators.imagecodec``
    (PIL when installed, else pure-python PNG/BMP), nearest-neighbor
    resample the pixel grid, re-encode as PNG; undecodable rows emit a
    black PNG of the contracted size rather than failing the batch task.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from mqtt_message_pump_spark.operators.imagecodec import (
                decode_image,
                encode_png,
                nearest_resize,
            )
        for batch in batches:
            out = []
            n_out = width * height
            for b in batch["content"]:
                raw = b"" if b is None else bytes(b)
                if not fake:
                    try:
                        pixels = decode_image(raw)
                        out.append(
                            encode_png(nearest_resize(pixels, width, height))
                        )
                    except (ValueError, zlib.error, struct.error, IndexError, KeyError):
                        black = np.zeros((height, width, 3), dtype=np.uint8)
                        out.append(encode_png(black))
                    continue
                if not raw:
                    # NULL or zero-length payload: nothing to sample from --
                    # emit a zero frame of the contracted size rather than
                    # letting one corrupt row fail the whole Arrow batch task
                    out.append(b"\x00" * n_out)
                    continue
                # nearest-neighbor byte resample: index i of the output
                # maps to byte floor(i * len/n_out) of the input
                step = len(raw) / n_out
                out.append(bytes(raw[int(i * step)] for i in range(n_out)))
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "content": out,
                    "width": width,
                    "height": height,
                }
            )

    images = df.filter(F.col("meta.modality") == "image")
    return images.select("media_id", "content").mapInPandas(
        resize, RESIZED_SCHEMA
    )
