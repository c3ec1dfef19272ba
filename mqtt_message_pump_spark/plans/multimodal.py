"""Registered queries for the multimodal-column surface (SURVEY.md SS2.8).

The driver fixtures carry no binary columns, so a deterministic media table
is derived from ``documents``: content = UTF-8 bytes of the text, typed
metadata (modality / width / duration) from doc_id arithmetic.  Both
engines derive it identically, so the oracles stay exact.  The operators
under test are the real ones from ``operators.multimodal`` -- the scale
property they demonstrate:

- metadata-only queries never touch the binary column (parquet column
  pruning; verify ReadSchema in .explain);
- frame sampling is JVM-side sequence+explode, one row per sampled frame,
  decode deferred downstream;
- decode itself is the Arrow-batched ``mapInPandas`` seam (stubbed feature
  extractor -- the codec libraries are not in this container), registered
  rows-only because a Python UDF pipeline is not SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt_message_pump_spark.operators import multimodal as MM
from mqtt_message_pump_spark.plans.registry import query, table

_MODALITIES = ("image", "audio", "video")


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> media table with the MEDIA_SCHEMA shape: binary
    content + typed metadata struct, all derived deterministically."""
    docs = table(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in _MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            modality.alias("modality"),
            F.lit("fake").alias("format"),
            (F.lit(32) + F.col("doc_id") % 8).cast("int").alias("width"),
            F.lit(32).cast("int").alias("height"),
            (F.lit(1000) * (F.col("doc_id") % 5)).cast("int").alias("duration_ms"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


_SQL_MODALITY = "['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]"


@query(
    "q_media_meta",
    oracle=f"""
    SELECT {_SQL_MODALITY} AS modality,
           COUNT(*) AS n,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
           SUM(32 + doc_id % 8) / COUNT(*) AS avg_width
    FROM documents
    GROUP BY 1
    """,
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media aggregation (modality histogram, byte totals):
    the plan prunes the binary column entirely -- ReadSchema is doc_id +
    text-length metadata, never the payload bytes."""
    return MM.metadata_stats(media_from_documents(spark, sf_dir))


@query(
    "q_frame_sample",
    oracle="""
    SELECT doc_id AS media_id, f.frame_ms
    FROM documents,
         LATERAL (SELECT unnest(generate_series(
             0, greatest(1000 * (doc_id % 5) - 1, 0), 500)) AS frame_ms) f
    WHERE doc_id % 3 = 2
    """,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one output row per (video, sampled timestamp),
    sequence+explode JVM-side; the binary column rides along for the
    downstream decode stage (dropped here so the oracle stays exact)."""
    media = media_from_documents(spark, sf_dir)
    return MM.frame_sample(media, every_ms=500).select("media_id", "frame_ms")


_DIM = MM.FEATURE_DIM


@query(
    "q_media_decode",
    oracle=f"""
    WITH dims AS (SELECT CAST(unnest(range(0, {_DIM})) AS INT) AS dim),
    chars AS (
      SELECT doc_id, cs, unnest(range(1, len(cs) + 1)) AS i
      FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents)
    ),
    stripes AS (
      SELECT doc_id, CAST((i - 1) % {_DIM} AS INT) AS dim,
             CAST(SUM(ascii(cs[i])) AS BIGINT) AS val
      FROM chars GROUP BY doc_id, (i - 1) % {_DIM}
    )
    SELECT d.doc_id AS media_id, dims.dim AS dim,
           COALESCE(s.val, CAST(0 AS BIGINT)) AS val,
           TRUE AS decoded_ok
    FROM documents d CROSS JOIN dims
    LEFT JOIN stripes s ON s.doc_id = d.doc_id AND s.dim = dims.dim
    """,
)
def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode seam: binary -> fixed-dim feature vector via
    ``mapInPandas`` (deterministic fake decoder standing in for
    PIL/opencv/ffmpeg; see ``operators.multimodal.decode_media`` for the
    import-gated real-codec path).

    The raw-vector API is ``operators.multimodal.decode_features``
    (media_id, feature array<float>, decoded_ok); the REGISTERED output
    is the long form (media_id, dim, val, decoded_ok) -- one row per
    feature component, exact integers -- because (a) the driver
    canonicalizes results through pandas, which cannot sort array cells,
    and (b) the fake decoder's stripe sums are plain byte arithmetic, so
    the long form carries a full DuckDB oracle over the same text bytes:
    every float bit of the seam's output is value-checked cross-engine,
    not just row-counted."""
    media = media_from_documents(spark, sf_dir)
    feats = MM.decode_features(media, fake=True)
    return feats.select(
        "media_id", "decoded_ok", F.posexplode("feature").alias("dim", "v")
    ).select(
        "media_id",
        F.col("dim").cast("int").alias("dim"),
        F.col("v").cast("bigint").alias("val"),
        "decoded_ok",
    )


@query(
    "q_media_resize",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN len(text) = 0
                -- operator contract for empty/NULL payloads: a zero
                -- frame of the contracted size (md5 of 256 NUL bytes)
                THEN '348a9791dc41b89796ec3808b5b5262f'
                ELSE md5(string_agg(
                    text[CAST(FLOOR(i * (len(text) / 256.0)) AS INT) + 1],
                    '' ORDER BY i))
           END AS content_md5,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height
    FROM (SELECT doc_id, text, unnest(range(0, 256)) AS i
          FROM documents WHERE doc_id % 3 = 0)
    GROUP BY doc_id, text
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize seam: image rows -> fixed-resolution payloads via
    Arrow-batched ``mapInPandas`` (deterministic nearest-neighbor byte
    resample standing in for PIL/opencv).  The operator returns the
    resized binary itself (exactly width*height bytes per row -- asserted
    in tests); the REGISTERED output digests it to
    (media_id, content_md5, width, height) so the key carries a DuckDB
    oracle: the fixture payload is the UTF-8 bytes of ASCII text, so the
    oracle rebuilds the identical nearest-neighbor resample with string
    indexing (out[i] = byte floor(i * len/256) -- the same one-rounding
    IEEE double expression both engines evaluate identically) and md5s
    the same bytes."""
    media = media_from_documents(spark, sf_dir)
    resized = MM.resize_images(media, width=16, height=16, fake=True)
    return resized.select(
        "media_id",
        F.md5("content").alias("content_md5"),
        "width",
        "height",
    )


@query(
    "q_media_codec_roundtrip",
    oracle=f"""
    WITH dims AS (SELECT CAST(unnest(range(0, {_DIM})) AS INT) AS dim),
    chars AS (
      SELECT doc_id, cs, unnest(range(1, len(cs) + 1)) AS i
      FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents)
    ),
    stripes AS (
      SELECT doc_id, CAST((i - 1) % {_DIM} AS INT) AS dim,
             CAST(SUM(ascii(cs[i])) AS BIGINT) AS val
      FROM chars GROUP BY doc_id, (i - 1) % {_DIM}
    )
    SELECT d.doc_id AS media_id, dims.dim AS dim,
           COALESCE(s.val, CAST(0 AS BIGINT)) AS val,
           TRUE AS decoded_ok
    FROM documents d CROSS JOIN dims
    LEFT JOIN stripes s ON s.doc_id = d.doc_id AND s.dim = dims.dim
    """,
)
def q_media_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL codec path, oracle-checked end to end: each document's
    UTF-8 bytes are wrapped into an actual grayscale PNG on the
    executors (``imagecodec.encode_png``), then decoded back through
    ``decode_features(fake=False)`` -- the production seam with the
    pure-python PNG decoder (PIL-first when installed) doing a full
    parse: signature, chunk walk, zlib inflate, scanline unfilter.

    The decoded pixel bytes ARE the original text bytes (plus row
    padding of zeros, which add nothing to any stripe sum), so the
    stripe-sum feature equals ``q_media_decode``'s over the same text --
    giving the real-codec path an EXACT DuckDB value oracle instead of
    a rows-only check.  Scale shape: two chained map-only Arrow stages,
    no shuffle at all; codec cost is per-row python, the price of a
    correctness-reference codec (production swaps in PIL via the same
    import gate)."""
    import numpy as np
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def to_png(batches):
        from mqtt_message_pump_spark.operators.imagecodec import encode_png

        width = 32
        for pdf in batches:
            content = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                pad = (-len(raw)) % width
                arr = np.frombuffer(raw + b"\x00" * pad, np.uint8).reshape(
                    -1, width, 1
                )
                content.append(encode_png(arr))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": content}
            )

    media = docs.mapInPandas(to_png, "media_id long, content binary")
    feats = MM.decode_features(media, fake=False)
    return feats.select(
        "media_id", "decoded_ok", F.posexplode("feature").alias("dim", "v")
    ).select(
        "media_id",
        F.col("dim").cast("int").alias("dim"),
        F.col("v").cast("bigint").alias("val"),
        "decoded_ok",
    )


_FRAME = 50  # samples per analysis frame


@query(
    "q_audio_energy",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id, cs, unnest(range(1, len(cs) + 1)) AS i
      FROM (SELECT doc_id, string_split(text, '') AS cs
            FROM documents WHERE doc_id % 3 = 1)
    )
    SELECT doc_id AS media_id,
           CAST((i - 1) // {_FRAME} AS BIGINT) AS frame,
           CAST(SUM(CAST(ascii(cs[i]) * ascii(cs[i]) AS BIGINT))
                AS BIGINT) AS energy,
           COUNT(*) AS n_samples
    FROM chars
    GROUP BY doc_id, (i - 1) // {_FRAME}
    """,
)
def q_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy over the byte stream: the first real audio
    feature every pipeline extracts (silence trimming, VAD gating,
    loudness normalization).  The deterministic fake-PCM convention reads
    each payload byte as an unsigned 8-bit sample (_FRAME=50-sample
    non-overlapping frames); a production build swaps the byte decode for
    a real codec behind the q_media_decode seam and keeps this exact
    frame/aggregate plumbing.

    Scale shape: explode -> (media, frame) aggregate partial-combines
    map-side, so the shuffle carries one row per frame, bounded by media
    duration, never corpus size.  Energy is an integer sum of squares --
    exact, order-independent, hash-stable cross-engine (an RMS consumer
    applies sqrt downstream; libm sqrt would differ in the last ulp)."""
    audio = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1
    )
    samples = audio.select(
        F.col("doc_id").alias("media_id"),
        F.posexplode(F.split(F.col("text"), "")).alias("pos", "ch"),
    ).select(
        "media_id",
        F.floor(F.col("pos") / _FRAME).cast("bigint").alias("frame"),
        F.ascii("ch").cast("bigint").alias("code"),
    )
    return samples.groupBy("media_id", "frame").agg(
        F.sum(F.col("code") * F.col("code")).alias("energy"),
        F.count("*").alias("n_samples"),
    )


@query(
    "q_audio_codec_roundtrip",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id, cs, unnest(range(1, len(cs) + 1)) AS i
      FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents)
    )
    SELECT doc_id AS media_id,
           CAST((i - 1) // {_FRAME} AS BIGINT) AS frame,
           CAST(SUM(CAST(ascii(cs[i]) * ascii(cs[i]) AS BIGINT))
                AS BIGINT) AS energy,
           COUNT(*) AS n_samples
    FROM chars
    GROUP BY doc_id, (i - 1) // {_FRAME}
    """,
)
def q_audio_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL audio codec path, oracle-checked end to end (audio twin
    of ``q_media_codec_roundtrip``): executors pack each document's
    bytes as PCM16 samples into an actual WAV container
    (``audiocodec.encode_wav``), ``decode_audio_samples(fake=False)``
    parses it back through a full RIFF/WAVE decode, and the SAME JVM
    frame aggregation as ``q_audio_energy`` computes windowed energy --
    proving the promised seam swap (real codec in, frame/aggregate
    plumbing unchanged).  Decoded samples equal the original byte
    values, so the integer energy oracle is exact.  Scale shape: two
    map-only Arrow stages then one (media, frame)-keyed aggregate with
    map-side combine; the shuffle carries frames, never samples."""
    import numpy as np
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def to_wav(batches):
        from mqtt_message_pump_spark.operators.audiocodec import encode_wav

        for pdf in batches:
            content = [
                encode_wav(
                    np.frombuffer(t.encode("utf-8"), np.uint8).astype(
                        np.int16
                    )
                )
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": content}
            )

    media = docs.mapInPandas(to_wav, "media_id long, content binary")
    samples = MM.decode_audio_samples(media, fake=False)
    return (
        samples.select(
            "media_id",
            F.floor(F.col("pos") / _FRAME).cast("bigint").alias("frame"),
            "sample",
        )
        .groupBy("media_id", "frame")
        .agg(
            F.sum(F.col("sample") * F.col("sample")).alias("energy"),
            F.count("*").alias("n_samples"),
        )
    )


_VF_W, _VF_H = 32, 4  # video frame geometry: 128 bytes per frame


@query(
    "q_video_codec_roundtrip",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id, cs, unnest(range(1, len(cs) + 1)) AS i
      FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents)
    )
    SELECT doc_id AS media_id,
           CAST((i - 1) // {_VF_W * _VF_H} AS INT) AS frame,
           CAST(SUM(CAST(ascii(cs[i]) AS BIGINT)) AS BIGINT) AS byte_sum
    FROM chars
    GROUP BY doc_id, (i - 1) // {_VF_W * _VF_H}
    """,
)
def q_video_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL video-container path, oracle-checked end to end (video
    twin of the PNG/WAV round-trip keys): executors chunk each
    document's bytes into 32x4 grayscale frames, pack them
    into an actual multi-frame GIF (``videocodec.encode_gif`` -- real
    LZW, real sub-block framing), and ``decode_video_frames(fake=False)``
    parses every frame back through the full GIF/LZW decoder; a JVM
    (media, frame) aggregate sums the pixel values.  The gray palette
    maps index == value, so decoded pixels equal the original bytes and
    the per-frame byte-sum oracle is exact (zero padding in the tail
    frame adds nothing).  Scale shape: two map-only Arrow stages, then
    one frame-keyed aggregate with map-side combine -- the shuffle
    carries frames, never pixels."""
    import numpy as np
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    per_frame = _VF_W * _VF_H

    def to_gif(batches):
        from mqtt_message_pump_spark.operators.videocodec import encode_gif

        for pdf in batches:
            content = []
            for t in pdf["text"]:
                raw = t.encode("utf-8")
                pad = (-len(raw)) % per_frame
                arr = np.frombuffer(
                    raw + b"\x00" * pad, np.uint8
                ).reshape(-1, _VF_H, _VF_W)
                content.append(encode_gif(list(arr)))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "content": content}
            )

    media = docs.mapInPandas(to_gif, "media_id long, content binary")
    pixels = MM.decode_video_frames(
        media, width=_VF_W, height=_VF_H, fake=False
    )
    return pixels.groupBy("media_id", "frame").agg(
        F.sum("px").alias("byte_sum")
    )


@query(
    "q_media_dedup",
    oracle="""
    SELECT md5(text) AS fp,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_copies,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY fp
    """,
)
def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable binary dedup (the blob-store / CAS index): one
    row per distinct media payload, keyed by the md5 of the raw bytes,
    keeping the lowest media_id as the canonical copy and accounting the
    duplicate bytes.  The storage-level dedup step that runs before any
    perceptual/embedding near-dup pass -- at multimodal-corpus scale,
    exact payload duplicates (mirrors, reposts) are the cheapest
    petabytes to reclaim.

    Scale shape: the digest is computed per row at scan time, and the
    aggregation shuffles one (16-byte hash, constant-size partials) row
    per distinct payload with map-side combine -- the q_dedup hash-group
    pattern applied to the binary column.  The fixture media table
    derives content = UTF-8(text), so the DuckDB oracle hashes the text
    directly: identical bytes, identical digests."""
    media = media_from_documents(spark, sf_dir)
    return (
        media.select(
            F.md5(F.col("content")).alias("fp"),
            "media_id",
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("fp")
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count("*").alias("n_copies"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )
