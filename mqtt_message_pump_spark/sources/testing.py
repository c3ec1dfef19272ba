"""Broker-free streaming sources in the MQTT wire shape, for tests and CI.

The reference needs a live EMQX/beacon broker; our pipeline is source-
agnostic -- anything producing (topic, payload, received_time) plugs in.
These adapters wrap Spark's built-in rate and file streaming sources into
that shape so the full pump runs without any broker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt_message_pump_spark.streaming.pump import MESSAGE_SCHEMA


def rate_message_stream(
    spark: SparkSession, rows_per_second: int = 100, n_topics: int = 5
) -> DataFrame:
    """Synthetic message stream from the rate source: round-robin topics,
    two-record JSON payloads keyed by the rate value."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    ).load()
    payload = F.concat(
        F.lit('{"r1":{"k":'),
        F.col("value"),
        F.lit('},"r2":{"k":'),
        F.col("value") * 2,
        F.lit("}}"),
    )
    return rate.select(
        F.concat(F.lit("pump/topic"), (F.col("value") % n_topics)).alias("topic"),
        payload.alias("payload"),
        F.col("timestamp").alias("received_time"),
    )


def file_message_stream(
    spark: SparkSession, dir_path: str, max_files: int | None = None
) -> DataFrame:
    """File-drop message stream: JSON-lines files with the wire schema
    (topic, payload, received_time) -- the deterministic test source.
    ``max_files`` caps files per trigger (micro-batch granularity for
    kill/restart tests)."""
    reader = spark.readStream.schema(MESSAGE_SCHEMA)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.json(dir_path)
