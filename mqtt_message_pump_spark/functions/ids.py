"""Message-ID enrichment.

Reference: every record gets a random base-36 uppercase id of configurable
length >= 8 (``data_processor.go:24-32``, applied at ``data_processor.go:77``).

Spark-first: the default id is derived JVM-side from ``uuid()`` -- no Python
round trip, fully codegen'd, unique across executors at any scale.  Because
a random id cannot be oracle-checked, ``deterministic=True`` derives the id
from a hash of the row content instead (same base-36 uppercase shape), which
tests and replays can rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _base36(hex_col: Column, length: int) -> Column:
    # 12 hex chars = 48 bits fits conv()'s 64-bit domain; chain segments
    # until we have enough base-36 characters, then crop.
    segments = [
        F.conv(F.substring(hex_col, 1 + 12 * i, 12), 16, 36)
        for i in range((length // 9) + 2)
    ]
    return F.upper(F.substring(F.concat(*segments), 1, length))


def message_id(length: int = 8, deterministic_from: list[str] | None = None) -> Column:
    """A base-36 uppercase id column of ``length`` chars (min 8, like the
    reference's clamp in ``data_processor.go:24-27``)."""
    length = max(8, length)
    if deterministic_from:
        seed = F.sha2(F.to_json(F.struct(*[F.col(c) for c in deterministic_from])), 256)
    else:
        seed = F.sha2(F.expr("uuid()"), 256)
    return _base36(seed, length)


def with_message_id(
    df: DataFrame,
    col: str = "mid",
    length: int = 8,
    deterministic_from: list[str] | None = None,
) -> DataFrame:
    return df.withColumn(col, message_id(length, deterministic_from))
