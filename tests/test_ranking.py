"""Distributed global ranking (operators/ranking.py): the shuffle-parallel
row_number / NTILE must be bit-identical to Spark's serial
empty-partitionBy window on every size/bucket shape, including ragged
(n % k != 0) and degenerate (n < k) inputs.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from mqtt_message_pump_spark.operators.ranking import (
    with_global_ntile,
    with_global_row_number,
)


def _sample(spark, n: int):
    # values collide heavily (v = i % 7) so correctness depends on the
    # unique tie-break, and ids are shuffled so input order != sort order
    return spark.range(n).select(
        ((F.col("id") * 131) % n).alias("k"),
        (F.col("id") % 7).alias("v"),
    )


@pytest.mark.parametrize("n,buckets", [(1000, 4), (997, 7), (5, 9), (1, 3)])
def test_global_ntile_matches_serial_window(spark, n, buckets):
    df = _sample(spark, n)
    order = [F.col("v"), F.col("k")]
    serial = df.select(
        "k", F.ntile(buckets).over(Window.orderBy(*order)).alias("b")
    )
    dist = with_global_ntile(
        df, buckets, order, bucket_col="b", num_partitions=8
    ).select("k", "b")
    assert sorted(map(tuple, dist.collect())) == sorted(
        map(tuple, serial.collect())
    )


def test_global_row_number_matches_serial_window(spark):
    df = _sample(spark, 1000)
    order = [F.col("v"), F.col("k")]
    serial = df.select(
        "k", F.row_number().over(Window.orderBy(*order)).alias("rn")
    )
    dist = with_global_row_number(
        df, order, rn_col="rn", num_partitions=8
    ).select("k", "rn")
    assert sorted(map(tuple, dist.collect())) == sorted(
        map(tuple, serial.collect())
    )
    # no helper columns leak into the output
    assert set(dist.columns) == {"k", "rn"}


def test_global_ntile_is_partition_count_invariant(spark):
    df = _sample(spark, 500)
    order = [F.col("v"), F.col("k")]
    a = with_global_ntile(df, 4, order, num_partitions=2)
    b = with_global_ntile(df, 4, order, num_partitions=16)
    assert sorted(map(tuple, a.select("k", "bucket").collect())) == sorted(
        map(tuple, b.select("k", "bucket").collect())
    )
