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


@pytest.mark.parametrize("materialize", [False, True])
def test_global_row_number_materialize_paths_agree(spark, materialize):
    """Both the recompute path and the localCheckpoint path must match
    the serial window exactly."""
    df = _sample(spark, 997)
    order = [F.col("v"), F.col("k")]
    serial = df.select(
        "k", F.row_number().over(Window.orderBy(*order)).alias("rn")
    )
    dist = with_global_row_number(
        df, order, rn_col="rn", num_partitions=8, materialize=materialize
    ).select("k", "rn")
    assert sorted(map(tuple, dist.collect())) == sorted(
        map(tuple, serial.collect())
    )


def test_range_exchange_is_reused_not_recomputed(spark):
    """The non-materialized plan's correctness invariant: the counts
    branch must read the SAME range exchange as the local branch (a
    re-sampled second exchange could pick different partition
    boundaries, silently mis-aligning counts with local row numbers).
    Assert the executed plan contains exactly one executed range
    exchange plus a ReusedExchange pointing at it, and NO second
    full-data exchange of any kind (the window-free local row number
    must not reintroduce a hashpartitioning shuffle of the data)."""
    df = _sample(spark, 2000)
    ranked = with_global_row_number(
        df, [F.col("v"), F.col("k")], rn_col="rn", num_partitions=8
    )
    ranked.collect()
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # AQE's toString prints the final plan followed by the initial plan;
    # keep only the final ("== Initial Plan ==" separator)
    final = plan.split("== Initial Plan ==")[0]
    lines = final.splitlines()
    executed_range = [
        line
        for line in lines
        if "Exchange rangepartitioning" in line
        and "ReusedExchange" not in line
    ]
    reused = [line for line in lines if "ReusedExchange" in line]
    assert len(executed_range) == 1, final
    assert len(reused) == 1 and "rangepartitioning" in reused[0], final
    # the only other exchanges allowed are partition-count-bounded
    # (counts aggregation + SinglePartition over one row per partition)
    # or broadcast -- never a second shuffle keyed on the data itself
    data_hash_exchanges = [
        line
        for line in final.splitlines()
        if "Exchange hashpartitioning" in line and "__rank_pid" not in line
    ]
    assert not data_hash_exchanges, data_hash_exchanges
