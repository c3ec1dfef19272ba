"""Unit tests for the custom join operators (asof / range / salted)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mqtt_message_pump_spark.operators.joins import (
    asof_join,
    range_join,
    salted_join,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01T00:00:05")),
            (2, "u", _ts("2024-01-01T00:00:10")),  # exactly at right ts
            (3, "u", _ts("2024-01-01T00:00:02")),  # before any right row
            (4, "v", _ts("2024-01-01T00:01:00")),  # other key
        ],
        ["event_id", "user", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01T00:00:04"), 40.0),
            ("u", _ts("2024-01-01T00:00:10"), 100.0),
            ("v", _ts("2024-01-01T00:00:59"), 7.0),
        ],
        ["user", "ts", "val"],
    )
    got = {
        r["event_id"]: r["val_asof"]
        for r in asof_join(
            left, right, on=["user"], ts_col="ts", value_cols=["val"]
        ).collect()
    }
    assert got == {1: 40.0, 2: 100.0, 3: None, 4: 7.0}


def test_range_join_matches_theta_join(spark):
    points = spark.createDataFrame(
        [(i, float(i * 7 % 100)) for i in range(200)], ["pid", "x"]
    )
    ivals = spark.createDataFrame(
        [(j, float(j * 10), float(j * 10 + 14.5)) for j in range(10)],
        ["iid", "lo", "hi"],
    )
    fast = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, ivals, "x", "lo", "hi", bucket_width=10
        ).collect()
    }
    slow = {
        (r["pid"], r["iid"])
        for r in points.join(
            ivals, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
        ).collect()
    }
    assert fast == slow and len(fast) > 0


def test_salted_join_matches_plain_join(spark):
    # skewed big side: 90% of rows share key 0
    big = spark.createDataFrame(
        [(i, i % 10 if i % 10 < 2 else 0) for i in range(1000)], ["row_id", "k"]
    )
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(10)], ["k", "name"]
    )
    fast = {
        (r["row_id"], r["name"])
        for r in salted_join(big, small, on=["k"], salt_buckets=8).collect()
    }
    slow = {
        (r["row_id"], r["name"]) for r in big.join(small, "k").collect()
    }
    assert fast == slow and len(fast) == 1000


def test_range_join_negative_coordinates(spark):
    """floor-based bucketing: negative points/intervals must match exactly
    like the theta join (cast-toward-zero would mis-bucket them)."""
    points = spark.createDataFrame(
        [(i, float(i * 7 % 100) - 50.0) for i in range(200)], ["pid", "x"]
    )
    ivals = spark.createDataFrame(
        [(j, float(j * 10) - 55.0, float(j * 10) - 40.5) for j in range(10)],
        ["iid", "lo", "hi"],
    )
    fast = {
        (r["pid"], r["iid"])
        for r in range_join(
            points, ivals, "x", "lo", "hi", bucket_width=10
        ).collect()
    }
    slow = {
        (r["pid"], r["iid"])
        for r in points.join(
            ivals, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
        ).collect()
    }
    assert fast == slow and len(fast) > 0


def test_join_operators_plan_shapes(spark, sf_dir):
    """Plan-shape guards for the custom join operators at fixture scale:
    the whole point of each operator is the plan it AVOIDS, so pin it.

    - as-of join: a sort-based union + window composition -- must contain
      NO join node at all (a naive as-of is a range theta-join that
      Catalyst executes as BroadcastNestedLoopJoin, O(n*m) compares);
    - range join: bucketed equi-join -- must be a hash/sort-merge
      equi-join, never CartesianProduct/BroadcastNestedLoopJoin."""
    from mqtt_message_pump_spark.plans import QUERIES

    asof_plan = (
        QUERIES["q_asof_join"](spark, sf_dir)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "NestedLoop" not in asof_plan and "CartesianProduct" not in asof_plan
    assert "Window" in asof_plan  # the sort-based composition is present

    range_plan = (
        QUERIES["q_range_join"](spark, sf_dir)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "NestedLoop" not in range_plan
    assert "CartesianProduct" not in range_plan
    assert "Join" in range_plan  # equi-join on the bucket key survives
