"""Focused tests for the round-16 compute-once boundary
(:func:`plans.registry.materialize_once`): results identical to the
un-checkpointed frame, partitioning preserved (the whole point of the
AQE flip inside it), laziness (no job at construction), and no reuse
across separately built frames (each build computes from the input).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mqtt_message_pump_spark.plans.registry import materialize_once, table


def _base(spark, sf_dir):
    return table(spark, sf_dir, "documents", split="doc_id").select(
        "doc_id", F.length("text").alias("n")
    )


def test_rows_identical(spark, sf_dir):
    plain = _base(spark, sf_dir)
    ck = materialize_once(_base(spark, sf_dir))
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, ck.collect())
    )


def test_partitioning_preserved_no_new_exchange(spark, sf_dir):
    """groupBy on the upstream repartition key over the checkpointed frame
    must plan ZERO exchanges -- the LogicalRDD carries the real
    hashpartitioning because the checkpoint is compiled with AQE off."""
    ck = materialize_once(_base(spark, sf_dir))
    agg = ck.groupBy("doc_id").agg(F.sum("n").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_lazy_construction_schedules_no_job(spark, sf_dir):
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = materialize_once(_base(spark, sf_dir))
    df.schema  # analysis only
    after = tracker.getJobIdsForGroup(None)
    assert before == after


def test_fresh_build_recomputes(spark, sf_dir):
    """Two separately built checkpointed frames are independent plans --
    nothing is memoized across builds (the no-result-caching contract)."""
    a = materialize_once(_base(spark, sf_dir))
    b = materialize_once(_base(spark, sf_dir))
    assert a._jdf != b._jdf
    assert a.count() == b.count()
