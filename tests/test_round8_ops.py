"""Round-8 additions: IVF-PQ index-maintenance drift monitor
(``ivfpq_quantization_error`` / ``ivfpq_drift``) -- the operational
complement to the persisted index from round 7 (an append-only ANN index
degrades silently as the embedding distribution shifts; the monitor
surfaces per-cell error drift and the re-train decision).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mqtt_message_pump_spark.operators import similarity as SIM
from mqtt_message_pump_spark.plans.registry import table

SF_DIR = "/root/testdata/sf0.001"


def _build(spark):
    emb = table(spark, SF_DIR, "embeddings")
    idx = SIM.ivfpq_build(
        emb, "vec_id", "embedding", n_centroids=16, m=8, nbits=4,
        max_train=10_000, max_iter=10, persist=False,
    )
    return emb, idx


def test_quantization_error_per_cell(spark):
    """Error rows cover every populated cell; MSE is finite and
    non-negative; n_vecs sums to the corpus size."""
    emb, idx = _build(spark)
    stats = SIM.ivfpq_quantization_error(emb, idx).collect()
    assert stats
    assert sum(r["n_vecs"] for r in stats) == emb.count()
    assert all(r["mse"] >= 0.0 for r in stats)
    assert len({r["cell"] for r in stats}) == len(stats)


def test_drift_in_distribution_batch_is_quiet(spark):
    """An append drawn from the SAME distribution (a disjoint half of the
    corpus) must not trip the re-train flag: per-cell error ratios stay
    near 1 (sampling noise only)."""
    emb, idx = _build(spark)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    rows = SIM.ivfpq_drift(idx, half_a, half_b).collect()
    assert rows
    flagged = [r for r in rows if r["retrain"]]
    # allow a sliver of sparse-cell noise, but the batch as a whole is quiet
    assert sum(r["n_new"] for r in flagged) <= 0.05 * sum(
        r["n_new"] for r in rows
    ), f"in-distribution append flagged: {flagged}"


def test_drift_shifted_batch_trips_retrain(spark):
    """A distribution-shifted append (every component +0.5: new embedding
    model / new domain mode) must raise the residual quantization error
    under the frozen codebooks and trip the re-train flag on cells
    holding most of the appended rows."""
    emb, idx = _build(spark)
    shifted = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x + F.lit(0.5)).alias("embedding"),
    )
    rows = SIM.ivfpq_drift(idx, emb, shifted).collect()
    assert rows
    flagged_rows = sum(r["n_new"] for r in rows if r["retrain"])
    total_rows = sum(r["n_new"] for r in rows)
    assert flagged_rows >= 0.5 * total_rows, (
        f"shifted append under-flagged: {flagged_rows}/{total_rows}"
    )
    # drift is directional: mean new error strictly above build error
    ratios = [r["err_ratio"] for r in rows if r["err_ratio"] is not None]
    assert ratios and sum(ratios) / len(ratios) > 1.5


def test_drift_new_cell_flags_retrain(spark):
    """Appends landing in a cell with NO build-time vectors (a mode the
    codebooks never saw) are flagged unconditionally."""
    emb, idx = _build(spark)
    base_cells = {
        r["cell"]
        for r in SIM.ivfpq_quantization_error(emb, idx).collect()
    }
    # baseline restricted to vectors of ONE cell; append from all cells
    some_cell = min(base_cells)
    cells = SIM.ivfpq_quantization_error(emb, idx)
    baseline = emb.limit(0)  # empty baseline: every append cell is new
    rows = SIM.ivfpq_drift(idx, baseline, emb).collect()
    assert rows and cells.count() == len(rows)
    assert all(r["retrain"] for r in rows if r["n_new"] > 0)
    assert some_cell in {r["cell"] for r in rows}


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's skew-join path validated on ACTUALLY skewed data (the r7
    verdict gap: q_skew_join proves manual salting is semantically
    invisible, but nothing ran the adaptive skew split).  A 1000:1 hot
    key forces one shuffle partition far past the (lowered) skew
    threshold; the final adaptive plan must mark the sort-merge join
    skew=true (the hot partition re-planned into multiple splits -- no
    straggler task owns the whole key), and the result must equal the
    plain non-adaptive join bit-for-bit."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32kb",
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16kb")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # 1000:1 skew: key 0 carries 100k rows, keys 1..100 carry 100 each.
        # The downstream group key is INDEPENDENT of the join key (row_id
        # % 5) -- grouping by k itself would reuse the join's hash
        # partitioning and AQE would (correctly) refuse a skew split that
        # adds a shuffle; real skewed pipelines group elsewhere.
        big = spark.range(0, 100_000).select(
            F.lit(0).alias("k"), F.col("id").alias("row_id")
        ).unionAll(
            spark.range(0, 10_000).select(
                (F.col("id") % 100 + 1).alias("k"),
                (F.col("id") + 1_000_000).alias("row_id"),
            )
        ).withColumn("pad", F.repeat(F.lit("x"), 64))
        dim = spark.range(0, 101).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
        )
        joined = (
            big.join(dim.hint("merge"), "k")
            .groupBy((F.col("row_id") % 5).alias("g"))
            .agg(
                F.count("*").alias("n"),
                F.sum("dim_val").alias("s"),
                F.sum(F.length("pad")).alias("pad_bytes"),
            )
        )
        rows = {
            (r["g"], r["n"], r["s"], r["pad_bytes"]) for r in joined.collect()
        }
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    # semantic invisibility: identical to the plain join, computed in
    # plain python over the same generator expressions
    from collections import defaultdict

    agg: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for row_id in range(100_000):  # hot key 0, dim_val 0
        agg[row_id % 5][0] += 1
    for i in range(10_000):  # keys 1..100
        g = (i + 1_000_000) % 5
        agg[g][0] += 1
        agg[g][1] += (i % 100 + 1) * 10
    expect = {(g, n, s, n * 64) for g, (n, s) in agg.items()}
    assert rows == expect


def test_drift_key_registered(spark):
    """The registered key produces one row per touched cell with the
    documented schema and at least one tripped flag (its append IS the
    shifted batch)."""
    from mqtt_message_pump_spark.plans import QUERIES

    df = QUERIES["q_ann_index_drift"](spark, SF_DIR)
    assert df.columns == [
        "cell", "n_base", "mse_base", "n_new", "mse_new",
        "err_ratio", "retrain",
    ]
    rows = df.collect()
    assert rows and any(r["retrain"] for r in rows)
