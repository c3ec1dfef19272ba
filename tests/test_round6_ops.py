"""Round-6 additions: the persisted-index IVF-PQ search key, generic
query-id types on the ADC path, tiny-corpus codebooks, and the
materialized ranking variant are covered in test_ranking.py.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mqtt_message_pump_spark.operators import similarity as SIM
from mqtt_message_pump_spark.plans import QUERIES
from mqtt_message_pump_spark.plans.registry import table


def _pairs(rows):
    return sorted(
        (r["query_id"], r["cand_id"], r["pq_dist"], r["rank"]) for r in rows
    )


def test_ivfpq_search_key_matches_one_shot_key(spark, sf_dir):
    """q_ann_ivfpq_search probes a persisted index built with the same
    seeds/params as q_ann_ivfpq's one-shot path -- results must be
    IDENTICAL, and the second invocation must reuse the cached index
    (no retrain, no re-encode)."""
    from mqtt_message_pump_spark.plans import llm

    one_shot = QUERIES["q_ann_ivfpq"](spark, sf_dir).collect()
    searched = QUERIES["q_ann_ivfpq_search"](spark, sf_dir).collect()
    assert _pairs(one_shot) == _pairs(searched)

    key = (spark.sparkContext.applicationId, sf_dir)
    idx_first = llm._IVFPQ_INDEX[key]
    assert idx_first.codes.storageLevel.useMemory  # persisted
    QUERIES["q_ann_ivfpq_search"](spark, sf_dir).collect()
    assert llm._IVFPQ_INDEX[key] is idx_first  # cache hit, not a rebuild


def test_ivfpq_search_supports_string_ids(spark):
    """The ADC frame's query_id type is derived from the caller's id
    column (round-5 advice: it was hardcoded to long), so string-keyed
    corpora search correctly."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (f"doc-{i:03d}", [float(x) for x in rng.standard_normal(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc string, emb array<double>")
    idx = SIM.ivfpq_build(
        df, id_col="doc", vec_col="emb", n_centroids=4, m=4, nbits=2,
        persist=False,
    )
    out = SIM.ivfpq_search(
        df.limit(3), idx, k=2, n_probe=2, rerank=4, candidates=df
    ).collect()
    assert out
    assert all(isinstance(r["query_id"], str) for r in out)
    assert all(r["query_id"] != r["cand_id"] for r in out)


def test_ivfpq_tiny_corpus_fewer_centroids_than_nbits(spark):
    """A training sample smaller than 2**nbits must yield a working
    (smaller) codebook, not an IndexError (round-5 advice)."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    idx = SIM.ivfpq_build(
        df, id_col="vec_id", vec_col="emb", n_centroids=2, m=2, nbits=4,
        persist=False,
    )
    assert idx.pq_centers.shape[1] == 6  # actual centroid count, not 16
    out = SIM.ivfpq_search(df.limit(2), idx, k=2, n_probe=1).collect()
    assert out


def test_ivfpq_build_rejects_degenerate_sample(spark):
    df = spark.createDataFrame([(1, [0.0, 1.0])], "vec_id long, emb array<double>")
    with pytest.raises(ValueError, match=">=2 sample vectors"):
        SIM.ivfpq_build(df, id_col="vec_id", vec_col="emb", m=2)


def test_ivfpq_search_rerank_requires_candidates(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    idx = SIM.ivfpq_build(emb, max_train=1_000, max_iter=3, persist=False)
    with pytest.raises(ValueError, match="candidates"):
        SIM.ivfpq_search(
            emb.filter(F.col("vec_id") < 2), idx, k=2, rerank=4
        )
