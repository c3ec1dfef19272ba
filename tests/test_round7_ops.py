"""Round-7 additions: IVF-PQ index persistence to storage
(``IvfPqIndex.save``/``load``) and the streaming search twin
(``start_ivfpq_search_stream``) -- the serving shape of the ANN stack.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

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


def _result_set(rows):
    return sorted(
        (r["query_id"], r["cand_id"], r["pq_dist"], r["rank"]) for r in rows
    )


def test_ivfpq_index_save_load_roundtrip(spark, tmp_path):
    """A saved-then-loaded index is search-result IDENTICAL to the
    in-session one (float64 centroids round-trip bit-exactly through
    parquet doubles; codes are re-read, not re-encoded)."""
    emb, idx = _build(spark)
    queries = emb.filter(F.col("vec_id") < 5)

    path = str(tmp_path / "ivfpq_index")
    idx.save(path)
    loaded = SIM.IvfPqIndex.load(spark, path)

    assert np.array_equal(loaded.coarse, idx.coarse)
    assert np.array_equal(loaded.pq_centers, idx.pq_centers)
    assert (loaded.id_col, loaded.vec_col, loaded.m) == ("vec_id", "embedding", 8)
    assert loaded.codes.count() == idx.codes.count()

    in_session = SIM.ivfpq_search(
        queries, idx, k=3, n_probe=3, rerank=8, candidates=emb
    ).collect()
    from_disk = SIM.ivfpq_search(
        queries, loaded, k=3, n_probe=3, rerank=8, candidates=emb
    ).collect()
    assert _result_set(in_session) == _result_set(from_disk)
    assert in_session  # non-vacuous


def test_ivfpq_index_resave_overwrites(spark, tmp_path):
    """Re-saving to the same path replaces the index (blue/green refresh
    semantics), leaving no stale code rows behind."""
    emb, idx = _build(spark)
    path = str(tmp_path / "idx")
    idx.save(path)
    n_full = SIM.IvfPqIndex.load(spark, path).codes.count()

    smaller = SIM.ivfpq_build(
        emb.filter(F.col("vec_id") < 50), "vec_id", "embedding",
        n_centroids=4, m=8, nbits=4, persist=False,
    )
    smaller.save(path)
    reloaded = SIM.IvfPqIndex.load(spark, path)
    assert reloaded.codes.count() == 50 * 8 < n_full
    assert reloaded.coarse.shape[0] == 4


def test_ivfpq_search_stream_matches_batch(spark, tmp_path):
    """Streaming ANN serving: micro-batches of query vectors probed via
    foreachBatch against an index LOADED FROM STORAGE must produce
    exactly the batch search's results for the same queries -- the
    frozen-index invariant, end to end through save/load."""
    from mqtt_message_pump_spark.streaming.vectors import (
        start_ivfpq_search_stream,
    )

    emb, idx = _build(spark)
    path = str(tmp_path / "served_index")
    idx.save(path)
    loaded = SIM.IvfPqIndex.load(spark, path)

    query_rows = emb.filter(F.col("vec_id") < 6).collect()
    src = tmp_path / "queries"
    src.mkdir()
    for name, chunk in (("b0.json", query_rows[:3]), ("b1.json", query_rows[3:])):
        with open(src / name, "w") as fh:
            for r in chunk:
                fh.write(
                    json.dumps(
                        {
                            "vec_id": r["vec_id"],
                            "embedding": [float(x) for x in r["embedding"]],
                        }
                    )
                    + "\n"
                )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = tmp_path / "results"
    q = start_ivfpq_search_stream(
        stream, loaded, str(out), str(tmp_path / "ckpt"),
        k=3, n_probe=3, rerank=8, candidates=emb,
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = _result_set(
        spark.read.parquet(str(out))
        .select("query_id", "cand_id", "pq_dist", "rank")
        .collect()
    )
    want = _result_set(
        SIM.ivfpq_search(
            emb.filter(F.col("vec_id") < 6), idx, k=3, n_probe=3,
            rerank=8, candidates=emb,
        ).collect()
    )
    assert got == want
    assert len({qid for qid, *_ in got}) == 6  # every query answered


def test_ivfpq_resave_onto_source_path_refused(spark, tmp_path):
    """A load()-ed index refuses save() onto its own source path (r7
    ADVICE): its codes DataFrame is a lazy scan of that location, and
    overwriting the parquet files mid-read corrupts the index.  Saving
    to a NEW path still works, and the built (non-loaded) index keeps
    its overwrite semantics."""
    _, idx = _build(spark)
    path = str(tmp_path / "idx")
    idx.save(path)
    idx.save(path)  # built in-session: re-save onto same path is fine

    loaded = SIM.IvfPqIndex.load(spark, path)
    with pytest.raises(ValueError, match="own source path"):
        loaded.save(path)
    with pytest.raises(ValueError, match="own source path"):
        loaded.save(path + "/")  # trailing-slash alias of the same dir
    other = str(tmp_path / "idx2")
    loaded.save(other)  # new location: allowed
    assert SIM.IvfPqIndex.load(spark, other).codes.count() == idx.codes.count()
