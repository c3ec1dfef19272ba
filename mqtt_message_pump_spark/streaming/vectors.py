"""Streaming vector-index maintenance: incremental PQ encoding.

The batch side (``operators.similarity``) trains PQ codebooks once on a
corpus sample; at 100 TB the codebook is FROZEN and newly-arriving
embeddings are encoded incrementally -- re-training per batch would both
thrash the index (codes from different codebooks are not comparable) and
re-scan history.  This module is the streaming twin of that posture,
mirroring ``q_incremental_dedup``'s batch-probes-persisted-index shape:

- the codebook DataFrame is tiny (m * 2**nbits rows) and broadcast into
  every micro-batch's encode join;
- each micro-batch is one narrow encode pass (explode to m subvectors,
  broadcast-codebook argmin -- see ``pq_encode``), shuffling only the
  (id, sub_id)-keyed argmin aggregate of the BATCH, never the corpus;
- the appended long-form codes are immediately unionable with the
  existing index: same codebook => same code space.

Checkpointing makes restarts effectively-once, same as the pump sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mqtt_message_pump_spark.operators.similarity import (
    IvfPqIndex,
    ivfpq_search,
    pq_encode,
)


def start_pq_encode_stream(
    vectors: DataFrame,
    codebooks: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    trigger_secs: int = 1,
):
    """Encode a streaming DataFrame of (id, vector) rows into long-form
    PQ codes appended under ``out_dir``.

    ``codebooks`` must be a STATIC frame from ``pq_train_codebooks`` --
    the frozen-codebook invariant is what keeps incremental codes
    compatible with the existing index.

    Each micro-batch OVERWRITES its own ``batch=<id>`` subdirectory, so a
    batch replayed after a crash-before-checkpoint-commit lands in the
    same place instead of appending duplicates -- idempotent under
    replay by construction (stronger than a flat append, whose
    exactly-once depends on the write and the checkpoint commit being
    atomic together).  Readers see one partitioned dataset:
    ``spark.read.parquet(out_dir)`` with a ``batch`` provenance column.
    """
    codebooks = codebooks.cache()

    def encode_batch(batch_df: DataFrame, batch_id: int) -> None:
        codes = pq_encode(batch_df, codebooks, id_col, vec_col, m=m)
        codes.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return (
        vectors.writeStream.foreachBatch(encode_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )


def start_ivfpq_search_stream(
    queries: DataFrame,
    index: IvfPqIndex,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    n_probe: int = 3,
    rerank: int | None = None,
    candidates: DataFrame | None = None,
    trigger_secs: int = 1,
):
    """The SERVING side of the ANN stack: per-micro-batch query vectors
    probed against a persisted :class:`IvfPqIndex`, results appended
    under ``out_dir`` -- the streaming twin of ``q_ann_ivfpq_search``.

    The index is FROZEN for the stream's lifetime (same invariant as the
    encode twin's codebooks): every batch reuses the one already-encoded
    corpus, so per-batch cost is the bounded query-side ADC tables plus
    the probed cells' codes -- the corpus is never re-scanned, which is
    what makes a query stream over a 100 TB corpus serveable.  Index
    refresh is a blue/green swap (build + ``IvfPqIndex.save`` elsewhere,
    restart the stream on the new path), never an in-stream mutation.

    Same idempotent-replay layout as the encode stream: each micro-batch
    overwrites its own ``batch=<id>`` subdirectory.
    """

    def search_batch(batch_df: DataFrame, batch_id: int) -> None:
        res = ivfpq_search(
            batch_df, index, k=k, n_probe=n_probe,
            rerank=rerank, candidates=candidates,
        )
        res.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return (
        queries.writeStream.foreachBatch(search_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )
