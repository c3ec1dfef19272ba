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

from mqtt_message_pump_spark.operators.similarity import pq_encode


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
