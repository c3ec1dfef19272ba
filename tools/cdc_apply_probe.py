#!/usr/bin/env python
"""Steady-state per-trigger cost of the streaming CDC apply
(``streaming.pump.start_cdc_apply`` / ``pump tail --merge-on``).

SCALE SS10g claims the apply's per-trigger cost is bounded by the
CHANGE RATE, not the table size -- the property that makes an eagerly
merged current-state table viable at 100 TB.  This probe measures it
directly: an upstream change log of ``n_batches`` batches x
``per_batch`` changes over a key space much larger than one batch is
tailed with ``max_batches_per_trigger=1`` (one upstream batch per
micro-batch) and merged into the downstream table as it GROWS; per
trigger we record wall time from the query's progress events.

Flat per-trigger wall across the run = amortized: trigger N merges the
same-sized change set into an N-times-larger table for the same cost.
The downstream table is manifest-compacted mid-run (in the maintenance
window while the stream is stopped) exactly as production would, so
the per-batch-frame read amplification stays bounded.

Usage::

    python tools/cdc_apply_probe.py [n_batches] [per_batch]

Results land in docs/SCALE.md SS10g.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mqtt_message_pump_spark.session import get_spark
from mqtt_message_pump_spark.sinks import (
    append_batch_manifest,
    compact_sink,
    read_sink,
    release_writer_lease,
    snapshot_sink,
)
from mqtt_message_pump_spark.config import StoreConf
from mqtt_message_pump_spark.sources.sinktail import (
    register_sink_tail_source,
)
from mqtt_message_pump_spark.streaming.pump import start_cdc_apply

WORK = "/tmp/cdc_apply_probe"


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    spark = get_spark(app_name="cdc-apply-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register_sink_tail_source(spark)
    shutil.rmtree(WORK, ignore_errors=True)
    up, down, ck = f"{WORK}/up", f"{WORK}/down", f"{WORK}/ck"
    store = StoreConf(commit_protocol="manifest")

    print(
        f"CDC apply: {n_batches} batches x {per_batch} changes "
        "(80% inserts / 20% recent-window updates)",
        flush=True,
    )
    def _batch_df(b: int):
        """Realistic CDC locality: 80% inserts (brand-new keys), 20%
        updates targeting the two PREVIOUS batches' keys.  Uniformly
        scattered updates would instead touch O(all) downstream batches
        per trigger -- the documented worst case where the lazy
        collapse read (read_sink(collapse_keys=...)) is the right tool,
        not eager MERGE."""
        base = b * per_batch
        win_lo = max(0, base - 2 * per_batch)
        win_n = max(base - win_lo, 1)
        is_upd = (F.col("id") % 5 == 0) & F.lit(b > 0)
        key_id = F.when(
            is_upd,
            F.lit(win_lo) + F.pmod(F.xxhash64(F.col("id")), F.lit(win_n)),
        ).otherwise(F.col("id"))
        return spark.range(base, base + per_batch).select(
            F.concat(F.lit("k"), key_id.cast("string")).alias("mid"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias(
                "payload"
            ),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(secs=F.col("id").cast("double"))
            ).alias("collect_datetime"),
            F.to_date(F.lit("2024-01-01")).alias("collect_date"),
        )

    t0 = time.time()
    for b in range(n_batches):
        append_batch_manifest(_batch_df(b), store, up, b, epoch="src")
    print(f"  upstream written in {time.time() - t0:.1f}s", flush=True)

    def run_stream(label: str) -> list[float]:
        q = start_cdc_apply(
            spark,
            spark.readStream.format("sink_tail")
            .option("path", up)
            .option("max_batches_per_trigger", "1")
            .load(),
            down, ck,
            on=["mid"],
            version_col="collect_datetime",
            trigger_secs=0.1,
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
        durs = [
            p.durationMs["triggerExecution"] / 1000.0
            for p in q.recentProgress
            if p.numInputRows > 0
        ]
        print(
            f"  {label}: {len(durs)} triggers, "
            f"median {statistics.median(durs):.2f}s "
            f"p90 {sorted(durs)[int(len(durs) * 0.9)]:.2f}s "
            f"first {durs[0]:.2f}s last {durs[-1]:.2f}s",
            flush=True,
        )
        return durs

    half = run_stream("first half (table growing from empty)")
    # mid-run maintenance, exactly as production: quiesce, compact the
    # downstream's accumulated per-batch attempts, snapshot, resume
    release_writer_lease(spark, down)
    t0 = time.time()
    compact_sink(spark, down, keep_last=2)
    snapshot_sink(spark, down)
    print(f"  mid-run compact+snapshot: {time.time() - t0:.1f}s", flush=True)
    for b in range(n_batches, n_batches * 2):
        append_batch_manifest(_batch_df(b), store, up, b, epoch="src")
    second = run_stream("second half (after compaction, table 2x)")
    n = read_sink(spark, down).count()
    total = n_batches * 2 * per_batch
    print(
        f"  downstream rows: {n} (changes applied: {total}); "
        f"flatness (median2/median1): "
        f"{statistics.median(second) / statistics.median(half):.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
