#!/usr/bin/env python
"""Full production-lineage scale probe (VERDICT r12 #6): pump-style
manifest sink -> ``sink_tail`` change feed -> derived aggregate ->
SECOND manifest sink, with in-line maintenance on BOTH sinks, at a
100x backlog.

What it measures, per hop:

- **hop 1** (ingest): per-micro-batch trigger cost of a file-stream
  backlog committed through the replay-idempotent manifest append, with
  in-line snapshots (metadata fold, keeps the tail's listing O(1)) and
  retention-safe vacuum on the ingest sink;
- **hop 2** (derive): per-trigger cost of tailing hop 1's sink through
  the native ``sink_tail`` source (``max_batches_per_trigger=1``: one
  upstream batch per trigger, so hop-2 cost is attributable to ONE hop-1
  output batch), computing a per-batch aggregate (topic x date counts +
  byte sums -- the monitor-rate shape one hop downstream) and committing
  it to a second manifest sink with ITS own in-line snapshot + compact +
  vacuum cadence.

The 100 TB claim under test: **hop-2 per-batch cost tracks hop-1 OUTPUT
batch size, not corpus size** -- the tail's listing stays O(1) under
snapshots, its delta is O(new batches), and the downstream aggregate
sees only the delta.  Flatness (last-third mean / first-third mean of
trigger time) ~1.0 means batch N over an N-batch-deep corpus costs the
same as batch 2.  Compaction runs on the DOWNSTREAM sink only while the
stream is live: compacting a tailed sink past the reader's cursor is
the documented ``TailLost`` contract, so production compacts upstream
sinks on a cadence sized over the tail's lag (here the probe compacts
hop 1 AFTER the drain and re-verifies the totals).

Usage::

    python tools/twohop_probe.py [events_parquet] [n_chunks]

Default events: the 100x derived corpus
(``/tmp/scale_probe_100x/events.parquet``, built by
``tools/scale_probe.py``).  Results land in docs/SCALE.md SS10e.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mqtt_message_pump_spark.config import StoreConf
from mqtt_message_pump_spark.session import get_spark
from mqtt_message_pump_spark.sinks import (
    compact_sink,
    read_sink,
    snapshot_sink,
    vacuum_sink,
    write_append,
)
from mqtt_message_pump_spark.sources.sinktail import (
    register_sink_tail_source,
)

WORK = "/tmp/twohop_probe"

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def prepare_chunks(spark, events_path: str, n_chunks: int) -> str:
    """Event-time-ordered message chunks (one file = one hop-1
    micro-batch), same recipe as tools/streaming_amortized_probe.py."""
    src_dir = f"{WORK}/src"
    if os.path.isdir(src_dir) and len(
        [f for f in os.listdir(src_dir) if f.endswith(".parquet")]
    ) == n_chunks:
        return src_dir
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    ev = spark.read.parquet(events_path).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    lohi = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    span = lohi["hi"] - lohi["lo"]
    qs = [lohi["lo"] + span * i / n_chunks for i in range(1, n_chunks)]
    bounds = [None, *qs, None]
    now = time.time()
    for i in range(n_chunks):
        lo, hi = bounds[i], bounds[i + 1]
        sl = ev
        if lo is not None:
            sl = sl.filter(F.col("ts") >= lo)
        if hi is not None:
            sl = sl.filter(F.col("ts") < hi)
        tmp = f"{WORK}/tmp_chunk"
        sl.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dest = f"{src_dir}/chunk-{i:04d}.parquet"
        shutil.move(f"{tmp}/{part}", dest)
        os.utime(dest, (now + i, now + i))
    shutil.rmtree(f"{WORK}/tmp_chunk", ignore_errors=True)
    return src_dir


def _progress(q) -> list[dict]:
    prog = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(str(p))
        prog.append(
            {
                "batch": d["batchId"],
                "rows": d.get("numInputRows", 0),
                "ms": d.get("durationMs", {}).get("triggerExecution", 0),
            }
        )
    return [p for p in prog if p["rows"] > 0]


def report(name: str, prog: list[dict]) -> dict:
    body = prog[1:]  # batch 0 pays stream-start + bootstrap costs
    third = max(1, len(body) // 3)
    first = statistics.mean(p["ms"] for p in body[:third])
    last = statistics.mean(p["ms"] for p in body[-third:])
    med_first = statistics.median(p["ms"] for p in body[:third])
    med_last = statistics.median(p["ms"] for p in body[-third:])
    med_ms = statistics.median(p["ms"] for p in body)
    med_rows = statistics.median(p["rows"] for p in body)
    out = {
        "batches": len(prog),
        "median_batch_ms": med_ms,
        "rows_per_batch": med_rows,
        "rows_per_s": 1000 * med_rows / med_ms if med_ms else 0,
        # mean flatness includes the scheduled in-line maintenance
        # spikes (compaction cost scales with the DOWNSTREAM corpus by
        # design); median flatness is the steady-state per-trigger claim
        "flatness_mean": last / first if first else 0,
        "flatness_median": med_last / med_first if med_first else 0,
    }
    print(
        f"{name}: batches={out['batches']} "
        f"median_batch={out['median_batch_ms']:.0f}ms "
        f"rows/batch={out['rows_per_batch']:.0f} "
        f"steady_rows_per_s={out['rows_per_s']:.0f} "
        f"flatness_mean={out['flatness_mean']:.2f} "
        f"flatness_median={out['flatness_median']:.2f}",
        flush=True,
    )
    return out


def main() -> None:
    events = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/tmp/scale_probe_100x/events.parquet"
    )
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark(app_name="twohop-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register_sink_tail_source(spark)
    for d in ("sink_a", "sink_b", "ck1", "ck2"):
        shutil.rmtree(f"{WORK}/{d}", ignore_errors=True)
    src_dir = prepare_chunks(spark, events, n_chunks)
    total = spark.read.parquet(src_dir).count()
    print(f"backlog: {total} rows in {n_chunks} chunks", flush=True)

    sink_a = f"{WORK}/sink_a"
    sink_b = f"{WORK}/sink_b"
    store = StoreConf(commit_protocol="manifest")

    # ---- hop 1: ingest stream -> manifest sink A + in-line maintenance
    msgs = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select(
            F.concat(F.lit("m"), F.col("event_id")).alias("mid"),
            F.col("event_type").alias("topic"),
            F.col("props").alias("payload"),
            F.col("ts").alias("collect_datetime"),
            F.to_date("ts").alias("collect_date"),
        )
    )

    def hop1(df, batch_id: int) -> None:
        write_append(df, store, sink_a, batch_id=batch_id, epoch="h1")
        if batch_id and batch_id % 5 == 0:
            snapshot_sink(spark, sink_a)
            vacuum_sink(spark, sink_a, retention_secs=3600)

    q1 = (
        msgs.writeStream.foreachBatch(hop1)
        .option("checkpointLocation", f"{WORK}/ck1")
        .start()
    )
    q1.processAllAvailable()
    r1 = report("hop1_ingest", _progress(q1))
    q1.stop()
    q1.awaitTermination(30)

    # ---- hop 1b: same ingest through the NATIVE stream writer
    # (df.writeStream.format("manifest_sink")) -- no foreachBatch, no
    # JVM-side helper; blooms are skipped above the driver-build guard
    # (the commit runs in a plain Python worker), so this row also
    # bounds the bloom build's share of hop 1's cost
    from mqtt_message_pump_spark.sources.manifestsink import (
        register_manifest_sink_source,
    )

    register_manifest_sink_source(spark)
    sink_a2 = f"{WORK}/sink_a_native"
    shutil.rmtree(sink_a2, ignore_errors=True)
    shutil.rmtree(f"{WORK}/ck1b", ignore_errors=True)
    q1b = (
        msgs.writeStream.format("manifest_sink")
        .option("path", sink_a2)
        .option("checkpointLocation", f"{WORK}/ck1b")
        .start()
    )
    q1b.processAllAvailable()
    r1b = report("hop1b_native_writer", _progress(q1b))
    q1b.stop()
    q1b.awaitTermination(30)
    a2_rows = read_sink(spark, sink_a2).count()
    print(f"hop1b verify: {a2_rows} rows (expect {total})", flush=True)

    # ---- hop 2: sink_tail(A) -> per-batch aggregate -> manifest sink B
    def hop2(df, batch_id: int) -> None:
        agg = (
            df.groupBy("topic", "collect_date")
            .agg(
                F.count(F.lit(1)).alias("n_msgs"),
                F.sum(F.length("payload")).alias("n_bytes"),
                F.max("collect_datetime").alias("collect_datetime"),
            )
            .withColumn("mid", F.concat("topic", F.lit("@"),
                                        F.col("collect_date").cast("string")))
        )
        write_append(agg, store, sink_b, batch_id=batch_id, epoch="h2")
        if batch_id and batch_id % 5 == 0:
            snapshot_sink(spark, sink_b)
        if batch_id and batch_id % 10 == 0:
            compact_sink(spark, sink_b, keep_last=2)
            vacuum_sink(spark, sink_b, retention_secs=3600)

    q2 = (
        spark.readStream.format("sink_tail")
        .option("path", sink_a)
        .option("max_batches_per_trigger", "1")
        .load()
        .writeStream.foreachBatch(hop2)
        .option("checkpointLocation", f"{WORK}/ck2")
        .start()
    )
    q2.processAllAvailable()
    r2 = report("hop2_tail_derive", _progress(q2))
    q2.stop()
    q2.awaitTermination(30)

    # ---- post-drain upstream compaction (the production cadence: sized
    # over the tail's lag) + end-to-end verification
    compact_sink(spark, sink_a, keep_last=2)
    snapshot_sink(spark, sink_a)
    vacuum_sink(spark, sink_a, retention_secs=0)
    a_rows = read_sink(spark, sink_a).count()
    b = read_sink(spark, sink_b)
    b_msgs = b.agg(F.sum("n_msgs")).first()[0]
    print(
        f"verify: sink_a rows={a_rows} (expect {total}); "
        f"sink_b sum(n_msgs)={b_msgs} (expect {total}); "
        f"sink_b agg rows={b.count()}",
        flush=True,
    )
    ok = a_rows == total and b_msgs == total
    print(
        json.dumps(
            {
                "metric": "twohop_probe",
                "ok": ok,
                "total_rows": total,
                "hop1": r1,
                "hop1b_native": r1b,
                "hop2": r2,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
