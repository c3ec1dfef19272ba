#!/usr/bin/env python
"""Steady-state per-micro-batch cost of the two heaviest data-bound
streaming shapes: sessionization and the stream-stream interval join.

Why: the r11 1000x BATCH probe's two largest ratios were exactly these
shapes (sessionize 102x, as-of/interval 42x) -- correct one-shot costs
for a keyed shuffle over the whole corpus, but NOT how they run at
100 TB.  Production runs them incrementally under a watermark
(``streaming/windows.py``: ``sessionized_counts``, ``interval_join``),
where per-batch cost must track BATCH size and state must be bounded by
the watermark horizon, not history.  This probe feeds a large backlog
through a file stream one chunk per trigger and measures exactly that:

- per-micro-batch wall time across the run (flat = amortized: batch N
  over a corpus-so-far of N chunks costs the same as batch 2);
- steady-state rows/s/host;
- state-store rows per batch (plateau = watermark-bounded eviction).

Chunks are written in EVENT-TIME order with strictly increasing file
mtimes (FileStreamSource breaks same-mtime ties arbitrarily -- a late
file overtaking an earlier one advances the watermark and drops rows,
the r11 soak gotcha), so the watermark advances monotonically like a
live feed.

Usage::

    python tools/streaming_amortized_probe.py [events_parquet] [n_chunks]

Default events: the 100x derived corpus
(``/tmp/scale_probe_100x/events.parquet``, built by
``tools/scale_probe.py``).  Results land in docs/SCALE.md SS10d.
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
from mqtt_message_pump_spark.streaming.windows import (
    interval_join,
    sessionized_counts,
)

WORK = "/tmp/streaming_amortized_probe"

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def prepare_chunks(spark, events_path: str, n_chunks: int) -> str:
    """Write the backlog as ``n_chunks`` event-time-ordered parquet
    files with strictly increasing mtimes (one file = one micro-batch
    under ``maxFilesPerTrigger=1``)."""
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
    # event-time range chunking: even time slices between min and max
    # (approxQuantile rejects timestamp columns), one filtered slice per
    # chunk -- N bounded scans; each output file is a contiguous time
    # range so the stream replays like a live feed
    lohi = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
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
        os.utime(dest, (now + i, now + i))  # strictly increasing mtimes
    shutil.rmtree(f"{WORK}/tmp_chunk", ignore_errors=True)
    return src_dir


def _stream(spark, src_dir: str):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def _run(name: str, out_df) -> list[dict]:
    ckpt = f"{WORK}/ckpt_{name}"
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        out_df.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # recentProgress entries are StreamingQueryProgress objects (classic
    # mode) or dicts; normalize defensively
    import json as J

    prog = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else J.loads(str(p))
        prog.append(
            {
                "batch": d["batchId"],
                "rows": d.get("numInputRows", 0),
                "ms": d.get("durationMs", {}).get("triggerExecution", 0),
                "state_rows": sum(
                    s.get("numRowsTotal", 0)
                    for s in d.get("stateOperators", [])
                ),
            }
        )
    q.stop()
    q.awaitTermination(30)
    return [p for p in prog if p["rows"] > 0]


def report(name: str, prog: list[dict]) -> None:
    if len(prog) < 6:
        print(f"{name}: too few batches ({len(prog)})")
        return
    body = prog[1:]  # batch 0 pays stream-start costs
    third = max(1, len(body) // 3)
    first = statistics.mean(p["ms"] for p in body[:third])
    last = statistics.mean(p["ms"] for p in body[-third:])
    med_ms = statistics.median(p["ms"] for p in body)
    med_rows = statistics.median(p["rows"] for p in body)
    state_tail = [p["state_rows"] for p in body[-third:]]
    print(
        f"{name}: batches={len(prog)} median_batch={med_ms:.0f}ms "
        f"rows/batch={med_rows:.0f} steady_rows_per_s="
        f"{1000 * med_rows / med_ms:.0f} "
        f"first_third={first:.0f}ms last_third={last:.0f}ms "
        f"flatness={last / first:.2f} "
        f"state_rows_tail={max(state_tail)}",
        flush=True,
    )


def main() -> None:
    events = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/tmp/scale_probe_100x/events.parquet"
    )
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark(app_name="streaming-amortized-probe")
    spark.sparkContext.setLogLevel("ERROR")
    src_dir = prepare_chunks(spark, events, n_chunks)
    total = spark.read.parquet(events).count()
    print(f"backlog: {total} rows in {n_chunks} chunks from {events}",
          flush=True)

    # 1. sessionization (streaming twin of q_sessionize): state = open
    # (user, session) rows inside the watermark horizon
    sess = sessionized_counts(
        _stream(spark, src_dir),
        gap="5 minutes", ts_col="ts", key_col="user_id",
        watermark="10 minutes",
    )
    report("sessionize_stream", _run("sess", sess))

    # 2. stream-stream interval join (streaming twin of the as-of/range
    # family): purchases joined to each user's clicks up to 2 minutes
    # earlier; both sides buffered only within the watermark
    left = _stream(spark, src_dir).filter(
        F.col("event_type") == "purchase"
    )
    right = (
        _stream(spark, src_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("rts"),
            F.col("event_id").alias("r_event_id"),
        )
    )
    ij = interval_join(
        left, right, "user_id", left_ts="ts", right_ts="rts",
        lower="INTERVAL 0 SECONDS", upper="INTERVAL 2 MINUTES",
        watermark="10 minutes",
    )
    report("interval_join_stream", _run("ij", ij))

    # 3. sink_tail drain: the backlog committed as manifest-sink batches,
    # tailed one batch per trigger (max_batches_per_trigger=1) -- the
    # change-feed source's own per-micro-batch cost (python-native
    # manifest listing + per-file Arrow reads)
    from pyspark.sql import functions as F2

    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import snapshot_sink, write_append
    from mqtt_message_pump_spark.sources.sinktail import (
        register_sink_tail_source,
    )

    register_sink_tail_source(spark)
    sink = f"{WORK}/tail_sink"
    if not os.path.isdir(f"{sink}/_manifests"):
        store = StoreConf(commit_protocol="manifest", snapshot_every=5)
        for i in range(n_chunks):
            batch = (
                spark.read.parquet(f"{src_dir}/chunk-{i:04d}.parquet")
                .select(
                    F2.concat(F2.lit("m"), F2.col("event_id")).alias("mid"),
                    F2.col("event_type").alias("topic"),
                    F2.col("props").alias("payload"),
                    F2.col("ts").alias("collect_datetime"),
                    F2.to_date("ts").alias("collect_date"),
                )
            )
            write_append(batch, store, sink, batch_id=i, epoch="probe")
        snapshot_sink(spark, sink, min_uncovered=1)
    tail = (
        spark.readStream.format("sink_tail")
        .option("path", sink)
        .option("max_batches_per_trigger", "1")
        .option(
            "schema",
            "mid string, topic string, payload string, "
            "collect_datetime timestamp, collect_date date",
        )
        .load()
    )
    report("sink_tail_drain", _run("tail", tail))


if __name__ == "__main__":
    main()
