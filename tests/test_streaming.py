"""Streaming pump tests: batch twin cardinality, file-source streaming with
checkpoint restart (effectively-once), monitor listener metrics.
"""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from mqtt_message_pump_spark.sources.testing import file_message_stream
from mqtt_message_pump_spark.streaming.monitor import PumpMonitorListener
from mqtt_message_pump_spark.streaming.pump import run_batch_pump, start_stream_pump


def test_batch_pump_cardinality(spark, sf_dir, tmp_path):
    """1 message with k=2 records -> 1 raw row + 2 flattened rows
    (FIXTURES.md A expected cardinality)."""
    counts = run_batch_pump(spark, sf_dir, str(tmp_path / "out"))
    assert counts["raw_rows"] == 1000
    assert counts["flat_rows"] == 2000


def _write_messages(dir_path, start: int, n: int) -> None:
    dir_path.mkdir(parents=True, exist_ok=True)
    lines = []
    for i in range(start, start + n):
        lines.append(
            json.dumps(
                {
                    "topic": f"pump/topic{i % 3}",
                    "payload": json.dumps(
                        {"r1": {"k": i}, "r2": {"k": i * 2}}
                    ),
                    "received_time": f"2024-01-01T00:00:{i % 60:02d}.000Z",
                }
            )
        )
    (dir_path / f"batch_{start}.json").write_text("\n".join(lines))


def _run_until_complete(query, timeout=60):
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout)


def test_stream_pump_file_source(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    _write_messages(src, 0, 20)

    messages = file_message_stream(spark, str(src))
    q = start_stream_pump(
        spark, messages, str(out), str(ckpt), trigger_secs=1
    )
    _run_until_complete(q)

    raw = spark.read.parquet(str(out / "raw_message"))
    flat = spark.read.parquet(str(out / "json_message"))
    assert raw.count() == 20
    assert flat.count() == 40  # 2 records per message
    assert set(raw.columns) == {
        "mid",
        "topic",
        "payload",
        "collect_datetime",
        "collect_date",
    }
    # mid: 8-char base-36 uppercase, unique (data_processor.go:24-32 parity)
    mids = [r["mid"] for r in raw.select("mid").collect()]
    assert all(len(m) == 8 for m in mids)
    assert len(set(mids)) == 20
    # flattened side carries key_id + flattened leaf k
    assert {"key_id", "k", "mid"} <= set(flat.columns)

    # restart with the same checkpoint + one new file: only the new data
    # lands (checkpointed source offsets -> effectively-once, the upgrade
    # over the reference's at-most-once, SURVEY.md SS2.6)
    _write_messages(src, 100, 5)
    q2 = start_stream_pump(
        spark, file_message_stream(spark, str(src)), str(out), str(ckpt),
        trigger_secs=1,
    )
    _run_until_complete(q2)
    assert spark.read.parquet(str(out / "raw_message")).count() == 25
    assert spark.read.parquet(str(out / "json_message")).count() == 50


def test_monitor_listener(spark, tmp_path):
    src = tmp_path / "src"
    _write_messages(src, 0, 10)
    published: list[tuple[str, str]] = []
    listener = PumpMonitorListener(
        lambda topic, payload: published.append((topic, payload))
    )
    spark.streams.addListener(listener)
    try:
        q = start_stream_pump(
            spark,
            file_message_stream(spark, str(src)),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            trigger_secs=1,
        )
        q.processAllAvailable()
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while not published and time.time() < deadline:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
    finally:
        spark.streams.removeListener(listener)
    assert published, "monitor published no metrics"
    topic, payload = published[0]
    assert topic == "pump-monitor/pump"
    metrics = json.loads(payload)
    assert {"SubMsgPerSec", "DpMsgPerSec", "AvgPeriodSubMsgPerSec",
            "BatchId"} <= set(metrics)


def test_monitor_stage_deltas(spark, tmp_path):
    """Reference stage-delta parity (monitor.go:120-136): the payload must
    carry the seven WaitFor* queue lags and the GapToDB/GapToDBCommit
    raw-vs-adapter divergence, computed from the dual-path counters."""
    from mqtt_message_pump_spark.streaming.monitor import PumpCounters

    from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader

    src = tmp_path / "src"
    _write_messages(src, 0, 10)
    counters = PumpCounters()
    # pipe status is driven by the SOURCE: loopback reads signal up on
    # subscribe and down on teardown (mqtt.go:128-150 -> PipeChan)
    class _LoopClient:
        on_message = None

        def subscribe(self, topic, qos=0):
            pass

        def loop_start(self):
            pass

        def loop_stop(self):
            pass

        def disconnect(self):
            pass

    reader = MqttStreamReader(
        {"group_num": "2", "poll_timeout_secs": "0.05"},
        client_factory=lambda o: _LoopClient(),
        pipe_signal=counters.pipe_signal,
    )
    for p in reader.partitions({"0": 0, "1": 0}, {"0": 0, "1": 0}):
        list(reader.read(p))
    assert counters.pipe_up_events == 2 and counters.pipe_down_events == 2
    published: list[tuple[str, str]] = []
    listener = PumpMonitorListener(
        lambda topic, payload: published.append((topic, payload)),
        counters=counters,
    )
    spark.streams.addListener(listener)
    try:
        q = start_stream_pump(
            spark,
            file_message_stream(spark, str(src)),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            trigger_secs=1,
            counters=counters,
        )
        q.processAllAvailable()
        deadline = time.time() + 30
        while not published and time.time() < deadline:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
    finally:
        spark.streams.removeListener(listener)

    # the foreachBatch commits updated every stage counter
    assert counters.dp_succeed == 10
    assert counters.rdo_commit_succeed == 10
    assert counters.ado_commit_succeed == 20  # 2 records per message
    # raw-vs-flat gap derives from the dual-path counts
    assert counters.gap_info() == {"GapToDB": -10, "GapToDBCommit": -10}
    wait = counters.queue_wait_info()
    assert set(wait) == {
        "WaitForProcess",
        "WaitForRawDataObjectToDB",
        "WaitForRawDataObjectToDBCommit",
        "WaitForAdapter",
        "WaitForProcessDataObject",
        "WaitForAdapterDataObjectToDB",
        "WaitForAdapterDataObjectToDBCommit",
    }
    # steady state: nothing in flight between stages on the raw path
    assert wait["WaitForRawDataObjectToDB"] == 0
    assert wait["WaitForRawDataObjectToDBCommit"] == 0
    assert wait["WaitForAdapter"] == 0

    # at least one published payload carries the stage-delta sections
    payloads = [json.loads(p) for _, p in published]
    with_perf = [p for p in payloads if "PerformanceMetrics" in p]
    assert with_perf, "no payload carried PerformanceMetrics"
    perf = with_perf[-1]["PerformanceMetrics"]
    assert set(perf) == {"QueueWaitInfo", "GapBetweenRawAndAdapterInfo"}
    assert set(perf["QueueWaitInfo"]) == set(wait)
    assert set(perf["GapBetweenRawAndAdapterInfo"]) == {
        "GapToDB",
        "GapToDBCommit",
    }
    # pipe up/down counts from the source reach the payload
    # (monitor.go:148-149,250-255 PipeNum surface)
    pipe = with_perf[-1]["PipeStatusInfo"]
    assert pipe == {"PipeNum": 0, "PipeUpEvents": 2, "PipeDownEvents": 2}
    # monitor self-status counters are present and consistent with the
    # publish log (reference MonPubSucceed/MonPubFailed)
    last = payloads[-1]
    assert last["MonPubFailed"] == 0
    assert last["MonPubSucceed"] == len(payloads) - 1


def test_mqtt_source_gated():
    from mqtt_message_pump_spark.sources import mqtt

    # module must import cleanly without paho; capability is reported
    assert isinstance(mqtt.mqtt_available(), bool)
    if not mqtt.mqtt_available():
        with pytest.raises(ImportError):
            mqtt.register_mqtt_source(None)


def test_keyed_lifetime_counters(spark, tmp_path):
    """Counters must accumulate ACROSS micro-batches (keyed state survives
    triggers and restarts via the checkpoint)."""
    from mqtt_message_pump_spark.streaming.stateful import (
        keyed_lifetime_counters,
    )

    src = tmp_path / "src"
    out = tmp_path / "out"
    _write_messages(src, 0, 9)  # 3 msgs per topic (i % 3)

    def run_once():
        counters = keyed_lifetime_counters(
            file_message_stream(spark, str(src))
        )
        def append_batch(batch_df, batch_id):
            batch_df.write.mode("append").parquet(str(out))

        q = (
            counters.writeStream.foreachBatch(append_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        _run_until_complete(q)

    run_once()
    first = {
        r["topic"]: r["lifetime_msgs"]
        for r in spark.read.parquet(str(out)).collect()
    }
    assert first == {"pump/topic0": 3, "pump/topic1": 3, "pump/topic2": 3}

    # second file: state picks up where the checkpoint left off
    _write_messages(src, 100, 6)  # 2 more per topic
    run_once()
    latest = (
        spark.read.parquet(str(out))
        .groupBy("topic")
        .agg(F.max("lifetime_msgs").alias("m"))
    )
    got = {r["topic"]: r["m"] for r in latest.collect()}
    assert got == {"pump/topic0": 5, "pump/topic1": 5, "pump/topic2": 5}


def test_dedupe_redeliveries(spark, tmp_path):
    """QoS-1 redelivery simulation: the same wire messages delivered twice
    (across micro-batches) must land exactly once in the sinks."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    _write_messages(src, 0, 10)

    q = start_stream_pump(
        spark, file_message_stream(spark, str(src)), str(out), str(ckpt),
        trigger_secs=1, dedupe_watermark="10 minutes",
    )
    _run_until_complete(q)

    # redeliver the identical messages in a new file (same topic/payload/
    # received_time -> same content-derived mid)
    import shutil

    shutil.copy(src / "batch_0.json", src / "redelivery.json")
    q = start_stream_pump(
        spark, file_message_stream(spark, str(src)), str(out), str(ckpt),
        trigger_secs=1, dedupe_watermark="10 minutes",
    )
    _run_until_complete(q)

    raw = spark.read.parquet(str(out / "raw_message"))
    assert raw.count() == 10, "redelivered duplicates must be dropped"
    assert raw.select("mid").distinct().count() == 10


def test_keyed_ewma_stream_matches_batch_fold(spark, tmp_path):
    """Streaming EWMA across two checkpointed runs must equal the batch
    applyInPandas fold over the full ordered history."""
    import json as _json

    from mqtt_message_pump_spark.streaming.stateful import keyed_ewma

    src = tmp_path / "esrc"
    out = tmp_path / "eout"
    src.mkdir()
    rows = [
        {"user_id": u, "event_id": 10 * b + i, "ts": f"2024-01-01 00:0{b}:{i:02d}", "value": float(u + b + i) / 3.0}
        for b in range(2)
        for u in (1, 2, 3)
        for i in range(3)
    ]
    schema = "user_id long, event_id long, ts timestamp, value double"

    def run_batch_files(batch_rows, name):
        (src / name).write_text(
            "\n".join(_json.dumps(r) for r in batch_rows)
        )
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            keyed_ewma(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(str(out))
            )
            .option("checkpointLocation", str(tmp_path / "eckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        _run_until_complete(q)

    early = [r for r in rows if r["event_id"] < 10]
    late = [r for r in rows if r["event_id"] >= 10]
    run_batch_files(early, "b0.json")
    run_batch_files(late, "b1.json")

    final = {
        r.user_id: (r.ewma, r.n_events)
        for r in spark.read.parquet(str(out))
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "ewma")).alias("s"))
        .select("user_id", "s.ewma", "s.n_events")
        .collect()
    }
    # driver replay of the full ordered fold
    for u in (1, 2, 3):
        state, n = None, 0
        for r in sorted(
            (r for r in rows if r["user_id"] == u),
            key=lambda r: (r["ts"], r["event_id"]),
        ):
            state = r["value"] if state is None else 0.5 * state + 0.5 * r["value"]
            n += 1
        assert final[u] == (state, n)


def test_capacity_report_format(spark):
    """Startup capacity line (metrics.go:28-36 parity): one formatted
    report carrying the pump's capacity knobs."""
    from mqtt_message_pump_spark.config import PumpConfig
    from mqtt_message_pump_spark.streaming.monitor import capacity_report

    line = capacity_report(spark, PumpConfig())
    assert "Capacity Metrics" in line
    for knob in (
        "TriggerSecs:[5]",
        "MaxBatchItems:[64]",
        "MonitorIntervalSecs:[5]",
        "ShufflePartitions:[",
        "DefaultParallelism:[",
    ):
        assert knob in line


def test_keyed_ewma_multi_chunk_order(spark, tmp_path):
    """A key whose trigger slice spans multiple Arrow chunks must still
    fold in (ts, event_id) order (chunks are concatenated before the
    sort, not sorted independently)."""
    import json as _json

    from mqtt_message_pump_spark.streaming.stateful import keyed_ewma

    src = tmp_path / "msrc"
    out = tmp_path / "mout"
    src.mkdir()
    vals = [float(v) for v in (9, 1, 7, 3, 5, 2, 8, 4)]
    rows = [
        {"user_id": 1, "event_id": i, "ts": f"2024-01-01 00:00:{i:02d}", "value": v}
        for i, v in enumerate(vals)
    ]
    (src / "b0.json").write_text("\n".join(_json.dumps(r) for r in rows))
    orig = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = spark.readStream.schema(
            "user_id long, event_id long, ts timestamp, value double"
        ).json(str(src))
        q = (
            keyed_ewma(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(str(out))
            )
            .option("checkpointLocation", str(tmp_path / "mckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        _run_until_complete(q)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", orig)
    state = vals[0]
    for v in vals[1:]:
        state = 0.5 * state + 0.5 * v
    [row] = spark.read.parquet(str(out)).collect()
    assert (row.user_id, row.n_events, row.ewma) == (1, len(vals), state)


def test_keyed_transitions_stream_matches_batch(spark, tmp_path):
    """Transition increments summed across two checkpointed runs must
    equal the batch matrix over the full per-user ordered history --
    including the transitions that straddle the restart boundary."""
    import json as _json
    from collections import Counter, defaultdict

    from mqtt_message_pump_spark.streaming.stateful import keyed_transitions

    src = tmp_path / "tsrc"
    out = tmp_path / "tout"
    src.mkdir()
    types = ["view", "click", "purchase", "view", "click", "error"]
    rows = [
        {
            "user_id": u,
            "event_id": 10 * b + i,
            "ts": f"2024-01-01 00:0{b}:{i:02d}",
            "event_type": types[(u + b + i) % len(types)],
        }
        for b in range(2)
        for u in (1, 2, 3)
        for i in range(3)
    ]
    schema = "user_id long, event_id long, ts timestamp, event_type string"

    def run_files(batch_rows, name):
        (src / name).write_text(
            "\n".join(_json.dumps(r) for r in batch_rows)
        )
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            keyed_transitions(stream)
            .writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(str(out))
            )
            .option("checkpointLocation", str(tmp_path / "tckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        _run_until_complete(q)

    run_files([r for r in rows if r["event_id"] < 10], "b0.json")
    run_files([r for r in rows if r["event_id"] >= 10], "b1.json")

    got: Counter = Counter()
    for r in spark.read.parquet(str(out)).collect():
        got[(r.src, r.dst)] += r.n

    seqs = defaultdict(list)
    for r in rows:
        seqs[r["user_id"]].append((r["event_id"], r["event_type"]))
    want: Counter = Counter()
    for evs in seqs.values():
        evs.sort()
        for (_, a), (_, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1
    assert got == want
    assert sum(want.values()) == 3 * 5  # 6 events/user -> 5 transitions


def test_monitor_topic_slash_flattening():
    """Reference parity (mqtt.go:93-94): the monitor publish topic is
    ``<monitor_root>/<target>`` where EVERY '/' inside the target segment
    (source topic root + prefix) becomes '_' -- a slashed source topic
    must publish to one flattened monitor level, not a nested hierarchy."""
    listener = PumpMonitorListener(
        lambda topic, payload: None,
        topic_root="Pump_Monitor",
        target="JSON_Simulator/Json_Tile/",
    )
    assert listener.topic == "Pump_Monitor/JSON_Simulator_Json_Tile_"


def test_incremental_pq_encode_matches_batch(spark, tmp_path):
    """Streaming PQ encoding with a frozen codebook must produce exactly
    the codes the batch encoder assigns to the same vectors -- the
    invariant that makes incrementally-appended codes unionable with the
    existing index (same codebook => same code space)."""
    import json as _json

    from mqtt_message_pump_spark.operators import similarity as SIM
    from mqtt_message_pump_spark.plans.registry import table
    from mqtt_message_pump_spark.streaming.vectors import (
        start_pq_encode_stream,
    )

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    books = SIM.pq_train_codebooks(emb, "embedding", m=8, nbits=4)
    incoming = emb.filter(F.col("vec_id") < 40)

    # serve the "new" vectors as two JSON file batches
    src = tmp_path / "vecs"
    src.mkdir()
    rows = incoming.collect()
    for name, chunk in (("b0.json", rows[:20]), ("b1.json", rows[20:])):
        with open(src / name, "w") as fh:
            for r in chunk:
                fh.write(
                    _json.dumps(
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
    out = tmp_path / "codes"
    q = start_pq_encode_stream(
        stream, books, str(out), str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = {
        (r["vec_id"], r["sub_id"]): r["code"]
        for r in spark.read.parquet(str(out)).collect()
    }
    want = {
        (r["vec_id"], r["sub_id"]): r["code"]
        for r in SIM.pq_encode(
            incoming, books, "vec_id", "embedding", m=8
        ).collect()
    }
    assert got == want
    assert len(got) == 40 * 8


def test_incremental_pq_encode_replay_is_idempotent(spark, tmp_path):
    """Replaying the same micro-batches into the same output (checkpoint
    lost, stream restarted from scratch) must not duplicate codes: each
    batch overwrites its own batch=<id> directory."""
    import json as _json
    import shutil

    from mqtt_message_pump_spark.operators import similarity as SIM
    from mqtt_message_pump_spark.plans.registry import table
    from mqtt_message_pump_spark.streaming.vectors import (
        start_pq_encode_stream,
    )

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    books = SIM.pq_train_codebooks(emb, "embedding", m=8, nbits=4)
    src = tmp_path / "vecs"
    src.mkdir()
    with open(src / "b0.json", "w") as fh:
        for r in emb.filter(F.col("vec_id") < 20).collect():
            fh.write(
                _json.dumps(
                    {
                        "vec_id": r["vec_id"],
                        "embedding": [float(x) for x in r["embedding"]],
                    }
                )
                + "\n"
            )
    out = tmp_path / "codes"

    def run_once():
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = start_pq_encode_stream(
            stream, books, str(out), str(tmp_path / "ckpt")
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run_once()
    # lose the checkpoint -> a restart replays batch 0 into the same dir
    shutil.rmtree(tmp_path / "ckpt")
    run_once()
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 20 * 8, "replayed batch duplicated codes"


def test_monitor_counts_late_rows_dropped_at_watermark(spark, tmp_path):
    """Late-data accounting (the engine's only otherwise-uncounted loss
    path -- the reference counts failed-parse and failed-insert,
    ``monitor.go:191-260``): a straggler behind the event-time watermark
    is dropped from the windowed aggregation SILENTLY by Spark; the
    monitor listener must surface it -- ``LateRowsDropped`` (per batch)
    and ``LateRowsDroppedTotal`` (lifetime) in the published JSON, summed
    from the state operators' ``numRowsDroppedByWatermark``."""
    from mqtt_message_pump_spark.streaming.pump import windowed_rates

    src = tmp_path / "src"

    def write_wire(rows):
        src.mkdir(parents=True, exist_ok=True)
        name = f"f{len(list(src.iterdir()))}.json"
        (src / name).write_text(
            "\n".join(
                json.dumps({"topic": t, "payload": p, "received_time": ts})
                for t, p, ts in rows
            )
        )

    published: list[str] = []
    listener = PumpMonitorListener(
        lambda topic, payload: published.append(payload)
    )
    write_wire([("a", "x", "2024-01-01T00:00:01.000Z")])
    stream = windowed_rates(
        file_message_stream(spark, str(src)),
        interval_secs=5,
        watermark="10 seconds",
    )

    def run_once():
        q = (
            stream.writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.streams.addListener(listener)
    try:
        run_once()
        # advance the watermark far past the first window ...
        write_wire([("a", "y", "2024-01-01T01:00:00.000Z")])
        run_once()
        # ... then inject the straggler: one row an hour behind it
        write_wire([("a", "z", "2024-01-01T00:00:03.000Z")])
        run_once()
        deadline = time.time() + 30
        while time.time() < deadline:
            if any(
                json.loads(p).get("LateRowsDroppedTotal", 0) > 0
                for p in published
            ):
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    metrics = [json.loads(p) for p in published]
    assert all("LateRowsDropped" in m for m in metrics)  # always present
    dropped = [m for m in metrics if m["LateRowsDropped"] > 0]
    assert dropped, "straggler drop never surfaced in the monitor payload"
    assert dropped[0]["LateRowsDropped"] == 1
    assert max(m["LateRowsDroppedTotal"] for m in metrics) == 1
