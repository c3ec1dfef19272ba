"""Sink DDL/writer tests + watermarked streaming rates."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from mqtt_message_pump_spark.config import StoreConf
from mqtt_message_pump_spark.functions.inference import infer_flat_schema
from mqtt_message_pump_spark.sinks import (
    adapter_table_ddl,
    adapter_table_ddl_clickhouse,
    jdbc_table_name,
    raw_table_ddl,
    raw_table_ddl_clickhouse,
    write_append,
    write_table,
)
from mqtt_message_pump_spark.sources.testing import file_message_stream
from mqtt_message_pump_spark.streaming.pump import windowed_rates

SAMPLE = '{"1": {"command": "c", "params": {"key": "ut", "value": 5}}}'


def test_ddl_generation():
    store = StoreConf(database="pumpdb")
    raw = raw_table_ddl(store)
    assert "pumpdb.Raw_Message" in raw
    assert "PARTITIONED BY (collect_date)" in raw
    cols = infer_flat_schema(SAMPLE)
    adapter = adapter_table_ddl(store, cols)
    assert "`params_value` DOUBLE" in adapter
    assert "`key_id` STRING" in adapter
    assert "pumpdb.Json_Message" in adapter


def test_clickhouse_ddl_passthrough():
    """jdbc targets get real MergeTree DDL (data_dbstore.go:127-142):
    legacy engine signature (date col, primary key tuple, granularity) and
    the MATERIALIZED toDate partition column."""
    store = StoreConf(format="jdbc", database="pumpdb")
    raw = raw_table_ddl_clickhouse(store)
    assert "pumpdb.Raw_Message" in raw
    assert (
        "ENGINE = MergeTree(collect_date, (mid, topic, collect_date), 8192)"
        in raw
    )
    assert "mid String COMMENT 'message id'" in raw
    assert "collect_date Date MATERIALIZED toDate(collect_datetime)" in raw

    cols = [("key_id", "String"), ("params_value", "Float64")]
    adapter = adapter_table_ddl_clickhouse(store, cols)
    assert "pumpdb.Json_Message" in adapter
    assert ", params_value Float64" in adapter  # unquoted, as the reference
    assert "ENGINE = MergeTree(collect_date, (mid, collect_date), 8192)" in adapter


def test_write_table_jdbc_resolves_table_from_config(spark, monkeypatch):
    """The jdbc branch writes to database.table from StoreConf -- never the
    filesystem path argument (which is not a valid JDBC identifier)."""
    from pyspark.sql.readwriter import DataFrameWriter

    calls = {}

    def fake_jdbc(self, url, table, mode=None, properties=None):
        calls["url"] = url
        calls["table"] = table

    monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc)
    store = StoreConf(
        format="jdbc",
        url="jdbc:clickhouse://ch:8123/pumpdb",
        database="pumpdb",
    )
    df = spark.createDataFrame(
        [("A1", "t/a", "p")], "mid string, topic string, payload string"
    )
    write_table(df, store, "/tmp/out/raw_message", store.raw_table_name)
    assert calls["url"] == "jdbc:clickhouse://ch:8123/pumpdb"
    assert calls["table"] == "pumpdb.Raw_Message"
    assert jdbc_table_name(store, None) == "pumpdb.Raw_Message"
    assert jdbc_table_name(store, "Json_Message") == "pumpdb.Json_Message"


def test_write_append_clusters_by_date(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("m1", "t/a", "p", "2024-01-01 00:00:01"),
            ("m2", "t/b", "p", "2024-01-02 00:00:01"),
            ("m3", "t/a", "p", "2024-01-01 09:00:01"),
        ],
        ["mid", "topic", "payload", "collect_datetime"],
    ).withColumn("collect_date", F.to_date("collect_datetime"))
    out = str(tmp_path / "raw")
    write_append(df, StoreConf(), out)
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert {str(r["collect_date"]) for r in back.collect()} == {
        "2024-01-01",
        "2024-01-02",
    }


def _write_wire(dir_path, rows):
    dir_path.mkdir(parents=True, exist_ok=True)
    name = f"f{len(list(dir_path.iterdir()))}.json"
    (dir_path / name).write_text(
        "\n".join(
            json.dumps(
                {"topic": t, "payload": p, "received_time": ts}
            )
            for t, p, ts in rows
        )
    )


def test_windowed_rates_batch_and_late_data(spark, tmp_path):
    """Batch mode: windows partition by event time.  Streaming mode with a
    watermark: a row later than the watermark bound is dropped, one inside
    the bound still lands in its true window."""
    src = tmp_path / "src"
    _write_wire(
        src,
        [
            ("a", "x" * 6, "2024-01-01T00:00:01.000Z"),
            ("a", "x" * 6, "2024-01-01T00:00:02.000Z"),
            ("a", "x" * 6, "2024-01-01T00:00:07.000Z"),
        ],
    )
    batch = spark.read.schema(
        "topic string, payload string, received_time timestamp"
    ).json(str(src))
    rows = {
        (str(r["window_start"]), r["n_msgs"], r["msgs_per_sec"])
        for r in windowed_rates(batch, interval_secs=5).collect()
    }
    assert rows == {
        ("2024-01-01 00:00:00", 2, 0.4),
        ("2024-01-01 00:00:05", 1, 0.2),
    }

    # streaming with watermark: feed a second file whose max event time
    # advances the watermark far past the first windows, then a third file
    # with a too-late row -> dropped from state
    out = []

    def sink(batch_df, batch_id):
        out.extend(batch_df.collect())

    stream = windowed_rates(
        file_message_stream(spark, str(src)),
        interval_secs=5,
        watermark="10 seconds",
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    _write_wire(src, [("a", "y", "2024-01-01T01:00:00.000Z")])  # advance wm
    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    _write_wire(src, [("a", "z", "2024-01-01T00:00:03.000Z")])  # too late
    before = len(out)
    q = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    late_emissions = [
        r for r in out[before:] if str(r["window_start"]).startswith("2024-01-01 00:00:00")
    ]
    assert late_emissions == [], "late row beyond watermark must be dropped"


def _ts_payload(t1: str, t2: str) -> str:
    return (
        '{"r1":{"k":1,"ts":"' + t1 + '"},"r2":{"k":1,"ts":"' + t2 + '"}}'
    )


def test_event_time_rates_stream_matches_batch(spark, tmp_path):
    """The opt-in event-time path (SURVEY SS1.1 upgrade): windows group by
    the payload's embedded per-record ts (earliest record), NOT arrival --
    batch and streaming produce the same windows, and in streaming a row
    whose EVENT time is behind the watermark is dropped even though its
    arrival is fresh (true event-time semantics)."""
    from mqtt_message_pump_spark.streaming.pump import with_event_time

    src = tmp_path / "src"
    # arrival one hour after generation; r2 one second after r1; one
    # message with no parseable field -> falls back to received_time
    _write_wire(
        src,
        [
            ("a", _ts_payload("2024-01-01T00:00:01", "2024-01-01T00:00:02"),
             "2024-01-01T01:00:00.000Z"),
            ("a", _ts_payload("2024-01-01T00:00:02", "2024-01-01T00:00:03"),
             "2024-01-01T01:00:01.000Z"),
            ("a", _ts_payload("2024-01-01T00:00:07", "2024-01-01T00:00:08"),
             "2024-01-01T01:00:02.000Z"),
            ("a", '{"r1":{"k":1}}', "2024-01-01T02:00:00.000Z"),
        ],
    )
    batch = spark.read.schema(
        "topic string, payload string, received_time timestamp"
    ).json(str(src))
    expect = {
        ("2024-01-01 00:00:00", 2, 0.4),
        ("2024-01-01 00:00:05", 1, 0.2),
        ("2024-01-01 02:00:00", 1, 0.2),  # fallback row windows on arrival
    }
    got = {
        (str(r["window_start"]), r["n_msgs"], r["msgs_per_sec"])
        for r in windowed_rates(
            with_event_time(batch, "ts"),
            interval_secs=5,
            time_col="event_time",
        ).collect()
    }
    assert got == expect

    out = []
    stream = windowed_rates(
        with_event_time(file_message_stream(spark, str(src)), "ts"),
        interval_secs=5,
        watermark="10 seconds",
        time_col="event_time",
    )

    def run_once():
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _id: out.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert {
        (str(r["window_start"]), r["n_msgs"], r["msgs_per_sec"]) for r in out
    } == expect

    # fresh ARRIVAL, stale EVENT time (behind the watermark, which the
    # fallback row advanced to 01:59:50) -> dropped from state
    _write_wire(
        src,
        [("a", _ts_payload("2024-01-01T00:00:03", "2024-01-01T00:00:04"),
          "2024-01-01T02:00:01.000Z")],
    )
    before = len(out)
    run_once()
    assert [
        r for r in out[before:]
        if str(r["window_start"]).startswith("2024-01-01 00:00:00")
    ] == [], "stale-event-time row beyond watermark must be dropped"


def test_pump_event_time_field_rides_both_sinks(spark, tmp_path):
    """start_stream_pump(event_time_field=...) parses the payload ts and
    lands an event_time column in BOTH sink tables while collect_datetime
    stays processing-time (reference parity)."""
    from mqtt_message_pump_spark.streaming.pump import start_stream_pump

    src = tmp_path / "src"
    _write_wire(
        src,
        [
            ("a", _ts_payload("2024-01-01T00:00:01", "2024-01-01T00:00:02"),
             "2024-01-01T01:00:00.000Z"),
            ("b", _ts_payload("2024-01-01T00:00:06", "2024-01-01T00:00:07"),
             "2024-01-01T01:00:01.000Z"),
        ],
    )
    q = start_stream_pump(
        spark,
        file_message_stream(spark, str(src)),
        str(tmp_path / "out"),
        str(tmp_path / "pckpt"),
        trigger_secs=1,
        event_time_field="ts",
    )
    deadline = time.time() + 60
    while time.time() < deadline:
        if (tmp_path / "out" / "json_message").exists():
            try:
                if spark.read.parquet(
                    str(tmp_path / "out" / "json_message")
                ).count() == 4:
                    break
            except Exception:
                pass
        time.sleep(0.5)
    q.stop()
    raw = spark.read.parquet(str(tmp_path / "out" / "raw_message"))
    flat = spark.read.parquet(str(tmp_path / "out" / "json_message"))
    assert "event_time" in raw.columns and "event_time" in flat.columns
    by_topic = {r["topic"]: r for r in raw.collect()}
    assert str(by_topic["a"]["event_time"]) == "2024-01-01 00:00:01"
    assert str(by_topic["b"]["event_time"]) == "2024-01-01 00:00:06"
    # processing-time column untouched by the opt-in
    assert str(by_topic["a"]["collect_datetime"]).startswith(
        "2024-01-01 01:00:00"
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on the join key must join with ZERO shuffles:
    the write-time bucketing pre-pays the exchange."""
    import contextlib
    import io

    from mqtt_message_pump_spark.sinks import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], num_buckets=8,
        sort_cols=["l_orderkey"],
    )
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # disable broadcast so the join strategy is the bucketed SMJ/SHJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "Exchange" not in plan, plan
            assert joined.count() > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_write_training_shards_layout(spark, sf_dir, tmp_path):
    """Packed corpus lands as one directory per shard; within a shard,
    sequences are contiguous and every doc keeps its packed seq_id."""
    import pyspark.sql.functions as F

    from mqtt_message_pump_spark.plans import QUERIES
    from mqtt_message_pump_spark.plans.registry import table
    from mqtt_message_pump_spark.sinks import write_training_shards

    out = str(tmp_path / "shards")
    docs = table(spark, sf_dir, "documents")
    write_training_shards(docs, out)

    written = spark.read.parquet(out)
    assert set(written.columns) >= {"doc_id", "seq_id", "n_tok", "text", "shard"}
    expected = {
        (r.doc_id, r.shard, r.seq_id)
        for r in QUERIES["q_pack_sequences"](spark, sf_dir).collect()
    }
    got = {
        (r.doc_id, r.shard, r.seq_id)
        for r in written.select("doc_id", "shard", "seq_id").collect()
    }
    assert got == expected
    # physical layout: hive-partitioned by shard
    shards = {r.shard for r in written.select("shard").distinct().collect()}
    import os

    dirs = {d for d in os.listdir(out) if d.startswith("shard=")}
    assert dirs == {f"shard={s}" for s in shards}


def test_append_batch_idempotent_replay(spark, tmp_path):
    """Replaying the SAME batch id must not duplicate sink rows (the
    stop-between-sink-write-and-checkpoint-commit case), a later batch
    must append, and a replay of batch 0 must leave batch 1's rows
    alone.  Layout stays a plain date-partitioned parquet dir: no extra
    partition column, no staging dirs left behind."""
    import os

    from pyspark.sql import functions as F

    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import write_append

    out = str(tmp_path / "raw_message")
    store = StoreConf()

    def frame(ids):
        return spark.createDataFrame(
            [(f"m{i}", "t", "p") for i in ids], ["mid", "topic", "payload"]
        ).select(
            "*",
            F.to_timestamp(F.lit("2024-01-02 03:04:05")).alias(
                "collect_datetime"
            ),
            F.to_date(F.lit("2024-01-02")).alias("collect_date"),
        )

    write_append(frame(range(10)), store, out, batch_id=0)
    write_append(frame(range(10)), store, out, batch_id=0)  # replay
    assert spark.read.parquet(out).count() == 10

    write_append(frame(range(10, 15)), store, out, batch_id=1)
    assert spark.read.parquet(out).count() == 15
    write_append(frame(range(10)), store, out, batch_id=0)  # late replay
    df = spark.read.parquet(out)
    assert df.count() == 15
    assert set(df.columns) == {
        "mid", "topic", "payload", "collect_datetime", "collect_date",
    }
    # no staging leftovers; files carry their batch prefix
    names = os.listdir(f"{out}/collect_date=2024-01-02")
    assert not any(n.startswith("_stage") for n in os.listdir(out))
    data = [n for n in names if n.endswith(".parquet")]
    assert data and all(n.startswith(("b0-", "b1-")) for n in data)


def test_append_batch_epoch_scopes_replay_sweep(spark, tmp_path):
    """Checkpoint-reset-over-kept-sink: batch ids restart at 0 under a
    NEW epoch, and the new run's batch-0 sweep must NOT delete the old
    epoch's committed batch-0 files (r9 review finding) -- while a
    replay under the SAME epoch still sweeps its own prior attempt."""
    from pyspark.sql import functions as F

    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import write_append

    out = str(tmp_path / "raw_message")
    store = StoreConf()

    def frame(ids):
        return spark.createDataFrame(
            [(f"m{i}", "t", "p") for i in ids], ["mid", "topic", "payload"]
        ).select(
            "*",
            F.to_timestamp(F.lit("2024-01-02 03:04:05")).alias(
                "collect_datetime"
            ),
            F.to_date(F.lit("2024-01-02")).alias("collect_date"),
        )

    write_append(frame(range(10)), store, out, batch_id=0, epoch="e1")
    # same epoch, same batch -> replay sweep: still 10
    write_append(frame(range(10)), store, out, batch_id=0, epoch="e1")
    assert spark.read.parquet(out).count() == 10
    # NEW epoch (checkpoint reset), batch ids restart at 0: appends,
    # never sweeps the old epoch's files
    write_append(frame(range(100, 105)), store, out, batch_id=0, epoch="e2")
    assert spark.read.parquet(out).count() == 15


def test_append_batch_sweeps_unscoped_prior_attempt(spark, tmp_path):
    """Epoch transiently unreadable on the FIRST attempt of a batch ->
    that attempt wrote unscoped ``b<id>-`` files; the replay (epoch now
    readable) must sweep them too, or every row of the batch duplicates
    (ADVICE r9).  Other batches -- scoped or unscoped -- stay intact."""
    from pyspark.sql import functions as F

    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import write_append

    out = str(tmp_path / "raw_message")
    store = StoreConf()

    def frame(ids):
        return spark.createDataFrame(
            [(f"m{i}", "t", "p") for i in ids], ["mid", "topic", "payload"]
        ).select(
            "*",
            F.to_timestamp(F.lit("2024-01-02 03:04:05")).alias(
                "collect_datetime"
            ),
            F.to_date(F.lit("2024-01-02")).alias("collect_date"),
        )

    # batch 0 committed earlier under the epoch; batch 1's first attempt
    # hit the unreadable-metadata race and wrote UNSCOPED files
    write_append(frame(range(10)), store, out, batch_id=0, epoch="e1")
    write_append(frame(range(10, 15)), store, out, batch_id=1, epoch=None)
    assert spark.read.parquet(out).count() == 15
    # crash-replay of batch 1, epoch now readable: must sweep the
    # unscoped b1-* leftovers, keep batch 0, land exactly 5 new rows
    write_append(frame(range(10, 15)), store, out, batch_id=1, epoch="e1")
    df = spark.read.parquet(out)
    assert df.count() == 15
    assert df.filter(df.mid.isin("m0", "m9")).count() == 2  # batch 0 intact
    # and the unscoped sweep must not eat a DIFFERENT unscoped batch
    write_append(frame(range(20, 22)), store, out, batch_id=10, epoch=None)
    write_append(frame(range(10, 15)), store, out, batch_id=1, epoch="e1")
    assert spark.read.parquet(out).count() == 17
