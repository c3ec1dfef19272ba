"""CLI parity tests: show / check / run against a reference-style INI."""

from __future__ import annotations

import json

import pytest

from mqtt_message_pump_spark.cli import main

# the canonical sample from the reference example config
# (docker/2020.01.28/conf/pump-plus-emqx-example.ini:66)
SAMPLE = json.dumps(
    {
        "1": {
            "command": "property.publish",
            "params": {
                "thingKey": "545420B443E8455335363335520C6E6B",
                "ts": "2020-01-05T20:31:00Z",
                "key": "ut",
                "value": 564,
            },
        },
        "2": {
            "command": "property.publish",
            "params": {
                "thingKey": "545420B443E8455335363335520C7777",
                "ts": "2020-01-06T21:31:00Z",
                "key": "ut",
                "value": 128,
            },
        },
    }
)


@pytest.fixture
def ini(tmp_path):
    out = tmp_path / "out"
    path = tmp_path / "pump.ini"
    path.write_text(
        "[source-mqtt]\n"
        "server = tcp://127.0.0.1:1883\n"
        "qos = 1\n"
        "[topic]\n"
        "topicroot = JSON_Simulator/\n"
        "topicprefix = SimTest\n"
        "[store]\n"
        f"path = {out}\n"
        "rawtablename = Raw_Message\n"
        "adaptertablename = Json_Message\n"
        "[adapter]\n"
        f"jsonsample = {SAMPLE}\n"
        "[batch]\n"
        "commitinterval = 1\n"
    )
    return path


def test_show(ini, capsys):
    assert main(["show", str(ini)]) == 0
    out = capsys.readouterr().out
    assert "topic_root = JSON_Simulator/" in out
    assert "qos = 1" in out


def test_check_golden_columns(spark, ini, capsys):
    """The inferred column line must match the reference's golden log
    (release_20120128/readme.txt:40)."""
    assert main(["check", str(ini)]) == 0
    out = capsys.readouterr().out
    assert (
        "command String, key_id String, params_key String, "
        "params_thingKey String, params_ts String, params_value Float64"
        in out
    )
    assert "2 flattened row(s)" in out
    assert "check: OK" in out


def test_run_file_source(spark, ini, tmp_path, capsys):
    src = tmp_path / "drop"
    src.mkdir()
    msgs = [
        json.dumps(
            {
                "topic": "JSON_Simulator/SimTest/0",
                "payload": SAMPLE,
                "received_time": "2024-01-01T00:00:01.000Z",
            }
        )
        for _ in range(3)
    ]
    (src / "m.json").write_text("\n".join(msgs))
    assert (
        main(
            [
                "run",
                str(ini),
                "--source-dir",
                str(src),
                "--duration-secs",
                "8",
            ]
        )
        == 0
    )
    out_dir = tmp_path / "out"
    raw = spark.read.parquet(str(out_dir / "raw_message"))
    flat = spark.read.parquet(str(out_dir / "json_message"))
    assert raw.count() == 3
    # two records per sample payload, flattened
    assert flat.count() == 6
    assert "params_thingKey" in flat.columns


def test_run_live_broker_end_to_end(spark, tmp_path):
    """``run`` against a real broker, no --source-dir: the reference's
    deployment shape (``main.go:139-176``) -- source messages consumed
    over MQTT (pure-python client fallback), sinks written, and monitor
    metrics JSON published to the [monitor-mqtt] broker where a wire
    subscriber receives them."""
    import threading
    import time

    from mqtt_message_pump_spark.sources.minimqtt import (
        MiniBroker,
        MiniMqttClient,
    )

    broker = MiniBroker()
    out = tmp_path / "out"
    ini = tmp_path / "live.ini"
    ini.write_text(
        "[source-mqtt]\n"
        f"server = tcp://127.0.0.1:{broker.port}\n"
        "qos = 1\n"
        "[monitor-mqtt]\n"
        f"server = tcp://127.0.0.1:{broker.port}\n"
        "[topic]\n"
        "topicroot = pump/\n"
        "topicprefix = g\n"
        "[store]\n"
        f"path = {out}\n"
        "[adapter]\n"
        f"jsonsample = {SAMPLE}\n"
        "[batch]\n"
        "commitinterval = 1\n"
    )
    mon_got: list = []
    sub = MiniMqttClient("127.0.0.1", broker.port, client_id="mon-watch")
    sub.on_message = lambda c, u, m: mon_got.append((m.topic, m.payload))
    sub.subscribe("pump-monitor/#", qos=0)

    def feed():
        assert broker.wait_for_subscription("pump/g/0", timeout=60)
        pub = MiniMqttClient("127.0.0.1", broker.port, client_id="feeder")
        for _ in range(3):
            pub.publish("pump/g/0", SAMPLE.encode(), qos=1)
        pub.disconnect()

    t = threading.Thread(target=feed, daemon=True)
    t.start()
    try:
        assert main(["run", str(ini), "--duration-secs", "20"]) == 0
        t.join(timeout=10)
    finally:
        sub.disconnect()
        broker.stop()

    raw = spark.read.parquet(str(out / "raw_message"))
    flat = spark.read.parquet(str(out / "json_message"))
    assert raw.count() == 3
    assert flat.count() == 6  # two records per sample payload
    assert "params_thingKey" in flat.columns
    # monitor metrics crossed the wire to the derived flattened topic
    assert mon_got, "no monitor publish received over MQTT"
    topic, payload = mon_got[0]
    assert topic == "pump-monitor/pump_g"
    assert b"AvgPeriodSubMsgPerSec" in payload


def test_maintain_compacts_and_vacuums_manifest_sinks(spark, tmp_path):
    """``pump maintain``: the maintenance-window entry point for
    manifest-protocol sinks -- compacts old batches, vacuums orphans,
    reports per-table row counts, contents unchanged."""
    import os

    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import read_sink, write_append
    from pyspark.sql import functions as F

    out = tmp_path / "out"
    store = StoreConf(commit_protocol="manifest")
    for sub in ("raw_message", "json_message"):
        for b in range(4):
            df = spark.createDataFrame(
                [(f"m{sub[:1]}{b}{i}", "t", "p", "2024-01-02") for i in range(3)],
                ["mid", "topic", "payload", "d"],
            ).select(
                "mid", "topic", "payload",
                F.to_timestamp("d").alias("collect_datetime"),
                F.to_date("d").alias("collect_date"),
            )
            write_append(df, store, str(out / sub), batch_id=b)

    ini = tmp_path / "pump.ini"
    ini.write_text(f"[store]\npath = {out}\n")
    assert main(["maintain", str(ini), "--keep-last", "1"]) == 0
    for sub in ("raw_message", "json_message"):
        assert read_sink(spark, str(out / sub)).count() == 12
        manifests = [
            n
            for n in os.listdir(out / sub / "_manifests")
            if n.endswith(".json")
        ]
        # r11: maintain snapshots after compacting, folding the compact
        # manifest + the kept last batch into ONE snapshot object -- the
        # whole listing is a single manifest open afterwards
        assert len(manifests) == 1, manifests
        assert manifests[0].startswith("s-")


def test_maintain_delete_where_and_collapse(spark, tmp_path, capsys):
    """``pump maintain --delete-where`` (row-level erasure, physical at
    the vacuum in the same window) and ``--collapse-keys/--version-col``
    (upsert merge: compaction keeps the highest version per key)."""
    import os

    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import read_sink, write_append
    from pyspark.sql import functions as F

    out = tmp_path / "out"
    store = StoreConf(commit_protocol="manifest")
    for sub in ("raw_message", "json_message"):
        for b in range(3):
            # mid k0 appears in EVERY batch (3 versions); others unique
            df = spark.createDataFrame(
                [
                    ("k0", "t", f"v{b}", f"2024-01-02 00:00:0{b}"),
                    (f"m{sub[:1]}{b}", "t", "erase-me" if b == 1 else "p",
                     "2024-01-02 00:00:00"),
                ],
                ["mid", "topic", "payload", "d"],
            ).select(
                "mid", "topic", "payload",
                F.to_timestamp("d").alias("collect_datetime"),
                F.to_date(F.substring("d", 1, 10)).alias("collect_date"),
            )
            write_append(df, store, str(out / sub), batch_id=b)

    ini = tmp_path / "pump.ini"
    ini.write_text(f"[store]\npath = {out}\n")
    assert main([
        "maintain", str(ini), "--keep-last", "0",
        "--delete-where", "payload = 'erase-me'",
        "--collapse-keys", "mid", "--version-col", "collect_datetime",
    ]) == 0
    msg = capsys.readouterr().out
    assert "deleted 1 rows" in msg
    for sub in ("raw_message", "json_message"):
        got = read_sink(spark, str(out / sub))
        # 6 rows written - 1 erased - 2 old k0 versions merged away
        assert got.count() == 3
        assert got.filter("payload = 'erase-me'").count() == 0
        assert got.filter("mid = 'k0'").select("payload").collect() == [
            ("v2",)
        ]
        # erasure is PHYSICAL: no attempt dir under the sink still holds
        # the deleted payload (vacuum ran in the same window)
        for root, _dirs, files in os.walk(out / sub):
            for f in files:
                if f.endswith(".parquet"):
                    import pyarrow.parquet as pq

                    t = pq.read_table(os.path.join(root, f))
                    if "payload" in t.column_names:
                        assert "erase-me" not in t[
                            "payload"
                        ].to_pylist()


def test_maintain_restore_as_of(spark, tmp_path, capsys):
    """``pump maintain --restore-as-of SEQ``: rollback-then-maintain as
    one window -- post-snapshot batches retired, contents equal the pin,
    the retired history vacuumed in the same run."""
    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import (
        list_snapshots,
        read_sink,
        snapshot_sink,
        write_append,
    )
    from pyspark.sql import functions as F

    out = tmp_path / "out"
    store = StoreConf(commit_protocol="manifest")

    def batch(sub, b):
        return spark.createDataFrame(
            [(f"m{sub[:1]}{b}{i}", "t", "p", "2024-01-02") for i in range(3)],
            ["mid", "topic", "payload", "d"],
        ).select(
            "mid", "topic", "payload",
            F.to_timestamp("d").alias("collect_datetime"),
            F.to_date("d").alias("collect_date"),
        )

    seqs = {}
    for sub in ("raw_message", "json_message"):
        for b in range(2):
            write_append(batch(sub, b), store, str(out / sub), batch_id=b)
        snapshot_sink(spark, str(out / sub), min_uncovered=1)
        seqs[sub] = list_snapshots(spark, str(out / sub))[-1]["seq"]
        write_append(batch(sub, 9), store, str(out / sub), batch_id=9)
        assert read_sink(spark, str(out / sub)).count() == 9

    assert seqs["raw_message"] == seqs["json_message"]
    ini = tmp_path / "pump.ini"
    ini.write_text(f"[store]\npath = {out}\n")
    assert main([
        "maintain", str(ini), "--keep-last", "0",
        "--restore-as-of", str(seqs["raw_message"]),
    ]) == 0
    assert "restored to snapshot" in capsys.readouterr().out
    for sub in ("raw_message", "json_message"):
        got = read_sink(spark, str(out / sub))
        assert got.count() == 6
        assert got.filter("mid like '%9%'").count() == 0


def test_maintain_restore_flags_mutually_exclusive(tmp_path):
    import pytest

    ini = tmp_path / "p.ini"
    ini.write_text(f"[store]\npath = {tmp_path}\n")
    with pytest.raises(SystemExit):
        main([
            "maintain", str(ini),
            "--restore-as-of", "1", "--restore-as-of-ts", "123",
        ])


def test_tail_once_drains_into_downstream_sink(spark, tmp_path, capsys):
    """``pump tail --once``: the downstream pipeline stage as a CLI
    one-liner -- drains the pump's raw sink into a second manifest sink
    exactly once; a second invocation (same checkpoint) delivers only
    batches committed in between."""
    from pyspark.sql import functions as F

    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import read_sink, write_append

    out = tmp_path / "out"
    down = str(tmp_path / "down")
    store = StoreConf(commit_protocol="manifest")

    def batch(b, n=4):
        df = spark.createDataFrame(
            [(f"m{b}-{i}", "t", "p", "2024-01-02") for i in range(n)],
            ["mid", "topic", "payload", "d"],
        ).select(
            "mid", "topic", "payload",
            F.to_timestamp("d").alias("collect_datetime"),
            F.to_date("d").alias("collect_date"),
        )
        write_append(df, store, str(out / "raw_message"),
                     batch_id=b, epoch="e1")

    for b in range(3):
        batch(b)
    ini = tmp_path / "pump.ini"
    ini.write_text(f"[store]\npath = {out}\n")
    assert main([
        "tail", str(ini), "--to", down, "--once",
    ]) == 0
    assert read_sink(spark, down).count() == 12
    # incremental second run: only the new batch delivers
    batch(3)
    batch(3)  # replay republish: must not double
    assert main(["tail", str(ini), "--to", down, "--once"]) == 0
    got = read_sink(spark, down)
    assert got.count() == 16
    assert got.select("mid").distinct().count() == 16
    assert "16 rows" in capsys.readouterr().out


def test_merge_subcommand(spark, tmp_path, capsys):
    """``pump merge --from <parquet> --on mid``: MERGE INTO one sink as
    a maintenance one-liner (sinks.merge_sink) -- updates matched rows,
    appends unmatched ones, and a re-run under the same --merge-id
    converges instead of duplicating."""
    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import read_sink, write_append
    from pyspark.sql import functions as F

    out = tmp_path / "out"
    store = StoreConf(commit_protocol="manifest")
    for b in range(2):
        df = spark.createDataFrame(
            [
                (f"m{b}a", "t", f"p{b}a", "2024-01-02 00:00:00"),
                (f"m{b}b", "t", f"p{b}b", "2024-01-02 00:00:01"),
            ],
            ["mid", "topic", "payload", "d"],
        ).select(
            "mid", "topic", "payload",
            F.to_timestamp("d").alias("collect_datetime"),
            F.to_date(F.substring("d", 1, 10)).alias("collect_date"),
        )
        write_append(df, store, str(out / "raw_message"), batch_id=b)

    src_dir = str(tmp_path / "changes")
    spark.createDataFrame(
        [
            ("m1a", "t", "UPDATED", "2024-01-02 00:00:09"),
            ("mNEW", "t", "INSERTED", "2024-01-03 00:00:00"),
        ],
        ["mid", "topic", "payload", "d"],
    ).select(
        "mid", "topic", "payload",
        F.to_timestamp("d").alias("collect_datetime"),
        F.to_date(F.substring("d", 1, 10)).alias("collect_date"),
    ).write.parquet(src_dir)

    ini = tmp_path / "pump.ini"
    ini.write_text(f"[store]\npath = {out}\n")
    args = [
        "merge", str(ini), "--from", src_dir, "--on", "mid",
        "--merge-id", "cli-merge-1",
    ]
    assert main(args) == 0
    msg = capsys.readouterr().out
    assert "updated=1" in msg and "inserted=1" in msg
    got = read_sink(spark, str(out / "raw_message"))
    assert got.count() == 5
    assert got.filter("payload = 'UPDATED'").count() == 1
    assert got.filter("mid = 'mNEW'").count() == 1
    # idempotent re-run: same logical merge, no duplicates
    assert main(args) == 0
    assert "inserted=0" in capsys.readouterr().out
    assert read_sink(spark, str(out / "raw_message")).count() == 5


def test_tail_merge_mode(spark, tmp_path, capsys):
    """``pump tail --merge-on mid``: the tailed sink is applied as a CDC
    change stream -- the downstream sink converges to current state
    (one row per key, last write wins, deletes applied) instead of
    accumulating the full change log."""
    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import read_sink, write_append
    from pyspark.sql import functions as F

    out = tmp_path / "out"
    down = str(tmp_path / "down")
    store = StoreConf(commit_protocol="manifest")

    def batch(b, rows):
        df = spark.createDataFrame(
            rows, ["mid", "payload", "op", "d"]
        ).select(
            "mid", "payload", "op",
            F.to_timestamp("d").alias("collect_datetime"),
            F.to_date(F.substring("d", 1, 10)).alias("collect_date"),
        )
        write_append(df, store, str(out / "raw_message"),
                     batch_id=b, epoch="e1")

    batch(0, [
        ("k1", "v1", "u", "2024-01-01 00:00:01"),
        ("k2", "v2", "u", "2024-01-01 00:00:01"),
    ])
    batch(1, [
        ("k1", "v1.2", "u", "2024-01-01 00:00:02"),  # update
        ("k2", "", "d", "2024-01-01 00:00:02"),       # delete
        ("k3", "v3", "u", "2024-01-01 00:00:02"),    # insert
    ])
    ini = tmp_path / "pump.ini"
    ini.write_text(f"[store]\npath = {out}\n")
    assert main([
        "tail", str(ini), "--to", down, "--once",
        "--merge-on", "mid", "--delete-when", "op = 'd'",
        "--drop-cols", "op",
    ]) == 0
    got = {
        r["mid"]: r["payload"]
        for r in read_sink(spark, down).collect()
    }
    assert got == {"k1": "v1.2", "k3": "v3"}
    # incremental: one more change batch, resume the same checkpoint
    batch(2, [("k3", "", "d", "2024-01-01 00:00:03")])
    assert main([
        "tail", str(ini), "--to", down, "--once",
        "--merge-on", "mid", "--delete-when", "op = 'd'",
        "--drop-cols", "op",
    ]) == 0
    got = {
        r["mid"]: r["payload"]
        for r in read_sink(spark, down).collect()
    }
    assert got == {"k1": "v1.2"}


def test_describe_subcommand(spark, tmp_path, capsys):
    """``pump describe``: summary JSON, files inventory and history log
    straight off the manifest metadata."""
    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import write_append
    from pyspark.sql import functions as F

    out = tmp_path / "out"
    store = StoreConf(commit_protocol="manifest")
    df = spark.createDataFrame(
        [("m1", "t", "p", "2024-01-02 00:00:00")],
        ["mid", "topic", "payload", "d"],
    ).select(
        "mid", "topic", "payload",
        F.to_timestamp("d").alias("collect_datetime"),
        F.to_date(F.substring("d", 1, 10)).alias("collect_date"),
    )
    write_append(df, store, str(out / "raw_message"), batch_id=0)
    ini = tmp_path / "pump.ini"
    ini.write_text(f"[store]\npath = {out}\n")
    assert main(["describe", str(ini)]) == 0
    msg = capsys.readouterr().out
    assert '"batches": 1' in msg
    assert main(["describe", str(ini), "--what", "files"]) == 0
    assert "b0.json" in capsys.readouterr().out
    assert main(["describe", str(ini), "--what", "history"]) == 0
    assert "append" in capsys.readouterr().out


def test_sql_and_register_subcommands(spark, tmp_path, capsys):
    """``pump sql`` drives the statement layer against the store's
    sinks by name; ``pump register`` bootstraps the SQL views and can
    run a query over data + metadata in one command."""
    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import read_sink, write_append
    from pyspark.sql import functions as F

    out = tmp_path / "out"
    store = StoreConf(commit_protocol="manifest")
    df = spark.createDataFrame(
        [
            ("m1", "t", "p1", "2024-01-02 00:00:00"),
            ("m2", "t", "p2", "2024-01-02 00:00:01"),
            ("m3", "t", "p3", "2024-01-02 00:00:02"),
        ],
        ["mid", "topic", "payload", "d"],
    ).select(
        "mid", "topic", "payload",
        F.to_timestamp("d").alias("collect_datetime"),
        F.to_date(F.substring("d", 1, 10)).alias("collect_date"),
    )
    write_append(df, store, str(out / "raw_message"), batch_id=0)
    ini = tmp_path / "pump.ini"
    ini.write_text(f"[store]\npath = {out}\n")

    # DML statement by sink name
    assert main([
        "sql", str(ini),
        "--sql", "DELETE FROM raw_message WHERE mid = 'm2'",
    ]) == 0
    msg = capsys.readouterr().out
    assert '"rows_deleted": 1' in msg
    assert read_sink(spark, str(out / "raw_message")).count() == 2

    # UPDATE by name
    assert main([
        "sql", str(ini),
        "--sql", "UPDATE raw_message SET payload = upper(payload) "
        "WHERE mid = 'm1'",
    ]) == 0
    assert '"rows_updated": 1' in capsys.readouterr().out

    # SELECT goes through registered views
    assert main([
        "sql", str(ini),
        "--sql", "SELECT mid, payload FROM raw_message ORDER BY mid",
    ]) == 0
    msg = capsys.readouterr().out
    assert "P1" in msg and "m3" in msg

    # register + one-shot query over data and metadata views
    assert main([
        "register", str(ini), "--path", "raw_message",
        "--name", "msgs",
        "--query", "SELECT count(*) AS n FROM msgs",
    ]) == 0
    msg = capsys.readouterr().out
    assert "registered: msgs, msgs_files, msgs_history" in msg
    assert "2" in msg
    assert main([
        "register", str(ini), "--path", "raw_message",
        "--name", "msgs2",
        "--query", "SELECT operation FROM msgs2_history",
    ]) == 0
    msg = capsys.readouterr().out
    assert "append" in msg and "rewrite" in msg

    # bad statement: loud non-zero exit
    assert main([
        "sql", str(ini), "--sql", "TRUNCATE TABLE raw_message",
    ]) == 1
