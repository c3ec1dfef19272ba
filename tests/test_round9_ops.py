"""Round-9 ADVICE fixes and delivery hardening: ClickHouse native->HTTP
port translation, the begingroupnum group offset (``main.go:111`` iterates
begin..end inclusive), the paho publish-rc reconnect path, the ivfpq_drift
zero-mse retrain flag, event-time columns in the provisioning DDL, and the
MQTT source's receive-side WAL (log-before-ack + replay-from-log, closing
the QoS-1 ack-to-commit loss window the r9 soak exposed)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mqtt_message_pump_spark.config import StoreConf, load_config
from mqtt_message_pump_spark.cli import make_monitor_publish
from mqtt_message_pump_spark.sinks import (
    adapter_table_ddl,
    adapter_table_ddl_clickhouse,
    raw_table_ddl,
    raw_table_ddl_clickhouse,
)
from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader


# --------------------------------------------------------------- config


def _load(tmp_path, body: str):
    p = tmp_path / "pump.ini"
    p.write_text(body)
    return load_config(str(p))


@pytest.mark.parametrize(
    ("native_port", "url_tail"),
    [
        ("9000", "8123/db1"),    # stock native -> stock HTTP
        ("19000", "18123/db1"),  # the shipped INIs' +10000 remap, preserved
        ("9440", "8443/db1?ssl=true"),  # native TLS -> HTTPS, TLS declared
        ("8123", "8123/db1"),    # already the HTTP port: pass through
        ("31337", "31337/db1"),  # unknown custom port: pass through
    ],
)
def test_clickhouse_port_maps_native_to_http(tmp_path, native_port, url_tail):
    cfg = _load(
        tmp_path,
        "[clickhouse]\nhostname = ch.example\n"
        f"port = {native_port}\ndatabase = db1\n",
    )
    assert cfg.store.url == f"jdbc:clickhouse://ch.example:{url_tail}"


def test_clickhouse_explicit_httpport_wins(tmp_path):
    cfg = _load(
        tmp_path,
        "[clickhouse]\nhostname = ch\nport = 19000\n"
        "httpport = 9999\ndatabase = db1\n",
    )
    assert cfg.store.url == "jdbc:clickhouse://ch:9999/db1"


def test_begingroupnum_sets_group_offset(tmp_path):
    cfg = _load(
        tmp_path,
        "[pipe-topic]\ntopicprefix = /TT\nenablegroupnum = true\n"
        "begingroupnum = 3\nendgroupnum = 5\n",
    )
    assert cfg.topic.group_num == 3  # pipes 3,4,5 inclusive
    assert cfg.topic.group_offset == 3


# --------------------------------------------------------------- source


def test_group_topic_honors_offset():
    reader = MqttStreamReader(
        {
            "topic_root": "root/",
            "topic_prefix": "TT",
            "group_num": "3",
            "group_offset": "3",
        }
    )
    assert [reader.group_topic(g) for g in range(3)] == [
        "root/TT/3",
        "root/TT/4",
        "root/TT/5",
    ]


def test_group_topic_single_numbered_group():
    # enablegroupnum with begin == end == 5: ONE numbered subscription
    # (mqtt.go:73-75), not the wildcard
    reader = MqttStreamReader(
        {
            "topic_root": "root/",
            "topic_prefix": "TT",
            "group_num": "1",
            "group_offset": "5",
        }
    )
    assert reader.group_topic(0) == "root/TT/5"


def test_group_topic_wildcard_unchanged():
    reader = MqttStreamReader(
        {"topic_root": "root/", "topic_prefix": "TT", "group_num": "0"}
    )
    assert reader.group_topic(0) == "root/TT/#"


def test_group_topic_numbered_flag_forces_single_group():
    # Enablegroupnum=true with groups 0..0 -> numbered topic /0
    reader = MqttStreamReader(
        {
            "topic_root": "root/",
            "topic_prefix": "TT",
            "group_num": "1",
            "numbered_topics": "true",
        }
    )
    assert reader.group_topic(0) == "root/TT/0"


# --------------------------------------------------------------- monitor


class _RcResult:
    def __init__(self, rc: int) -> None:
        self.rc = rc


class _PahoLikeClient:
    """Publish reports failure via the result rc, paho-style: never raises."""

    def __init__(self, rcs) -> None:
        self.rcs = list(rcs)
        self.published: list[tuple[str, bytes]] = []
        self.disconnected = False

    def publish(self, topic, data, qos=0):
        rc = self.rcs.pop(0) if self.rcs else 0
        if rc == 0:
            self.published.append((topic, data))
        return _RcResult(rc)

    def disconnect(self):
        self.disconnected = True


def test_monitor_publish_reconnects_on_paho_rc():
    dead = _PahoLikeClient(rcs=[4])  # MQTT_ERR_NO_CONN, silently returned
    fresh = _PahoLikeClient(rcs=[])
    mon = {"client": dead}
    publish = make_monitor_publish(mon, lambda: fresh, qos=0)
    publish("pump-monitor/t", '{"tick": 1}')
    # the dead client was torn down, the tick landed on the fresh client
    assert dead.disconnected and dead.published == []
    assert fresh.published == [("pump-monitor/t", b'{"tick": 1}')]
    assert mon["client"] is fresh


def test_monitor_publish_echoes_when_reconnect_fails(capsys):
    dead = _PahoLikeClient(rcs=[4, 4])
    mon = {"client": dead}

    def no_broker():
        raise OSError("connection refused")

    publish = make_monitor_publish(mon, no_broker, qos=0)
    publish("pump-monitor/t", '{"tick": 2}')
    err = capsys.readouterr().err
    assert "reconnect failed" in err and '{"tick": 2}' in err


def test_monitor_publish_rc_zero_publishes_once():
    ok = _PahoLikeClient(rcs=[0])
    mon = {"client": ok}
    publish = make_monitor_publish(
        mon, lambda: (_ for _ in ()).throw(AssertionError), qos=0
    )
    publish("t", "x")
    assert ok.published == [("t", b"x")] and not ok.disconnected


# --------------------------------------------------------------- drift


def test_ivfpq_drift_zero_base_mse_flags_retrain(spark):
    """A cell whose build-time vectors quantize EXACTLY (mse_base == 0)
    but whose appends carry nonzero error must flag retrain -- previously
    the ratio when-guard left the flag NULL (ADVICE r8)."""
    from mqtt_message_pump_spark.operators import similarity as SIM

    rng = np.random.default_rng(7)
    # two well-separated clusters; build vectors REPEATED so every
    # subvector codebook centers exactly on them -> zero residual error
    a = np.array([0.0] * 8)
    b = np.array([10.0] * 8)
    build = [(i, (a if i % 2 else b).tolist()) for i in range(32)]
    emb = spark.createDataFrame(build, ["vec_id", "embedding"])
    idx = SIM.ivfpq_build(
        emb, "vec_id", "embedding", n_centroids=2, m=2, nbits=2,
        persist=False,
    )

    base_rows = SIM.ivfpq_quantization_error(emb, idx).collect()
    assert all(r["mse"] == pytest.approx(0.0, abs=1e-12) for r in base_rows)

    drift = [
        (100 + i, (a + rng.normal(2.0, 0.5, 8)).tolist()) for i in range(16)
    ]
    appended = spark.createDataFrame(drift, ["vec_id", "embedding"])
    rows = SIM.ivfpq_drift(idx, emb, appended).collect()
    # every cell that received appends has nonzero new error over a
    # zero base -> retrain True, and the flag is never NULL anywhere
    assert all(r["retrain"] is not None for r in rows)
    hit = [r for r in rows if r["n_new"] > 0]
    assert hit and all(r["retrain"] for r in hit if r["mse_new"] > 0)


# --------------------------------------------------------------- sink DDL


def test_event_time_ddl_optin():
    store = StoreConf(database="db", raw_table_name="raw", adapter_table_name="flat")
    cols = [("x", "Float64"), ("y", "String")]
    # default stays golden: no event_time anywhere
    for ddl in (
        raw_table_ddl(store),
        adapter_table_ddl(store, cols),
        raw_table_ddl_clickhouse(store),
        adapter_table_ddl_clickhouse(store, cols),
    ):
        assert "event_time" not in ddl
    # opt-in adds the column before the date everywhere
    assert "event_time TIMESTAMP, collect_date DATE" in raw_table_ddl(
        store, event_time=True
    )
    assert "event_time TIMESTAMP, collect_date DATE" in adapter_table_ddl(
        store, cols, event_time=True
    )
    ch_raw = raw_table_ddl_clickhouse(store, event_time=True)
    assert "event_time DateTime" in ch_raw
    assert ch_raw.index("event_time") < ch_raw.index("collect_date Date")
    ch_flat = adapter_table_ddl_clickhouse(store, cols, event_time=True)
    assert "collect_datetime DateTime, event_time DateTime" in ch_flat


def test_event_time_pump_frames_match_optin_ddl(spark):
    """The dual-path frames written under ``event_time_field`` carry
    exactly the column set the opt-in DDL declares (ADVICE r8: the
    jdbc passthrough tables must match the written schema)."""
    import re

    from mqtt_message_pump_spark.streaming.pump import (
        build_dual_path,
        payload_map_schema,
        with_event_time,
    )
    from mqtt_message_pump_spark.functions.ids import with_message_id

    msgs = spark.createDataFrame(
        [("t/1", '{"r1": {"k": 1, "ts": "2024-01-02T03:04:05"}}')],
        ["topic", "payload"],
    ).withColumn(
        "received_time", F.to_timestamp(F.lit("2024-01-02 04:00:00"))
    )
    msgs = with_event_time(msgs, "ts")
    raw, flat = build_dual_path(
        with_message_id(msgs, "mid", 8), payload_map_schema()
    )
    store = StoreConf(database="db", raw_table_name="raw")
    ddl_cols = set(
        re.findall(r"(\w+) (?:STRING|TIMESTAMP|DATE)", raw_table_ddl(store, event_time=True))
    )
    assert set(raw.columns) == ddl_cols
    assert "event_time" in flat.columns


# --------------------------------------------------------------- WAL


class _OneShotClient:
    """Delivers a fixed message list once after subscribe, minimqtt-style
    manual-ack surface; records acks and disconnects."""

    manual_ack = True

    def __init__(self, msgs) -> None:
        self.msgs = msgs
        self.acked: list[int] = []
        self.on_message = None
        self.disconnected = False

    def subscribe(self, topic, qos=0):
        pass

    def loop_start(self):
        for m in self.msgs:
            self.on_message(self, None, m)

    def loop_stop(self):
        pass

    def ack(self, mid):
        self.acked.append(mid)

    def disconnect(self):
        self.disconnected = True


class _Msg:
    def __init__(self, topic, payload, mid, dup=False):
        self.topic, self.payload, self.mid, self.dup = topic, payload, mid, dup


def _wal_reader(tmp_path, msgs):
    from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader

    calls = {"n": 0}

    def factory(opts):
        calls["n"] += 1
        return _OneShotClient(msgs)

    reader = MqttStreamReader(
        {
            "group_num": "0",
            "topic_root": "pump/",
            "topic_prefix": "g",
            "poll_timeout_secs": "0.05",
            "wal_dir": str(tmp_path / "wal"),
        },
        client_factory=factory,
    )
    return reader, calls


def test_wal_logs_before_ack_and_serves_replay(tmp_path):
    """Rows are durably logged before the PUBACK flush, and a REPLAYED
    partition (same offsets) is served from the log without opening a
    broker session -- the close of the ack-to-commit loss window."""
    msgs = [_Msg("pump/g/1", b'{"k": 1}', 11), _Msg("pump/g/1", b'{"k": 2}', 12)]
    reader, calls = _wal_reader(tmp_path, msgs)
    part = reader.partitions({"0": 0}, {"0": 100})[0]
    first = list(reader.read(part))
    assert [r[0:2] for r in first] == [
        ("pump/g/1", '{"k": 1}'),
        ("pump/g/1", '{"k": 2}'),
    ]
    assert calls["n"] == 1
    # the log plus its post-ack marker (commit() deletes marked logs
    # outright; unmarked ones become suppress ledgers)
    assert {f.name for f in (tmp_path / "wal").iterdir()} == {
        "g0-0-100.jsonl", "g0-0-100.jsonl.acked",
    }

    # replay: same (group, start, end] -> WAL rows, broker untouched
    replay = list(reader.read(reader.partitions({"0": 0}, {"0": 100})[0]))
    assert replay == first  # bit-identical incl. receipt timestamps
    assert calls["n"] == 1, "replay must not open a broker session"


def test_wal_commit_prunes_completed_batches(tmp_path):
    msgs = [_Msg("pump/g/1", b"x", 1)]
    reader, _ = _wal_reader(tmp_path, msgs)
    list(reader.read(reader.partitions({"0": 0}, {"0": 100})[0]))
    reader2_part = reader.partitions({"0": 100}, {"0": 200})[0]
    list(reader.read(reader2_part))
    wal = tmp_path / "wal"
    assert {f.name for f in wal.iterdir()} == {
        "g0-0-100.jsonl", "g0-0-100.jsonl.acked",
        "g0-100-200.jsonl", "g0-100-200.jsonl.acked",
    }
    reader.commit({"0": 100})
    assert {f.name for f in wal.iterdir()} == {
        "g0-100-200.jsonl", "g0-100-200.jsonl.acked",
    }
    reader.commit({"0": 200})
    assert list(wal.iterdir()) == []


def test_monitor_publish_transient_rc_keeps_connection(capsys):
    """A transient paho rc (QUEUE_SIZE=15) must NOT tear down a healthy
    monitor connection -- the tick is echoed and the client kept; only
    connection-dead rcs (4/5/7/16) trigger the rebuild."""
    client = _PahoLikeClient(rcs=[15, 0])
    mon = {"client": client}
    publish = make_monitor_publish(
        mon, lambda: (_ for _ in ()).throw(AssertionError), qos=0
    )
    publish("t", "dropped-tick")
    assert not client.disconnected and mon["client"] is client
    assert "rc=15" in capsys.readouterr().err
    publish("t", "next-tick")  # connection still works on the next tick
    assert client.published == [("t", b"next-tick")]


def test_wal_crash_before_ack_is_at_least_once(tmp_path, spark):
    """The delivery-ladder middle rung, pinned: a task that logs its WAL
    but dies before the PUBACK flush yields BOTH a WAL replay (copy 1)
    and a broker redelivery into the next poll (copy 2) -- at-least-once,
    never loss; the opt-in content dedup then collapses the pair to
    exactly-once."""
    import datetime as dt

    from mqtt_message_pump_spark.streaming.pump import dedupe_redeliveries

    msgs = [_Msg("pump/g/1", b'{"k": 1}', 11)]
    reader, calls = _wal_reader(tmp_path, msgs)
    part0 = reader.partitions({"0": 0}, {"0": 100})[0]

    # attempt 1: the WAL is written and the PUBACKs go out, but the
    # batch dies before committing (or the acks are lost in flight) --
    # either way the broker still holds the message as undelivered
    gen = reader.read(part0)
    next(gen)
    gen.close()
    assert (tmp_path / "wal" / "g0-0-100.jsonl").exists()

    # replay of the SAME batch: served from the WAL -- copy 1
    copy1 = list(reader.read(reader.partitions({"0": 0}, {"0": 100})[0]))
    assert [r[1] for r in copy1] == ['{"k": 1}']

    # the broker never saw acks -> it redelivers into the NEXT batch
    # (new connection, new packet id, dup=True) -- copy 2
    redelivered = [_Msg("pump/g/1", b'{"k": 1}', 37, dup=True)]
    reader2, _ = _wal_reader(tmp_path, redelivered)
    copy2 = list(reader2.read(reader2.partitions({"0": 100}, {"0": 200})[0]))
    assert [r[1] for r in copy2] == ['{"k": 1}']

    # at-least-once: both copies exist; content dedup -> exactly-once
    rows = [
        (r[0], r[1], dt.datetime(2024, 1, 1, 12, 0, i), r[3], r[4])
        for i, r in enumerate(copy1 + copy2)
    ]
    df = spark.createDataFrame(
        rows, "topic string, payload string, received_time timestamp, "
        "packet_id long, dup boolean",
    )
    assert df.count() == 2
    assert dedupe_redeliveries(df).count() == 1


# ------------------------------------------------- manual-ack coverage


def test_paho_factory_requests_manual_ack(monkeypatch):
    """The paho factory must construct a manual-ack client on paho>=2
    (ADVICE r9: without it paho auto-PUBACKs inside its network loop and
    the WAL's log-before-ack claim silently degrades to poll-end), and
    fall back cleanly on paho 1.x which lacks the kwarg."""
    import types

    from mqtt_message_pump_spark.sources import mqtt as mqtt_mod

    built = {}

    class _Client2:
        def __init__(self, api_version, manual_ack=False, client_id="",
                     clean_session=True):
            built.update(api_version=api_version, manual_ack=manual_ack)

        def username_pw_set(self, u, p):
            pass

        def connect(self, host, port):
            built["addr"] = (host, port)

    fake2 = types.SimpleNamespace(
        Client=_Client2,
        CallbackAPIVersion=types.SimpleNamespace(VERSION1="v1"),
    )
    monkeypatch.setattr(mqtt_mod, "_paho", fake2)
    client = mqtt_mod._paho_client_factory(
        {"server": "tcp://127.0.0.1:1883", "client_name": "c"}
    )
    assert built["manual_ack"] is True and built["api_version"] == "v1"
    assert getattr(client, "manual_ack", False) is True
    assert built["addr"] == ("127.0.0.1", 1883)

    class _Client1:  # paho 1.x: no manual_ack kwarg, no api-version arg
        def __init__(self, client_id="", clean_session=True):
            pass

        def connect(self, host, port):
            pass

    monkeypatch.setattr(
        mqtt_mod, "_paho", types.SimpleNamespace(Client=_Client1)
    )
    client = mqtt_mod._paho_client_factory({"server": "tcp://h:1883"})
    assert not getattr(client, "manual_ack", False)


def test_wal_with_autoack_client_warns(tmp_path):
    """wal_dir + an auto-ack client = the per-message guarantee does not
    hold; the source must say so loudly instead of over-promising."""
    import warnings

    from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader

    class _AutoAckClient(_OneShotClient):
        manual_ack = False

    reader = MqttStreamReader(
        {
            "group_num": "0",
            "topic_root": "pump/",
            "topic_prefix": "g",
            "poll_timeout_secs": "0.05",
            "wal_dir": str(tmp_path / "wal"),
        },
        client_factory=lambda opts: _AutoAckClient(
            [_Msg("pump/g/1", b"x", 1)]
        ),
    )
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        rows = list(reader.read(reader.partitions({"0": 0}, {"0": 100})[0]))
    assert len(rows) == 1
    assert any(
        issubclass(w.category, RuntimeWarning)
        and "auto-acks" in str(w.message)
        for w in rec
    )


def test_ack_dispatch_covers_paho2_signature(tmp_path):
    """paho 2.x acks take (mid, qos); the deferred-ack flush must reach
    such a client instead of dying on the 1-arg call."""
    from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader

    class _TwoArgAckClient(_OneShotClient):
        def ack(self, mid, qos):
            self.acked.append((mid, qos))

    client = _TwoArgAckClient(
        [_Msg("pump/g/1", b"a", 7), _Msg("pump/g/1", b"b", 8)]
    )
    reader = MqttStreamReader(
        {
            "group_num": "0",
            "topic_root": "pump/",
            "topic_prefix": "g",
            "poll_timeout_secs": "0.05",
            "qos": "1",
        },
        client_factory=lambda opts: client,
    )
    rows = list(reader.read(reader.partitions({"0": 0}, {"0": 100})[0]))
    assert len(rows) == 2
    assert client.acked == [(7, 1), (8, 1)]


# ---------------------------------------- post-log pre-ack crash window


def test_wal_post_log_pre_ack_kill_no_double_count(tmp_path):
    """The surgical crash window (r9 VERDICT #6): the task dies BETWEEN
    ``_write_wal`` and the deferred PUBACK flush.  The log is durable
    (replay serves it -- copy 1 commits), but the broker never saw acks,
    so its persistent session redelivers the rows (dup=1, FRESH packet
    ids -- minimqtt reissues ids on session resume) into the next poll.
    With the content-dedup watermark OFF, the source itself must not
    double-count: commit() retains the never-acked log as a ``.unacked``
    suppress ledger, and the next poll acks-and-drops dup-flagged
    arrivals whose content the ledger owns -- while a genuinely new
    message, even one with IDENTICAL content but dup=0, passes through."""
    from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader

    wal = tmp_path / "wal"

    class _AckBomb(_OneShotClient):
        def ack(self, mid):
            raise ConnectionError("killed between WAL write and ack flush")

    def reader_for(client):
        return MqttStreamReader(
            {
                "group_num": "0",
                "topic_root": "pump/",
                "topic_prefix": "g",
                "poll_timeout_secs": "0.05",
                "wal_dir": str(wal),
            },
            client_factory=lambda opts: client,
        )

    msgs = [_Msg("pump/g/1", b'{"k": 1}', 11), _Msg("pump/g/1", b'{"k": 2}', 12)]
    reader = reader_for(_AckBomb(msgs))
    part = reader.partitions({"0": 0}, {"0": 100})[0]
    with pytest.raises(ConnectionError):
        list(reader.read(part))
    # the log won the race; the marker did not -- the surgical state
    assert (wal / "g0-0-100.jsonl").exists()
    assert not (wal / "g0-0-100.jsonl.acked").exists()

    # replay serves the log (copy 1), broker untouched
    replay = list(reader.read(reader.partitions({"0": 0}, {"0": 100})[0]))
    assert [r[1] for r in replay] == ['{"k": 1}', '{"k": 2}']

    # the batch commits; the never-acked log becomes the suppress ledger
    reader.commit({"0": 100})
    assert not (wal / "g0-0-100.jsonl").exists()
    assert (wal / "g0-0-100.jsonl.unacked").exists()

    # next poll: the broker redelivers both rows (dup=1, new packet ids)
    # alongside one new message AND one fresh publish whose content is
    # identical to a suppressed row (dup=0 -> must NOT be suppressed)
    batch2 = [
        _Msg("pump/g/1", b'{"k": 1}', 31, dup=True),
        _Msg("pump/g/1", b'{"k": 2}', 32, dup=True),
        _Msg("pump/g/1", b'{"k": 3}', 33),
        _Msg("pump/g/1", b'{"k": 1}', 34),  # same content, dup=0: NEW row
    ]
    client2 = _OneShotClient(batch2)
    reader2 = reader_for(client2)
    rows = list(reader2.read(reader2.partitions({"0": 100}, {"0": 200})[0]))
    assert [r[1] for r in rows] == ['{"k": 3}', '{"k": 1}']
    # suppressed redeliveries were still ACKED (stops the redelivery
    # loop), alongside the yielded rows' acks
    assert set(client2.acked) == {31, 32, 33, 34}
    # the fully-consumed ledger is gone; batch 2's own log carries only
    # the rows batch 2 yields (a replay of batch 2 must not resurrect
    # the suppressed rows)
    assert not (wal / "g0-100-200.jsonl.unacked").exists()
    assert [r[1] for r in MqttStreamReader._load_wal(
        str(wal / "g0-100-200.jsonl")
    )] == ['{"k": 3}', '{"k": 1}']


def test_unmatched_ledger_expires_after_retention(tmp_path):
    """A ledger whose redeliveries never arrive (broker restarted without
    persistence, session gone) must not live forever: the retention
    sweep (wall-clock based -- the r10 fuzz showed poll-drain heuristics
    expire during stalls while redeliveries still pend) reclaims it once
    it ages past ``wal_ledger_retention_secs``."""
    msgs = [_Msg("pump/g/1", b'{"k": 9}', 7)]
    reader, _ = _wal_reader(tmp_path, msgs)

    class _AckBomb(_OneShotClient):
        def ack(self, mid):
            raise ConnectionError("boom")

    from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader

    wal = tmp_path / "wal"
    bomb_reader = MqttStreamReader(
        {
            "group_num": "0",
            "topic_root": "pump/",
            "topic_prefix": "g",
            "poll_timeout_secs": "0.05",
            "wal_dir": str(wal),
        },
        client_factory=lambda opts: _AckBomb(msgs),
    )
    with pytest.raises(ConnectionError):
        list(bomb_reader.read(bomb_reader.partitions({"0": 0}, {"0": 100})[0]))
    bomb_reader.commit({"0": 100})
    assert (wal / "g0-0-100.jsonl.unacked").exists()
    # a poll within the retention leaves the ledger alone (its
    # redeliveries could still be pending at a stalled broker) ...
    list(reader.read(reader.partitions({"0": 100}, {"0": 200})[0]))
    assert (wal / "g0-0-100.jsonl.unacked").exists()
    # ... and one past the retention reclaims it
    aged = MqttStreamReader(
        {
            "group_num": "0",
            "topic_root": "pump/",
            "topic_prefix": "g",
            "poll_timeout_secs": "0.05",
            "wal_dir": str(wal),
            "wal_ledger_retention_secs": "0",
        },
        client_factory=lambda opts: _OneShotClient([]),
    )
    list(aged.read(aged.partitions({"0": 200}, {"0": 300})[0]))
    assert not (wal / "g0-0-100.jsonl.unacked").exists()


def test_concurrent_attempt_wal_claim_first_writer_wins(tmp_path):
    """Two attempts race the same offset range (a lingering cancelled
    task vs the restarted query's replay): the first to claim the log
    owns the batch; the second must serve the OWNER's rows and ack
    nothing of its own -- acking rows the committed log does not carry
    would lose them (the broker forgets acked rows)."""
    from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader

    wal = tmp_path / "wal"

    def reader_for(client):
        return MqttStreamReader(
            {
                "group_num": "0",
                "topic_root": "pump/",
                "topic_prefix": "g",
                "poll_timeout_secs": "0.05",
                "wal_dir": str(wal),
            },
            client_factory=lambda opts: client,
        )

    # attempt A (the lingering task) wins the claim with rows 1,2
    a_rows = [_Msg("pump/g/1", b'{"k": 1}', 11), _Msg("pump/g/1", b'{"k": 2}', 12)]
    ra = reader_for(_OneShotClient(a_rows))
    got_a = [r[1] for r in ra.read(ra.partitions({"0": 0}, {"0": 100})[0])]
    assert got_a == ['{"k": 1}', '{"k": 2}']

    # attempt B polls DIFFERENT rows for the same range -- it must lose
    # the claim (the log exists), yield A's rows, and ack NOTHING
    b_client = _OneShotClient([_Msg("pump/g/1", b'{"k": 3}', 31)])
    rb = reader_for(b_client)
    # simulate "B started before A's log existed": bypass the replay
    # fast-path by deleting nothing -- read() checks at entry, so make
    # the entry check miss by... the entry check can't miss here; call
    # the claim path directly instead: entry replay-serve is ALSO
    # correct behavior, so assert the claim primitive itself too.
    assert MqttStreamReader._claim_wal(
        str(wal / "g0-0-100.jsonl"),
        [("pump/g/1", '{"k": 3}', __import__("datetime").datetime.now(
            __import__("datetime").timezone.utc), 31, False)],
    ) is False  # the log is already owned
    got_b = [r[1] for r in rb.read(rb.partitions({"0": 0}, {"0": 100})[0])]
    assert got_b == ['{"k": 1}', '{"k": 2}']  # owner's rows, not k:3
    assert b_client.acked == []  # replay-serve path: no broker acks


def test_late_arrivals_after_poll_end_are_not_acked_or_yielded(tmp_path):
    """The captured 25-row loss (r10): minimqtt's ``loop_stop`` is a
    no-op flag, so the network thread keeps delivering after the poll
    window closes -- rows arriving between the WAL write and the PUBACK
    flush were acked-but-never-logged, and a kill after the acks lost
    them forever.  The batch must be FROZEN at poll end: batch content
    == log content == acked set, and late arrivals stay un-acked (the
    broker requeues them into the next poll)."""
    from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader

    class _LeakyClient(_OneShotClient):
        """Delivers 2 rows during the poll, then keeps the network
        thread 'running' -- one more row lands DURING the ack flush
        (after the log write), the exact moment of the captured race."""

        def __init__(self):
            super().__init__(
                [_Msg("pump/g/1", b'{"k": 1}', 11),
                 _Msg("pump/g/1", b'{"k": 2}', 12)]
            )
            self._leaked = False

        def ack(self, mid):
            super().ack(mid)
            if not self._leaked:
                self._leaked = True
                self.on_message(self, None, _Msg("pump/g/1", b'{"k": 3}', 13))

    client = _LeakyClient()
    reader = MqttStreamReader(
        {
            "group_num": "0",
            "topic_root": "pump/",
            "topic_prefix": "g",
            "poll_timeout_secs": "0.05",
            "wal_dir": str(tmp_path / "wal"),
        },
        client_factory=lambda opts: client,
    )
    rows = list(reader.read(reader.partitions({"0": 0}, {"0": 100})[0]))
    # batch = the frozen poll window only
    assert [r[1] for r in rows] == ['{"k": 1}', '{"k": 2}']
    # log = the same two rows
    logged = list(
        MqttStreamReader._load_wal(str(tmp_path / "wal" / "g0-0-100.jsonl"))
    )
    assert [r[1] for r in logged] == ['{"k": 1}', '{"k": 2}']
    # acked = the same two rows; the late arrivals stay broker-owned
    assert client.acked == [11, 12]


# ------------------------------------------------ kill-point matrix


def _matrix_reader(tmp_path, client):
    from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader

    return MqttStreamReader(
        {
            "group_num": "0",
            "topic_root": "pump/",
            "topic_prefix": "g",
            "poll_timeout_secs": "0.05",
            "wal_dir": str(tmp_path / "wal"),
        },
        client_factory=lambda opts: client,
    )


@pytest.mark.parametrize(
    "kill_point",
    ["during_poll", "before_acks", "mid_acks", "before_marker", "after_marker"],
)
def test_kill_point_matrix_exactly_once_content(tmp_path, kill_point, monkeypatch):
    """Systematic sweep of every crash point in the manual-ack WAL read
    path.  For each point: kill attempt 1 there, replay the batch, feed
    the broker's redeliveries (per MQTT semantics for what was un-acked
    at the kill) into the next poll -- and assert the TOTAL delivered
    content across both batches is exactly the original two messages,
    with content dedup OFF.  This is the delivery ladder's top rung as
    one table instead of scattered scenarios."""
    from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader

    msgs = [_Msg("pump/g/1", b'{"k": 1}', 11), _Msg("pump/g/1", b'{"k": 2}', 12)]

    class _Killable(_OneShotClient):
        def __init__(self, msgs, point):
            super().__init__(msgs)
            self.point = point
            self._acks = 0

        def loop_stop(self):
            if self.point == "during_poll":
                raise ConnectionError("killed during poll")

        def ack(self, mid):
            if self.point == "before_acks":
                raise ConnectionError("killed before ack flush")
            if self.point == "mid_acks" and self._acks == 1:
                raise ConnectionError("killed mid ack flush")
            self._acks += 1
            super().ack(mid)

    client = _Killable(msgs, kill_point)
    reader = _matrix_reader(tmp_path, client)
    if kill_point == "before_marker":
        # the crash window between the ack flush and the marker write:
        # the marker simply never lands (the log is retained as a
        # ledger at commit; acked rows never redeliver, so the ledger
        # just expires on a drained poll)
        monkeypatch.setattr(
            MqttStreamReader, "_mark_acked", staticmethod(lambda path: None)
        )

    part = reader.partitions({"0": 0}, {"0": 100})[0]
    delivered: list[str] = []
    if kill_point in ("during_poll", "before_acks", "mid_acks"):
        with pytest.raises(ConnectionError):
            list(reader.read(part))
    else:
        # marker failure is absorbed (the marker is an optimization);
        # after_marker kills land in the SINK, past the read
        delivered += [r[1] for r in reader.read(part)]
        delivered.clear()  # the killed batch never commits its output

    monkeypatch.undo()

    # the batch REPLAYS (same offsets)
    replay_client = _OneShotClient(list(msgs))
    replay_reader = _matrix_reader(tmp_path, replay_client)
    delivered += [
        r[1] for r in replay_reader.read(
            replay_reader.partitions({"0": 0}, {"0": 100})[0]
        )
    ]
    replay_reader.commit({"0": 100})

    # broker redelivers whatever was NEVER acked at the kill, dup=1 with
    # fresh packet ids (minimqtt reissues on session resume).
    # during_poll: no WAL exists, so the REPLAY ITSELF opened a fresh
    # broker session and consumed the requeued rows above -- nothing
    # left to redeliver later.
    unacked = {
        "during_poll": [],
        "before_acks": msgs,       # WAL written, nothing acked
        "mid_acks": msgs[1:],      # first PUBACK landed
        "before_marker": [],       # all acked
        "after_marker": [],        # all acked
    }[kill_point]
    redelivered = [
        _Msg(m.topic, m.payload, 30 + i, dup=True)
        for i, m in enumerate(unacked)
    ]
    nxt_client = _OneShotClient(redelivered)
    nxt_reader = _matrix_reader(tmp_path, nxt_client)
    delivered += [
        r[1] for r in nxt_reader.read(
            nxt_reader.partitions({"0": 100}, {"0": 200})[0]
        )
    ]

    # exactly-once content, no content dedup involved
    assert sorted(delivered) == ['{"k": 1}', '{"k": 2}'], (
        kill_point, delivered
    )
