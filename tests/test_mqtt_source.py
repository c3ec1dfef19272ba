"""MQTT source loopback tests: drive ``MqttStreamReader`` end-to-end
(partitions -> read -> rows -> commit) with an in-process fake client, no
broker required.

Covers the reference subscriber semantics (``mqtt.go:72-126``): topic
construction per group vs single wildcard, payload decode, QoS wiring
(SOURCE qos, diverging deliberately from the reference quirk that uses the
monitor QoS at ``mqtt.go:82``), and the packet-id/dup surface QoS-1
redelivery dedup keys on.
"""

from __future__ import annotations

import datetime

import pytest

from mqtt_message_pump_spark.sources.mqtt import (
    MQTT_SOURCE_SCHEMA,
    MqttDataSource,
    MqttStreamReader,
    mqtt_available,
    register_mqtt_source,
)


class FakeMessage:
    def __init__(self, topic: str, payload: bytes, mid: int, dup: bool):
        self.topic = topic
        self.payload = payload
        self.mid = mid
        self.dup = dup


class FakeClient:
    """Loopback stand-in for ``paho.mqtt.client.Client``: delivers a
    preloaded message feed to ``on_message`` when the loop starts."""

    # mirror the minimqtt manual-ack surface so the reader's budget cap
    # takes the production path: buffer-then-ack, never ack-then-drop
    manual_ack = True

    def __init__(self, feed: list[FakeMessage]):
        self.feed = feed
        self.on_message = None
        self.subscribed: list[tuple[str, int]] = []
        self.loop_running = False
        self.disconnected = False
        self.acked: list[int] = []

    def ack(self, mid: int) -> None:
        self.acked.append(mid)

    def _matches(self, flt: str, topic: str) -> bool:
        if flt.endswith("/#"):
            return topic.startswith(flt[:-2])
        return flt == topic

    def subscribe(self, topic: str, qos: int = 0) -> None:
        self.subscribed.append((topic, qos))

    def loop_start(self) -> None:
        self.loop_running = True
        for msg in self.feed:
            if any(self._matches(f, msg.topic) for f, _ in self.subscribed):
                self.on_message(self, None, msg)

    def loop_stop(self) -> None:
        self.loop_running = False

    def disconnect(self) -> None:
        self.disconnected = True


def _feed(group: int, n: int, start_mid: int = 1) -> list[FakeMessage]:
    return [
        FakeMessage(
            f"pump/g/{group}",
            f'{{"k": {i}}}'.encode(),
            start_mid + i,
            False,
        )
        for i in range(n)
    ]


def _reader(feed, group_num="3", **extra):
    opts = {
        "group_num": group_num,
        "topic_root": "pump/",
        "topic_prefix": "g",
        "poll_timeout_secs": "0.2",
        **extra,
    }
    return MqttStreamReader(opts, client_factory=lambda o: FakeClient(feed))


def test_reader_partition_cycle():
    """Full DataSourceStreamReader cycle: initialOffset -> latestOffset ->
    partitions -> read -> commit, one partition per topic group."""
    feed = _feed(0, 4) + _feed(1, 2) + _feed(2, 1)
    reader = _reader(feed)

    start = reader.initialOffset()
    assert start == {"0": 0, "1": 0, "2": 0}
    end = {"0": 4, "1": 2, "2": 1}
    parts = reader.partitions(start, end)
    assert [(p.group, p.start, p.end) for p in parts] == [
        (0, 0, 4), (1, 0, 2), (2, 0, 1),
    ]

    rows_by_group = {p.group: list(reader.read(p)) for p in parts}
    assert [len(v) for v in rows_by_group.values()] == [4, 2, 1]
    # each partition's subscription is scoped to ITS group topic
    assert all(
        r[0] == f"pump/g/{g}" for g, rows in rows_by_group.items() for r in rows
    )
    # row shape matches the source schema: payload decoded, arrival stamped,
    # packet id + dup carried through
    topic, payload, ts, packet_id, dup = rows_by_group[0][0]
    assert payload == '{"k": 0}'
    assert isinstance(ts, datetime.datetime)
    assert packet_id == 1 and dup is False
    assert len(MQTT_SOURCE_SCHEMA) == 5
    reader.commit(end)  # no-op, must not raise


def test_reader_want_caps_rows_and_acks_only_kept():
    """read() yields exactly end-start rows when more arrive, and -- the
    r7 ADVICE fix -- PUBACKs ONLY the rows it keeps: the over-budget
    deliveries stay unacknowledged so a real broker redelivers them to
    the next micro-batch instead of the reader ack-then-dropping them."""
    captured = {}

    def factory(opts):
        captured["client"] = FakeClient(_feed(0, 5))
        return captured["client"]

    reader = MqttStreamReader(
        {
            "group_num": "3",
            "topic_root": "pump/",
            "topic_prefix": "g",
            "poll_timeout_secs": "0.2",
        },
        client_factory=factory,
    )
    [part0] = [p for p in reader.partitions({"0": 0}, {"0": 3}) if p.group == 0]
    rows = list(reader.read(part0))
    assert len(rows) == 3
    # acked exactly the 3 kept mids; mids 4 and 5 remain in flight
    assert captured["client"].acked == [r[3] for r in rows] == [1, 2, 3]


def test_reader_wildcard_single_group():
    """group_num=0 -> one partition subscribing to the wildcard topic
    (reference single-subscription mode, ``mqtt.go:72-77``)."""
    feed = [FakeMessage("pump/g/anything", b"x", 7, True)]
    reader = _reader(feed, group_num="0")
    assert reader.groups == 1
    assert reader.group_topic(0) == "pump/g/#"
    parts = reader.partitions({"0": 0}, {"0": 1})
    rows = list(reader.read(parts[0]))
    assert rows[0][0] == "pump/g/anything"
    assert rows[0][3] == 7 and rows[0][4] is True


def test_reader_uses_source_qos():
    """We wire the SOURCE section's qos into subscribe (the reference
    passes the monitor QoS instead, ``mqtt.go:82`` -- documented
    divergence)."""
    captured = {}

    def factory(opts):
        client = FakeClient([])
        captured["client"] = client
        return client

    reader = MqttStreamReader(
        {"group_num": "0", "qos": "1", "poll_timeout_secs": "0.1"},
        client_factory=factory,
    )
    list(reader.read(reader.partitions({"0": 0}, {"0": 0})[0]))
    assert captured["client"].subscribed == [("/#", 1)]
    assert captured["client"].disconnected


def test_clean_session_option_parse():
    """[source-mqtt] clean_session flows config -> reader option -> client
    flag (string-typed at the DataSource boundary)."""
    from mqtt_message_pump_spark.config import MqttConf
    from mqtt_message_pump_spark.sources.mqtt import clean_session_flag

    assert clean_session_flag({}) is True
    assert clean_session_flag({"clean_session": "False"}) is False
    assert clean_session_flag({"clean_session": "1"}) is True
    # the config default round-trips through str() the way cli.py passes it
    assert clean_session_flag({"clean_session": str(MqttConf().clean_session)})


def test_reader_pipe_signals():
    """Each partition read signals pipe-up after subscribe and pipe-down
    on teardown (the reference PipeChan, ``mqtt.go:128-150``); a
    subscribe failure signals pipe-down only (``mqtt.go:131-134``)."""
    from mqtt_message_pump_spark.streaming.monitor import PumpCounters

    counters = PumpCounters()
    feed = _feed(0, 2) + _feed(1, 1) + _feed(2, 1)
    reader = MqttStreamReader(
        {
            "group_num": "3",
            "topic_root": "pump/",
            "topic_prefix": "g",
            "poll_timeout_secs": "0.2",
        },
        client_factory=lambda o: FakeClient(feed),
        pipe_signal=counters.pipe_signal,
    )
    for p in reader.partitions({"0": 0, "1": 0, "2": 0}, {"0": 2, "1": 1, "2": 1}):
        list(reader.read(p))
    assert counters.pipe_up_events == 3
    assert counters.pipe_down_events == 3
    assert counters.pipe_num == 0  # per-batch clients: none live between reads

    class BrokenClient(FakeClient):
        def subscribe(self, topic, qos=0):
            raise ConnectionError("broker refused subscription")

    broken = MqttStreamReader(
        {"group_num": "0", "poll_timeout_secs": "0.1"},
        client_factory=lambda o: BrokenClient([]),
        pipe_signal=counters.pipe_signal,
    )
    with pytest.raises(ConnectionError):
        list(broken.read(broken.partitions({"0": 0}, {"0": 0})[0]))
    assert counters.pipe_down_events == 4
    assert counters.pipe_up_events == 3


def test_redelivery_dedup_collapses_replay(spark):
    """A QoS-1 redelivery (dup=True, LATER arrival time) collapses to one
    sink row: the content-derived mid excludes the arrival timestamp AND
    the connection-scoped packet id (a cross-batch redelivery arrives
    under a new packet id, so keying on it would leak the dup)."""
    from mqtt_message_pump_spark.streaming.pump import dedupe_redeliveries

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("pump/g/0", '{"k": 1}', t0, 11, False),
        ("pump/g/0", '{"k": 2}', t0, 12, False),
        # redelivery of packet 11 arriving 5 seconds later
        ("pump/g/0", '{"k": 1}', t0 + datetime.timedelta(seconds=5), 11, True),
    ]
    df = spark.createDataFrame(
        rows, "topic string, payload string, received_time timestamp, "
        "packet_id long, dup boolean",
    )
    out = dedupe_redeliveries(df)
    assert out.count() == 2
    assert out.select("mid").distinct().count() == 2


def test_datasource_registration_surface():
    assert MqttDataSource.name() == "mqtt_pump"
    assert MqttDataSource(options={}).schema() == MQTT_SOURCE_SCHEMA
    if not mqtt_available():
        with pytest.raises(ImportError, match="data source API"):
            register_mqtt_source(None)


def test_commit_fast_forwards_scheduling_offsets():
    """After a checkpoint restore the reader's counters start at zero
    while the commit log is far ahead: commit(end) must fast-forward so
    the NEXT latestOffset schedules a fresh poll window instead of
    sitting below the committed end for several triggers; a replayed
    batch presenting start > end reads zero rows rather than crashing."""
    reader = _reader([], group_num="2")
    # restored batch from the commit log: end way ahead of fresh counters
    reader.commit({"0": 30000, "1": 50})
    nxt = reader.latestOffset()
    assert int(nxt["0"]) == 30000 + reader.max_batch_rows
    assert int(nxt["1"]) == 50 + reader.max_batch_rows
    # commit never rewinds
    reader.commit({"0": 10})
    assert reader._counts[0] == 30000 + reader.max_batch_rows

    # a start > end batch must yield zero rows WITHOUT opening a
    # broker session -- even with traffic waiting in the feed
    loaded = _reader(_feed(0, 5), group_num="2")
    part = loaded.partitions({"0": 30000, "1": 0}, {"0": 10, "1": 0})[0]
    assert list(loaded.read(part)) == []
