"""Live-TCP MQTT loopback: ``MqttStreamReader`` driven end-to-end over a
real socket against the in-process ``MiniBroker`` (no paho, no mosquitto).

This is the wire-level complement to ``test_mqtt_source.py``'s in-memory
fake: every byte here crosses a loopback TCP connection through the MQTT
3.1.1 framing in ``sources/minimqtt.py``.  Covers reference behavior the
fake cannot: QoS-1 DUP redelivery carrying the SAME packet id
(``mqtt.go:117-126`` surfaces mid/dup from Paho), per-micro-batch
reconnect after a broker outage (``mqtt.go:41`` AutoReconnect), and +/#
topic-filter routing done by a broker rather than the test itself.
"""

from __future__ import annotations

import datetime
import threading
import time

import pytest

from mqtt_message_pump_spark.sources.minimqtt import (
    MiniBroker,
    MiniMqttClient,
    minimqtt_client_factory,
    topic_matches,
)
from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader


@pytest.fixture
def broker():
    b = MiniBroker()
    yield b
    b.stop()


def _reader(port: int, *, group_num="0", qos="0", timeout="5", **extra):
    opts = {
        "server": f"tcp://127.0.0.1:{port}",
        "group_num": group_num,
        "topic_root": "pump/",
        "topic_prefix": "g",
        "qos": qos,
        "poll_timeout_secs": timeout,
        **extra,
    }
    return MqttStreamReader(opts, client_factory=minimqtt_client_factory)


def _publish_when_subscribed(
    broker: MiniBroker, topic: str, payloads: list[bytes], qos: int = 0,
    timeout: float = 60.0,
) -> threading.Thread:
    """Background publisher that waits until some connection's filter
    matches ``topic`` (the reader subscribing) before sending.  The
    generous default timeout covers a streaming query's cold start --
    the executor-side subscribe only exists during a poll window."""

    def run():
        assert broker.wait_for_subscription(topic, timeout=timeout)
        pub = MiniMqttClient("127.0.0.1", broker.port, client_id="pub")
        for p in payloads:
            pub.publish(topic, p, qos=qos)
        pub.disconnect()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t

def test_live_tcp_end_to_end(broker):
    """Reader -> broker -> publisher round-trip over real TCP: rows come
    back with decoded payloads, wildcard-matched topics, receipt stamps."""
    reader = _reader(broker.port)
    t = _publish_when_subscribed(
        broker, "pump/g/7", [b'{"k": 0}', b'{"k": 1}', b'{"k": 2}']
    )
    part = reader.partitions({"0": 0}, {"0": 3})[0]
    rows = list(reader.read(part))
    t.join(timeout=5)
    assert [r[1] for r in rows] == ['{"k": 0}', '{"k": 1}', '{"k": 2}']
    assert all(r[0] == "pump/g/7" for r in rows)  # matched via pump/g/#
    assert all(isinstance(r[2], datetime.datetime) for r in rows)
    # QoS-0 publishes carry no packet id and are never DUP
    assert all(r[3] == 0 and r[4] is False for r in rows)


def test_live_qos1_dup_redelivery_dedup(broker, spark):
    """QoS-1 with the broker forced into at-least-once redelivery: each
    message arrives TWICE over the wire (second with DUP=1, same packet
    id), and ``dedupe_redeliveries`` collapses the replays exactly."""
    from mqtt_message_pump_spark.streaming.pump import dedupe_redeliveries

    broker.redeliver_qos1 = True
    reader = _reader(broker.port, qos="1")
    payloads = [b'{"k": 1}', b'{"k": 2}', b'{"k": 3}']
    t = _publish_when_subscribed(broker, "pump/g/0", payloads, qos=1)
    part = reader.partitions({"0": 0}, {"0": 6})[0]
    rows = list(reader.read(part))
    t.join(timeout=5)
    assert len(rows) == 6

    originals = [r for r in rows if r[4] is False]
    dups = [r for r in rows if r[4] is True]
    assert len(originals) == 3 and len(dups) == 3
    # the redelivery reuses the ORIGINAL packet id (MQTT 3.1.1 §3.3.1.1);
    # three distinct messages got three distinct ids (broker assigns
    # under its lock, so no id is ever shared by two distinct messages)
    assert sorted(r[3] for r in dups) == sorted(r[3] for r in originals)
    assert len({r[3] for r in originals}) == 3

    epoch = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (r[0], r[1], epoch + datetime.timedelta(seconds=i), r[3], r[4])
            for i, r in enumerate(rows)
        ],
        "topic string, payload string, received_time timestamp, "
        "packet_id long, dup boolean",
    )
    out = dedupe_redeliveries(df)
    assert out.count() == 3
    assert sorted(
        r.payload for r in out.select("payload").collect()
    ) == ['{"k": 1}', '{"k": 2}', '{"k": 3}']


def test_live_group_partition_topics(broker):
    """Fan-out mode over real TCP: each group partition's client
    subscribes to ITS exact group topic; the broker routes per-filter, so
    a group sees only its own traffic (``mqtt.go:72-77``)."""
    reader = _reader(broker.port, group_num="2", timeout="2")
    t0 = _publish_when_subscribed(broker, "pump/g/0", [b"a0", b"b0"])
    part0 = reader.partitions({"0": 0, "1": 0}, {"0": 2, "1": 0})[0]
    rows0 = list(reader.read(part0))
    t0.join(timeout=5)
    assert [r[1] for r in rows0] == ["a0", "b0"]
    assert all(r[0] == "pump/g/0" for r in rows0)

    # group 1's subscription (exact topic pump/g/1) must NOT see g/0 traffic
    def publish_both():
        assert broker.wait_for_subscription("pump/g/1", timeout=5.0)
        pub = MiniMqttClient("127.0.0.1", broker.port, client_id="pub2")
        pub.publish("pump/g/0", b"stray", qos=0)
        pub.publish("pump/g/1", b"mine", qos=0)
        pub.disconnect()

    t1 = threading.Thread(target=publish_both, daemon=True)
    t1.start()
    part1 = reader.partitions({"0": 0, "1": 0}, {"0": 0, "1": 1})[1]
    rows1 = list(reader.read(part1))
    t1.join(timeout=5)
    assert [(r[0], r[1]) for r in rows1] == [("pump/g/1", b"mine".decode())]


def test_live_broker_restart_reconnect(broker):
    """Per-micro-batch reconnect (the reference relies on Paho
    AutoReconnect, ``mqtt.go:41``; our reader builds a fresh client per
    batch): a batch read during broker downtime fails loudly, and the
    next batch connects cleanly to a broker restarted on the SAME port."""
    port = broker.port
    reader = _reader(port, timeout="3")
    t = _publish_when_subscribed(broker, "pump/g/1", [b"one"])
    rows = list(reader.read(reader.partitions({"0": 0}, {"0": 1})[0]))
    t.join(timeout=5)
    assert [r[1] for r in rows] == ["one"]

    # broker dies mid-stream: the NEXT micro-batch's connect attempt must
    # surface an error (Spark then retries the task), not hang silently
    broker.stop()
    with pytest.raises(OSError):
        list(reader.read(reader.partitions({"0": 0}, {"0": 1})[0]))

    # broker comes back on the same port; a fresh micro-batch reconnects
    revived = MiniBroker(port=port)
    try:
        t2 = _publish_when_subscribed(revived, "pump/g/1", [b"two", b"three"])
        rows2 = list(reader.read(reader.partitions({"0": 0}, {"0": 2})[0]))
        t2.join(timeout=5)
        assert [r[1] for r in rows2] == ["two", "three"]
    finally:
        revived.stop()


def test_live_idle_connection_survives_quiet_period(broker):
    """The client clears its connect timeout after CONNACK: a subscriber
    idle past the 10 s handshake timeout must keep its read loop alive
    (regression: socket.timeout used to silently kill ``_read_loop``).
    Tested with a shortened handshake timeout so the test stays fast."""
    got = []
    sub = MiniMqttClient(
        "127.0.0.1", broker.port, client_id="idle-sub", timeout=0.3
    )
    sub.on_message = lambda c, u, m: got.append(m.payload)
    sub.subscribe("quiet/topic", qos=0)
    time.sleep(0.8)  # idle well past the 0.3 s connect timeout
    pub = MiniMqttClient("127.0.0.1", broker.port, client_id="late-pub")
    pub.publish("quiet/topic", b"still-alive", qos=0)
    deadline = time.time() + 5
    while not got and time.time() < deadline:
        time.sleep(0.02)
    pub.disconnect()
    sub.disconnect()
    assert got == [b"still-alive"]


def test_concurrent_publishers_unique_packet_ids(broker):
    """Packet ids are assigned under the broker lock: many concurrent
    QoS-1 publishers routing to one subscriber must never hand two
    DISTINCT messages the same packet id (which mid-keyed dedup would
    wrongly collapse)."""
    n_pub, per_pub = 8, 25
    got: list[tuple[int, bytes]] = []
    got_lock = threading.Lock()
    sub = MiniMqttClient("127.0.0.1", broker.port, client_id="sub")

    def on_msg(c, u, m):
        with got_lock:
            got.append((m.mid, m.payload))

    sub.on_message = on_msg
    sub.subscribe("race/#", qos=1)

    def pump(i: int):
        pub = MiniMqttClient("127.0.0.1", broker.port, client_id=f"p{i}")
        for j in range(per_pub):
            pub.publish(f"race/{i}", f"{i}:{j}".encode(), qos=1)
        pub.disconnect()

    threads = [threading.Thread(target=pump, args=(i,)) for i in range(n_pub)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    deadline = time.time() + 10
    while time.time() < deadline:
        with got_lock:
            if len(got) >= n_pub * per_pub:
                break
        time.sleep(0.02)
    sub.disconnect()
    assert len(got) == n_pub * per_pub
    # every delivery got a distinct id (no wrap at 200 < 65535)
    assert len({mid for mid, _ in got}) == n_pub * per_pub


def test_spark_readstream_end_to_end(broker, spark, tmp_path):
    """THE full product path: ``spark.readStream.format("mqtt_pump")``
    against a live TCP broker with the pure-python client fallback
    (client_impl=auto, no paho installed) -- DataSource registration,
    advancing scheduling offsets, executor-side subscribe/poll/drain,
    rows landing in foreachBatch with the source schema."""
    import time as _time

    from mqtt_message_pump_spark.sources.mqtt import (
        mqtt_available,
        register_mqtt_source,
    )

    if not mqtt_available():
        pytest.skip("Spark 4 Python data source API unavailable")
    register_mqtt_source(spark)

    stream = (
        spark.readStream.format("mqtt_pump")
        .option("server", f"tcp://127.0.0.1:{broker.port}")
        .option("group_num", "0")
        .option("topic_root", "pump/")
        .option("topic_prefix", "g")
        .option("qos", "1")
        .option("poll_timeout_secs", "3")
        .load()
    )
    got: list = []

    def sink(batch_df, batch_id):
        got.extend(batch_df.collect())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # publish as soon as an executor-side poll subscribes
        payloads = [f'{{"n": {i}}}'.encode() for i in range(4)]
        pub_done = _publish_when_subscribed(
            broker, "pump/g/5", payloads, qos=1
        )
        deadline = _time.time() + 60
        while len(got) < 4 and _time.time() < deadline:
            _time.sleep(0.2)
        pub_done.join(timeout=5)
    finally:
        q.stop()
        q.awaitTermination(30)

    assert len(got) >= 4, f"only {len(got)} rows arrived via readStream"
    rows = {r.payload for r in got}
    assert {f'{{"n": {i}}}' for i in range(4)} <= rows
    one = got[0]
    assert one.topic == "pump/g/5"
    assert one.received_time is not None
    assert one.packet_id >= 1 and one.dup is False


def test_live_full_pump_exactly_once(broker, spark, tmp_path):
    """CAPSTONE: the whole reference pipeline live over the wire --
    MiniBroker -> ``readStream.format("mqtt_pump")`` (pure-python
    client) -> dual-path pump (enrich, dedupe, flatten) -> partitioned
    parquet sinks.  The broker redelivers every QoS-1 publish with DUP=1,
    and the checkpointed content-derived-mid dedup collapses the
    at-least-once stream to EXACTLY-ONCE sink rows -- the end-to-end
    guarantee the reference cannot make (SURVEY.md §2.6)."""
    import time as _time

    from mqtt_message_pump_spark.sources.mqtt import register_mqtt_source
    from mqtt_message_pump_spark.streaming.pump import (
        drain_and_stop,
        start_stream_pump,
    )

    broker.redeliver_qos1 = True
    register_mqtt_source(spark)
    stream = (
        spark.readStream.format("mqtt_pump")
        .option("server", f"tcp://127.0.0.1:{broker.port}")
        .option("group_num", "0")
        .option("topic_root", "pump/")
        .option("topic_prefix", "g")
        .option("qos", "1")
        .option("poll_timeout_secs", "3")
        .load()
    )
    out = tmp_path / "out"
    q = start_stream_pump(
        spark,
        stream,
        str(out),
        str(tmp_path / "ckpt"),
        trigger_secs=1,
        dedupe_watermark="1 minute",
    )
    raw_dir = out / "raw_message"
    try:
        # the pump's multi-record payload shape (map of record structs)
        payloads = [
            f'{{"r1": {{"k": {i}}}, "r2": {{"k": {i + 100}}}}}'.encode()
            for i in range(5)
        ]
        pub = _publish_when_subscribed(broker, "pump/g/2", payloads, qos=1)
        deadline = _time.time() + 90
        n = 0
        while _time.time() < deadline:
            try:
                n = spark.read.parquet(str(raw_dir)).count()
            except Exception:
                n = 0
            if n >= 5:
                # one more trigger so any straggling DUP redelivery has
                # been through the dedup before we assert exactly-once
                _time.sleep(3)
                break
            _time.sleep(0.5)
        pub.join(timeout=5)
    finally:
        drain_and_stop(q)

    raw = spark.read.parquet(str(raw_dir))
    rows = raw.collect()
    # every message exactly once: 10 wire deliveries -> 5 sink rows
    assert len(rows) == 5, f"expected 5 exactly-once rows, got {len(rows)}"
    assert len({r.mid for r in rows}) == 5
    assert sorted(r.payload for r in rows) == sorted(
        p.decode() for p in payloads
    )
    flat = spark.read.parquet(str(out / "json_message"))
    # flattened fan-out: one row per (message, record key)
    assert flat.count() == 10
    assert {r.key_id for r in flat.select("key_id").distinct().collect()} == {
        "r1", "r2",
    }


def test_live_monitor_publish_over_wire(broker, spark):
    """S7 over a real socket: the monitor listener's per-trigger metrics
    JSON is published through an actual MQTT client to the broker and
    received by a wire subscriber on the flattened monitor topic
    (reference ``monitor.go:100-106`` publish loop + ``mqtt.go:93-94``
    topic underscore parity)."""
    import json as _json
    import time as _time

    from mqtt_message_pump_spark.streaming.monitor import (
        PumpMonitorListener,
    )

    got: list = []
    sub = MiniMqttClient("127.0.0.1", broker.port, client_id="mon-sub")
    sub.on_message = lambda c, u, m: got.append((m.topic, m.payload))
    sub.subscribe("Pump_Monitor/#", qos=0)

    pub = MiniMqttClient("127.0.0.1", broker.port, client_id="mon-pub")
    listener = PumpMonitorListener(
        lambda topic, payload: pub.publish(topic, payload.encode(), qos=0),
        topic_root="Pump_Monitor",
        target="pump/g/",
    )
    spark.streams.addListener(listener)
    q = None
    try:
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "10")
            .load()
            .writeStream.format("noop")
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = _time.time() + 30
        while not got and _time.time() < deadline:
            _time.sleep(0.2)
    finally:
        if q is not None:
            q.stop()
            q.awaitTermination(30)
        spark.streams.removeListener(listener)
        sub.disconnect()
        pub.disconnect()

    assert got, "no monitor payload arrived over the wire"
    topic, payload = got[0]
    assert topic == "Pump_Monitor/pump_g_"  # slashes flattened, mqtt.go:93
    doc = _json.loads(payload)
    assert "AvgPeriodSubMsgPerSec" in doc and "BatchId" in doc
    assert listener.pub_succeed >= 1 and listener.pub_failed == 0


def test_topic_filter_semantics():
    """MQTT 3.1.1 +/# filter matching used by the broker's router."""
    assert topic_matches("a/+/c", "a/b/c")
    assert not topic_matches("a/+/c", "a/b/d")
    assert topic_matches("a/#", "a/b/c/d")
    assert topic_matches("#", "anything/at/all")
    assert not topic_matches("a/b", "a/b/c")
    assert not topic_matches("a/b/c", "a/b")


def test_live_broker_auth(broker):
    """Credentials flow client -> wire -> broker: a broker requiring
    (user, pass) accepts the matching client, refuses a wrong/absent one
    with CONNACK return code 4 (MQTT 3.1.1 §3.2.2.3) -- surfaced as a
    loud ConnectionError at connect, not a later SUBACK timeout."""
    broker.required_user = ("pump", "s3cret")
    ok = MiniMqttClient(
        "127.0.0.1", broker.port, username="pump", password="s3cret"
    )
    ok.subscribe("auth/topic", qos=0)  # proves the session is usable
    ok.disconnect()
    for kwargs in ({}, {"username": "pump", "password": "wrong"}):
        with pytest.raises(ConnectionError, match="return code 4"):
            MiniMqttClient("127.0.0.1", broker.port, **kwargs)

    from mqtt_message_pump_spark.sources.minimqtt import (
        minimqtt_client_factory,
    )

    c = minimqtt_client_factory(
        {
            "server": f"tcp://127.0.0.1:{broker.port}",
            "username": "pump",
            "password": "s3cret",
        }
    )
    c.disconnect()


def test_live_will_connect_with_auth(broker):
    """A CONNECT carrying a Will (flag 0x04) puts Will topic+message
    BEFORE the username in the payload (MQTT 3.1.1 §3.1.3); the broker
    must skip them when parsing credentials, or a valid willed client is
    refused with rc=4 (r7 ADVICE: previously misparsed Will bytes as the
    username)."""
    broker.required_user = ("pump", "s3cret")
    willed = MiniMqttClient(
        "127.0.0.1",
        broker.port,
        username="pump",
        password="s3cret",
        will=("pump/last", b"gone"),
    )
    willed.subscribe("will/topic", qos=0)  # session survives + usable
    willed.disconnect()
    # wrong credentials on a willed CONNECT are still refused
    with pytest.raises(ConnectionError, match="return code 4"):
        MiniMqttClient(
            "127.0.0.1", broker.port,
            username="pump", password="wrong", will=("pump/last", b"gone"),
        )


def test_live_keepalive_ping_survives_enforcing_broker():
    """A client declaring keepalive K runs a PINGREQ loop at K/2, so a
    spec-enforcing broker (drops after 1.5*K of silence, MQTT 3.1.1
    §3.1.2.10) keeps the idle connection alive -- the long-lived monitor
    client pattern (r7 ADVICE: declaring 60 but never pinging means a
    real broker kills the client after ~90 s)."""
    broker = MiniBroker(enforce_keepalive=True)
    try:
        sub = MiniMqttClient("127.0.0.1", broker.port, keepalive=2)
        sub.subscribe("ka/topic", qos=0)
        time.sleep(3.5)  # > 1.5x keepalive of publish silence
        assert sub._reader.is_alive()  # connection NOT dropped
        got = threading.Event()
        sub.on_message = lambda c, u, m: got.set()
        pub = MiniMqttClient("127.0.0.1", broker.port)
        pub.publish("ka/topic", b"still-here")
        assert got.wait(timeout=5.0)
        pub.disconnect()
        sub.disconnect()
    finally:
        broker.stop()


def test_live_silent_client_dropped_by_enforcing_broker():
    """Negative control for the keepalive fix: a client that DECLARES a
    keepalive but never pings (the pre-fix behavior) is dropped by the
    enforcing broker after ~1.5x keepalive."""
    broker = MiniBroker(enforce_keepalive=True)
    try:
        sub = MiniMqttClient("127.0.0.1", broker.port, keepalive=2)
        sub._closed.set()  # kill the ping loop: simulate the old client
        sub.subscribe("ka/topic", qos=0)
        deadline = time.time() + 8.0
        while sub._reader.is_alive() and time.time() < deadline:
            time.sleep(0.1)
        assert not sub._reader.is_alive()  # broker closed the connection
    finally:
        broker.stop()


def test_live_budget_cap_leaves_excess_unacked(broker):
    """The r7 ADVICE QoS-1 loss fix over a real socket: when more QoS-1
    messages arrive than the micro-batch budget, the reader yields
    exactly the budget AND acks exactly those -- the excess deliveries
    stay unacknowledged at the broker (redelivery-eligible on a real
    broker via clean_session=false), instead of being acked-then-dropped."""
    reader = _reader(broker.port, qos="1")
    payloads = [f'{{"k": {i}}}'.encode() for i in range(6)]
    t = _publish_when_subscribed(broker, "pump/g/0", payloads, qos=1)
    part = reader.partitions({"0": 0}, {"0": 2})[0]
    rows = list(reader.read(part))
    t.join(timeout=5)
    time.sleep(0.2)  # let in-flight PUBACKs reach the broker
    assert len(rows) == 2
    kept_pids = {r[3] for r in rows}
    assert len(kept_pids) == 2 and 0 not in kept_pids
    # broker saw acks for the kept packet ids ONLY
    assert broker.acked_pids == kept_pids


def test_live_multigroup_offset_pump_fan_in(broker, spark, tmp_path):
    """The reference's full fan-out shape over real TCP: enablegroupnum
    with begingroupnum=3/endgroupnum=4 means TWO pipes subscribing to the
    NUMBERED topics pump/g/3 and pump/g/4 (``main.go:111``,
    ``mqtt.go:73-75``) -- here two source partitions, each with its own
    live client and its own receive-WAL file, fanned into ONE pump query
    and one pair of sinks (S3 multi-pipe fan-in).  Rows from both groups
    land exactly once; traffic on a group outside [begin, end] is never
    subscribed and never appears."""
    import os

    from mqtt_message_pump_spark.sources.mqtt import register_mqtt_source
    from mqtt_message_pump_spark.streaming.pump import (
        drain_and_stop,
        start_stream_pump,
    )

    register_mqtt_source(spark)
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def feed():
        assert broker.wait_for_subscription("pump/g/3", timeout=30)
        assert broker.wait_for_subscription("pump/g/4", timeout=30)
        pub = MiniMqttClient("127.0.0.1", broker.port, client_id="mg-pub")
        for i in range(5):
            pub.publish("pump/g/3", f'{{"r1": {{"k": {i}}}}}'.encode(), qos=1)
            pub.publish(
                "pump/g/4", f'{{"r1": {{"k": {100 + i}}}}}'.encode(), qos=1
            )
        # outside the configured [3, 4] span: must never be subscribed
        pub.publish("pump/g/5", b'{"r1": {"k": 999}}', qos=1)
        pub.disconnect()

    t = threading.Thread(target=feed, daemon=True)
    t.start()
    stream = (
        spark.readStream.format("mqtt_pump")
        .option("server", f"tcp://127.0.0.1:{broker.port}")
        .option("group_num", "2")
        .option("group_offset", "3")
        .option("topic_root", "pump/")
        .option("topic_prefix", "g")
        .option("qos", "1")
        .option("clean_session", "false")
        .option("client_name", "mg-sub")
        .option("poll_timeout_secs", "2")
        .option("wal_dir", str(ckpt / "_mqtt_wal"))
        .load()
    )
    q = start_stream_pump(
        spark, stream, str(out), str(ckpt),
        trigger_secs=1, dedupe_watermark="30 seconds",
    )
    deadline = time.time() + 60
    def raw_count():
        try:
            return spark.read.parquet(str(out / "raw_message")).count()
        except Exception:
            return 0
    while time.time() < deadline and raw_count() < 10:
        time.sleep(1)
    drain_and_stop(q)
    t.join(timeout=5)

    raw = spark.read.parquet(str(out / "raw_message"))
    rows = raw.select("topic", "payload").collect()
    assert len(rows) == 10
    by_topic = {}
    for r in rows:
        by_topic.setdefault(r.topic, []).append(r.payload)
    assert set(by_topic) == {"pump/g/3", "pump/g/4"}
    assert len(by_topic["pump/g/3"]) == 5
    assert len(by_topic["pump/g/4"]) == 5
    assert not any("999" in p for ps in by_topic.values() for p in ps)
    # each group partition wrote its own WAL files (g0-*, g1-*)
    wal_names = os.listdir(ckpt / "_mqtt_wal") if (ckpt / "_mqtt_wal").exists() else []
    groups_seen = {n.split("-")[0] for n in wal_names}
    assert groups_seen <= {"g0", "g1"}
