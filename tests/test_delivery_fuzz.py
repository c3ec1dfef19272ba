"""Seeded fuzz harness for the receive path's delivery state machine.

The kill-point matrix (``test_round9_ops.py``) proves each crash window
in isolation; this harness composes them: a scripted model broker with
MQTT 3.1.1 persistent-session semantics (un-acked deliveries requeue
dup=1 with fresh packet ids, queued publishes survive disconnects), a
publisher that keeps publishing across batches AND mid-poll (the frozen-
batch window), and a scheduler that injects a crash at a RANDOM call
boundary of every batch attempt -- poll, loop_stop, each individual ack,
the marker write -- or lets the batch commit.  Replays re-read the same
offsets, exactly like Spark's micro-batch retry.

Invariant asserted per schedule, with content dedup OFF: the union of
committed batches' outputs contains every published message EXACTLY
once.  Hundreds of interleavings per run, no Spark session needed.
"""

from __future__ import annotations

import random

import pytest

from mqtt_message_pump_spark.sources.mqtt import MqttStreamReader


class _Msg:
    def __init__(self, topic, payload, mid, dup=False):
        self.topic = topic
        self.payload = payload
        self.mid = mid
        self.dup = dup


class ModelBroker:
    """Persistent-session model: one subscriber session.  Publishes go
    to the session queue; deliveries move to in-flight until acked; a
    disconnect requeues un-acked in-flight at the queue FRONT as dup=1
    (MQTT 3.1.1 SS4.4); packet ids are fresh per connection."""

    def __init__(self):
        self.queue: list[tuple[bytes, bool]] = []  # (payload, dup)
        self.inflight: dict[int, tuple[bytes, bool]] = {}
        self._next_pid = 0
        # ground truth: every payload ACTUALLY handed to the broker --
        # the harness asserts against this, so scheduling paths that
        # never connect a client (WAL replays) can't skew the ledger
        self.all_published: list[bytes] = []

    def publish(self, payload: bytes):
        self.all_published.append(payload)
        self.queue.append((payload, False))

    def deliver_next(self):
        if not self.queue:
            return None
        payload, dup = self.queue.pop(0)
        self._next_pid += 1
        self.inflight[self._next_pid] = (payload, dup)
        return _Msg("pump/g/1", payload, self._next_pid, dup)

    def ack(self, pid: int):
        self.inflight.pop(pid, None)

    def drop_connection(self):
        requeued = [(p, True) for _, (p, _d) in sorted(self.inflight.items())]
        self.queue = requeued + self.queue
        self.inflight = {}


class FuzzClient:
    """minimqtt-shaped client over the model broker, with a crash fuse:
    ``kill_at`` counts risky calls (loop_start deliveries, loop_stop,
    each ack) and raises when the fuse burns down -- the crash can land
    at ANY boundary.  ``midpoll`` payloads arrive during loop_stop,
    exercising the frozen-batch window (the network thread outliving the
    poll)."""

    manual_ack = True

    def __init__(self, broker, kill_at=None, deliver_n=None, midpoll=()):
        self.broker = broker
        self.kill_at = kill_at
        self.deliver_n = deliver_n  # rows to deliver this poll (None=all)
        self.midpoll = list(midpoll)
        self.on_message = None
        self.calls = 0

    def _tick(self):
        self.calls += 1
        if self.kill_at is not None and self.calls >= self.kill_at:
            self.broker.drop_connection()
            raise ConnectionError("fuzz kill")

    def subscribe(self, topic, qos=0):
        pass

    def loop_start(self):
        n = 0
        while self.deliver_n is None or n < self.deliver_n:
            self._tick()
            msg = self.broker.deliver_next()
            if msg is None:
                break
            self.on_message(self, None, msg)
            n += 1

    def loop_stop(self):
        self._tick()
        # late arrivals: published AND delivered while the poll is
        # closing -- the frozen batch must exclude-and-not-ack these
        for payload in self.midpoll:
            self.broker.publish(payload)
            msg = self.broker.deliver_next()
            if msg is not None:
                self.on_message(self, None, msg)

    def ack(self, pid):
        self._tick()
        self.broker.ack(pid)

    def disconnect(self):
        self.broker.drop_connection()


@pytest.mark.parametrize("seed", range(30))
def test_delivery_fuzz_exactly_once(tmp_path, seed):
    rng = random.Random(seed)
    broker = ModelBroker()
    seq = 0

    def publish_some(k):
        nonlocal seq
        for _ in range(k):
            broker.publish(f'{{"k": {seq}}}'.encode())
            seq += 1

    committed: list[str] = []
    start = 0
    client_box = {}

    def factory(opts):
        return client_box["client"]

    reader = MqttStreamReader(
        {
            "group_num": "0",
            "topic_root": "pump/",
            "topic_prefix": "g",
            "poll_timeout_secs": "0.01",
            "wal_dir": str(tmp_path / "wal"),
        },
        client_factory=factory,
    )

    n_batches = 12
    for _ in range(n_batches):
        publish_some(rng.randint(0, 4))
        # budget-capped ranges too: want can be SMALLER than the pending
        # queue, exercising the over-budget un-acked requeue path
        end = start + rng.choice([2, 3, 5, 100])
        part = reader.partitions({"0": start}, {"0": end})[0]
        # a batch may be attempted several times (kill -> replay)
        for attempt in range(6):
            kill = rng.random() < 0.45 and attempt < 5
            midpoll = (
                [f'{{"k": {seq + i}, "late": 1}}'.encode() for i in range(rng.randint(1, 2))]
                if rng.random() < 0.3
                else []
            )
            seq += len(midpoll)
            client_box["client"] = FuzzClient(
                broker,
                kill_at=rng.randint(1, 12) if kill else None,
                deliver_n=rng.choice([None, None, rng.randint(0, 3)]),
                midpoll=midpoll,
            )
            try:
                rows = list(reader.read(part))
            except ConnectionError:
                continue  # crash: batch replays (same offsets)
            # sink + checkpoint commit can ALSO die: with probability,
            # discard the output and replay (replay-idempotent sinks
            # make re-appends safe; here we model the offset log)
            if rng.random() < 0.25 and attempt < 5:
                continue
            committed.extend(r[1] for r in rows)
            reader.commit({"0": end})
            break
        else:
            pytest.fail("batch never committed within 6 attempts")
        start = end

    # drain: keep polling committed batches until the broker is empty
    for _ in range(20):
        if not broker.queue and not broker.inflight:
            break
        end = start + 100
        part = reader.partitions({"0": start}, {"0": end})[0]
        client_box["client"] = FuzzClient(broker)
        rows = list(reader.read(part))
        committed.extend(r[1] for r in rows)
        reader.commit({"0": end})
        start = end

    got = sorted(committed)
    want = sorted(p.decode() for p in broker.all_published)
    assert got == want, (
        f"seed={seed}: delivered {len(got)} vs published {len(want)}; "
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )
