"""Minimal in-process MQTT 3.1.1 broker + client (pure stdlib TCP).

Why this exists: the test container has neither a ``mosquitto`` binary
nor ``paho-mqtt``, so the live-broker path of the MQTT source
(``sources/mqtt.py``) would otherwise only ever be exercised through an
in-memory fake.  This module implements just enough of the public MQTT
3.1.1 wire protocol (OASIS spec: CONNECT/CONNACK, SUBSCRIBE/SUBACK,
PUBLISH/PUBACK, PINGREQ/PINGRESP, DISCONNECT) for a REAL network
round-trip: ``MiniBroker`` is a threaded TCP broker with +/# topic-filter
routing, ``MiniMqttClient`` a socket client exposing the same surface the
reader needs from Paho (``on_message`` / ``subscribe`` / ``loop_start`` /
``loop_stop`` / ``disconnect``), and ``minimqtt_client_factory`` the
drop-in ``client_factory`` for ``MqttStreamReader``.

It is a test/dev loopback, not a production broker: QoS 0/1 only (no
QoS 2 handshake, no retained messages).  Persistent sessions ARE
implemented (MQTT 3.1.1 §3.1.2.4: clean_session=0 keeps subscriptions,
queues QoS-1 messages while the client is offline, re-queues unacked
in-flight deliveries as DUP on connection loss) -- the broker half of the
"replay comes from the broker" contract the budget-capped reader relies
on.  The broker can also deliberately REDELIVER every QoS-1 publish with
DUP=1
(``redeliver_qos1=True``) -- forcing the at-least-once duplication that
real brokers only produce on connection loss, so the packet-id dedup
path is testable end-to-end (reference parity: ``mqtt.go:117-126``
delivers Paho messages with mid/dup; ``SURVEY.md SS2.6``).
"""

from __future__ import annotations

import collections
import socket
import struct
import threading
import time
from types import SimpleNamespace

CONNECT, CONNACK, PUBLISH, PUBACK = 1, 2, 3, 4
SUBSCRIBE, SUBACK, PINGREQ, PINGRESP, DISCONNECT = 8, 9, 12, 13, 14


def _encode_len(n: int) -> bytes:
    out = bytearray()
    while True:
        d, n = n % 128, n // 128
        out.append(d | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _encode_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("socket closed")
        buf += chunk
    return buf


def _read_packet(sock: socket.socket) -> tuple[int, int, bytes]:
    """Read one MQTT control packet: (type, flags, body)."""
    head = _read_exact(sock, 1)[0]
    length, shift = 0, 0
    while True:
        b = _read_exact(sock, 1)[0]
        length |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    body = _read_exact(sock, length) if length else b""
    return head >> 4, head & 0x0F, body


def _packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([(ptype << 4) | flags]) + _encode_len(len(body)) + body


def topic_matches(flt: str, topic: str) -> bool:
    """MQTT 3.1.1 topic-filter matching: ``+`` one level, ``#`` suffix."""
    fparts, tparts = flt.split("/"), topic.split("/")
    for i, fp in enumerate(fparts):
        if fp == "#":
            return True
        if i >= len(tparts) or (fp != "+" and fp != tparts[i]):
            return False
    return len(fparts) == len(tparts)


class MiniBroker:
    """Threaded loopback MQTT 3.1.1 broker bound to 127.0.0.1.

    ``redeliver_qos1=True`` delivers every QoS-1 publish to each matching
    subscriber TWICE -- second copy with DUP=1 and the same packet id --
    modelling the at-least-once redelivery window of a real broker after
    an unacknowledged delivery.
    """

    def __init__(
        self,
        port: int = 0,
        redeliver_qos1: bool = False,
        required_user: tuple[str, str] | None = None,
        enforce_keepalive: bool = False,
    ):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", port))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self.redeliver_qos1 = redeliver_qos1
        # (username, password) every CONNECT must present, else CONNACK
        # return code 4 (bad user name or password, MQTT 3.1.1 §3.2.2.3)
        self.required_user = required_user
        # MQTT 3.1.1 §3.1.2.10: when True, a connection whose CONNECT
        # declared keepalive K > 0 is dropped after 1.5*K seconds of
        # control-packet silence (what mosquitto/EMQX do) -- lets tests
        # prove the client's PINGREQ loop actually keeps it alive
        self.enforce_keepalive = enforce_keepalive
        # subscriber PUBACKs seen, per packet id (QoS-1 consumers that
        # defer acks leave their unacked ids out of this set)
        self.acked_pids: set[int] = set()
        self._lock = threading.Lock()
        # Persistent sessions (MQTT 3.1.1 §3.1.2.4): client_id ->
        # {"subs": [(filter, qos)], "queue": deque[[topic, payload, qos,
        # dup]], "conn": live conn id | None}.  clean_session=0 CONNECTs
        # create/resume one; QoS-1 publishes matching an OFFLINE session's
        # subscriptions queue here and flush on re-subscribe, and
        # in-flight deliveries never PUBACKed re-queue (dup=1) when the
        # subscriber drops -- what the pump's budget-capped manual-ack
        # reader relies on for no-loss across micro-batches and restarts.
        self._sessions: dict[str, dict] = {}
        # conn -> {"sock", "wlock", "mid", "subs": [(filter, qos)],
        #          "session": session dict | None, "inflight": {pid: entry}}
        self._conns: dict[int, dict] = {}
        self._next_conn = 0
        self._stopped = threading.Event()
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True
        )
        self._accept_thread.start()

    # ------------------------------------------------------------ server
    def _accept_loop(self) -> None:
        while not self._stopped.is_set():
            try:
                sock, _ = self._srv.accept()
            except OSError:
                return
            if self._stopped.is_set():
                # stop() raced the accept: refuse, don't serve
                try:
                    sock.close()
                except OSError:
                    pass
                return
            with self._lock:
                cid = self._next_conn
                self._next_conn += 1
                self._conns[cid] = {
                    "sock": sock,
                    "wlock": threading.Lock(),
                    "mid": 0,
                    "subs": [],
                    "session": None,
                    "inflight": {},
                }
            threading.Thread(
                target=self._serve, args=(cid,), daemon=True
            ).start()

    def _send(self, conn: dict, data: bytes) -> None:
        with conn["wlock"]:
            conn["sock"].sendall(data)

    def _serve(self, cid: int) -> None:
        conn = self._conns[cid]
        sock = conn["sock"]
        try:
            while True:
                ptype, flags, body = _read_packet(sock)
                if ptype == CONNECT:
                    if self.required_user is not None:
                        if self._connect_creds(body) != self.required_user:
                            self._send(
                                conn, _packet(CONNACK, 0, b"\x00\x04")
                            )
                            break
                    if self.enforce_keepalive:
                        ka = self._connect_keepalive(body)
                        if ka > 0:
                            # §3.1.2.10: server MUST disconnect after
                            # 1.5x the declared keepalive of silence;
                            # any control packet (incl. PINGREQ) resets
                            # the timer via the per-recv socket timeout
                            sock.settimeout(ka * 1.5)
                    client_id, clean = self._connect_meta(body)
                    session_present = 0
                    if not clean and client_id:
                        with self._lock:
                            sess = self._sessions.get(client_id)
                            if sess is None:
                                sess = {
                                    "subs": [],
                                    "queue": collections.deque(),
                                    "conn": None,
                                }
                                self._sessions[client_id] = sess
                            else:
                                session_present = 1
                            conn["session"] = sess
                            # §3.1.2.4: subscriptions are session state
                            conn["subs"] = list(sess["subs"])
                            sess["conn"] = cid
                    elif clean and client_id:
                        with self._lock:
                            self._sessions.pop(client_id, None)
                    self._send(
                        conn,
                        _packet(CONNACK, 0, bytes([session_present, 0])),
                    )
                elif ptype == SUBSCRIBE:
                    (pid,) = struct.unpack(">H", body[:2])
                    i, granted = 2, []
                    while i < len(body):
                        (tl,) = struct.unpack(">H", body[i : i + 2])
                        flt = body[i + 2 : i + 2 + tl].decode("utf-8")
                        qos = body[i + 2 + tl]
                        i += 3 + tl
                        with self._lock:
                            conn["subs"].append((flt, qos))
                            if conn["session"] is not None:
                                conn["session"]["subs"] = list(conn["subs"])
                        granted.append(min(qos, 1))
                    self._send(
                        conn,
                        _packet(
                            SUBACK,
                            0,
                            struct.pack(">H", pid) + bytes(granted),
                        ),
                    )
                    # deliver messages queued while the session was
                    # offline (flushed post-SUBACK rather than at resume:
                    # our clients attach on_message between connect and
                    # subscribe, and an un-acked flush re-queues anyway)
                    self._flush_session(conn)
                elif ptype == PUBLISH:
                    qos = (flags >> 1) & 0x03
                    (tl,) = struct.unpack(">H", body[:2])
                    topic = body[2 : 2 + tl].decode("utf-8")
                    i = 2 + tl
                    if qos:
                        (pid,) = struct.unpack(">H", body[i : i + 2])
                        i += 2
                        self._send(
                            conn, _packet(PUBACK, 0, struct.pack(">H", pid))
                        )
                    self._route(topic, body[i:], qos)
                elif ptype == PINGREQ:
                    self._send(conn, _packet(PINGRESP, 0, b""))
                elif ptype == PUBACK:
                    # QoS-1 ack from a subscriber: record the packet id so
                    # tests can assert which deliveries a budget-capped
                    # reader actually acked (unacked = redelivery-eligible)
                    (apid,) = struct.unpack(">H", body[:2])
                    with self._lock:
                        self.acked_pids.add(apid)
                        conn["inflight"].pop(apid, None)
                elif ptype == DISCONNECT:
                    break
        except (ConnectionError, OSError):
            pass
        finally:
            with self._lock:
                # un-PUBACKed QoS-1 deliveries to a persistent session go
                # back to the FRONT of its queue as DUP redeliveries
                # (§4.4) -- the no-loss guarantee the budget-capped reader
                # leans on across micro-batches and pump restarts
                sess = conn["session"]
                if sess is not None:
                    if conn["inflight"]:
                        requeued = [
                            [e[0], e[1], e[2], True]
                            for _, e in sorted(conn["inflight"].items())
                        ]
                        sess["queue"] = collections.deque(
                            requeued + list(sess["queue"])
                        )
                        conn["inflight"] = {}
                    if sess["conn"] == cid:
                        sess["conn"] = None
                self._conns.pop(cid, None)
            try:
                sock.close()
            except OSError:
                pass

    def _flush_session(self, conn: dict) -> None:
        """Send every queued message matching ``conn``'s subscriptions,
        tracking each as in-flight until its PUBACK arrives."""
        while True:
            with self._lock:
                sess = conn["session"]
                if sess is None or not sess["queue"]:
                    return
                entry = None
                for idx, e in enumerate(sess["queue"]):
                    if any(topic_matches(f, e[0]) for f, _ in conn["subs"]):
                        del sess["queue"][idx]
                        entry = e
                        break
                if entry is None:
                    return
                topic, payload, qos, dup = entry
                conn["mid"] = conn["mid"] % 65535 + 1
                pid = conn["mid"]
                conn["inflight"][pid] = entry
            head = _encode_str(topic) + struct.pack(">H", pid)
            try:
                self._send(
                    conn,
                    _packet(
                        PUBLISH, (0x08 if dup else 0) | (qos << 1),
                        head + payload,
                    ),
                )
            except OSError:
                return

    @staticmethod
    def _connect_meta(body: bytes) -> tuple[str, bool]:
        """(client_id, clean_session) from a CONNECT body (MQTT 3.1.1
        §3.1.2.4 flag bit 1; client id is the first payload field)."""
        try:
            (plen,) = struct.unpack(">H", body[:2])
            flags = body[2 + plen + 1]
            i = 2 + plen + 1 + 1 + 2  # proto str + level + flags + keepalive
            (cl,) = struct.unpack(">H", body[i : i + 2])
            client_id = body[i + 2 : i + 2 + cl].decode("utf-8")
            return client_id, bool(flags & 0x02)
        except (struct.error, IndexError, UnicodeDecodeError):
            return "", True

    @staticmethod
    def _connect_keepalive(body: bytes) -> int:
        """Keepalive seconds declared in a CONNECT body (0 = disabled)."""
        try:
            (plen,) = struct.unpack(">H", body[:2])
            i = 2 + plen + 1 + 1  # proto str + level + flags
            return struct.unpack(">H", body[i : i + 2])[0]
        except (struct.error, IndexError):
            return 0

    @staticmethod
    def _connect_creds(body: bytes) -> tuple[str, str] | None:
        """Parse (username, password) out of a CONNECT body; None when
        the user-name flag is unset.  Per MQTT 3.1.1 §3.1.3 the payload
        order is client-id, [Will topic, Will message], [user], [pwd] --
        a Will (flags & 0x04) must be skipped or its bytes would be
        misparsed as credentials."""
        try:
            (plen,) = struct.unpack(">H", body[:2])
            flags = body[2 + plen + 1]
            i = 2 + plen + 1 + 1 + 2  # proto str + level + flags + keepalive
            (cl,) = struct.unpack(">H", body[i : i + 2])
            i += 2 + cl  # client id
            if flags & 0x04:  # Will topic + Will message precede username
                for _ in range(2):
                    (wl,) = struct.unpack(">H", body[i : i + 2])
                    i += 2 + wl
            if not flags & 0x80:
                return None
            (ul,) = struct.unpack(">H", body[i : i + 2])
            user = body[i + 2 : i + 2 + ul].decode("utf-8")
            i += 2 + ul
            pwd = ""
            if flags & 0x40:
                (pl,) = struct.unpack(">H", body[i : i + 2])
                pwd = body[i + 2 : i + 2 + pl].decode("utf-8")
            return (user, pwd)
        except (struct.error, IndexError, UnicodeDecodeError):
            return None

    def _route(self, topic: str, payload: bytes, pub_qos: int) -> None:
        # Packet ids are assigned INSIDE the lock: concurrent publishers
        # routing to the same subscriber must not race conn["mid"]'s
        # read-modify-write, or two distinct messages could share a packet
        # id and be wrongly collapsed by the mid-based dedup under test.
        with self._lock:
            targets = []
            for conn in self._conns.values():
                if not any(topic_matches(f, topic) for f, _ in conn["subs"]):
                    continue
                qos = min(pub_qos, max(q for f, q in conn["subs"]
                                       if topic_matches(f, topic)))
                pid = 0
                if qos:
                    conn["mid"] = conn["mid"] % 65535 + 1
                    pid = conn["mid"]
                    if conn["session"] is not None:
                        # persistent subscriber: hold until PUBACK so an
                        # unacked delivery re-queues when the conn drops
                        conn["inflight"][pid] = [topic, payload, qos, False]
                targets.append((conn, qos, pid))
            # offline persistent sessions: queue QoS>=1 messages for the
            # next resume (§3.1.2.4 session state); QoS 0 drops, per spec
            for sess in self._sessions.values():
                if sess["conn"] in self._conns:
                    continue
                match_qos = [
                    q for f, q in sess["subs"] if topic_matches(f, topic)
                ]
                if not match_qos:
                    continue
                qos = min(pub_qos, max(match_qos))
                if qos >= 1:
                    sess["queue"].append([topic, payload, qos, False])
        for conn, qos, pid in targets:
            head = _encode_str(topic)
            if qos:
                head += struct.pack(">H", pid)
            try:
                self._send(conn, _packet(PUBLISH, qos << 1, head + payload))
                if qos and self.redeliver_qos1:
                    # deliberate at-least-once duplicate: same packet id,
                    # DUP flag set (MQTT 3.1.1 SS3.3.1.1)
                    self._send(
                        conn,
                        _packet(PUBLISH, 0x08 | (qos << 1), head + payload),
                    )
            except OSError:
                pass

    # ------------------------------------------------------------- admin
    def wait_for_subscription(self, topic: str, timeout: float = 5.0) -> bool:
        """Block until some connection's filter matches ``topic`` (lets a
        test publisher start only once the reader is subscribed)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            with self._lock:
                for conn in self._conns.values():
                    if any(
                        topic_matches(f, topic) for f, _ in conn["subs"]
                    ):
                        return True
            time.sleep(0.01)
        return False

    def stop(self) -> None:
        self._stopped.set()
        try:
            # shutdown() (not just close()) is required: close() alone does
            # not wake a thread blocked in accept(), and the kernel keeps
            # the listening socket alive -- the "stopped" broker would keep
            # accepting connections.  shutdown wakes accept with an error.
            self._srv.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        try:
            self._srv.close()
        except OSError:
            pass
        with self._lock:
            conns = list(self._conns.values())
        for conn in conns:
            try:
                conn["sock"].close()
            except OSError:
                pass


class MiniMqttClient:
    """Socket MQTT 3.1.1 client with the Paho sub-surface the stream
    reader uses: ``on_message(client, userdata, msg)`` where ``msg`` has
    ``topic`` / ``payload`` / ``mid`` / ``dup``, plus ``subscribe`` /
    ``loop_start`` / ``loop_stop`` / ``disconnect`` / ``publish``."""

    def __init__(
        self,
        host: str,
        port: int,
        client_id: str = "",
        clean_session: bool = True,
        timeout: float = 10.0,
        username: str = "",
        password: str = "",
        keepalive: int = 0,
        manual_ack: bool = False,
        will: tuple[str, bytes] | None = None,
    ):
        self.on_message = None
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._wlock = threading.Lock()
        self._suback = threading.Event()
        self._pid = 0
        self._looping = False
        # keepalive=0 disables server-side timeout entirely (MQTT 3.1.1
        # §3.1.2.10) -- the safe default for a client with no ping loop.
        # keepalive>0 starts a PINGREQ timer at half the declared period,
        # so a spec-enforcing broker (1.5x window) never drops us idle.
        self.keepalive = int(keepalive)
        # manual_ack=True defers QoS-1 PUBACKs to an explicit ack(mid)
        # call: a consumer that stops acking at its row budget leaves the
        # excess unacknowledged, so the broker redelivers instead of the
        # reader silently dropping acked rows (SURVEY.md SS2.6).
        self.manual_ack = bool(manual_ack)
        self._closed = threading.Event()
        # In-flight QoS-1 publishes awaiting PUBACK.  Drained before
        # DISCONNECT: closing the socket with unread PUBACKs pending can
        # RST the connection and destroy publishes the broker has not yet
        # read from its receive buffer.
        self._pending_acks: set[int] = set()
        self._ack_cv = threading.Condition()
        flags = 0x02 if clean_session else 0x00
        if will is not None:
            flags |= 0x04  # §3.1.2.5: Will flag (QoS 0, not retained)
        if username:
            flags |= 0x80  # MQTT 3.1.1 §3.1.2.8/9: user name (+password)
            if password:
                flags |= 0x40
        body = (
            _encode_str("MQTT")
            + bytes([4, flags])
            + struct.pack(">H", self.keepalive)
            + _encode_str(client_id or f"mini-{id(self):x}")
        )
        if will is not None:
            body += _encode_str(will[0])
            body += struct.pack(">H", len(will[1])) + will[1]
        if username:
            body += _encode_str(username)
            if password:
                body += _encode_str(password)
        self._send(_packet(CONNECT, 0, body))
        ptype, _, ack = _read_packet(self._sock)
        if ptype != CONNACK:
            raise ConnectionError(f"expected CONNACK, got type {ptype}")
        # §3.2.2.3: a non-zero return code is a REFUSED connection (bad
        # protocol / identifier / auth) -- fail loudly instead of letting
        # it surface later as a misleading SUBACK timeout
        if len(ack) >= 2 and ack[1] != 0:
            raise ConnectionError(f"CONNACK refused, return code {ack[1]}")
        # The connect timeout must not outlive the handshake: left on, an
        # idle subscriber's recv would raise socket.timeout after 10 s and
        # silently kill _read_loop while the client looks connected.
        self._sock.settimeout(None)
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()
        if self.keepalive > 0:
            self._pinger = threading.Thread(target=self._ping_loop, daemon=True)
            self._pinger.start()

    def _ping_loop(self) -> None:
        # PINGREQ at half the declared keepalive: comfortably inside the
        # broker's 1.5x-keepalive drop window even if one ping is delayed
        # a full interval by scheduling (ADVICE r7: a client declaring a
        # keepalive but never pinging is dropped by spec-compliant
        # brokers after ~1.5x keepalive of publish silence)
        interval = max(self.keepalive / 2.0, 0.05)
        while not self._closed.wait(interval):
            try:
                self._send(_packet(PINGREQ, 0, b""))
            except OSError:
                return

    def _send(self, data: bytes) -> None:
        with self._wlock:
            self._sock.sendall(data)

    def _read_loop(self) -> None:
        try:
            while True:
                ptype, flags, body = _read_packet(self._sock)
                if ptype == PUBLISH:
                    qos = (flags >> 1) & 0x03
                    dup = bool(flags & 0x08)
                    (tl,) = struct.unpack(">H", body[:2])
                    topic = body[2 : 2 + tl].decode("utf-8")
                    i = 2 + tl
                    mid = 0
                    if qos:
                        (mid,) = struct.unpack(">H", body[i : i + 2])
                        i += 2
                        if not self.manual_ack:
                            self._send(
                                _packet(PUBACK, 0, struct.pack(">H", mid))
                            )
                    cb = self.on_message
                    if cb is not None:
                        cb(
                            self,
                            None,
                            SimpleNamespace(
                                topic=topic,
                                payload=body[i:],
                                mid=mid,
                                dup=dup,
                            ),
                        )
                elif ptype == SUBACK:
                    self._suback.set()
                elif ptype == PUBACK:
                    (mid,) = struct.unpack(">H", body[:2])
                    with self._ack_cv:
                        self._pending_acks.discard(mid)
                        self._ack_cv.notify_all()
        except (ConnectionError, OSError):
            return

    def subscribe(self, topic: str, qos: int = 0) -> None:
        self._pid = self._pid % 65535 + 1
        self._suback.clear()
        body = (
            struct.pack(">H", self._pid) + _encode_str(topic) + bytes([qos])
        )
        self._send(_packet(SUBSCRIBE, 0x02, body))
        if not self._suback.wait(timeout=5.0):
            raise ConnectionError(f"no SUBACK for {topic!r}")

    def ack(self, mid: int) -> None:
        """Manually PUBACK a received QoS-1 delivery (``manual_ack=True``
        mode).  A message never acked stays redelivery-eligible at the
        broker -- the budget-capped stream reader acks exactly the rows
        it yields."""
        if mid:
            self._send(_packet(PUBACK, 0, struct.pack(">H", mid)))

    def publish(self, topic: str, payload: bytes, qos: int = 0) -> None:
        head = _encode_str(topic)
        if qos:
            self._pid = self._pid % 65535 + 1
            head += struct.pack(">H", self._pid)
            with self._ack_cv:
                self._pending_acks.add(self._pid)
        self._send(_packet(PUBLISH, qos << 1, head + payload))

    def wait_for_acks(self, timeout: float = 5.0) -> bool:
        """Block until every in-flight QoS-1 publish has been PUBACKed."""
        deadline = time.time() + timeout
        with self._ack_cv:
            while self._pending_acks:
                remaining = deadline - time.time()
                if remaining <= 0 or not self._ack_cv.wait(remaining):
                    return False
            return True

    def loop_start(self) -> None:
        self._looping = True  # reader thread runs from connect; flag only

    def loop_stop(self) -> None:
        self._looping = False

    def disconnect(self) -> None:
        self._closed.set()  # stops the keepalive ping loop
        self.wait_for_acks()
        try:
            self._send(_packet(DISCONNECT, 0, b""))
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass


def minimqtt_client_factory(options) -> MiniMqttClient:
    """``client_factory`` drop-in for ``MqttStreamReader`` mirroring
    ``_paho_client_factory``'s option parsing (server / client_name /
    clean_session)."""
    from mqtt_message_pump_spark.sources.mqtt import clean_session_flag

    server = options.get("server", "tcp://127.0.0.1:1883")
    host = server.split("://", 1)[-1].rsplit(":", 1)[0]
    port = int(server.rsplit(":", 1)[-1])
    manual = str(options.get("manual_ack", "false")).strip().lower() in (
        "1", "true", "yes", "on",
    )
    return MiniMqttClient(
        host,
        port,
        client_id=options.get("client_name", ""),
        clean_session=clean_session_flag(options),
        username=options.get("username", "") or "",
        password=options.get("password", "") or "",
        keepalive=int(options.get("keepalive", "0") or 0),
        manual_ack=manual,
    )
