"""Tiny in-process MQTT 3.1.1 broker for live-socket tests.

Implements just enough of the (public, OASIS) 3.1.1 spec to smoke-test
the repo's MQTT transport over a real TCP connection, hermetically —
no mosquitto / docker / paho needed: CONNECT/CONNACK (with optional
user/password check), SUBSCRIBE/SUBACK, PUBLISH fan-out to matching
subscribers (topic filters with ``+`` and ``#``), QoS-1 PUBACK both
directions, PINGREQ/PINGRESP, DISCONNECT.

Usage::

    with EmbeddedBroker() as broker:          # port picked by the OS
        ... connect clients to ("127.0.0.1", broker.port) ...
"""

from __future__ import annotations

import socket
import struct
import threading

from solar_logger_spark.streaming import mqtt_wire as w


def topic_matches(filt: str, topic: str) -> bool:
    """MQTT 3.1.1 §4.7 topic-filter matching (``+`` one level, ``#`` rest)."""
    fparts, tparts = filt.split("/"), topic.split("/")
    for i, fp in enumerate(fparts):
        if fp == "#":
            return True
        if i >= len(tparts):
            return False
        if fp != "+" and fp != tparts[i]:
            return False
    return len(fparts) == len(tparts)


class EmbeddedBroker:
    def __init__(
        self, user: str | None = None, password: str | None = None
    ) -> None:
        self._user, self._password = user, password
        self._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._server.bind(("127.0.0.1", 0))
        self._server.listen(8)
        self.port = self._server.getsockname()[1]
        self._lock = threading.Lock()
        self._subs: list[tuple[socket.socket, str, int]] = []
        self._conns: list[socket.socket] = []
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self.messages: list[tuple[str, bytes]] = []  # every routed publish
        # persistent sessions (CONNECT clean_session=0), keyed by
        # client id: subscriptions survive the connection, and
        # publishes matching them while the client is OFFLINE are
        # queued for delivery on resume (session-present CONNACK)
        self._sessions: dict[str, dict] = {}
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)

    # -- lifecycle ---------------------------------------------------
    def __enter__(self) -> "EmbeddedBroker":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        self._stop.set()
        try:
            self._server.close()
        except OSError:
            pass
        with self._lock:
            conns = list(self._conns)
        for c in conns:
            try:
                c.close()
            except OSError:
                pass
        for t in self._threads:
            t.join(timeout=3.0)

    # -- server loops ------------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._server.accept()
            except OSError:
                return
            with self._lock:
                self._conns.append(conn)
            t = threading.Thread(
                target=self._serve_client, args=(conn,), daemon=True
            )
            t.start()
            self._threads.append(t)

    def _serve_client(self, conn: socket.socket) -> None:
        try:
            pkt = w.read_packet(conn)
            if pkt is None or pkt[0] != w.CONNECT:
                return
            rc, cid, clean = self._parse_connect(pkt[2])
            session = None
            present = 0
            if rc == 0:
                with self._lock:
                    if clean:
                        # a clean CONNECT discards any stored session
                        self._sessions.pop(cid, None)
                    else:
                        session = self._sessions.get(cid)
                        if session is None:
                            session = {"subs": [], "queue": [],
                                       "conn": None}
                            self._sessions[cid] = session
                        else:
                            present = 1
            conn.sendall(
                w.encode_packet(w.CONNACK, 0, bytes([present, rc]))
            )
            if rc != 0:
                return
            if session is not None:
                with self._lock:
                    session["conn"] = conn
                    for filt, q in session["subs"]:
                        self._subs.append((conn, filt, q))
                    queued = list(session["queue"])
                    session["queue"].clear()
                # flush the offline queue right after CONNACK (a
                # resumed session's subscriptions are live before any
                # re-SUBSCRIBE arrives — the client buffers these
                # until its SUBACK); QoS-2 completes via the normal
                # PUBREC/PUBREL/PUBCOMP exchange below
                for i, (topic, payload, q) in enumerate(queued):
                    conn.sendall(w.encode_publish(
                        topic, payload, q, packet_id=(i % 65000) + 500
                    ))
            pub_pending: set[int] = set()  # inbound QoS-2 pids awaiting PUBREL
            while not self._stop.is_set():
                pkt = w.read_packet(conn)
                if pkt is None:
                    return
                ptype, flags, body = pkt
                if ptype == w.SUBSCRIBE:
                    (pid,) = struct.unpack_from(">H", body, 0)
                    at, grants = 2, []
                    while at < len(body):
                        filt, at = w.decode_string(body, at)
                        qos = body[at]
                        at += 1
                        grants.append(min(qos, 2))
                        with self._lock:
                            # a resumed session re-SUBSCRIBEs over its
                            # already-re-attached stored subscriptions:
                            # never double-register one (conn, filter)
                            if not any(
                                c is conn and f == filt
                                for c, f, _ in self._subs
                            ):
                                self._subs.append(
                                    (conn, filt, min(qos, 2))
                                )
                            if session is not None and (
                                (filt, min(qos, 2)) not in session["subs"]
                            ):
                                session["subs"].append(
                                    (filt, min(qos, 2))
                                )
                    conn.sendall(
                        w.encode_packet(
                            w.SUBACK, 0, struct.pack(">H", pid) + bytes(grants)
                        )
                    )
                elif ptype == w.PUBLISH:
                    qos = (flags >> 1) & 0x03
                    topic, at = w.decode_string(body, 0)
                    pid = None
                    if qos > 0:
                        (pid,) = struct.unpack_from(">H", body, at)
                        at += 2
                    # route BEFORE acking: publish_once waits on the
                    # PUBACK, so ack-first would let a second publisher
                    # overtake this fan-out and reorder deliveries the
                    # live tests assert on
                    if qos == 2:
                        # exactly-once inbound: route only the first
                        # PUBLISH of a pid, PUBREC every transmission
                        if pid not in pub_pending:
                            pub_pending.add(pid)
                            self._route(topic, body[at:])
                        conn.sendall(w.encode_pubrec(pid))
                    else:
                        self._route(topic, body[at:])
                        if pid is not None:
                            conn.sendall(w.encode_puback(pid))
                elif ptype == w.PUBREL:
                    # publisher releasing a QoS-2 pid
                    (pid,) = struct.unpack_from(">H", body, 0)
                    pub_pending.discard(pid)
                    conn.sendall(w.encode_pubcomp(pid))
                elif ptype == w.PUBREC:
                    # subscriber acked our QoS-2 PUBLISH: release it
                    (pid,) = struct.unpack_from(">H", body, 0)
                    conn.sendall(w.encode_pubrel(pid))
                elif ptype == w.PINGREQ:
                    conn.sendall(w.encode_packet(w.PINGRESP, 0, b""))
                elif ptype in (w.PUBACK, w.PUBCOMP):
                    pass  # delivery acks — nothing pending to retry
                elif ptype == w.DISCONNECT:
                    return
        finally:
            with self._lock:
                self._subs = [s for s in self._subs if s[0] is not conn]
                if conn in self._conns:
                    self._conns.remove(conn)
                for sess in self._sessions.values():
                    if sess.get("conn") is conn:
                        sess["conn"] = None  # offline: queue from here
            try:
                conn.close()
            except OSError:
                pass

    def _check_connect(self, body: bytes) -> int:
        return self._parse_connect(body)[0]

    def _parse_connect(self, body: bytes) -> tuple[int, str, bool]:
        """(return code, client id, clean-session flag)."""
        _proto, at = w.decode_string(body, 0)
        flags = body[at + 1]
        clean = bool(flags & 0x02)
        at += 4  # level + flags + keepalive(2)
        client_id, at = w.decode_string(body, at)
        user = pw = None
        if flags & 0x80:
            user, at = w.decode_string(body, at)
        if flags & 0x40:
            pw, at = w.decode_string(body, at)
        if self._user is not None and (user, pw) != (self._user, self._password):
            return 4, client_id, clean  # bad user name or password
        return 0, client_id, clean

    # -- fault-injection hooks for transport-hardening tests ----------
    def kill_client_connections(self) -> int:
        """Hard-close every live client socket (no DISCONNECT) —
        simulates a broker restart / LB idle-kill mid-stream. Returns
        how many connections were dropped."""
        with self._lock:
            conns = list(self._conns)
        for c in conns:
            try:
                c.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                c.close()
            except OSError:
                pass
        return len(conns)

    def subscriber_count(self) -> int:
        with self._lock:
            return len(self._subs)

    def send_duplicate(
        self, topic: str, payload: bytes, packet_id: int, dup: bool = True
    ) -> None:
        """Inject a (possibly DUP-flagged) QoS-1 PUBLISH with a chosen
        packet id straight to matching subscribers — the broker-side
        retransmit the client's DUP handling must dedupe."""
        with self._lock:
            subs = list(self._subs)
        for conn, filt, _qos in subs:
            if topic_matches(filt, topic):
                try:
                    conn.sendall(w.encode_publish(
                        topic, payload, qos=1, packet_id=packet_id, dup=dup
                    ))
                except OSError:
                    pass

    def send_qos2_duplicate(
        self, topic: str, payload: bytes, packet_id: int
    ) -> None:
        """Inject a QoS-2 PUBLISH and its DUP retransmit back-to-back
        (ONE sendall, so no PUBREL can land between them) straight to
        matching subscribers — the in-window retransmit the client's
        exactly-once pending set must suppress. The subscriber's
        PUBRECs route back to `_serve_client`, which completes the
        PUBREL/PUBCOMP handshake."""
        frames = w.encode_publish(
            topic, payload, qos=2, packet_id=packet_id
        ) + w.encode_publish(
            topic, payload, qos=2, packet_id=packet_id, dup=True
        )
        with self._lock:
            subs = list(self._subs)
        for conn, filt, _qos in subs:
            if topic_matches(filt, topic):
                try:
                    conn.sendall(frames)
                except OSError:
                    pass

    def _route(self, topic: str, payload: bytes) -> None:
        self.messages.append((topic, payload))
        with self._lock:
            subs = list(self._subs)
            offline = [
                s for s in self._sessions.values()
                if s.get("conn") is None
            ]
        pid = (len(self.messages) % 65535) + 1
        for conn, filt, qos in subs:
            if topic_matches(filt, topic):
                try:
                    conn.sendall(
                        w.encode_publish(topic, payload, qos, packet_id=pid)
                    )
                except OSError:
                    pass
        # queue for disconnected persistent sessions (QoS > 0 only —
        # MQTT 3.1.1 queues QoS 1/2 for offline sessions, QoS 0 drops)
        for sess in offline:
            for filt, qos in sess["subs"]:
                if qos > 0 and topic_matches(filt, topic):
                    sess["queue"].append((topic, payload, qos))
                    break


def publish_once(
    port: int,
    topic: str,
    payload: bytes,
    user: str | None = None,
    password: str | None = None,
    qos: int = 1,
) -> None:
    """One-shot publisher: CONNECT, PUBLISH (await PUBACK), DISCONNECT."""
    sock = socket.create_connection(("127.0.0.1", port), timeout=5.0)
    try:
        sock.sendall(w.encode_connect("pub-once", user, password))
        pkt = w.read_packet(sock)
        assert pkt is not None and pkt[0] == w.CONNACK and pkt[2][1] == 0, pkt
        sock.sendall(w.encode_publish(topic, payload, qos=qos, packet_id=7))
        if qos == 2:
            pkt = w.read_packet(sock)
            assert pkt is not None and pkt[0] == w.PUBREC, pkt
            sock.sendall(w.encode_pubrel(7))
            pkt = w.read_packet(sock)
            assert pkt is not None and pkt[0] == w.PUBCOMP, pkt
        elif qos == 1:
            pkt = w.read_packet(sock)
            assert pkt is not None and pkt[0] == w.PUBACK, pkt
        sock.sendall(w.encode_packet(w.DISCONNECT, 0, b""))
    finally:
        sock.close()
