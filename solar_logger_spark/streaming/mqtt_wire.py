"""Minimal MQTT 3.1.1 wire client — stdlib-only live-broker transport.

The reference's transport layer is paho-mqtt
(``/root/reference/src/classes/mqtt_classes.py:298-324``: TLS + user/token
auth, one topic-filter subscription, binary messages via callback). paho
is an optional dependency that is absent in the test environment, which
left the live-socket path of the ``"mqtt"`` data source untested. This
module closes that gap: a from-scratch client for the (public, OASIS)
MQTT 3.1.1 protocol covering exactly the subset the source needs —
CONNECT with optional username/password, one SUBSCRIBE, QoS 0/1/2
PUBLISH receive (PUBACK for QoS 1; the PUBREC/PUBREL/PUBCOMP
exactly-once handshake for QoS 2), PINGREQ keepalive, DISCONNECT —
over a real TCP (optionally TLS) socket.

``socket_client(options, push)`` matches the transport-factory contract
of :class:`solar_logger_spark.streaming.mqtt_source.MqttStreamReader`,
so the data source works against a live broker with no third-party
packages; when paho IS installed it remains the default.

Packet framing (MQTT 3.1.1 §2): 1 control byte (type<<4 | flags), a
variable-length "remaining length" (7 bits/byte, MSB = continuation),
then type-specific variable header + payload. Strings are big-endian
u16-length-prefixed UTF-8.
"""

from __future__ import annotations

import socket
import struct
import threading
from collections import OrderedDict

CONNECT, CONNACK, PUBLISH, PUBACK = 1, 2, 3, 4
PUBREC, PUBREL, PUBCOMP = 5, 6, 7
SUBSCRIBE, SUBACK = 8, 9
PINGREQ, PINGRESP, DISCONNECT = 12, 13, 14


def encode_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def encode_remaining_length(n: int) -> bytes:
    out = bytearray()
    while True:
        digit = n % 128
        n //= 128
        out.append(digit | (0x80 if n else 0))
        if not n:
            return bytes(out)


def encode_packet(ptype: int, flags: int, body: bytes) -> bytes:
    return bytes([(ptype << 4) | flags]) + encode_remaining_length(len(body)) + body


def encode_connect(
    client_id: str, user: str | None, password: str | None,
    keepalive: int = 60, clean_session: bool = True,
) -> bytes:
    flags = 0x02 if clean_session else 0x00
    payload = encode_string(client_id)
    if user:
        flags |= 0x80
        payload += encode_string(user)
        if password is not None:
            flags |= 0x40
            payload += encode_string(password)
    body = (
        encode_string("MQTT")
        + bytes([4, flags])  # protocol level 4 = 3.1.1
        + struct.pack(">H", keepalive)
        + payload
    )
    return encode_packet(CONNECT, 0, body)


def encode_subscribe(packet_id: int, topic_filter: str, qos: int) -> bytes:
    body = struct.pack(">H", packet_id) + encode_string(topic_filter) + bytes([qos])
    return encode_packet(SUBSCRIBE, 0x02, body)


def encode_publish(
    topic: str, payload: bytes, qos: int = 0,
    packet_id: int | None = None, dup: bool = False,
) -> bytes:
    body = encode_string(topic)
    if qos > 0:
        body += struct.pack(">H", packet_id or 1)
    return encode_packet(PUBLISH, (qos << 1) | (0x08 if dup else 0),
                         body + payload)


def encode_puback(packet_id: int) -> bytes:
    return encode_packet(PUBACK, 0, struct.pack(">H", packet_id))


def encode_pubrec(packet_id: int) -> bytes:
    return encode_packet(PUBREC, 0, struct.pack(">H", packet_id))


def encode_pubrel(packet_id: int) -> bytes:
    # MQTT 3.1.1 [MQTT-3.6.1-1]: PUBREL's fixed-header flags MUST be 0x02
    return encode_packet(PUBREL, 0x02, struct.pack(">H", packet_id))


def encode_pubcomp(packet_id: int) -> bytes:
    return encode_packet(PUBCOMP, 0, struct.pack(">H", packet_id))


def read_packet(sock: socket.socket) -> tuple[int, int, bytes] | None:
    """Read one packet; returns (type, flags, body) or None on EOF.

    Only a timeout BEFORE the first byte (idle link) raises
    TimeoutError — that's the caller's keepalive hook. Once the control
    byte has been consumed the rest of the frame is read with
    timeout-retrying reads: raising mid-frame would desync the parser
    (the pending length byte would be reinterpreted as the next
    packet's control byte)."""
    first = _read_exact(sock, 1, at_packet_start=True)
    if first is None:
        return None
    ctrl = first[0]
    length, mult = 0, 1
    for _ in range(4):
        b = _read_exact(sock, 1)
        if b is None:
            return None
        length += (b[0] & 0x7F) * mult
        if not (b[0] & 0x80):
            break
        mult *= 128
    else:
        raise ValueError("malformed remaining length")
    body = _read_exact(sock, length) if length else b""
    if body is None:
        return None
    return ctrl >> 4, ctrl & 0x0F, body


# a peer that stalls mid-frame for this many consecutive recv timeouts
# is treated as dead (frame reads never desync, but must not spin forever)
_MID_FRAME_TIMEOUT_LIMIT = 30


def _read_exact(
    sock: socket.socket, n: int, at_packet_start: bool = False
) -> bytes | None:
    buf = bytearray()
    stalls = 0
    while len(buf) < n:
        try:
            chunk = sock.recv(n - len(buf))
        except TimeoutError:
            if at_packet_start and not buf:
                raise  # idle between packets → let caller ping
            stalls += 1
            if stalls >= _MID_FRAME_TIMEOUT_LIMIT:
                return None  # dead peer mid-frame
            continue  # keep reading the frame — never desync
        except OSError:
            return None
        if not chunk:
            return None
        buf.extend(chunk)
        stalls = 0
    return bytes(buf)


def decode_string(body: bytes, at: int) -> tuple[str, int]:
    (ln,) = struct.unpack_from(">H", body, at)
    return body[at + 2 : at + 2 + ln].decode("utf-8"), at + 2 + ln


class MiniMqttClient:
    """Subscribe-and-receive client: the subset the data source needs.

    Delivers each received PUBLISH as ``on_message(topic, payload)`` from
    a reader thread; QoS-1 deliveries are PUBACK'd (at-least-once — the
    reader's offset replay upgrades that to effectively-once downstream,
    SURVEY T6). API mirrors the paho calls MqttStreamReader.stop uses
    (``loop_stop`` / ``disconnect``).

    Transport hardening (r9):

    * **Reconnect-with-resubscribe** — a dropped socket (broker
      restart, LB idle-kill, network blip) no longer silently ends the
      reader: the loop re-dials, re-CONNECTs, and re-SUBSCRIBEs with
      capped exponential backoff until it succeeds or the client is
      stopped (``reconnect=False`` restores the old die-on-drop
      behavior). Messages published while disconnected follow the
      broker's QoS contract; the downstream offset replay (T6) is what
      makes the pipeline effectively-once across the gap either way.
    * **Duplicate-PUBLISH (DUP) handling** — a QoS-1 retransmit
      (DUP=1) whose packet id was already delivered ON THIS CONNECTION
      is PUBACK'd again but NOT re-delivered to ``on_message`` (bounded
      id memory, cleared on reconnect — MQTT 3.1.1 packet ids are only
      meaningful within a connection). Cross-connection duplicates
      remain at-least-once, deduped downstream.
    * **QoS 2 (r11)** — the full receiver-side exactly-once handshake
      (method A): deliver on the first PUBLISH of a pid, answer every
      transmission with PUBREC, hold the pid until the broker's
      PUBREL (retransmits in the window are PUBREC'd, not
      re-delivered), then PUBCOMP — including for an unknown pid,
      which is a PUBREL retransmit after a lost PUBCOMP. Pending ids
      clear on reconnect with the rest of the per-connection state.
    """

    _DUP_MEMORY = 4096  # recently-delivered QoS-1 packet ids per conn

    def __init__(
        self,
        host: str,
        port: int,
        topic: str,
        on_message,
        user: str | None = None,
        token: str | None = None,
        qos: int = 1,
        client_id: str = "solar-logger-spark",
        tls: bool = False,
        keepalive: int = 60,
        timeout: float = 10.0,
        reconnect: bool = True,
        reconnect_delay: float = 0.2,
        reconnect_delay_max: float = 5.0,
        clean_session: bool = True,
    ) -> None:
        self._on_message = on_message
        self._keepalive = keepalive
        self._conn_params = (host, port, topic, user, token, qos,
                             client_id, tls, timeout)
        self._reconnect = reconnect
        self._delay0 = reconnect_delay
        self._delay_max = reconnect_delay_max
        self._clean = clean_session
        self.session_present = False  # last CONNACK's session flag
        self.reconnects = 0  # observable in tests / ops logs
        self._connect()  # first connect failure raises to the caller
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _connect(self) -> None:
        """Dial + CONNECT + SUBSCRIBE; swaps ``self._sock`` in and
        resets the per-connection DUP memory."""
        host, port, topic, user, token, qos, client_id, tls, timeout = \
            self._conn_params
        sock = socket.create_connection((host, port), timeout=timeout)
        if tls:
            import ssl

            sock = ssl.create_default_context().wrap_socket(
                sock, server_hostname=host
            )
        sock.sendall(encode_connect(client_id, user, token,
                                    self._keepalive,
                                    clean_session=self._clean))
        pkt = read_packet(sock)
        if pkt is None or pkt[0] != CONNACK or pkt[2][1] != 0:
            sock.close()
            raise ConnectionError(f"MQTT CONNECT refused: {pkt!r}")
        self.session_present = bool(pkt[2][0] & 0x01)
        sock.sendall(encode_subscribe(1, topic, qos))
        # A resumed session (CONNECT clean_session=0, session present)
        # may start delivering QUEUED publishes immediately after
        # CONNACK — before our SUBACK arrives. Buffer anything that
        # lands in between; the reader loop drains the buffer first.
        early: list[tuple[int, int, bytes]] = []
        while True:
            pkt = read_packet(sock)
            if pkt is None:
                sock.close()
                raise ConnectionError("MQTT SUBSCRIBE: broker closed")
            if pkt[0] == SUBACK:
                if pkt[2][2] == 0x80:
                    sock.close()
                    raise ConnectionError(
                        f"MQTT SUBSCRIBE refused: {pkt!r}"
                    )
                break
            if pkt[0] in (PUBLISH, PUBREL):
                early.append(pkt)
        sock.settimeout(1.0)
        self._early = early
        self._seen_pids: "OrderedDict[int, None]" = OrderedDict()
        # QoS-2 pids delivered awaiting PUBREL — a retransmitted
        # PUBLISH whose pid is still here is PUBREC'd again but not
        # re-delivered (exactly-once, method-A receiver). Packet ids
        # are per-connection under a clean session, but SURVIVE a
        # persistent-session resume (MQTT 3.1.1 [4.4]: unacknowledged
        # QoS-2 flows continue in the resumed session) — so the
        # pending set is preserved exactly when the broker confirmed
        # the session carried over.
        if not (not self._clean and self.session_present
                and hasattr(self, "_qos2_pending")):
            self._qos2_pending: "OrderedDict[int, None]" = OrderedDict()
        self._sock = sock
        # A disconnect() may have raced this dial: it sets _stop, then
        # closes whatever self._sock held BEFORE this assignment. Check
        # after the swap so the fresh subscriber can never outlive a
        # stopped client (disconnect's own re-close can't see a socket
        # assigned after its read). __init__'s first connect runs
        # before _stop exists — hence the getattr.
        stop = getattr(self, "_stop", None)
        if stop is not None and stop.is_set():
            sock.close()
            raise ConnectionError("client stopped during (re)connect")

    def _try_reconnect(self) -> bool:
        """Backoff re-dial loop; True once resubscribed, False when
        stopped first (or reconnect is disabled)."""
        if not self._reconnect:
            return False
        try:
            self._sock.close()
        except OSError:
            pass
        delay = self._delay0
        while not self._stop.is_set():
            try:
                self._connect()
                self.reconnects += 1
                return True
            except OSError:
                # includes ConnectionError from a refused handshake —
                # the broker may still be coming back up
                if self._stop.wait(delay):
                    return False
                delay = min(delay * 2, self._delay_max)
        return False

    def _loop(self) -> None:
        import time

        last_ping = time.monotonic()
        while not self._stop.is_set():
            if self._early:
                # queued-session deliveries buffered between CONNACK
                # and SUBACK during a persistent-session resume: drain
                # them through the same dispatch before reading more
                pkt = self._early.pop(0)
            else:
                try:
                    pkt = read_packet(self._sock)
                except TimeoutError:
                    # idle: ping at keepalive/2 cadence, not every
                    # timeout — a 1s PINGREQ drumbeat would be 30x the
                    # negotiated rate
                    now = time.monotonic()
                    if now - last_ping >= self._keepalive / 2:
                        try:
                            self._sock.sendall(
                                encode_packet(PINGREQ, 0, b"")
                            )
                        except OSError:
                            if not self._try_reconnect():
                                return
                        last_ping = now
                    continue
                except OSError:
                    if not self._try_reconnect():
                        return
                    last_ping = time.monotonic()
                    continue
            last_ping = time.monotonic()  # any traffic proves liveness
            if pkt is None:  # orderly EOF from the broker side
                if not self._try_reconnect():
                    return
                continue
            ptype, flags, body = pkt
            if ptype == PUBLISH:
                qos = (flags >> 1) & 0x03
                dup = bool(flags & 0x08)
                topic, at = decode_string(body, 0)
                pid = None
                if qos == 2:
                    # exactly-once, method-A receiver: deliver on the
                    # FIRST PUBLISH of a pid, hold the pid until PUBREL,
                    # PUBREC every transmission (the broker keeps
                    # re-PUBLISHing until it sees our PUBREC)
                    (pid,) = struct.unpack_from(">H", body, at)
                    at += 2
                    try:
                        self._sock.sendall(encode_pubrec(pid))
                    except OSError:
                        if not self._try_reconnect():
                            return
                        continue  # rec lost with the socket: broker re-sends
                    if pid in self._qos2_pending:
                        continue  # retransmit before PUBREL: rec-only
                    self._qos2_pending[pid] = None
                    while len(self._qos2_pending) > self._DUP_MEMORY:
                        self._qos2_pending.popitem(last=False)
                elif qos == 1:
                    (pid,) = struct.unpack_from(">H", body, at)
                    at += 2
                    try:
                        self._sock.sendall(encode_puback(pid))
                    except OSError:
                        if not self._try_reconnect():
                            return
                        continue  # ack lost with the socket: broker re-sends
                    if dup and pid in self._seen_pids:
                        continue  # retransmit of a delivered packet: ack-only
                    self._seen_pids[pid] = None
                    self._seen_pids.move_to_end(pid)
                    while len(self._seen_pids) > self._DUP_MEMORY:
                        self._seen_pids.popitem(last=False)
                self._on_message(topic, body[at:])
            elif ptype == PUBREL:
                # release the pid (delivery already happened on the
                # first PUBLISH); PUBCOMP even for an unknown pid — a
                # PUBREL retransmit after our PUBCOMP was lost
                (pid,) = struct.unpack_from(">H", body, 0)
                self._qos2_pending.pop(pid, None)
                try:
                    self._sock.sendall(encode_pubcomp(pid))
                except OSError:
                    if not self._try_reconnect():
                        return
            # PINGRESP / SUBACK dups need no action

    def loop_stop(self) -> None:
        self._stop.set()

    def disconnect(self) -> None:
        self._stop.set()
        try:
            self._sock.sendall(encode_packet(DISCONNECT, 0, b""))
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass
        self._thread.join(timeout=3.0)
        # an in-flight _try_reconnect may have swapped a FRESH socket
        # into self._sock after the close above (it checks _stop only
        # between attempts) — close again after the join so a
        # disconnect racing a reconnect cannot leak a live subscriber
        # whose QoS-1 queue grows unread on the broker
        try:
            self._sock.close()
        except OSError:
            pass


def socket_client(options: dict, push):
    """Transport factory for MqttStreamReader using the stdlib client.

    Same option surface as the paho factory (host/port/user/token/topic/
    qos/tls); messages land via ``push(topic, payload)``. When ``tls``
    is not given it follows the port: 8883 (the IANA MQTT-over-TLS
    port) → TLS on, anything else → plaintext — a TLS handshake
    against a plaintext 1883 listener would just hang to timeout.
    """
    port = int(options.get("port", "1883"))
    tls_default = "true" if port == 8883 else "false"
    return MiniMqttClient(
        host=options.get("host", "localhost"),
        port=port,
        topic=options.get("topic", "#"),
        on_message=push,
        user=options.get("user"),
        token=options.get("token"),
        qos=int(options.get("qos", "1")),
        tls=options.get("tls", tls_default).lower() == "true",
        client_id=options.get("client_id", "solar-logger-spark"),
        # clean_session=false + a stable client_id gives a persistent
        # broker session: QoS 1/2 publishes during a disconnect are
        # queued broker-side and delivered on resume (r12)
        clean_session=options.get(
            "clean_session", "true"
        ).lower() == "true",
    )
