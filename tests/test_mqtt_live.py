"""Live-socket MQTT smoke tests (S2's last gap, SURVEY §2).

Round-3 verdict listed "live-broker MQTT path" as the one untested
transport: the data source had only ever run against an injected fake.
These tests run the real wire path — `mqtt_wire.MiniMqttClient` over a
TCP socket against `tests/embedded_mqtt_broker.EmbeddedBroker`, an
in-process MQTT 3.1.1 broker — hermetically (no external broker, no
paho; reference transport: /root/reference/src/classes/mqtt_classes.py).
"""

from __future__ import annotations

import time

import pytest

from solar_logger_spark.streaming.mqtt_source import MqttStreamReader
from solar_logger_spark.streaming.mqtt_wire import MiniMqttClient
from tests.embedded_mqtt_broker import (
    EmbeddedBroker,
    publish_once,
    topic_matches,
)


def _wait_until(pred, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.02)
    return pred()


def test_topic_filter_matching():
    assert topic_matches("mate/#", "mate/dc/payload")
    assert topic_matches("#", "anything/at/all")
    assert topic_matches("mate/+/payload", "mate/dc/payload")
    assert not topic_matches("mate/+/payload", "mate/dc/extra/payload")
    assert not topic_matches("mate/dc", "mate/fx")
    assert topic_matches("mate/dc", "mate/dc")


def test_client_receives_published_messages():
    got: list[tuple[str, bytes]] = []
    with EmbeddedBroker() as broker:
        client = MiniMqttClient(
            "127.0.0.1",
            broker.port,
            "mate/#",
            lambda t, p: got.append((t, p)),
        )
        try:
            publish_once(broker.port, "mate/dc/payload", b"\x01\x02\x03")
            publish_once(broker.port, "mate/status", b"online")
            publish_once(broker.port, "other/topic", b"not-for-us")
            assert _wait_until(lambda: len(got) >= 2)
        finally:
            client.disconnect()
    assert got[0] == ("mate/dc/payload", b"\x01\x02\x03")
    assert got[1] == ("mate/status", b"online")
    assert all(t != "other/topic" for t, _ in got)


def test_client_auth_enforced():
    with EmbeddedBroker(user="logger", password="s3cret") as broker:
        with pytest.raises(ConnectionError, match="CONNECT refused"):
            MiniMqttClient(
                "127.0.0.1", broker.port, "#", lambda t, p: None, user="logger",
                token="wrong",
            )
        ok: list[tuple[str, bytes]] = []
        client = MiniMqttClient(
            "127.0.0.1",
            broker.port,
            "#",
            lambda t, p: ok.append((t, p)),
            user="logger",
            token="s3cret",
        )
        try:
            publish_once(
                broker.port, "mate/x", b"hi", user="logger", password="s3cret"
            )
            assert _wait_until(lambda: len(ok) == 1)
        finally:
            client.disconnect()


def test_stream_reader_over_live_socket():
    """MqttStreamReader with its DEFAULT factory (paho absent → stdlib
    wire client) drains live-published messages through read()/replay."""
    with EmbeddedBroker() as broker:
        reader = MqttStreamReader(
            {
                "host": "127.0.0.1",
                "port": str(broker.port),
                "topic": "mate/#",
                "tls": "false",
            }
        )
        try:
            publish_once(broker.port, "mate/dc/payload", b"packet-a")
            publish_once(broker.port, "mate/fx/payload", b"packet-b")
            assert _wait_until(lambda: len(reader._buffer) >= 2)
            start = reader.initialOffset()
            rows, end = reader.read(start)
            rows = list(rows)
            assert [(r[0], r[1]) for r in rows] == [
                ("mate/dc/payload", b"packet-a"),
                ("mate/fx/payload", b"packet-b"),
            ]
            assert end == {"n": 1}
            # retry semantics: replay between committed offsets
            replay = list(reader.readBetweenOffsets(start, end))
            assert [(r[0], r[1]) for r in replay] == [
                (r[0], r[1]) for r in rows
            ]
        finally:
            reader.stop()


def test_read_packet_survives_mid_frame_stall():
    """A TCP stall between bytes of one frame must not desync the
    parser: read_packet retries mid-frame (only idle timeouts — before
    any byte of a packet — raise to the keepalive hook)."""
    import socket
    import threading

    from solar_logger_spark.streaming import mqtt_wire as w

    a, b = socket.socketpair()
    try:
        pkt = w.encode_publish("t/x", b"payload-after-stall")

        def dribble():
            a.sendall(pkt[:1])          # control byte arrives...
            time.sleep(0.35)            # ...then the link stalls
            a.sendall(pkt[1:2])         # remaining-length byte
            time.sleep(0.35)
            a.sendall(pkt[2:])          # rest of the frame

        b.settimeout(0.1)  # several timeouts fire inside the frame
        t = threading.Thread(target=dribble)
        t.start()
        deadline = time.time() + 5
        got = None
        while time.time() < deadline:
            try:
                got = w.read_packet(b)
                break
            except TimeoutError:
                continue  # idle before the first byte — keep waiting
        t.join()
        assert got is not None
        ptype, _flags, body = got
        assert ptype == w.PUBLISH
        topic, at = w.decode_string(body, 0)
        assert (topic, body[at:]) == ("t/x", b"payload-after-stall")
        # and the stream is still in sync: a second packet parses clean
        a.sendall(w.encode_publish("t/y", b"second"))
        b.settimeout(1.0)
        ptype2, _f2, body2 = w.read_packet(b)
        topic2, at2 = w.decode_string(body2, 0)
        assert (ptype2, topic2, body2[at2:]) == (w.PUBLISH, "t/y", b"second")
    finally:
        a.close()
        b.close()


def test_client_reconnects_and_resubscribes_after_socket_kill():
    """r9 transport hardening: a mid-stream hard socket kill (broker
    restart / LB idle-drop) must not end the reader — the client
    re-dials, re-subscribes, and keeps delivering; T6 effectively-once
    survives the transport gap via downstream offset replay."""
    got: list[tuple[str, bytes]] = []
    with EmbeddedBroker() as broker:
        client = MiniMqttClient(
            "127.0.0.1", broker.port, "mate/#",
            lambda t, p: got.append((t, p)),
            reconnect_delay=0.05,
        )
        try:
            publish_once(broker.port, "mate/a", b"before")
            assert _wait_until(lambda: len(got) == 1)

            assert broker.kill_client_connections() >= 1
            # reconnect-with-RESUBSCRIBE: the broker's sub table must
            # repopulate (the old conn's entry died with the socket)
            assert _wait_until(lambda: client.reconnects >= 1)
            assert _wait_until(lambda: broker.subscriber_count() >= 1)

            publish_once(broker.port, "mate/b", b"after")
            assert _wait_until(lambda: len(got) == 2)
        finally:
            client.disconnect()
    assert got == [("mate/a", b"before"), ("mate/b", b"after")]


def test_client_survives_repeated_kills():
    got: list[bytes] = []
    with EmbeddedBroker() as broker:
        client = MiniMqttClient(
            "127.0.0.1", broker.port, "#",
            lambda t, p: got.append(p),
            reconnect_delay=0.05,
        )
        try:
            for i in range(3):
                broker.kill_client_connections()
                assert _wait_until(lambda: client.reconnects >= i + 1)
                assert _wait_until(lambda: broker.subscriber_count() >= 1)
                publish_once(broker.port, "t", f"m{i}".encode())
                assert _wait_until(lambda: len(got) == i + 1), got
        finally:
            client.disconnect()
    assert got == [b"m0", b"m1", b"m2"]


def test_duplicate_publish_dup_flag_acked_but_not_redelivered():
    """r9: a QoS-1 retransmit (DUP=1, same packet id) is PUBACK'd but
    NOT delivered twice; a DUP-flagged id never seen on this connection
    (ack lost before the app saw it) IS delivered."""
    got: list[bytes] = []
    with EmbeddedBroker() as broker:
        client = MiniMqttClient(
            "127.0.0.1", broker.port, "#", lambda t, p: got.append(p)
        )
        try:
            broker.send_duplicate("t", b"first", packet_id=77, dup=False)
            assert _wait_until(lambda: len(got) == 1)
            # broker retransmits the same packet id with DUP set —
            # already delivered: ack-only, no second on_message
            broker.send_duplicate("t", b"first", packet_id=77, dup=True)
            broker.send_duplicate("t", b"next", packet_id=78, dup=False)
            assert _wait_until(lambda: len(got) == 2)
            assert got == [b"first", b"next"]
            # DUP with an UNSEEN id: the original delivery was lost
            # before reaching us — must be delivered, not swallowed
            broker.send_duplicate("t", b"lost-then-resent",
                                  packet_id=99, dup=True)
            assert _wait_until(lambda: len(got) == 3)
        finally:
            client.disconnect()
    assert got[-1] == b"lost-then-resent"


def test_reconnect_disabled_dies_on_drop():
    got: list[bytes] = []
    with EmbeddedBroker() as broker:
        client = MiniMqttClient(
            "127.0.0.1", broker.port, "#", lambda t, p: got.append(p),
            reconnect=False,
        )
        try:
            broker.kill_client_connections()
            time.sleep(0.3)
            client._thread.join(timeout=5.0)
            assert not client._thread.is_alive()  # old die-on-drop contract
            assert client.reconnects == 0
        finally:
            client.disconnect()


def test_qos2_publish_exactly_once_end_to_end():
    """r11: QoS-2 end to end over a live socket — a qos=2 subscription
    is granted at 2, a QoS-2 publisher's PUBREC/PUBREL/PUBCOMP
    handshake completes, the message is delivered exactly once, and
    the client's pending set drains after the broker's PUBREL."""
    got: list[tuple[str, bytes]] = []
    with EmbeddedBroker() as broker:
        client = MiniMqttClient(
            "127.0.0.1", broker.port, "mate/#",
            lambda t, p: got.append((t, p)), qos=2,
        )
        try:
            # publish_once itself asserts the publisher-side handshake
            publish_once(broker.port, "mate/q2", b"exactly-once", qos=2)
            assert _wait_until(lambda: len(got) >= 1)
            assert got == [("mate/q2", b"exactly-once")]
            # broker's PUBREL releases the pid on the subscriber side
            assert _wait_until(lambda: len(client._qos2_pending) == 0)
            publish_once(broker.port, "mate/q2", b"second", qos=2)
            assert _wait_until(lambda: len(got) == 2)
            assert got[1] == ("mate/q2", b"second")
        finally:
            client.disconnect()


def test_qos2_retransmit_before_pubrel_not_redelivered():
    """r11: a QoS-2 PUBLISH retransmitted (DUP) while its pid is still
    pending (no PUBREL yet) is PUBREC'd but NOT delivered twice; after
    the handshake releases the pid, a NEW message reusing that packet
    id is a fresh lifecycle and must be delivered."""
    got: list[bytes] = []
    with EmbeddedBroker() as broker:
        client = MiniMqttClient(
            "127.0.0.1", broker.port, "#", lambda t, p: got.append(p),
            qos=2,
        )
        try:
            # PUBLISH + its DUP retransmit in one TCP write: the client
            # must see both before any PUBREL can interleave
            broker.send_qos2_duplicate("t", b"only-once", packet_id=41)
            assert _wait_until(lambda: len(got) == 1)
            assert got == [b"only-once"]
            # handshake completes via the broker's PUBREC->PUBREL reply
            assert _wait_until(lambda: len(client._qos2_pending) == 0)
            # pid 41 reused AFTER release: a new message, delivered
            broker.send_qos2_duplicate("t", b"new-lifecycle",
                                       packet_id=41)
            assert _wait_until(lambda: len(got) == 2)
            assert got[1] == b"new-lifecycle"
        finally:
            client.disconnect()


def test_qos2_pubrel_retransmit_gets_pubcomp():
    """r11: a PUBREL for an already-released (or never-seen) pid — a
    retransmit after our PUBCOMP was lost — is answered with PUBCOMP
    and delivers nothing."""
    import socket as _socket
    import struct as _struct

    from solar_logger_spark.streaming import mqtt_wire as w

    got: list[bytes] = []
    with EmbeddedBroker() as broker:
        client = MiniMqttClient(
            "127.0.0.1", broker.port, "#", lambda t, p: got.append(p),
            qos=2,
        )
        try:
            # drive the client's socket directly: inject a bare PUBREL
            # from the broker side by publishing first (so a connection
            # exists), then reusing send_qos2_duplicate's path for a
            # normal delivery and finally a stray PUBREL
            broker.send_qos2_duplicate("t", b"m", packet_id=7)
            assert _wait_until(lambda: len(got) == 1)
            assert _wait_until(lambda: len(client._qos2_pending) == 0)
            with broker._lock:
                conn = broker._subs[0][0]
            conn.sendall(w.encode_pubrel(7))   # retransmit after release
            conn.sendall(w.encode_pubrel(999))  # never-seen pid
            # client must stay alive and deliver nothing new
            broker.send_qos2_duplicate("t", b"after", packet_id=8)
            assert _wait_until(lambda: len(got) == 2)
            assert got == [b"m", b"after"]
        finally:
            client.disconnect()


def test_persistent_session_resumes_and_delivers_queued():
    """r12 (VERDICT task #7): CONNECT clean_session=0 — messages
    published while the subscriber is DISCONNECTED are queued by the
    broker and delivered exactly once when a client with the same id
    resumes the session (CONNACK session-present)."""
    got: list[tuple[str, bytes]] = []
    with EmbeddedBroker() as broker:
        c1 = MiniMqttClient(
            "127.0.0.1", broker.port, "mate/#",
            lambda t, p: got.append((t, p)),
            qos=1, clean_session=False,
            client_id="persistent-reader", reconnect=False,
        )
        assert c1.session_present is False  # first contact
        publish_once(broker.port, "mate/a", b"before")
        assert _wait_until(lambda: len(got) == 1)

        # deterministic offline window: disconnect, publish into it
        c1.disconnect()
        assert _wait_until(lambda: broker.subscriber_count() == 0)
        publish_once(broker.port, "mate/b", b"gap-1")
        publish_once(broker.port, "mate/b", b"gap-2")
        publish_once(broker.port, "other/x", b"not-ours")

        # resume: same client id, clean_session=0 — the queued gap
        # messages arrive exactly once each, before/with live traffic
        c2 = MiniMqttClient(
            "127.0.0.1", broker.port, "mate/#",
            lambda t, p: got.append((t, p)),
            qos=1, clean_session=False,
            client_id="persistent-reader", reconnect=False,
        )
        try:
            assert c2.session_present is True
            assert _wait_until(lambda: len(got) >= 3)
            time.sleep(0.3)  # settle: catch any duplicate deliveries
            assert got.count(("mate/b", b"gap-1")) == 1
            assert got.count(("mate/b", b"gap-2")) == 1
            assert ("other/x", b"not-ours") not in got
            # live delivery still works after the resume
            publish_once(broker.port, "mate/c", b"after")
            assert _wait_until(
                lambda: got.count(("mate/c", b"after")) == 1
            )
        finally:
            c2.disconnect()


def test_persistent_session_queues_qos2_exactly_once():
    """Gap publishes at QoS 2 resume through the full receiver-side
    handshake: delivered exactly once, PUBREL/PUBCOMP completing after
    the flush."""
    got: list[tuple[str, bytes]] = []
    with EmbeddedBroker() as broker:
        c1 = MiniMqttClient(
            "127.0.0.1", broker.port, "mate/#",
            lambda t, p: got.append((t, p)),
            qos=2, clean_session=False,
            client_id="persistent-q2", reconnect=False,
        )
        c1.disconnect()
        assert _wait_until(lambda: broker.subscriber_count() == 0)
        publish_once(broker.port, "mate/q2", b"gap", qos=2)
        c2 = MiniMqttClient(
            "127.0.0.1", broker.port, "mate/#",
            lambda t, p: got.append((t, p)),
            qos=2, clean_session=False,
            client_id="persistent-q2", reconnect=False,
        )
        try:
            assert c2.session_present is True
            assert _wait_until(
                lambda: got.count(("mate/q2", b"gap")) >= 1
            )
            time.sleep(0.3)
            assert got.count(("mate/q2", b"gap")) == 1
        finally:
            c2.disconnect()


def test_clean_session_discards_stored_state():
    """A clean CONNECT with the same client id drops the stored
    session: nothing is queued across its gaps."""
    got: list[tuple[str, bytes]] = []
    with EmbeddedBroker() as broker:
        c1 = MiniMqttClient(
            "127.0.0.1", broker.port, "mate/#",
            lambda t, p: got.append((t, p)),
            clean_session=False, client_id="cs-test",
            reconnect=False,
        )
        c1.disconnect()
        # clean CONNECT with the same id discards the session...
        c2 = MiniMqttClient(
            "127.0.0.1", broker.port, "mate/#",
            lambda t, p: got.append((t, p)),
            clean_session=True, client_id="cs-test",
            reconnect=False,
        )
        c2.disconnect()
        # ...so a publish after both are gone queues NOTHING
        publish_once(broker.port, "mate/z", b"dropped")
        c3 = MiniMqttClient(
            "127.0.0.1", broker.port, "mate/#",
            lambda t, p: got.append((t, p)),
            clean_session=False, client_id="cs-test",
            reconnect=False,
        )
        try:
            assert c3.session_present is False
            time.sleep(0.3)
            assert ("mate/z", b"dropped") not in got
        finally:
            c3.disconnect()


def test_stream_reader_persistent_session_gap_delivery():
    """The ingest path end-to-end (VERDICT task #7 'through the ingest
    path'): an MqttStreamReader with clean_session=false stops, the
    gap publishes queue broker-side, and a reader resuming the same
    client id receives them exactly once via offsets/commit."""
    with EmbeddedBroker() as broker:
        opts = {
            "host": "127.0.0.1", "port": str(broker.port),
            "topic": "mate/#", "qos": "1",
            "clean_session": "false", "client_id": "ingest-resume",
        }
        r1 = MqttStreamReader(opts)
        publish_once(broker.port, "mate/dc", b"live-1")
        assert _wait_until(lambda: len(r1._buffer) >= 1)
        r1.stop()
        assert _wait_until(lambda: broker.subscriber_count() == 0)

        publish_once(broker.port, "mate/dc", b"gap-1")
        publish_once(broker.port, "mate/dc", b"gap-2")

        r2 = MqttStreamReader(opts)
        try:
            assert _wait_until(lambda: len(r2._buffer) >= 2)
            rows, _end = r2.read(r2.initialOffset())
            payloads = [r[1] for r in rows]
            assert payloads.count(b"gap-1") == 1
            assert payloads.count(b"gap-2") == 1
        finally:
            r2.stop()
