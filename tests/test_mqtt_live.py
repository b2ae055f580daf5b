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
