"""Property-based coverage of the MQTT 3.1.1 wire primitives (pure
python — cheap per example). The live-broker tests exercise the full
client/socket path; these pin the codec laws directly."""

import pytest
from hypothesis import given, settings
import hypothesis.strategies as hst

from solar_logger_spark.streaming import mqtt_wire as w


@settings(max_examples=200, deadline=None)
@given(s=hst.text(max_size=200))
def test_string_roundtrip(s):
    buf = w.encode_string(s)
    assert len(buf) == 2 + len(s.encode("utf-8"))
    got, at = w.decode_string(buf, 0)
    assert got == s
    assert at == len(buf)


@settings(max_examples=200, deadline=None)
@given(
    prefix=hst.binary(max_size=20),
    s=hst.text(max_size=50),
    suffix=hst.binary(max_size=20),
)
def test_string_decode_at_offset(prefix, s, suffix):
    body = prefix + w.encode_string(s) + suffix
    got, at = w.decode_string(body, len(prefix))
    assert got == s
    assert at == len(prefix) + 2 + len(s.encode("utf-8"))


def _decode_remaining_length(buf):
    """Reference decoder straight from the MQTT 3.1.1 spec (§2.2.3)."""
    mult, value = 1, 0
    for i, b in enumerate(buf):
        value += (b & 0x7F) * mult
        if not b & 0x80:
            return value, i + 1
        mult *= 128
    raise AssertionError("unterminated varint")


@settings(max_examples=300, deadline=None)
@given(n=hst.integers(min_value=0, max_value=268_435_455))
def test_remaining_length_spec_roundtrip(n):
    buf = w.encode_remaining_length(n)
    assert 1 <= len(buf) <= 4
    # every byte except the last has the continuation bit set
    assert all(b & 0x80 for b in buf[:-1])
    assert not buf[-1] & 0x80
    value, used = _decode_remaining_length(buf)
    assert (value, used) == (n, len(buf))


@settings(max_examples=100, deadline=None)
@given(
    topic=hst.text(
        alphabet=hst.characters(
            blacklist_categories=("Cs",), blacklist_characters="#+\x00"
        ),
        min_size=1,
        max_size=50,
    ),
    payload=hst.binary(max_size=200),
    qos=hst.sampled_from([0, 1]),
    packet_id=hst.integers(min_value=1, max_value=65535),
)
def test_publish_packet_parses_back(topic, payload, qos, packet_id):
    pkt = w.encode_publish(topic, payload, qos=qos, packet_id=packet_id)
    ptype_flags = pkt[0]
    assert ptype_flags >> 4 == 3  # PUBLISH
    assert (ptype_flags >> 1) & 0x3 == qos
    rem, used = _decode_remaining_length(pkt[1:5])
    body = pkt[1 + used:]
    assert len(body) == rem
    got_topic, at = w.decode_string(body, 0)
    assert got_topic == topic
    if qos:
        pid = int.from_bytes(body[at:at + 2], "big")
        at += 2
        assert pid == packet_id
    assert body[at:] == payload
