"""Property-based tests (hypothesis): the codec and parser invariants
that golden tests can't sweep — arbitrary values roundtrip, arbitrary
duration literals parse consistently with their own string form."""

from __future__ import annotations

import struct

from hypothesis import given, settings, strategies as st

from solar_logger_spark.durations import parse_duration
from solar_logger_spark.streaming import decode as D

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, width=64
)


@settings(max_examples=200, deadline=None)
@given(
    m=st.sampled_from(sorted(D.MEASUREMENT_FIELDS)),
    epoch=st.integers(min_value=0, max_value=2**31 - 1),
    data=st.data(),
)
def test_codec_roundtrip_any_values(m, epoch, data):
    fields = D.MEASUREMENT_FIELDS[m]
    values = {
        f: data.draw(finite_doubles, label=f) for f in fields
    }
    pkt = D.encode_packet(m, epoch, values)
    # wire layout: 4-byte LE epoch + 8*n channel bytes + padding
    assert len(pkt) == 4 + 8 * len(fields) + D.PADDING_AT_END[m]
    got_epoch, body = D.detach_time(pkt, D.PADDING_AT_END[m])
    assert got_epoch == epoch
    decoded = D.DECODERS[m](body)
    assert decoded == values  # float64 exact, no precision loss


@settings(max_examples=200, deadline=None)
@given(
    epoch=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    payload=st.binary(min_size=0, max_size=64),
    padding=st.integers(min_value=0, max_value=8),
)
def test_detach_time_matches_struct_semantics(epoch, payload, padding):
    msg = struct.pack("<i", epoch) + payload + b"\x00" * padding
    got_epoch, got_payload = D.detach_time(msg, padding_at_end=padding)
    assert got_epoch == epoch
    assert got_payload == payload


@settings(max_examples=300, deadline=None)
@given(
    sign=st.sampled_from(["", "-"]),
    amount=st.integers(min_value=0, max_value=10**6),
    unit=st.sampled_from(["us", "ms", "s", "m", "h", "d", "w"]),
)
def test_duration_parser_fixed_units(sign, amount, unit):
    """Fixed-width units (no calendar months): the parsed timedelta must
    equal amount × unit width, negated for leading '-'. (``ns`` is
    excluded: python timedelta resolves to µs, so sub-µs literals round
    — the parser accepts them but they are below clock resolution.)"""
    from datetime import timedelta

    widths = {
        "us": timedelta(microseconds=1),
        "ms": timedelta(milliseconds=1),
        "s": timedelta(seconds=1),
        "m": timedelta(minutes=1),
        "h": timedelta(hours=1),
        "d": timedelta(days=1),
        "w": timedelta(weeks=1),
    }
    dur = parse_duration(f"{sign}{amount}{unit}")
    expect = widths[unit] * amount
    if sign == "-":
        expect = -expect
    assert dur.timedelta == expect


@settings(max_examples=100, deadline=None)
@given(
    parts=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=999),
            st.sampled_from(["h", "m", "s"]),
        ),
        min_size=1,
        max_size=3,
        unique_by=lambda p: p[1],
    )
)
def test_duration_parser_compound_is_sum(parts):
    """Compound literals (Flux '1h30m') equal the sum of their parts."""
    text = "".join(f"{n}{u}" for n, u in parts)
    total = sum(
        (parse_duration(f"{n}{u}").timedelta for n, u in parts),
        start=parse_duration("0s").timedelta,
    )
    assert parse_duration(text).timedelta == total
