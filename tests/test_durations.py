"""Duration-literal grammar (reference accepts Flux durations as params,
src/classes/query_classes.py:95-106,127-137; README.md:209)."""

from datetime import datetime, timedelta

import pytest

from solar_logger_spark.durations import (
    duration_to_interval,
    duration_to_spark_window,
    parse_duration,
)


@pytest.mark.parametrize(
    "text,seconds",
    [
        ("-5m", -300),
        ("-20m", -1200),
        ("1h", 3600),
        ("1h30m", 5400),
        ("2d", 2 * 86400),
        ("1w", 7 * 86400),
        ("10s", 10),
        ("+45s", 45),
        ("500ms", 0.5),
    ],
)
def test_fixed_durations(text, seconds):
    assert parse_duration(text).seconds == seconds


def test_calendar_durations():
    d = parse_duration("-2mo")
    assert d.months == -2 and d.seconds == 0
    assert parse_duration("1y").months == 12
    assert parse_duration("1mo12h").seconds == 12 * 3600


def test_add_to_calendar():
    d = parse_duration("-1mo")
    assert d.add_to(datetime(2024, 3, 31)) == datetime(2024, 2, 29)
    assert parse_duration("-5m").add_to(datetime(2024, 1, 1)) == datetime(
        2023, 12, 31, 23, 55
    )


@pytest.mark.parametrize("bad", ["", "5 minutes", "m5", "5x", "--5m", "5m3", None, "5"])
def test_invalid(bad):
    with pytest.raises(ValueError):
        parse_duration(bad)


def test_interval_rendering():
    assert duration_to_interval("1h30m") == "INTERVAL '5400' SECOND"
    assert duration_to_interval("-2mo") == "INTERVAL '-2' MONTH"
    assert duration_to_spark_window("6h") == "21600 seconds"
    with pytest.raises(ValueError):
        duration_to_spark_window("1mo")
    with pytest.raises(ValueError):
        duration_to_spark_window("-1h")


def test_timedelta_guard():
    with pytest.raises(ValueError):
        parse_duration("1mo").timedelta
    assert parse_duration("90s").timedelta == timedelta(seconds=90)


# -- property-based coverage (pure-python parser: cheap per example) --

from hypothesis import given, settings
import hypothesis.strategies as hst

_FIXED = {"ns": 1e-9, "us": 1e-6, "ms": 1e-3, "s": 1.0,
          "m": 60.0, "h": 3600.0, "d": 86400.0, "w": 604800.0}
_CAL = {"mo": 1, "y": 12}

_component = hst.tuples(
    hst.integers(min_value=0, max_value=10**6),
    hst.sampled_from(sorted(_FIXED) + sorted(_CAL)),
)


@settings(max_examples=200, deadline=None)
@given(
    sign=hst.sampled_from(["", "+", "-"]),
    comps=hst.lists(_component, min_size=1, max_size=5),
)
def test_parse_duration_matches_reference(sign, comps):
    """Any well-formed literal parses to the component-sum reference
    (fixed seconds + calendar months, sign applied to both)."""
    text = sign + "".join(f"{n}{u}" for n, u in comps)
    got = parse_duration(text)
    s = -1 if sign == "-" else 1
    want_sec = s * sum(n * _FIXED[u] for n, u in comps if u in _FIXED)
    want_mo = s * sum(n * _CAL[u] for n, u in comps if u in _CAL)
    assert got.seconds == want_sec
    assert got.months == want_mo


@settings(max_examples=200, deadline=None)
@given(text=hst.text(max_size=12))
def test_parse_duration_never_crashes_unexpectedly(text):
    """Arbitrary strings either parse (and then re-parse stably) or
    raise ValueError — never any other exception type."""
    try:
        d1 = parse_duration(text)
    except ValueError:
        return
    d2 = parse_duration(text)
    assert (d1.seconds, d1.months) == (d2.seconds, d2.months)
