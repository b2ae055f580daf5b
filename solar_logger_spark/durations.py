"""Flux duration-literal parsing.

The reference accepts Flux duration strings as query parameters — e.g.
``range(start: -5m)`` and ``aggregateWindow(every: 1h)`` (reference:
``src/classes/query_classes.py:95-106,127-137``, README.md:209-211) — and
forwards them verbatim to the server. Our engine has to interpret them
itself, so this module implements the Flux duration grammar: an optional
sign followed by one or more ``<int><unit>`` components, e.g. ``1h30m``.

Fixed-width units map to an exact ``datetime.timedelta``; the calendar
units ``mo``/``y`` (variable length) are carried separately as months so
callers can apply them with Spark's ``add_months``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta

# longest-match-first so "mo"/"ms"/"us" win over "m"/"s"
_COMPONENT = re.compile(r"(\d+)(mo|ms|us|ns|y|w|d|h|m|s)")

_FIXED_SECONDS = {
    "w": 7 * 86400.0,
    "d": 86400.0,
    "h": 3600.0,
    "m": 60.0,
    "s": 1.0,
    "ms": 1e-3,
    "us": 1e-6,
    "ns": 1e-9,
}
_CALENDAR_MONTHS = {"mo": 1, "y": 12}


@dataclass(frozen=True)
class Duration:
    """A parsed Flux duration: fixed seconds + calendar months."""

    seconds: float
    months: int

    @property
    def timedelta(self) -> timedelta:
        if self.months:
            raise ValueError(
                "calendar duration (mo/y) has no fixed timedelta; "
                "apply with add_months()"
            )
        return timedelta(seconds=self.seconds)

    def add_to(self, dt: datetime) -> datetime:
        """Apply this duration to a datetime (calendar months first)."""
        out = dt
        if self.months:
            # minimal month arithmetic, day clamped to end-of-month
            total = out.month - 1 + self.months
            year, month = out.year + total // 12, total % 12 + 1
            day = min(out.day, _days_in_month(year, month))
            out = out.replace(year=year, month=month, day=day)
        return out + timedelta(seconds=self.seconds)


def _days_in_month(year: int, month: int) -> int:
    if month == 12:
        nxt = datetime(year + 1, 1, 1)
    else:
        nxt = datetime(year, month + 1, 1)
    return (nxt - timedelta(days=1)).day


def parse_duration(text: str) -> Duration:
    """Parse a Flux duration literal like ``-5m``, ``1h30m``, ``2mo``.

    Raises ``ValueError`` on anything that is not a pure duration.
    """
    if not isinstance(text, str) or not text:
        raise ValueError(f"not a duration literal: {text!r}")
    body = text.strip()
    if not body:  # whitespace-only input (hypothesis-found: "\r")
        raise ValueError(f"not a duration literal: {text!r}")
    sign = 1
    if body[0] in "+-":
        sign = -1 if body[0] == "-" else 1
        body = body[1:]
    pos = 0
    seconds = 0.0
    months = 0
    for match in _COMPONENT.finditer(body):
        if match.start() != pos:
            raise ValueError(f"invalid duration literal: {text!r}")
        magnitude, unit = int(match.group(1)), match.group(2)
        if unit in _CALENDAR_MONTHS:
            months += magnitude * _CALENDAR_MONTHS[unit]
        else:
            seconds += magnitude * _FIXED_SECONDS[unit]
        pos = match.end()
    if pos != len(body) or pos == 0:
        raise ValueError(f"invalid duration literal: {text!r}")
    return Duration(seconds=sign * seconds, months=sign * months)


def duration_to_interval(text: str) -> str:
    """Render a Flux duration as a Spark SQL INTERVAL expression string.

    ``"1h30m"`` → ``"INTERVAL '5400' SECOND"``; calendar components use
    month intervals: ``"-2mo"`` → ``"INTERVAL '-2' MONTH"`` (composed with
    ``+`` when both parts are present).
    """
    dur = parse_duration(text)
    parts = []
    if dur.months:
        parts.append(f"INTERVAL '{dur.months}' MONTH")
    if dur.seconds or not parts:
        # sub-second durations expressed in microseconds to stay exact
        if dur.seconds == int(dur.seconds):
            parts.append(f"INTERVAL '{int(dur.seconds)}' SECOND")
        else:
            parts.append(f"INTERVAL '{int(dur.seconds * 1e6)}' MICROSECOND")
    return " + ".join(parts)


def epoch_us(col):
    """Microseconds-since-epoch for a timestamp column, portable across
    TIMESTAMP and TIMESTAMP_NTZ.

    Parquet written with naive timestamps loads as ``TIMESTAMP_NTZ`` on
    Spark 4.1+, which rejects both ``unix_micros(ntz)`` and
    ``CAST(ntz AS DOUBLE)``. Casting to the session-zone TIMESTAMP first
    resolves on both types; with the engine's pinned UTC session zone
    (session.py) the cast is lossless, and every caller uses the result
    for differences or ordering, which are offset-invariant regardless.
    """
    from pyspark.sql import Column, functions as F

    if not isinstance(col, Column):
        col = F.col(col)
    return F.unix_micros(col.cast("timestamp"))


def epoch_seconds(col):
    """Seconds-since-epoch as DOUBLE — the portable replacement for the
    pre-Spark-4.1 idiom ``CAST(ts AS DOUBLE)``."""
    return epoch_us(col).cast("double") / 1_000_000.0


def duration_to_spark_window(text: str) -> str:
    """Render a Flux duration as a ``window()``/``session_window()`` width
    string, e.g. ``"1h"`` → ``"3600 seconds"``. Calendar units rejected —
    Spark tumbling windows are fixed-width by design.
    """
    dur = parse_duration(text)
    if dur.months:
        raise ValueError(f"calendar duration not valid as window width: {text!r}")
    if dur.seconds <= 0:
        raise ValueError(f"window width must be positive: {text!r}")
    if dur.seconds == int(dur.seconds):
        return f"{int(dur.seconds)} seconds"
    return f"{int(dur.seconds * 1e6)} microseconds"
