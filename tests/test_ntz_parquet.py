"""TIMESTAMP_NTZ portability regression tests.

Parquet written with naive timestamps loads as ``TIMESTAMP_NTZ`` on
Spark 4.1+, which rejects ``unix_micros(ntz)`` and ``CAST(ntz AS
DOUBLE)`` — the round-2 driver found six queries broken while the unit
suite stayed green, because fixtures built tz-aware timestamps in
memory and never hit the NTZ parquet path. These tests round-trip a
frame through parquet (forcing NTZ typing) and run every operator that
does epoch arithmetic on the timestamp column.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from solar_logger_spark.durations import epoch_seconds, epoch_us
from solar_logger_spark.operators.interval_join import interval_join
from solar_logger_spark.operators.timeseries import (
    derivative,
    elapsed,
    state_duration,
)
from solar_logger_spark.operators.window_agg import aggregate_window


@pytest.fixture(scope="module")
def ntz_events(spark, tmp_path_factory):
    """Events round-tripped through parquet so ``ts`` is TIMESTAMP_NTZ."""
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, i * 10), float(i)) for i in range(6)
    ] + [
        ("b", datetime(2024, 1, 1, 0, 1, i * 15), float(10 - i))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "series string, ts timestamp_ntz, value double")
    path = str(tmp_path_factory.mktemp("ntz") / "events.parquet")
    df.write.mode("overwrite").parquet(path)
    out = spark.read.parquet(path)
    assert "timestamp_ntz" in out.schema["ts"].dataType.simpleString()
    return out


def test_epoch_us_on_ntz(ntz_events):
    got = ntz_events.select(epoch_us("ts").alias("us")).agg(F.min("us")).first()[0]
    assert got == int(datetime(2024, 1, 1).timestamp() * 1e6) or got > 0


def test_epoch_seconds_difference_invariant(ntz_events):
    # differences are tz-offset-invariant: 10 s between consecutive 'a' rows
    rates = (
        derivative(ntz_events, ["series"])
        .filter(F.col("series") == "a")
        .select("rate")
        .collect()
    )
    vals = sorted(r.rate for r in rates if r.rate is not None)
    assert vals == pytest.approx([0.1] * 5)


def test_elapsed_on_ntz(ntz_events):
    out = (
        elapsed(ntz_events, ["series"])
        .filter(F.col("series") == "b")
        .select("elapsed")
        .collect()
    )
    vals = sorted(r.elapsed for r in out if r.elapsed is not None)
    assert vals == pytest.approx([15.0] * 3)


def test_state_duration_on_ntz(ntz_events):
    out = state_duration(
        ntz_events, F.col("value") >= 2.0, ["series"]
    ).select("series", "value", "state_duration")
    rows = {(r.series, r.value): r.state_duration for r in out.collect()}
    assert rows[("a", 2.0)] == 0.0  # run opens
    assert rows[("a", 5.0)] == 30.0  # 3 steps × 10 s later
    assert rows[("a", 0.0)] == -1.0  # off-state


def test_integral_on_ntz(ntz_events):
    out = aggregate_window(
        ntz_events, every="1h", fn="integral", by=["series"], ts_col="ts"
    )
    vals = {r.series: r.value for r in out.collect()}
    # trapezoid over series a: (0+1)/2*10 + ... + (4+5)/2*10 = 125
    assert vals["a"] == pytest.approx(125.0)


def test_interval_join_on_ntz(ntz_events, spark, tmp_path_factory):
    clicks = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 0, 0, 5))],
        "series string, ts timestamp_ntz",
    )
    path = str(tmp_path_factory.mktemp("ntz_r") / "clicks.parquet")
    clicks.write.mode("overwrite").parquet(path)
    right = spark.read.parquet(path)
    out = interval_join(
        ntz_events,
        right,
        keys=["series"],
        left_ts="ts",
        right_ts="ts",
        lower="0s",
        upper="30s",
    )
    # left rows at :00 catch the :05 click within [0s, 30s); :10 does not
    # wait — click at :05 relative to left ts: ts<=:05<ts+30 → left :00 only
    assert out.count() == 1
