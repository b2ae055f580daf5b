"""Binned interval join: exact window semantics (inclusive lower,
exclusive upper), bucket-boundary cases, outer variant, and a
brute-force differential check on random data."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import Row

from solar_logger_spark.operators.interval_join import interval_join


def _df(spark, rows, ts_name="ts"):
    return spark.createDataFrame(rows)


def test_window_bounds_inclusive_exclusive(spark):
    base = datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([Row(lid=1, k="a", ts=base)])
    right = spark.createDataFrame(
        [
            Row(rid=10, k="a", ts=base - timedelta(minutes=10)),  # == lower: in
            Row(rid=11, k="a", ts=base - timedelta(minutes=5)),   # in
            Row(rid=12, k="a", ts=base),                          # == upper: out
            Row(rid=13, k="a", ts=base - timedelta(minutes=10, seconds=1)),  # out
            Row(rid=14, k="b", ts=base - timedelta(minutes=5)),   # wrong key
        ]
    )
    out = interval_join(
        left, right, keys=["k"], lower="-10m", upper="0s",
        left_ts="ts", right_ts="ts",
    )
    assert {r.rid for r in out.collect()} == {10, 11}


def test_left_outer_keeps_unmatched(spark):
    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [Row(lid=1, k="a", ts=base), Row(lid=2, k="z", ts=base)]
    )
    right = spark.createDataFrame([Row(rid=10, k="a", ts=base)])
    out = interval_join(
        left, right, keys=["k"], lower="0s", upper="1m", how="left_outer"
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == {1: 10, 2: None}


def test_matches_bruteforce_on_random_data(spark):
    rng = random.Random(3)
    t0 = datetime(2024, 1, 1)
    lrows = [
        Row(lid=i, k=rng.choice("abc"),
            ts=t0 + timedelta(seconds=rng.randrange(0, 3600)))
        for i in range(60)
    ]
    rrows = [
        Row(rid=i, k=rng.choice("abc"),
            ts=t0 + timedelta(seconds=rng.randrange(0, 3600)))
        for i in range(80)
    ]
    lo, hi = -300, 120  # [-5m, +2m)
    want = {
        (l.lid, r.rid)
        for l in lrows
        for r in rrows
        if l.k == r.k
        and l.ts + timedelta(seconds=lo) <= r.ts < l.ts + timedelta(seconds=hi)
    }
    out = interval_join(
        spark.createDataFrame(lrows),
        spark.createDataFrame(rrows),
        keys=["k"], lower="-5m", upper="2m",
    )
    got = {(r.lid, r.rid) for r in out.collect()}
    assert got == want


def test_invalid_bounds_rejected(spark):
    import pytest

    df = spark.createDataFrame([Row(k="a", ts=datetime(2024, 1, 1))])
    with pytest.raises(ValueError, match="lower < upper"):
        interval_join(df, df, keys=["k"], lower="0s", upper="0s")
    with pytest.raises(ValueError, match="fixed durations"):
        interval_join(df, df, keys=["k"], lower="-1mo", upper="0s")
