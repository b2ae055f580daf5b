"""aggregate_window semantics: epoch alignment, stop-labeling, fn set
(reference aggregateWindow, src/classes/query_classes.py:127-137)."""

from datetime import datetime

import pytest
from pyspark.sql import Row

from solar_logger_spark.operators.window_agg import aggregate_window


@pytest.fixture(scope="module")
def series(spark):
    base = datetime(2024, 1, 1)
    rows = [
        Row(measurement="m", field="f",
            ts=base.replace(minute=10 * i), value=float(i))
        for i in range(6)  # 00:00..00:50, values 0..5
    ] + [
        Row(measurement="m", field="f",
            ts=base.replace(hour=2, minute=5), value=100.0)
    ]
    return spark.createDataFrame(rows)


def test_stop_label_and_alignment(series):
    out = {r.ts: r.value for r in aggregate_window(
        series, "1h", "mean", by=["measurement", "field"]).collect()}
    assert out == {
        datetime(2024, 1, 1, 1): 2.5,     # mean(0..5)
        datetime(2024, 1, 1, 3): 100.0,   # the lone 02:05 point
    }


def test_label_start_and_both(series):
    start = {r.ts for r in aggregate_window(
        series, "1h", "count", by=[], label="start").collect()}
    assert datetime(2024, 1, 1, 0) in start
    both = aggregate_window(series, "1h", "count", by=[], label="both")
    assert {"window_start", "window_end", "value"} <= set(both.columns)


@pytest.mark.parametrize(
    "fn,expected",
    [
        ("min", 0.0), ("max", 5.0), ("sum", 15.0), ("count", 6),
        ("first", 0.0), ("last", 5.0), ("median", 2.5),
    ],
)
def test_agg_fns_first_window(series, fn, expected):
    out = {r.ts: r.value for r in aggregate_window(
        series, "1h", fn, by=["measurement"]).collect()}
    assert out[datetime(2024, 1, 1, 1)] == expected


def test_empty_window_not_emitted(series):
    # hour 01:00-02:00 has no points → absent (createEmpty=false semantics)
    labels = {r.ts for r in aggregate_window(series, "1h", "mean").collect()}
    assert datetime(2024, 1, 1, 2) not in labels


def test_unknown_fn():
    with pytest.raises(ValueError, match="unknown aggregate fn"):
        aggregate_window(None, "1h", "nope")


def test_sliding_window_fanout(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from solar_logger_spark.operators.window_agg import aggregate_window

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 3, 0), 10.0), (datetime(2024, 1, 1, 9, 0), 30.0)],
        ["ts", "value"],
    )
    out = aggregate_window(df, every="1d", slide="6h", fn="mean").collect()
    # each row lands in 4 overlapping 1-day windows sliding 6h
    got = {r.ts: r.value for r in out}
    assert len(got) == 5  # stops 06,12 (overlap both) and 18,00,+06
    assert got[datetime(2024, 1, 1, 6, 0)] == 10.0   # only first event
    assert got[datetime(2024, 1, 1, 12, 0)] == 20.0  # both events
    assert got[datetime(2024, 1, 2, 6, 0)] == 30.0   # only second event


def test_window_alignment_matches_floor_arithmetic(spark):
    """SURVEY §7 hard part 1: aggregateWindow bucket edges. For random
    timestamps and every width, the stop label must equal
    floor(epoch/width)*width + width (epoch-aligned tumbling windows,
    Flux/DuckDB time_bucket semantics)."""
    import random

    from pyspark.sql import Row, functions as F

    from solar_logger_spark.durations import parse_duration
    from solar_logger_spark.operators.window_agg import aggregate_window

    rng = random.Random(42)
    epochs = [rng.randrange(1_500_000_000, 1_800_000_000) for _ in range(200)]
    df = spark.createDataFrame(
        [Row(epoch=e, value=float(i)) for i, e in enumerate(epochs)]
    ).select(F.timestamp_seconds("epoch").alias("ts"), "value")

    for every in ["1m", "5m", "1h", "6h", "1d"]:
        width = int(parse_duration(every).timedelta.total_seconds())
        out = aggregate_window(df, every, "count").collect()
        got_stops = {r.ts for r in out}
        want_stops = {
            __import__("datetime").datetime.utcfromtimestamp(
                (e // width) * width + width
            )
            for e in epochs
        }
        assert got_stops == want_stops, f"misaligned for every={every}"
        # every input row lands in exactly one window
        assert sum(r.value for r in out) == len(epochs)  # count agg


def test_create_empty_fills_gap_windows(spark):
    from datetime import datetime

    from solar_logger_spark.operators.window_agg import aggregate_window

    # rows in hours 0 and 2; hour 1 is empty
    df = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 10), 1.0),
            ("a", datetime(2024, 1, 1, 2, 20), 3.0),
        ],
        "measurement string, ts timestamp, value double",
    )
    out = aggregate_window(
        df, "1h", "mean", by=["measurement"], create_empty=True
    ).orderBy("ts")
    rows = out.collect()
    assert [r.ts.hour for r in rows] == [1, 2, 3]  # stop-labeled
    assert [r.value for r in rows] == [1.0, None, 3.0]


def test_create_empty_count_is_zero(spark):
    from datetime import datetime

    from solar_logger_spark.operators.window_agg import aggregate_window

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 0, 10), 1.0)],
        "measurement string, ts timestamp, value double",
    )
    out = aggregate_window(
        df, "1h", "count", by=["measurement"], create_empty=True,
        bounds=(datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 3)),
    ).orderBy("ts")
    rows = out.collect()
    assert [r.value for r in rows] == [1, 0, 0]  # Flux: empty count = 0


def test_create_empty_bounds_pin_spine(spark):
    from datetime import datetime

    from solar_logger_spark.operators.window_agg import aggregate_window

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 1, 30), 5.0)],
        "measurement string, ts timestamp, value double",
    )
    out = aggregate_window(
        df, "1h", "mean", by=["measurement"], create_empty=True,
        bounds=(datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 4)),
    ).orderBy("ts")
    rows = out.collect()
    # spine covers [00:00, 04:00): stops at 01..04
    assert [r.ts.hour for r in rows] == [1, 2, 3, 4]
    assert [r.value for r in rows] == [None, 5.0, None, None]


def test_create_empty_per_series_keys(spark):
    from datetime import datetime

    from solar_logger_spark.operators.window_agg import aggregate_window

    df = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 10), 1.0),
            ("b", datetime(2024, 1, 1, 1, 10), 2.0),
        ],
        "measurement string, ts timestamp, value double",
    )
    out = aggregate_window(
        df, "1h", "mean", by=["measurement"], create_empty=True
    )
    rows = {(r.measurement, r.ts.hour): r.value for r in out.collect()}
    # both series get both windows
    assert rows == {
        ("a", 1): 1.0, ("a", 2): None, ("b", 1): None, ("b", 2): 2.0,
    }


def test_create_empty_rejects_slide_and_calendar(spark):
    import pytest

    from solar_logger_spark.operators.window_agg import aggregate_window

    df = spark.createDataFrame([], "ts timestamp, value double")
    with pytest.raises(ValueError, match="slide"):
        aggregate_window(df, "1h", "mean", slide="30m", create_empty=True)
    with pytest.raises(ValueError, match="whole-second"):
        aggregate_window(df, "500ms", "mean", create_empty=True)


def test_integral_window_trapezoid(spark):
    from datetime import datetime

    from solar_logger_spark.operators.window_agg import aggregate_window

    df = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 0, 0), 1.0),
            ("a", datetime(2024, 1, 1, 0, 10, 0), 3.0),   # (1+3)/2*600 = 1200
            ("a", datetime(2024, 1, 1, 0, 20, 0), 3.0),   # (3+3)/2*600 = 1800
            ("a", datetime(2024, 1, 1, 1, 30, 0), 5.0),   # lone point → 0
            ("b", datetime(2024, 1, 1, 0, 5, 0), 2.0),    # lone point → 0
        ],
        "measurement string, ts timestamp, value double",
    )
    out = aggregate_window(df, "1h", "integral", by=["measurement"])
    rows = {(r.measurement, r.ts.hour): r.value for r in out.collect()}
    assert rows == {("a", 1): 3000.0, ("a", 2): 0.0, ("b", 1): 0.0}


def test_integral_rejects_slide_and_create_empty(spark):
    import pytest

    from solar_logger_spark.operators.window_agg import aggregate_window

    df = spark.createDataFrame([], "ts timestamp, value double")
    with pytest.raises(ValueError, match="integral"):
        aggregate_window(df, "1h", "integral", slide="30m")
    with pytest.raises(ValueError, match="integral"):
        aggregate_window(df, "1h", "integral", create_empty=True)


def test_offset_shifts_alignment(spark):
    from datetime import datetime

    from solar_logger_spark.operators.window_agg import aggregate_window

    # 02:30 event: plain 1h buckets → stop 03:00; offset 15m → [02:15,
    # 03:15) → stop 03:15
    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 2, 30), 1.0)],
        "measurement string, ts timestamp, value double",
    )
    plain = aggregate_window(df, "1h", "count").collect()[0]
    assert plain.ts == datetime(2024, 1, 1, 3, 0)
    shifted = aggregate_window(df, "1h", "count", offset="15m").collect()[0]
    assert shifted.ts == datetime(2024, 1, 1, 3, 15)
    negative = aggregate_window(df, "1h", "count", offset="-15m").collect()[0]
    assert negative.ts == datetime(2024, 1, 1, 2, 45)


def test_mode_skew_kurtosis_first_window(series):
    """r11 Flux-stdlib tail on the 0..5 first window: mode with no
    repeats returns the LOWEST value (deterministic divergence from
    Flux's null-on-no-repeat), the symmetric uniform has skewness 0,
    and its excess kurtosis is m4/m2^2 - 3 = (707/48)/(35/12)^2 - 3
    = 2121/1225 - 3 (hand-computed)."""
    first = datetime(2024, 1, 1, 1)
    mode = {r.ts: r.value for r in aggregate_window(
        series, "1h", "mode", by=["measurement"]).collect()}
    assert mode[first] == 0.0
    skew = {r.ts: r.value for r in aggregate_window(
        series, "1h", "skew", by=["measurement"]).collect()}
    assert abs(skew[first]) < 1e-9
    kurt = {r.ts: r.value for r in aggregate_window(
        series, "1h", "kurtosis", by=["measurement"]).collect()}
    assert kurt[first] == pytest.approx(2121.0 / 1225.0 - 3.0, rel=1e-12)
    # the lone 02:05 point: mode is itself; zero variance → moments null
    lone = datetime(2024, 1, 1, 3)
    assert mode[lone] == 100.0
    assert skew[lone] is None and kurt[lone] is None


def test_mode_tie_breaks_to_lowest(spark):
    # counts {3.0: 2, 1.0: 2, 2.0: 1} — tie on the max count, the
    # LOWEST tied value wins (mirrors the oracle's cnt DESC, value ASC)
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, i), v)
         for i, v in enumerate([3.0, 3.0, 1.0, 1.0, 2.0])],
        "ts timestamp, value double",
    )
    out = aggregate_window(df, "1h", "mode", by=[]).collect()
    assert [(r.ts, r.value) for r in out] == [(datetime(2024, 1, 1, 1), 1.0)]


def test_skew_kurtosis_null_values_match_oracle_semantics(spark):
    """r12 (ADVICE low): _power_sums' n is F.count(xi) — the non-null
    count — and the DuckDB moment prelude must use count(xi) too (it
    used count(*), so any group containing nulls diverged
    cross-engine). Pin: a group with nulls equals the same group with
    the nulls REMOVED, on both engines."""
    import duckdb

    vals = [0.0, 1.0, None, 2.0, None, 3.0, 4.0, 5.0]
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, i), v) for i, v in enumerate(vals)],
        "ts timestamp, value double",
    )
    dense = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, i), v)
         for i, v in enumerate([v for v in vals if v is not None])],
        "ts timestamp, value double",
    )
    for fn in ("skew", "kurtosis"):
        with_nulls = aggregate_window(df, "1h", fn, by=[]).collect()
        without = aggregate_window(dense, "1h", fn, by=[]).collect()
        assert [r.value for r in with_nulls] == [r.value for r in without]

    # and the mirrored SQL (count(xi) form) agrees bit-for-bit
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(value DOUBLE); INSERT INTO t VALUES "
        + ", ".join("(NULL)" if v is None else f"({v})" for v in vals)
    )
    [(n, s1, s2)] = con.execute("""
        SELECT count(xi), CAST(sum(xi) AS DOUBLE),
               CAST(sum(xi*xi) AS DOUBLE)
        FROM (SELECT CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100
                     AS BIGINT) AS HUGEINT) AS xi FROM t)
    """).fetchall()
    assert n == 6  # count(xi) skips nulls, count(*) would say 8
    want_skew = aggregate_window(df, "1h", "skew", by=[]).collect()[0].value
    m1 = s1 / n
    m2 = s2 / n - m1 * m1
    [(s3,)] = con.execute("""
        SELECT CAST(sum(xi*xi*xi) AS DOUBLE)
        FROM (SELECT CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100
                     AS BIGINT) AS HUGEINT) AS xi FROM t)
    """).fetchall()
    m3 = s3 / n - 3.0 * m1 * (s2 / n) + 2.0 * m1 * m1 * m1
    import math
    assert want_skew == m3 / (m2 * math.sqrt(m2))
