"""Time-series transform semantics on a hand-computed series."""

from __future__ import annotations

from datetime import datetime

import pytest

from solar_logger_spark.operators import timeseries as T


@pytest.fixture()
def series(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 0), 1, 10.0),
        ("a", datetime(2024, 1, 1, 0, 0, 10), 2, 14.0),
        ("a", datetime(2024, 1, 1, 0, 0, 30), 3, 11.0),   # counter reset
        ("a", datetime(2024, 1, 1, 0, 0, 40), 4, 20.0),
        ("b", datetime(2024, 1, 1, 0, 0, 0), 5, 100.0),
        ("b", datetime(2024, 1, 1, 0, 0, 5), 6, None),
        ("b", datetime(2024, 1, 1, 0, 0, 9), 7, 101.0),
    ]
    return spark.createDataFrame(rows, "series string, ts timestamp, id long, value double")


def _col(df, alias, key="id"):
    return {r[key]: r[alias] for r in df.collect()}


def test_difference(series):
    got = _col(T.difference(series, ["series"], tiebreak=["id"]), "diff")
    assert got[1] is None and got[2] == 4.0 and got[3] == -3.0 and got[4] == 9.0
    assert got[5] is None and got[6] is None  # null value → null diff


def test_derivative_per_second(series):
    got = _col(T.derivative(series, ["series"], tiebreak=["id"]), "rate")
    assert got[2] == pytest.approx(0.4)    # +4 over 10s
    assert got[3] == pytest.approx(-0.15)  # -3 over 20s
    assert got[1] is None


def test_derivative_zero_dt_is_null(spark):
    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 1, 1.0), ("a", datetime(2024, 1, 1), 2, 5.0)],
        "series string, ts timestamp, id long, value double",
    )
    got = _col(T.derivative(df, ["series"], tiebreak=["id"]), "rate")
    assert got[2] is None  # duplicate timestamp: no ±inf


def test_cumulative_sum(series):
    got = _col(T.cumulative_sum(series, ["series"], tiebreak=["id"]), "cum_sum")
    assert got[4] == pytest.approx(55.0)
    assert got[7] == pytest.approx(201.0)  # null contributes nothing


def test_forward_fill(series):
    got = _col(T.forward_fill(series, ["series"], tiebreak=["id"]), "filled")
    assert got[6] == 100.0  # null filled from previous
    assert got[7] == 101.0  # real values untouched


def test_increase_skips_resets(series):
    got = _col(T.increase(series, ["series"], tiebreak=["id"]), "increase")
    # +4, reset (-3 → 0), +9 → total 13
    assert got[4] == pytest.approx(13.0)


def test_elapsed_and_time_shift(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from solar_logger_spark.operators import timeseries as T

    df = spark.createDataFrame(
        [
            Row(k="a", ts=datetime(2024, 1, 1, 0, 0, 0), i=1),
            Row(k="a", ts=datetime(2024, 1, 1, 0, 0, 30), i=2),
            Row(k="a", ts=datetime(2024, 1, 1, 0, 2, 0), i=3),
            Row(k="b", ts=datetime(2024, 1, 1, 0, 5, 0), i=4),
        ]
    )
    out = T.elapsed(df, series=["k"], tiebreak=["i"]).orderBy("i").collect()
    assert [r.elapsed for r in out] == [None, 30.0, 90.0, None]

    shifted = T.time_shift(df, "-5m").filter("i = 1").collect()[0]
    assert shifted.ts == datetime(2023, 12, 31, 23, 55, 0)


def test_moving_average_row_frame(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from solar_logger_spark.operators import timeseries as T

    rows = [Row(k="a", ts=datetime(2024, 1, 1, 0, i), i=i, value=float(v))
            for i, v in enumerate([2, 4, 6, 8])]
    out = (
        T.moving_average(
            spark.createDataFrame(rows), n=2, series=["k"],
            value_col="value", tiebreak=["i"],
        )
        .orderBy("i").collect()
    )
    assert [r.mavg for r in out] == [2.0, 3.0, 5.0, 7.0]


def test_ema_recursion_exact(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from solar_logger_spark.operators import timeseries as T

    rows = [Row(k="a", ts=datetime(2024, 1, 1, 0, i), i=i, value=float(v))
            for i, v in enumerate([10, 20, 30])]
    out = (
        T.exponential_moving_average(
            spark.createDataFrame(rows), n=9, series=["k"],
            value_col="value", tiebreak=["i"],
        )
        .orderBy("i").collect()
    )
    # alpha = 0.2: y = [10, 0.2*20+0.8*10, 0.2*30+0.8*prev]
    y1 = 10.0
    y2 = 0.2 * 20.0 + 0.8 * y1
    y3 = 0.2 * 30.0 + 0.8 * y2
    assert [r.ema for r in out] == [y1, y2, y3]


def test_state_count_runs(spark):
    from pyspark.sql import functions as F
    from solar_logger_spark.operators import timeseries as T

    df = spark.createDataFrame(
        [  # series a: on on off on ; series b: off off
            ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, -1.0), ("a", 4, 5.0),
            ("b", 1, -2.0), ("b", 2, -3.0),
        ],
        "s string, t int, v double",
    ).withColumn("ts", F.timestamp_seconds("t"))
    out = {
        (r.s, r.t): r.state_count
        for r in T.state_count(
            df, F.col("v") > 0, ["s"], ts_col="ts", tiebreak=["t"]
        ).collect()
    }
    assert out == {
        ("a", 1): 1, ("a", 2): 2, ("a", 3): -1, ("a", 4): 1,
        ("b", 1): -1, ("b", 2): -1,
    }


def test_state_duration_runs(spark):
    from pyspark.sql import functions as F
    from solar_logger_spark.operators import timeseries as T

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 30, 1.0), ("a", 90, -1.0), ("a", 120, 1.0)],
        "s string, t int, v double",
    ).withColumn("ts", F.timestamp_seconds("t"))
    out = {
        r.t: r.state_duration
        for r in T.state_duration(
            df, F.col("v") > 0, ["s"], ts_col="ts", tiebreak=["t"]
        ).collect()
    }
    # run restarts at t=120 after the off-state row at t=90
    assert out == {0: 0.0, 30: 30.0, 90: -1.0, 120: 0.0}


def test_anomaly_zscore_flags_spike(spark):
    from pyspark.sql import Row

    from solar_logger_spark.operators import timeseries as T

    base = [float(v) for v in (10, 11, 9, 10, 12, 10, 11, 9, 10, 11)]
    rows = [
        Row(event_id=i, event_type="a", ts=i, value=v)
        for i, v in enumerate(base)
    ]
    rows.append(Row(event_id=10, event_type="a", ts=10, value=500.0))
    df = spark.createDataFrame(rows)
    out = {
        r.event_id: r
        for r in T.anomaly_zscore(
            df, n=25, series=["event_type"], tiebreak=["event_id"]
        ).collect()
    }
    assert out[0].z is None  # single-point window: undefined
    assert not any(out[i].is_anomaly for i in range(10))
    assert out[10].is_anomaly and out[10].z > 3.0


def test_interpolate_linear_matches_pandas_reference(spark):
    """Differential: 40 random series with random null patterns vs a
    brute-force pandas reference (time-weighted interpolation, nulls at
    the edges stay null) — one Spark job for all series."""
    import random

    import numpy as np
    import pandas as pd
    from pyspark.sql import Row

    from solar_logger_spark.operators import timeseries as T

    rng = random.Random(7)
    rows = []
    for s in range(40):
        n = rng.randrange(1, 30)
        ts = sorted(rng.sample(range(0, 10_000), n))
        for i, t in enumerate(ts):
            v = None if rng.random() < 0.35 else round(rng.uniform(-50, 50), 3)
            rows.append(
                Row(
                    series=f"s{s}",
                    event_id=i,
                    ts=t * 1_000_000,  # µs
                    value=v,
                )
            )
    df = spark.createDataFrame(rows, "series string, event_id long, ts long, value double")
    # operator works on any orderable ts; epoch_us of a long column is
    # not defined, so use a timestamp column derived from the µs value
    from pyspark.sql import functions as F

    df = df.withColumn("tcol", F.timestamp_micros(F.col("ts")))
    out = T.interpolate_linear(
        df, series=["series"], ts_col="tcol", tiebreak=["event_id"]
    ).collect()

    pdf = pd.DataFrame([r.asDict() for r in rows])

    def _null(x):
        return x is None or (isinstance(x, float) and x != x)  # None/NaN

    expected = {}
    for s, grp in pdf.groupby("series"):
        g = grp.sort_values(["ts", "event_id"]).reset_index(drop=True)
        vals = g.value.to_numpy(dtype=object)
        for i in range(len(g)):
            if not _null(vals[i]):
                expected[(s, g.event_id[i])] = vals[i]
                continue
            prev = next_ = None
            for j in range(i - 1, -1, -1):
                if not _null(vals[j]):
                    prev = j
                    break
            for j in range(i + 1, len(g)):
                if not _null(vals[j]):
                    next_ = j
                    break
            if prev is None or next_ is None:
                expected[(s, g.event_id[i])] = None
            else:
                t0, t1, t = g.ts[prev], g.ts[next_], g.ts[i]
                frac = (t - t0) / (t1 - t0)
                expected[(s, g.event_id[i])] = vals[prev] + (
                    vals[next_] - vals[prev]
                ) * frac

    assert len(out) == len(rows)
    for r in out:
        exp = expected[(r.series, r.event_id)]
        if exp is None:
            assert r.filled is None, (r.series, r.event_id, r.filled)
        else:
            assert r.filled == pytest.approx(exp, rel=1e-12), (
                r.series,
                r.event_id,
            )


def test_anomaly_zscore_skips_nulls(spark):
    """Null values must not bias the window moments: [10, null, 10]
    has zero variance over its two observed points — z undefined, no
    spurious anomaly."""
    from pyspark.sql import Row

    from solar_logger_spark.operators import timeseries as T

    df = spark.createDataFrame(
        [
            Row(event_id=0, event_type="a", ts=0, value=10.0),
            Row(event_id=1, event_type="a", ts=1, value=None),
            Row(event_id=2, event_type="a", ts=2, value=10.0),
            Row(event_id=3, event_type="a", ts=3, value=40.0),
        ],
        "event_id long, event_type string, ts long, value double",
    )
    out = {
        r.event_id: r
        for r in T.anomaly_zscore(
            df, n=25, series=["event_type"], tiebreak=["event_id"]
        ).collect()
    }
    assert out[2].z is None and not out[2].is_anomaly  # var 0, not biased
    assert out[1].z is None  # null input row scores nothing
    assert out[3].z is not None  # 3 observed points, real variance


def test_interpolate_duplicate_timestamps_pin_prev(spark):
    from pyspark.sql import Row, functions as F

    from solar_logger_spark.operators import timeseries as T

    df = spark.createDataFrame(
        [
            Row(series="s", event_id=0, ts=5, value=1.0),
            Row(series="s", event_id=1, ts=5, value=None),
            Row(series="s", event_id=2, ts=5, value=9.0),
        ],
        "series string, event_id long, ts long, value double",
    )
    df = df.withColumn("tcol", F.timestamp_micros(F.col("ts")))
    out = {
        r.event_id: r
        for r in T.interpolate_linear(
            df, series=["series"], ts_col="tcol", tiebreak=["event_id"]
        ).collect()
    }
    assert out[1].filled == 1.0  # pinned to prev, not NaN/NULL


def test_cusum_drift_matches_textbook_recursion(spark):
    """The closed form (prefix sum minus running min) must equal the
    textbook recursion S_i = max(0, S_{i-1} + d_i - k) exactly, with a
    drift injected mid-series getting detected."""
    import numpy as np
    import pandas as pd
    from decimal import Decimal, ROUND_HALF_UP

    rng = np.random.default_rng(7)
    vals = np.round(
        np.concatenate([rng.normal(0, 1, 120), rng.normal(1.5, 1, 60)]), 4
    )
    pdf = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "ts": pd.date_range("2024-01-01", periods=len(vals), freq="min"),
            "event_type": "a",
            "value": vals,
        }
    )
    out = (
        T.cusum_drift(
            spark.createDataFrame(pdf),
            series=["event_type"],
            tiebreak=["event_id"],
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    xd = [Decimal(str(v)).quantize(Decimal("0.000001")) for v in vals]
    sx, sxx, n = float(sum(xd)), float(sum(d * d for d in xd)), float(len(xd))
    mean = sx / n
    sigma = ((n * sxx - sx * sx) / (n * (n - 1))) ** 0.5
    k = 0.5 * sigma

    def dq(x):
        return Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )

    sp = sn = Decimal(0)
    exp_pos, exp_neg = [], []
    for v in vals:
        sp = max(Decimal(0), sp + dq(float(v) - mean - k))
        sn = max(Decimal(0), sn + dq(mean - float(v) - k))
        exp_pos.append(float(sp))
        exp_neg.append(float(sn))

    assert np.abs(out["cusum_pos"].to_numpy() - exp_pos).max() == 0.0
    assert np.abs(out["cusum_neg"].to_numpy() - exp_neg).max() == 0.0
    # drift is detected (the in-control stats come from the full —
    # contaminated — series, so the pre-shift segment reads as downward
    # drift relative to the elevated mean: both sides fire; upward
    # accumulation must peak after the +1.5 sigma shift begins)
    assert out["is_drift"].any()
    assert out["cusum_pos"].to_numpy().argmax() >= 120
    assert (
        out.loc[out["event_id"] >= 160, "cusum_pos"].min()
        > out.loc[out["event_id"] < 120, "cusum_pos"].max()
    )


def test_holt_smoothing_recursion_and_batch_carry(spark):
    """r12: levels/trends equal the pinned affine-scan fold
    bit-for-bit (the closed matrix form of the recursion, entry 0 on
    the first block — within one 64-row chunk this is the plain
    within-chunk map fold), and stay within float noise of the
    classic step-by-step recursion."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    vals = np.round(rng.normal(50, 10, 64), 3)
    pdf = pd.DataFrame(
        {
            "event_id": range(64),
            "ts": pd.date_range("2024-01-01", periods=64, freq="min"),
            "event_type": "a",
            "value": vals,
        }
    )
    sdf = spark.createDataFrame(pdf)
    out = (
        T.holt_smoothing(sdf, series=["event_type"], tiebreak=["event_id"])
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    f = np.float64
    a, b_ = 0.2, 0.1
    consts = (f(1.0 - a), f(1.0 - a), f(-(b_ * a)), f(1.0 - b_ * a))
    acc = (f(1), f(0), f(0), f(1), f(0), f(0))  # a11 a12 a21 a22 c1 c2
    exp_l, exp_b = [], []
    for k, x in enumerate(vals):
        x = f(x)
        if k == 0:
            it = (f(0), f(0), f(0), f(0), x, f(0))
        else:
            it = (*consts, f(f(a) * x), f(f(b_ * a) * x))
        i11, i12, i21, i22, ic1, ic2 = it
        a11, a12, a21, a22, c1, c2 = acc
        acc = (
            f(f(i11 * a11) + f(i12 * a21)),
            f(f(i11 * a12) + f(i12 * a22)),
            f(f(i21 * a11) + f(i22 * a21)),
            f(f(i21 * a12) + f(i22 * a22)),
            f(f(f(i11 * c1) + f(i12 * c2)) + ic1),
            f(f(f(i21 * c1) + f(i22 * c2)) + ic2),
        )
        # y = apply(acc, (0, 0)) = fl(fl(a11*0 + a12*0) + c)
        exp_l.append(float(f(f(f(acc[0] * 0.0) + f(acc[1] * 0.0)) + acc[4])))
        exp_b.append(float(f(f(f(acc[2] * 0.0) + f(acc[3] * 0.0)) + acc[5])))
    got_l = out["level"].to_numpy()
    got_b = out["trend"].to_numpy()
    assert (got_l.view("int64") == np.array(exp_l).view("int64")).all()
    assert (got_b.view("int64") == np.array(exp_b).view("int64")).all()

    # sanity: the closed matrix form tracks the classic recursion
    l, b = float(vals[0]), 0.0
    for k, x in enumerate(vals):
        if k:
            ln = a * float(x) + (1 - a) * (l + b)
            b = b_ * (ln - l) + (1 - b_) * b
            l = ln
        assert abs(got_l[k] - l) <= 1e-9 * max(1.0, abs(l))
        assert abs(got_b[k] - b) <= 1e-9 * max(1.0, abs(b))

def test_cusum_and_holt_keep_null_series_keys(spark):
    """Null series keys form a real series: cusum must not drop the
    rows (null-safe stats join) and holt must not fabricate 0.0 state
    (groupby dropna=False + normalized carry keys)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": pd.date_range("2024-01-01", periods=6, freq="min"),
            "event_type": ["a", "a", "a", None, None, None],
            "value": [10.0, 12.0, 11.0, 5.0, 7.0, 6.0],
        }
    )
    sdf = spark.createDataFrame(pdf)

    c = T.cusum_drift(sdf, series=["event_type"], tiebreak=["event_id"])
    assert c.count() == 6  # null-key rows survive the stats join

    h = (
        T.holt_smoothing(sdf, series=["event_type"], tiebreak=["event_id"])
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # the null series runs the real recursion: l0 = x0, and the later
    # levels move toward the observations instead of staying 0.0
    nulls = h[h["event_type"].isna()]
    assert list(nulls["event_id"]) == [3, 4, 5]
    assert nulls["level"].iloc[0] == 5.0
    assert (nulls["level"] != 0.0).all()


def test_holt_winters_learns_a_season(spark):
    """Seasonal recursion matches the plain python reference bit-for-bit
    and actually learns an injected 4-step season (late-series seasonal
    estimates correlate with the true pattern)."""
    import numpy as np
    import pandas as pd

    pattern = [5.0, -2.0, 0.0, -3.0]
    vals = np.array(
        [50.0 + pattern[i % 4] for i in range(80)]
    )
    pdf = pd.DataFrame(
        {
            "event_id": range(80),
            "ts": pd.date_range("2024-01-01", periods=80, freq="h"),
            "event_type": "a",
            "value": vals,
        }
    )
    out = (
        T.holt_winters(
            spark.createDataFrame(pdf),
            series=["event_type"],
            period=4,
            tiebreak=["event_id"],
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    a, be, g = 0.3, 0.1, 0.2
    l, b = float(vals[0]), 0.0
    seas = [0.0] * 4
    exp_l, exp_b, exp_s = [l], [b], [0.0]
    for x in vals[1:]:
        sm = seas[0]
        ln = a * (float(x) - sm) + (1 - a) * (l + b)
        b = be * (ln - l) + (1 - be) * b
        sn = g * (float(x) - ln) + (1 - g) * sm
        seas = seas[1:] + [sn]
        l = ln
        exp_l.append(l)
        exp_b.append(b)
        exp_s.append(sn)
    assert np.abs(out["level"].to_numpy() - exp_l).max() == 0.0
    assert np.abs(out["trend"].to_numpy() - exp_b).max() == 0.0
    assert np.abs(out["seasonal"].to_numpy() - exp_s).max() == 0.0
    # learned seasonals in the last cycle rank the same as the truth
    tail = out["seasonal"].to_numpy()[-4:]
    phase = [(i % 4) for i in out["event_id"].to_numpy()[-4:]]
    truth = [pattern[p] for p in phase]
    assert np.argsort(tail).tolist() == np.argsort(truth).tolist()


def test_rsi_hand_computed(spark):
    from pyspark.sql import Row

    rows = [
        Row(event_id=i, event_type="a", ts=i, value=float(v))
        for i, v in enumerate([10, 11, 10, 11, 10])
    ]
    rows += [
        Row(event_id=10 + i, event_type="b", ts=i, value=float(10 + i))
        for i in range(4)
    ]
    out = {
        r.event_id: r.rsi
        for r in T.rsi(
            spark.createDataFrame(rows),
            n=2,
            series=["event_type"],
            tiebreak=["event_id"],
        ).collect()
    }
    # series a: needs 2 deltas -> null, null, then alternating +1/-1
    # windows give 100*1/(1+1) = 50
    assert out[0] is None and out[1] is None
    assert out[2] == 50.0 and out[3] == 50.0 and out[4] == 50.0
    # series b: monotone up -> all gains, rsi = 100
    assert out[10] is None and out[11] is None
    assert out[12] == 100.0 and out[13] == 100.0


def test_rsi_differential_vs_pandas(spark):
    """Differential: random multi-series data vs a pandas rolling
    reference (simple-average RSI, warm-up = n deltas), one job."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(23)
    frames = []
    for s in range(6):
        m = int(rng.integers(1, 40))
        frames.append(
            pd.DataFrame(
                {
                    "event_id": np.arange(m) + s * 1000,
                    "ts": pd.date_range("2024-01-01", periods=m, freq="min"),
                    "event_type": f"s{s}",
                    "value": np.round(rng.normal(50, 10, m), 3),
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    n = 5
    out = (
        T.rsi(
            spark.createDataFrame(pdf),
            n=n,
            series=["event_type"],
            tiebreak=["event_id"],
        )
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    exp = []
    for s, g in pdf.groupby("event_type", sort=False):
        diff = g["value"].diff()
        gain = diff.clip(lower=0)
        loss = (-diff).clip(lower=0)
        sg = gain.rolling(n, min_periods=n).sum()
        sl = loss.rolling(n, min_periods=n).sum()
        r = 100.0 * sg / (sg + sl)
        r[(sg + sl) == 0] = np.nan
        exp.append(pd.DataFrame({"event_id": g["event_id"], "exp": r}))
    expected = (
        pd.concat(exp).sort_values("event_id").reset_index(drop=True)
    )
    a = out["rsi"].to_numpy()
    b = expected["exp"].to_numpy()
    both_nan = np.isnan(a) & np.isnan(b)
    close = np.isclose(a, b, rtol=1e-9, atol=1e-12)
    assert bool((both_nan | close).all())


def test_rolling_median_despike(spark):
    from solar_logger_spark.operators import timeseries as T
    from pyspark.sql import Row
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    vals = [1.0, 2.0, 100.0, 3.0, 4.0, 5.0]  # 100 is a spike
    df = spark.createDataFrame(
        [
            Row(event_id=i, ts=t0 + dt.timedelta(minutes=i),
                user_id=1, value=v)
            for i, v in enumerate(vals)
        ]
    )
    out = {
        r.event_id: (r.rolling_med, r.is_spike)
        for r in T.rolling_median_despike(
            df, k=2, threshold=10.0, series=["user_id"],
            tiebreak=["event_id"],
        ).collect()
    }
    # interior odd window: median of [1,2,100,3,4] = 3
    assert out[2] == (3.0, True)
    # edge row 0: window [1,2,100] -> 2; |1-2| < 10
    assert out[0] == (2.0, False)
    # edge row 1: even window [1,2,100,3] -> (2+3)/2
    assert out[1] == (2.5, False)
    # interior after the spike: [100,3,4,5] even -> (4+100... sorted
    # [3,4,5,100] -> (4+5)/2 = 4.5
    assert out[4] == (4.5, False)


def test_ab_welch_hand_computed(spark, tmp_path):
    """Welch statistic on a hand-checkable corpus written as parquet so
    the query path (load_table) is exercised end to end."""
    import math
    from pyspark.sql import Row
    import datetime as dt
    from solar_logger_spark.queries.scale_ops import ab_welch_value_click_view

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    a_vals, b_vals = [1.0, 2.0, 3.0, 4.0], [10.0, 12.0, 14.0]
    for i, v in enumerate(a_vals):
        rows.append(Row(event_id=i, ts=t0, user_id=1,
                        event_type="click", value=v, props="{}"))
    for i, v in enumerate(b_vals):
        rows.append(Row(event_id=100 + i, ts=t0, user_id=1,
                        event_type="view", value=v, props="{}"))
    rows.append(Row(event_id=999, ts=t0, user_id=1,
                    event_type="purchase", value=99.0, props="{}"))
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    out = ab_welch_value_click_view(spark, str(tmp_path)).collect()[0]
    assert (out.n_a, out.n_b) == (4, 3)
    assert out.mean_a == 2.5 and out.mean_b == 12.0
    va = 5.0 / 3.0   # sample var of 1..4
    vb = 4.0         # sample var of 10,12,14
    assert abs(out.var_a - va) < 1e-12 and out.var_b == vb
    assert abs(out.t_stat - (2.5 - 12.0) / math.sqrt(va / 4 + vb / 3)) < 1e-12


def test_rolling_median_differential_vs_pandas(spark):
    """One Spark job over a seeded random series vs pandas
    rolling(center=True).median() — including both edges, ties, and
    repeated values."""
    import datetime as dt
    import numpy as np
    import pandas as pd
    from pyspark.sql import Row
    from solar_logger_spark.operators import timeseries as T

    rng = np.random.RandomState(11)
    vals = np.round(rng.lognormal(2.0, 1.0, 200), 2)
    vals[::17] = 5.0  # forced ties
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(event_id=i, ts=t0 + dt.timedelta(seconds=i),
                user_id=1, value=float(v))
            for i, v in enumerate(vals)
        ]
    )
    got = (
        T.rolling_median_despike(
            df, k=2, threshold=1.0, series=["user_id"],
            tiebreak=["event_id"],
        )
        .orderBy("event_id")
        .toPandas()
    )
    want = (
        pd.Series(vals)
        .rolling(5, center=True, min_periods=1)
        .median()
        .to_numpy()
    )
    assert np.array_equal(got["rolling_med"].to_numpy(), want)


def test_seasonal_decompose_components_sum(spark, tmp_path):
    """value == trend + seasonal + resid identically, and a pure
    hourly pattern is fully captured by the seasonal component."""
    import datetime as dt
    from pyspark.sql import Row
    from solar_logger_spark.queries.scale_ops import (
        ts_seasonal_decompose_events,
    )

    t0 = dt.datetime(2024, 1, 1)
    pattern = {0: 10.0, 1: 20.0, 2: 30.0}  # 3-hour cycle over hours 0-2
    rows = [
        Row(event_id=i, ts=t0 + dt.timedelta(hours=i % 3, days=i // 3),
            user_id=1, event_type="click",
            value=pattern[i % 3], props="{}")
        for i in range(90)
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "events.parquet"))
    out = ts_seasonal_decompose_events(spark, str(tmp_path)).collect()
    for r in out:
        assert abs(r.value - (r.trend + r.seasonal + r.resid)) < 1e-9
    # hourly means are exactly 10/20/30; grand mean 20 -> seasonal
    # -10/0/+10 per hour bucket
    by_hour = {}
    for r in out:
        by_hour.setdefault(r.value, r.seasonal)
    assert by_hour[10.0] == -10.0
    assert by_hour[20.0] == 0.0
    assert by_hour[30.0] == 10.0


def test_autocorrelation_matches_numpy(spark):
    """ACF == numpy Pearson of (x, x shifted by lag) on a seeded
    series, including the sinusoid's expected sign structure."""
    import math
    import numpy as np
    from pyspark.sql import Row
    from solar_logger_spark.operators import timeseries as T

    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    vals = [math.sin(i / 3.0) * 10 + (i % 7) * 0.25 for i in range(200)]
    df = spark.createDataFrame(
        [Row(event_type="a", event_id=i, ts=t0 + timedelta(minutes=i),
             value=round(v, 6)) for i, v in enumerate(vals)]
    )
    out = {r.lag: r for r in T.autocorrelation(df, lags=(1, 5, 9)).collect()}
    x = np.array([round(v, 6) for v in vals])
    for lag in (1, 5, 9):
        ref = np.corrcoef(x[:-lag], x[lag:])[0, 1]
        assert out[lag].n_pairs == 200 - lag
        assert abs(out[lag].acf - ref) < 1e-9, (lag, out[lag].acf, ref)
    # sin(i/3): strong positive at small lag, negative near half period
    assert out[1].acf > 0.9 and out[9].acf < 0
    import pytest
    with pytest.raises(ValueError, match="lags"):
        T.autocorrelation(df, lags=(0,))


def test_autocorrelation_zero_variance_and_dup_lags(spark):
    """Zero-variance series yield NULL acf (not NaN, and the oracle's
    sqrt must never see a negative radicand); duplicate lags are
    rejected up front."""
    import pytest
    from datetime import datetime, timedelta
    from pyspark.sql import Row
    from solar_logger_spark.operators import timeseries as T

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [Row(event_type="c", event_id=i, ts=t0 + timedelta(minutes=i),
             value=623347.347958) for i in range(50)]
    )
    out = T.autocorrelation(df, lags=(1, 2)).collect()
    assert len(out) == 2
    assert all(r.acf is None for r in out)
    with pytest.raises(ValueError, match="distinct"):
        T.autocorrelation(df, lags=(2, 2))


def test_trix_matches_hand_ema_tower(spark):
    """TRIX == 100·(e3 − lag e3)/lag e3 over the hand-rolled EMA
    tower (alpha = 2/(n+1), y0 = x0), bit-compared; series head is
    null."""
    from pyspark.sql import functions as F

    from solar_logger_spark.operators.timeseries import trix

    vals = [10.0, 12.0, 9.0, 15.0, 14.0, 11.0, 18.0]
    rows = [(i, "a", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        [(i, k, v, i) for i, k, v in rows],
        "ts long, event_type string, value double, event_id long",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    n = 3
    alpha = 2.0 / (n + 1)

    def ema(xs):
        out = []
        for x in xs:
            out.append(x if not out else alpha * x + (1 - alpha) * out[-1])
        return out

    e3 = ema(ema(ema(vals)))
    want = [None] + [
        None if e3[i - 1] == 0 else 100.0 * (e3[i] - e3[i - 1]) / e3[i - 1]
        for i in range(1, len(e3))
    ]
    got = [
        r.trix
        for r in trix(df, n=n, series=["event_type"], tiebreak=["event_id"])
        .orderBy("ts").collect()
    ]
    assert got[0] is None
    for g, w in zip(got[1:], want[1:]):
        assert g.hex() == w.hex()


def test_histogram_quantile_hand_computed(spark):
    """Interpolation, empty-bin skip, q=1 upper edge, and the
    all-empty-series drop, against hand-worked values."""
    from solar_logger_spark.operators.timeseries import histogram_quantile

    # series 'a': cumulative counts [2, 2, 8, 10] over bounds
    # [1, 2, 3, 4] — bin 2 is empty (2 -> 2); total 10
    # series 'z': all-empty histogram -> no output row
    rows = [
        ("a", 1.0, 2.0), ("a", 2.0, 2.0), ("a", 3.0, 8.0), ("a", 4.0, 10.0),
        ("z", 1.0, 0.0), ("z", 2.0, 0.0),
    ]
    df = spark.createDataFrame(rows, "k string, le double, value double")
    # q=0.5: pos=5 -> first bin with c>=5 and c>prev is le=3
    # (prev c=2 at le=2): est = 2 + (3-2)*((5-2)/(8-2)) = 2.5
    got = {
        r.k: r.q
        for r in histogram_quantile(
            df, q=0.5, series=["k"], count_col="value", alias="q"
        ).collect()
    }
    assert set(got) == {"a"}
    assert got["a"] == 2.5
    # q=1.0: pos=10 -> le=4 bin: est = 3 + (4-3)*((10-8)/(10-8)) = 4.0
    got1 = {
        r.k: r.q
        for r in histogram_quantile(
            df, q=1.0, series=["k"], count_col="value", alias="q"
        ).collect()
    }
    assert got1["a"] == 4.0
    # q=0.1: pos=1 -> first bin le=1 (prev 0, lower=min_value=0):
    # est = 0 + (1-0)*((1-0)/(2-0)) = 0.5
    got0 = {
        r.k: r.q
        for r in histogram_quantile(
            df, q=0.1, series=["k"], count_col="value", alias="q"
        ).collect()
    }
    assert got0["a"] == 0.5
    import pytest as _pytest

    with _pytest.raises(ValueError, match="quantile"):
        histogram_quantile(df, q=1.5, series=["k"])


def test_kaufmans_ama_matches_reference_loop(spark):
    """r12: kaufmans_ama vs a pure-Python KAMA fold (n=2): null
    warm-up, seed = the first full-window row's own value, flat
    windows use ER = 0, then the pinned affine form
    acc' = fl(fl((1−sc)·acc) + fl(sc·x)) per step — exact float
    equality (the fold IS the documented r12 scan semantics; short
    series stay within one chunk, where the scan equals this plain
    fold bit-for-bit)."""
    from datetime import datetime, timedelta

    from solar_logger_spark.operators.timeseries import kaufmans_ama

    base = datetime(2024, 1, 1)
    series = {
        "a": [1.0, 2.0, 4.0, 8.0, 6.0, 6.0, 6.0, 7.0],
        "b": [5.0, 5.0, 5.0, 9.0],  # flat full window at row 2
        "c": [3.0],                 # all warm-up
    }
    rows = [
        (s, base + timedelta(minutes=i), v, i)
        for s, vs in series.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "s string, ts timestamp, value double, event_id long"
    )
    got = {
        (r.s, r.event_id): r.kama
        for r in kaufmans_ama(df, 2, ["s"], tiebreak=["event_id"]).collect()
    }

    fast, slow = 2.0 / 3, 2.0 / 31
    c1 = fast - slow

    def ref(vs, n=2):
        out, acc = [], None
        for t in range(len(vs)):
            if t < n:
                out.append(None)
                continue
            deltas = [vs[i + 1] - vs[i] for i in range(t - n, t)]
            net, path = abs(sum(deltas)), sum(abs(d) for d in deltas)
            er = net / path if path > 0 else 0.0
            sc = (er * c1 + slow) ** 2
            acc = vs[t] if acc is None else (1.0 - sc) * acc + sc * vs[t]
            out.append(acc)
        return out

    for s, vs in series.items():
        for i, want in enumerate(ref(vs)):
            assert got[(s, i)] == want, (s, i, got[(s, i)], want)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n must be"):
        kaufmans_ama(df, 0, ["s"])


def test_series_selector_six_variants(spark):
    """r11: the Flux highest*/lowest* table-stream selectors — one
    record per series (extreme/average/current), then the global
    top/bottom n; deterministic ties (within series by ts+tiebreak,
    across series by the series key)."""
    from datetime import datetime, timedelta

    from solar_logger_spark.operators.timeseries import series_selector

    base = datetime(2024, 1, 1)
    data = {  # series -> values in time order
        "a": [1.0, 9.0, 3.0],
        "b": [8.0, 2.0, 8.0],   # tied max: earliest (ts) wins
        "c": [5.0, 5.0, 5.0],
        "d": [0.0, 7.0, 2.0],
    }
    rows = [
        (s, base + timedelta(minutes=i), v, i)
        for s, vs in data.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "s string, ts timestamp, value double, event_id long"
    )

    def run(stat, lowest, n=2):
        out = series_selector(
            df, n, stat, lowest, ["s"], tiebreak=["event_id"]
        ).collect()
        return [(r.s, r.value) for r in out]

    # highestMax: per-series maxes a=9 b=8 c=5 d=7 -> top2 [a, b];
    # b's tied 8s reduce to the earliest record (minute 0)
    assert run("extreme", False) == [("a", 9.0), ("b", 8.0)]
    hm = series_selector(df, 2, "extreme", False, ["s"],
                         tiebreak=["event_id"]).collect()
    assert hm[1].ts == base  # b's earliest tied record
    # lowestMin: mins a=1 b=2 c=5 d=0 -> bottom2 [d, a]
    assert run("extreme", True) == [("d", 0.0), ("a", 1.0)]
    # highestCurrent: last records a=3 b=8 c=5 d=2 -> top2 [b, c]
    assert run("current", False) == [("b", 8.0), ("c", 5.0)]
    # lowestCurrent -> bottom2 [d, a]
    assert run("current", True) == [("d", 2.0), ("a", 3.0)]
    # averages: a=13/3 b=6 c=5 d=3 -> highest2 [b, c], lowest2 [d, a]
    got = run("average", False)
    assert got[0] == ("b", 6.0) and got[1] == ("c", 5.0)
    low = run("average", True)
    assert low[0] == ("d", 3.0) and low[1][0] == "a"
    assert low[1][1] == 13.0 / 3.0
    # average drops the time column (no record carries the mean)
    cols = series_selector(df, 2, "average", False, ["s"]).columns
    assert cols == ["s", "value"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n must be"):
        series_selector(df, 0, "extreme", False, ["s"])
    with _pytest.raises(ValueError, match="unknown selector"):
        series_selector(df, 1, "sum", False, ["s"])


def test_time_weighted_avg_hand_computed(spark):
    """r11: timeWeightedAvg — trapezoid integral / span, hand-checked:
    (0,0s),(10,10s),(10,30s) -> (50 + 200)/30 = 25/3; zero-span and
    single-point series are null."""
    from datetime import datetime, timedelta

    from solar_logger_spark.operators.timeseries import time_weighted_avg

    base = datetime(2024, 1, 1)
    rows = [
        ("a", base, 0.0, 0),
        ("a", base + timedelta(seconds=10), 10.0, 1),
        ("a", base + timedelta(seconds=30), 10.0, 2),
        ("b", base, 5.0, 3),                      # single point
        ("c", base, 1.0, 4), ("c", base, 9.0, 5),  # zero span
    ]
    df = spark.createDataFrame(
        rows, "s string, ts timestamp, value double, event_id long"
    )
    got = {
        r.s: r.value
        for r in time_weighted_avg(df, ["s"], tiebreak=["event_id"]).collect()
    }
    assert got["a"] == 250.0 / 30.0
    assert got["b"] is None and got["c"] is None


def test_time_weighted_avg_large_values_long_gaps_no_overflow(spark):
    """r12 (ADVICE medium): the trapezoid term used to multiply two
    BIGINTs — with decimal(12,2)-scale values (xi up to ~1e12) a gap
    over ~4.6s wrapped int64 silently (ANSI off) while the DuckDB twin
    raised. The pair-sum is now cast to decimal before the multiply;
    pin exactness at the domain corner: max-magnitude values, hour
    gaps, against both the exact Python trapezoid and DuckDB."""
    from datetime import datetime, timedelta

    import duckdb

    from solar_logger_spark.operators.timeseries import time_weighted_avg

    big = 9999999999.99            # decimal(12,2) max magnitude
    base = datetime(2024, 1, 1)
    rows = [
        ("a", base, big, 0),
        ("a", base + timedelta(hours=1), big, 1),
        ("a", base + timedelta(hours=3), -big, 2),
    ]
    df = spark.createDataFrame(
        rows, "s string, ts timestamp, value double, event_id long"
    )
    got = {
        r.s: r.value
        for r in time_weighted_avg(df, ["s"], tiebreak=["event_id"]).collect()
    }
    # exact integer trapezoid (scaled by 100), one float division
    xi = round(big * 100)
    h = 3_600_000_000              # 1h in us
    s_exact = (xi + xi) * h + (xi + (-xi)) * 2 * h
    want = float(s_exact) / 200.0 / float(3 * h)
    assert got["a"] == want

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        "('a', TIMESTAMP '2024-01-01 00:00:00', 9999999999.99, 0), "
        "('a', TIMESTAMP '2024-01-01 01:00:00', 9999999999.99, 1), "
        "('a', TIMESTAMP '2024-01-01 03:00:00', -9999999999.99, 2)"
        ") v(s, ts, value, event_id)"
    )
    [(duck,)] = con.execute("""
        WITH x AS (
            SELECT s, ts, event_id,
                   CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS xi,
                   epoch_us(ts) AS eus
            FROM t
        ), seg AS (
            SELECT s, eus,
                   CAST(xi + lag(xi) OVER win AS HUGEINT)
                     * (eus - lag(eus) OVER win) AS t2
            FROM x
            WINDOW win AS (PARTITION BY s ORDER BY ts, xi, event_id)
        )
        SELECT CASE WHEN max(eus) - min(eus) > 0
                    THEN CAST(sum(t2) AS DOUBLE) / 200.0
                         / CAST(max(eus) - min(eus) AS DOUBLE)
               END AS value
        FROM seg GROUP BY s
    """).fetchall()
    assert duck == want


def test_state_changes_and_event_duration(spark):
    """r11: stateChanges keeps only predicate flips (first row of a
    series is not a transition) with the new state attached;
    events.duration is seconds-to-next-row, null on each series tail."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from solar_logger_spark.operators.timeseries import (
        event_duration, state_changes,
    )

    base = datetime(2024, 1, 1)
    vals = {"a": [1.0, 9.0, 9.0, 2.0, 8.0], "b": [9.0, 9.0]}
    rows = [
        (s, base + timedelta(seconds=10 * (i + 1) * (i + 1)), v, i)
        for s, vs in vals.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows, "s string, ts timestamp, value double, event_id long"
    )
    flips = state_changes(
        df, F.col("value") > 5.0, ["s"], tiebreak=["event_id"]
    ).collect()
    got = sorted((r.s, r.event_id, r.state) for r in flips)
    # a: off->on at i=1, on->off at i=3, off->on at i=4; b: no flips
    assert got == [("a", 1, True), ("a", 3, False), ("a", 4, True)]

    dur = {
        (r.s, r.event_id): r.duration
        for r in event_duration(df, ["s"], tiebreak=["event_id"]).collect()
    }
    # quadratic spacing: gaps 30, 50, 70, 90s for a; 30s for b
    assert dur[("a", 0)] == 30.0 and dur[("a", 3)] == 90.0
    assert dur[("b", 0)] == 30.0
    assert dur[("a", 4)] is None and dur[("b", 1)] is None
    # unit conversion: 1m -> minutes
    m = {
        (r.s, r.event_id): r.duration
        for r in event_duration(
            df, ["s"], tiebreak=["event_id"], unit_seconds=60.0
        ).collect()
    }
    assert m[("a", 0)] == 0.5

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unit must be"):
        event_duration(df, ["s"], unit_seconds=0.0)
