"""Interval (range) join: pair rows whose timestamps fall within a
bounded offset window, at shuffle-join cost.

Beyond-reference (SURVEY §2.3: the reference has no joins); the shape a
training-data pipeline needs constantly — "events of the same key
within [t+lower, t+upper)" — and the one Spark's planner handles worst
naively: a raw inequality condition plans as a sort-merge or nested-loop
range join whose per-key cost is quadratic in key frequency.

The scale trick is standard binning: both sides are bucketed by
``width = upper - lower`` so every qualifying right row lives in one of
at most two adjacent buckets of its left row. The left side explodes to
those 2-3 bucket keys, both sides equi-join on (keys…, bucket) — a plain
hash shuffle join, linear shuffle volume — and the exact interval
predicate filters the bucket-grain candidates. Cost: ≤3× left fan-out
instead of per-key cross products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from solar_logger_spark.durations import epoch_us, parse_duration


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    lower: str,
    upper: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows of the same ``keys`` whose
    ``right_ts`` lies in ``[left_ts + lower, left_ts + upper)``.

    ``lower``/``upper`` are Flux duration literals (e.g. ``"-10m"``,
    ``"0s"``), ``lower < upper``. Right columns that collide with left
    names get an ``r_`` prefix. ``how`` ∈ {"inner", "left_outer"} —
    left_outer keeps unmatched left rows with null right columns (the
    count-with-zero idiom).
    """
    lo = parse_duration(lower)
    hi = parse_duration(upper)
    if lo.months or hi.months:
        raise ValueError("interval_join bounds must be fixed durations")
    lo_us = int(lo.seconds * 1_000_000)
    hi_us = int(hi.seconds * 1_000_000)
    if hi_us <= lo_us:
        raise ValueError(f"need lower < upper, got [{lower}, {upper})")
    width = hi_us - lo_us

    lcols = set(left.columns)
    renamed = {
        c: (f"r_{c}" if c in lcols else c) for c in right.columns
    }
    r = right.select(
        *[F.col(c).alias(n) for c, n in renamed.items()]
    )
    r_ts = renamed[right_ts]
    r_keys = [renamed[k] for k in keys]

    lb = epoch_us(left_ts)
    rb = epoch_us(r_ts)
    lhs = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor((lb + F.lit(lo_us)) / width),
                F.floor((lb + F.lit(hi_us)) / width),
            )
        ),
    )
    rhs = r.withColumn("_bucket", F.floor(rb / width))

    cond = F.lit(True)
    for k, rk in zip(keys, r_keys):
        cond = cond & (F.col(k) == F.col(rk))
    cond = cond & (F.col("_bucket") == F.col("_rbucket"))
    rhs = rhs.withColumnRenamed("_bucket", "_rbucket")

    exact = (rb >= lb + F.lit(lo_us)) & (rb < lb + F.lit(hi_us))
    if how == "inner":
        out = lhs.join(rhs, cond & exact, "inner")
        return out.drop("_bucket", "_rbucket")
    if how == "left_outer":
        # dedupe the exploded left first: inner-match then re-attach
        matched = lhs.join(rhs, cond & exact, "inner").drop(
            "_bucket", "_rbucket"
        )
        return left.join(matched, left.columns, "left_outer")
    raise ValueError(f"how must be inner|left_outer, got {how!r}")
