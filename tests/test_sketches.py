"""Mergeable HLL sketches: error bounds vs exact, and the load-bearing
invariant — a union of per-partition sketches equals sketching the
whole input directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from solar_logger_spark.io.tables import load_table
from solar_logger_spark.operators import sketches


def test_estimate_within_hll_error(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    sk = sketches.distinct_sketches(events, ["event_type"], "user_id")
    got = {
        r.event_type: r.approx_distinct
        for r in sketches.union_estimate(sk, ["event_type"]).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(got[k] - n) / n < 0.05, (k, got[k], n)


def test_union_of_partial_sketches_equals_direct(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = sketches.distinct_sketches(events, ["event_type", "day"], "user_id")
    via_union = {
        r.event_type: r.approx_distinct
        for r in sketches.union_estimate(daily, ["event_type"]).collect()
    }
    direct_sk = sketches.distinct_sketches(events, ["event_type"], "user_id")
    direct = {
        r.event_type: r.approx_distinct
        for r in sketches.union_estimate(direct_sk, ["event_type"]).collect()
    }
    assert via_union == direct  # register merge is exact, not approximate


def test_approx_quantiles_bracket_exact_median(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    q = {
        r.event_type: r.quantiles
        for r in sketches.approx_quantiles(
            events, "value", ["event_type"], probabilities=(0.5,)
        ).collect()
    }
    exact = {
        r.event_type: r.m
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for k, m in exact.items():
        assert abs(q[k][0] - m) <= max(1.0, 0.05 * abs(m))
