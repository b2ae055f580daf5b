"""Salting correctness: salted plans must return exactly the unsalted
results (the whole point is changing the distribution, not the answer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solar_logger_spark.io.tables import load_table
from solar_logger_spark.operators.skew import salted_join, two_phase_agg
from solar_logger_spark.operators import skew


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_salted_join_matches_plain_join(spark, sf_dir):
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    dim = part.withColumnRenamed("p_partkey", "l_partkey")

    plain = line.join(dim, on=["l_partkey"], how="inner")
    salted = salted_join(
        line, dim, on=["l_partkey"], n_salt=8, salt_from=["l_orderkey"]
    )
    cols = ["l_partkey", "l_orderkey", "l_quantity", "p_brand"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_salted_join_random_salt_matches_too(spark, sf_dir):
    line = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    dim = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    )
    plain_count = line.join(dim, ["l_partkey"]).count()
    salted_count = salted_join(line, dim, ["l_partkey"], n_salt=4).count()
    assert salted_count == plain_count


def test_two_phase_agg_matches_direct(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    direct = (
        events.groupBy("event_type")
        .agg(F.sum("value").alias("sum_value"))
    )
    salted = two_phase_agg(
        events, ["event_type"], "value", fn="sum", n_salt=16,
        salt_from=["event_id"], alias="sum_value",
    )
    got = {r.event_type: r.sum_value for r in salted.collect()}
    want = {r.event_type: r.sum_value for r in direct.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_two_phase_count_combines_by_sum(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    direct = {
        r.event_type: r.c
        for r in events.groupBy("event_type").agg(F.count("value").alias("c")).collect()
    }
    salted = {
        r.event_type: r.c
        for r in two_phase_agg(
            events, ["event_type"], "value", fn="count", alias="c"
        ).collect()
    }
    assert salted == direct


def test_two_phase_rejects_non_decomposable():
    with pytest.raises(ValueError, match="two-phase"):
        two_phase_agg(None, ["k"], "v", fn="median")


def test_declared_salted_queries_match_plain_equivalents(spark, sf_dir):
    """The registry queries built on skew ops must equal their
    unsalted formulations row-for-row (salt invisible in the result)."""
    from solar_logger_spark.queries import scale_ops as sca

    got = sca.join_salted_brand_volume(spark, sf_dir)
    line = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    plain = (
        line.join(part, line.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double").alias("sum_price"),
        )
    )
    cols = ["p_brand", "n_items", "sum_qty", "sum_price"]
    assert _sorted_rows(got, cols) == _sorted_rows(plain, cols)

    got2 = sca.agg_two_phase_event_value(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    plain2 = ev.groupBy("event_type").agg(
        F.count("event_id").cast("long").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double").alias("sum_value"),
    )
    cols2 = ["event_type", "n_events", "sum_value"]
    assert _sorted_rows(got2, cols2) == _sorted_rows(plain2, cols2)
    # discrimination: multiple groups, non-degenerate values
    rows = _sorted_rows(got2, cols2)
    assert len(rows) >= 3 and len({r[2] for r in rows}) >= 3


def test_two_phase_agg_multi_one_pass_and_null_group(spark):
    """Multiple measures combine in ONE pass (one scan of the input in
    the optimized plan) and a NULL grouping key survives — the
    per-measure-join form silently dropped it (inner equi-join never
    matches NULL keys)."""
    rows = [("a", 1, 10.0), ("a", 2, 20.0), (None, 3, 5.0), ("b", 4, 1.0)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    got = skew.two_phase_agg_multi(
        df, ["k"], [("sum", "v", "s"), ("count", "id", "n")],
        n_salt=4, salt_from=["id"],
    )
    by_k = {r["k"]: (r["s"], r["n"]) for r in got.collect()}
    assert by_k == {"a": (30.0, 2), None: (5.0, 1), "b": (1.0, 1)}
    plan = got._jdf.queryExecution().optimizedPlan().toString().lower()
    assert plan.count("localtablescan") + plan.count("logicalrdd") == 1


def test_two_phase_agg_multi_validates(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    with pytest.raises(ValueError, match="at least one"):
        skew.two_phase_agg_multi(df, ["k"], [])
    with pytest.raises(ValueError, match="not defined"):
        skew.two_phase_agg_multi(df, ["k"], [("median", "v", "m")])


def test_salted_join_rejects_outer_joins(spark):
    """right/full would emit each unmatched dim row n_salt× — the
    operator must refuse rather than silently multiply rows."""
    f = spark.createDataFrame([("a", 1)], "k string, v long")
    d = spark.createDataFrame([("a", 9), ("zz", 7)], "k string, w long")
    for how in ("right", "full", "full_outer", "leftanti"):
        with pytest.raises(ValueError, match="unmatched"):
            salted_join(f, d, ["k"], n_salt=4, how=how)
    # the safe forms still work, including the left-outer aliases
    assert salted_join(f, d, ["k"], n_salt=4, how="left").count() == 1
    assert salted_join(f, d, ["k"], n_salt=4, how="leftouter").count() == 1


def test_two_phase_avg_matches_plain_avg(spark, sf_dir):
    """avg decomposes as (sum, count) partials + final divide; must
    equal F.avg exactly (same double division) incl. null handling."""
    events = load_table(spark, sf_dir, "events")
    direct = {
        r.event_type: r.a
        for r in events.groupBy("event_type")
        .agg(F.avg("value").alias("a"))
        .collect()
    }
    salted = {
        r.event_type: r.a
        for r in two_phase_agg(
            events, ["event_type"], "value", fn="avg",
            n_salt=16, salt_from=["event_id"], alias="a",
        ).collect()
    }
    assert set(salted) == set(direct)
    for k in direct:
        assert salted[k] == pytest.approx(direct[k], rel=1e-12)

    # null handling: count(col) skips nulls on both paths; all-null
    # group yields NULL (0/0 under non-ANSI divide → null sum / 0)
    rows = [("a", 1, 10.0), ("a", 2, None), ("n", 3, None)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    got = {
        r["k"]: r["a"]
        for r in two_phase_agg(
            df, ["k"], "v", fn="avg", n_salt=4, salt_from=["id"], alias="a"
        ).collect()
    }
    want = {
        r["k"]: r["a"]
        for r in df.groupBy("k").agg(F.avg("v").alias("a")).collect()
    }
    assert got == want


def test_two_phase_avg_refuses_decimal(spark):
    """DECIMAL avg has its own (p+4, s+4) result typing/rounding that
    sum/count division does not reproduce — refuse, don't near-miss."""
    df = spark.createDataFrame([("a", 1)], "k string, v long").select(
        "k", F.col("v").cast("decimal(18,6)").alias("v")
    )
    with pytest.raises(ValueError, match="DECIMAL"):
        two_phase_agg(df, ["k"], "v", fn="avg")


def test_two_phase_avg_large_longs_track_f_avg(spark):
    """F.avg over integral columns sums in DOUBLE; an exact long
    partial sum diverges past 2^53 (one ulp measured at [2^53, 1, 1]).
    The partials must cast first so both paths round identically."""
    big = 2 ** 53
    df = spark.createDataFrame(
        [("a", 1, big), ("a", 2, 1), ("a", 3, 1)], "k string, id long, v long"
    )
    want = df.groupBy("k").agg(F.avg("v").alias("a")).collect()[0]["a"]
    got = two_phase_agg(
        df, ["k"], "v", fn="avg", n_salt=1, salt_from=["id"], alias="a"
    ).collect()[0]["a"]
    assert got.hex() == want.hex()
