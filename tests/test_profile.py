"""Single-pass column profiling semantics."""

from pyspark.sql import Row

from solar_logger_spark.operators.profile import profile_columns


def _rows(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_profile_counts_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x", c=1.5),
            Row(a=1, b=None, c=2.5),
            Row(a=2, b="y", c=None),
            Row(a=None, b="y", c=-1.0),
        ]
    )
    out = _rows(profile_columns(df, exact_distinct=True))
    assert out["a"] == {
        "column": "a", "n_nonnull": 3, "n_null": 1, "n_distinct": 2,
        "min_value": 1.0, "max_value": 2.0,
    }
    assert out["b"]["n_null"] == 1 and out["b"]["n_distinct"] == 2
    # non-numeric columns report null extremes (type-stable profile)
    assert out["b"]["min_value"] is None and out["b"]["max_value"] is None
    assert out["c"]["min_value"] == -1.0 and out["c"]["max_value"] == 2.5


def test_profile_approx_mode_same_schema(spark):
    df = spark.createDataFrame([Row(a=i % 7, b=str(i % 3)) for i in range(100)])
    exact = profile_columns(df, exact_distinct=True)
    approx = profile_columns(df)  # approx is the (scale-safe) default
    assert exact.schema == approx.schema
    ex, ap = _rows(exact), _rows(approx)
    # HLL++ at default rsd is exact for tiny cardinalities
    assert ap["a"]["n_distinct"] == ex["a"]["n_distinct"] == 7
    assert ap["b"]["n_distinct"] == 3


def test_profile_column_subset_and_single_scan(spark):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    out = profile_columns(df, cols=["b"])
    rows = out.collect()
    assert [r["column"] for r in rows] == ["b"]
    # approx mode must not add an Expand to the plan (the exact
    # multi-distinct rewrite does, by design)
    plan = profile_columns(df, exact_distinct=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_quality_counters_ride_the_action(spark, tmp_path):
    from pyspark.sql import Row, functions as F
    from solar_logger_spark.operators.profile import (
        QualityGateViolation,
        attach_quality_counters,
        raise_on_violations,
    )

    df = spark.createDataFrame(
        [Row(k=1, v=10.0), Row(k=2, v=-3.0), Row(k=None, v=5.0)]
    )
    observed, obs = attach_quality_counters(
        df,
        {
            "null_key": F.col("k").isNull(),
            "negative_value": F.col("v") < 0,
            "huge_value": F.col("v") > 1e6,
        },
    )
    # counters ride the write action itself — no second scan
    observed.write.parquet(str(tmp_path / "out"))
    try:
        raise_on_violations(obs)
        assert False, "expected QualityGateViolation"
    except QualityGateViolation as e:
        assert e.violations == {"null_key": 1, "negative_value": 1}

    clean = df.filter(F.col("k").isNotNull() & (F.col("v") >= 0))
    observed2, obs2 = attach_quality_counters(
        clean, {"null_key": F.col("k").isNull()}
    )
    assert observed2.count() == 1
    assert raise_on_violations(obs2) == {"null_key": 0}


def test_quality_counters_exact_through_clustered_write(spark, tmp_path):
    """repartitionByRange's sampling job re-executes the plan; the
    persisted clustered_write keeps observe counters exact (the naive
    composition double-fires them)."""
    import pytest
    from pyspark.sql import Row, functions as F
    from solar_logger_spark.operators.layout import clustered_write
    from solar_logger_spark.operators.profile import attach_quality_counters

    df = spark.createDataFrame(
        [Row(k=i, v=float(-1 if i < 50 else 1)) for i in range(500)]
    )
    gated, obs = attach_quality_counters(df, {"neg": F.col("v") < 0})
    clustered_write(gated, str(tmp_path / "a"), ["k"], num_files=4)
    assert dict(obs.get) == {"neg": 50}

    with pytest.raises(ValueError, match="checks must not be empty"):
        attach_quality_counters(df, {})
