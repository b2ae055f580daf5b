"""Incrementally maintained rollups == batch recompute, replay-exact.

The additive-merge sink (streaming/rollup_ingest.py): deliveries fold
mergeable partials into the snapshot store; the finalized view must
equal a plain groupBy over the full history, a replayed epoch must not
double-count (the sidecar rides the snapshot's atomic commit), and the
decimal sums make mean bitwise engine-reproducible.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row, functions as F

from solar_logger_spark.io import merge as M
from solar_logger_spark.streaming import rollup_ingest as R


def _points(n, start_hour=0, meas="dc-1"):
    t0 = datetime(2024, 1, 1, start_hour)
    return [
        Row(
            measurement=meas,
            field="bat_v" if i % 2 == 0 else "amps",
            ts=t0 + timedelta(minutes=7 * i),
            value=float(f"{(i * 13 % 97) / 7:.6f}"),
        )
        for i in range(n)
    ]


def _finalized(spark, d):
    return {
        (r.measurement, r.field, r.window_start): (
            r["count"], r["mean"], r["min"], r["max"]
        )
        for r in R.read_rollup(spark, d).collect()
    }


def _batch_expected(spark, rows):
    df = spark.createDataFrame(rows)
    agg = (
        df.groupBy(
            "measurement", "field",
            F.window("ts", "1 hour")["start"].alias("w"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("count"),
            (
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
    )
    return {
        (r.measurement, r.field, r.w): (
            r["count"], r["mean"], r["min"], r["max"]
        )
        for r in agg.collect()
    }


def test_incremental_rollup_equals_batch_recompute(spark, tmp_path):
    d = str(tmp_path / "rollup")
    sink = R.rollup_maintenance_sink(d, every="1 hour")
    deliveries = [_points(40, 0), _points(40, 1), _points(25, 1, "mx-1")]
    for i, rows in enumerate(deliveries):
        sink(spark.createDataFrame(rows), i)
    all_rows = [r for dl in deliveries for r in dl]
    exp = _batch_expected(spark, all_rows)
    got = _finalized(spark, d)
    assert got == exp  # exact equality incl. float means (decimal sums)


def test_replayed_epoch_does_not_double_count(spark, tmp_path):
    d = str(tmp_path / "rollup")
    sink = R.rollup_maintenance_sink(d)
    d1, d2 = _points(30, 0), _points(30, 1)
    sink(spark.createDataFrame(d1), 0)
    sink(spark.createDataFrame(d2), 1)
    once = _finalized(spark, d)
    sink(spark.createDataFrame(d2), 1)  # crash replay of epoch 1
    assert _finalized(spark, d) == once
    # the applied epoch rides the snapshot (atomic with the data)
    assert M.read_sidecar(d, R.EPOCH_SIDECAR) == "1"
    # and time travel shows the PREVIOUS snapshot carried epoch 0
    snaps = sorted(
        s for s in __import__("os").listdir(d) if s.startswith("snap-")
    )
    assert M.read_sidecar(d, R.EPOCH_SIDECAR, at=snaps[0]) == "0"


def test_rollup_sink_through_foreachbatch_stream(spark, tmp_path):
    import os

    d = str(tmp_path / "rollup")
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    deliveries = [_points(20, 0), _points(20, 2)]
    for i, rows in enumerate(deliveries):
        spark.createDataFrame(rows).coalesce(1).write.parquet(
            os.path.join(in_dir, f"f{i}")
        )
    stream = (
        spark.readStream.schema(
            "measurement string, field string, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(R.rollup_maintenance_sink(d))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    exp = _batch_expected(spark, [r for dl in deliveries for r in dl])
    assert _finalized(spark, d) == exp


def test_sidecar_requires_underscore_prefix(spark, tmp_path):
    df = spark.createDataFrame([Row(k=1)])
    with pytest.raises(ValueError, match="sidecar"):
        M.init_table(df, str(tmp_path / "t"), sidecar={"meta": "x"})


def test_null_ts_and_key_rows_are_dropped(spark, tmp_path):
    d = str(tmp_path / "rollup")
    sink = R.rollup_maintenance_sink(d)
    good = _points(10, 0)
    nulls = [
        Row(measurement="dc-1", field="bat_v", ts=None, value=1.0),
        Row(measurement=None, field="bat_v",
            ts=datetime(2024, 1, 1), value=2.0),
    ]
    schema = "measurement string, field string, ts timestamp, value double"
    sink(spark.createDataFrame(good + nulls, schema), 0)
    sink(spark.createDataFrame(nulls, schema), 1)  # all-null delivery
    got = _finalized(spark, d)
    assert got == _batch_expected(spark, good)
    assert all(w is not None for (_, _, w) in got)


def test_fresh_checkpoint_against_old_table_fails_loud(spark, tmp_path):
    d = str(tmp_path / "rollup")
    sink = R.rollup_maintenance_sink(d)
    sink(spark.createDataFrame(_points(10, 0)), 7)
    with pytest.raises(ValueError, match="fresh"):
        sink(spark.createDataFrame(_points(10, 1)), 0)


def test_rollup_with_hll_distinct_equals_batch(spark, tmp_path):
    """approx_distinct rides the same maintenance: HLL register-max
    merge is order-independent, so the streamed sketch equals a
    one-shot sketch over the union — same estimate, exactly."""
    d = str(tmp_path / "roll")
    rows = _points(40)
    # user column with within- and cross-window repeats
    rows = [
        Row(**{**r.asDict(), "user": f"u{i % 7}"})
        for i, r in enumerate(rows)
    ]
    sink = R.rollup_maintenance_sink(d, distinct_col="user")
    sink(spark.createDataFrame(rows[:15]), 0)
    sink(spark.createDataFrame(rows[15:]), 1)
    got = {
        (r.measurement, r.field, r.window_start): r["approx_distinct"]
        for r in R.read_rollup(spark, d).collect()
    }
    one_shot = R.partial_rollup(
        spark.createDataFrame(rows), distinct_col="user"
    )
    exp = {
        (r.measurement, r.field, r.window_start): r["approx_distinct"]
        for r in one_shot.select(
            "measurement", "field", "window_start",
            F.hll_sketch_estimate("hll").cast("long")
            .alias("approx_distinct"),
        ).collect()
    }
    assert got == exp
    # exact distincts are small here, so the estimate is exact too
    df = spark.createDataFrame(rows)
    truth = {
        (r.measurement, r.field, r.w): r["nd"]
        for r in df.groupBy(
            "measurement", "field",
            F.window("ts", "1 hour")["start"].alias("w"),
        ).agg(F.count_distinct("user").alias("nd")).collect()
    }
    assert got == truth
    # replaying the last epoch does not perturb the sketches
    sink(spark.createDataFrame(rows[15:]), 1)
    got2 = {
        (r.measurement, r.field, r.window_start): r["approx_distinct"]
        for r in R.read_rollup(spark, d).collect()
    }
    assert got2 == got
