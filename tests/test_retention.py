"""Downsample + retention lifecycle over the partitioned point store."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from solar_logger_spark.io import retention as R


@pytest.fixture()
def point_store(spark, tmp_path):
    rows = []
    for day, hour, minute, val in [
        (1, 0, 15, 10.0), (1, 0, 45, 20.0), (1, 1, 15, 30.0),
        (1, 23, 30, 70.0),   # last-hour point: must NOT leak to day 2
        (2, 5, 15, 40.0), (2, 5, 45, 60.0),
        (3, 9, 15, 5.0),
    ]:
        rows.append(
            ("dev1", datetime(2024, 1, day, hour, minute), "volts", val)
        )
    df = spark.createDataFrame(
        rows, "measurement string, ts timestamp, field string, value double"
    ).withColumn("date", F.to_date("ts"))
    raw = str(tmp_path / "raw")
    df.write.partitionBy("measurement", "date").parquet(raw)
    return raw


def test_downsample_rolls_up_hourly_means(spark, point_store, tmp_path):
    rollup = str(tmp_path / "rollup")
    n = R.downsample_partitions(
        spark, point_store, rollup, dates=["2024-01-01", "2024-01-02"],
        every="1h", fn="mean",
    )
    assert n == 4  # three hours on day 1 (incl. 23:00), one on day 2
    got = {
        (str(r.date), r.ts.hour): r.value
        for r in spark.read.parquet(rollup).collect()
    }
    # START-labeled windows: each hour's mean stays inside its own date
    assert got[("2024-01-01", 0)] == 15.0
    assert got[("2024-01-01", 1)] == 30.0
    assert got[("2024-01-01", 23)] == 70.0  # no leak into date=2024-01-02
    assert got[("2024-01-02", 5)] == 50.0
    assert not any(d == "2024-01-02" and h != 5 for d, h in got)
    # re-run idempotency: remove exactly the date, re-roll, same count
    removed = R.remove_rollup_dates(rollup, ["2024-01-02"])
    assert len(removed) == 1
    n2 = R.downsample_partitions(
        spark, point_store, rollup, dates=["2024-01-02"],
        every="1h", fn="mean",
    )
    assert n2 == 1  # reports THIS run's rows, not the whole store
    assert spark.read.parquet(rollup).count() == 4


def test_expire_removes_only_old_partitions(spark, point_store):
    removed = R.expire_partitions(point_store, before_date="2024-01-03")
    assert len(removed) == 2
    left = spark.read.parquet(point_store)
    assert left.count() == 1
    assert str(left.first().date) == "2024-01-03"


def test_merged_view_prefers_raw_and_handles_overlap(
    spark, point_store, tmp_path
):
    rollup = str(tmp_path / "rollup")
    # before the first retention pass: raw-only, no crash on missing dir
    assert R.read_merged(spark, point_store, rollup).count() == 7
    # roll day 1 WITHOUT expiring it: merged view must not double-count
    R.downsample_partitions(
        spark, point_store, rollup, dates=["2024-01-01"]
    )
    merged = R.read_merged(spark, point_store, rollup)
    assert merged.count() == 7  # raw wins for the overlapping date
    # now expire day 1 from raw: its rollup rows appear instead
    R.expire_partitions(point_store, before_date="2024-01-02")
    merged = R.read_merged(spark, point_store, rollup)
    # 3 remaining raw points (day2 x2 + day3) + 3 rollup rows for day 1
    assert merged.count() == 6


def test_apply_retention_roll_then_expire(spark, point_store, tmp_path):
    rollup = str(tmp_path / "rollup")
    res = R.apply_retention(
        spark, point_store, rollup,
        dates_to_roll=["2024-01-01", "2024-01-02"],
        expire_before="2024-01-03",
    )
    assert res["rollup_rows"] == 4 and len(res["expired_partitions"]) == 2
    merged = R.read_merged(spark, point_store, rollup)
    # 1 surviving raw point + 4 rollup rows, one shared schema
    assert merged.count() == 5
    assert set(merged.columns) == {"measurement", "ts", "field", "value"}
