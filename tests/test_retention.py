"""Downsample + retention lifecycle over the partitioned point store."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from solar_logger_spark.io import retention as R


@pytest.fixture()
def point_store(spark, tmp_path):
    rows = []
    for day, hour, val in [
        (1, 0, 10.0), (1, 0, 20.0), (1, 1, 30.0),
        (2, 5, 40.0), (2, 5, 60.0),
        (3, 9, 5.0),
    ]:
        rows.append(
            ("dev1", datetime(2024, 1, day, hour, 15), "volts", val)
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
    assert n == 3  # two hours on day 1, one on day 2
    got = {
        (str(r.date), r.ts.hour): r.value
        for r in spark.read.parquet(rollup).collect()
    }
    # stop-labeled windows: the 00:00-01:00 mean lands on the 01:00 label
    assert got[("2024-01-01", 1)] == 15.0
    assert got[("2024-01-01", 2)] == 30.0
    assert got[("2024-01-02", 6)] == 50.0


def test_expire_removes_only_old_partitions(spark, point_store):
    removed = R.expire_partitions(point_store, before_date="2024-01-03")
    assert len(removed) == 2
    left = spark.read.parquet(point_store)
    assert left.count() == 1
    assert str(left.first().date) == "2024-01-03"


def test_apply_retention_and_merged_view(spark, point_store, tmp_path):
    rollup = str(tmp_path / "rollup")
    res = R.apply_retention(
        spark, point_store, rollup,
        dates_to_roll=["2024-01-01", "2024-01-02"],
        expire_before="2024-01-03",
    )
    assert res["rollup_rows"] == 3 and len(res["expired_partitions"]) == 2
    merged = R.read_merged(spark, point_store, rollup)
    # 1 surviving raw point + 3 rollup rows, one shared schema
    assert merged.count() == 4
    assert set(merged.columns) == {"measurement", "ts", "field", "value"}
