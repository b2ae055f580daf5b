"""Compaction: many small sink files → few target-sized files, data intact."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from solar_logger_spark.io.compaction import compact_partition


def test_compact_partition_merges_small_files(spark, tmp_path):
    store = str(tmp_path / "points")
    # simulate many micro-batch appends into one date partition
    for batch in range(6):
        (
            spark.range(batch * 100, (batch + 1) * 100)
            .select(
                F.lit("mx-1").alias("measurement"),
                F.col("id").alias("value"),
            )
            .coalesce(2)
            .write.mode("append")
            .parquet(store + "/date=2024-01-01")
        )
    before = glob.glob(store + "/date=2024-01-01/*.parquet")
    assert len(before) >= 6
    total_before = spark.read.parquet(store + "/date=2024-01-01").count()

    n_after = compact_partition(spark, store, "date=2024-01-01")
    after = glob.glob(store + "/date=2024-01-01/*.parquet")
    assert len(after) == n_after < len(before)
    assert spark.read.parquet(store + "/date=2024-01-01").count() == total_before
