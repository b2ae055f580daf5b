"""Downsampling + retention for the (measurement, date)-partitioned
point store — the InfluxDB continuous-query / retention-policy pair
(the reference's deployment relies on InfluxDB doing this server-side;
here it is an explicit batch job over the same store the streaming
sink writes).

The lifecycle: raw points land at full resolution; closed date
partitions are periodically DOWNSAMPLED into a rollup table at a
coarser ``every`` resolution (same layout, so every query that reads
the raw store reads the rollup unchanged), and raw partitions older
than the retention horizon are EXPIRED (directory delete —
partition-pruned, no data scan).

Scale shape: downsampling reads only the named date partitions
(partition pruning), aggregates with the same one-hash-agg
``aggregate_window`` plan as the query path, and appends
date-partitioned output; expiry is pure filesystem metadata. Both run
on closed partitions so they never race the live writer (same contract
as ``io.compaction``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from solar_logger_spark.operators.window_agg import aggregate_window


def downsample_partitions(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    dates: list[str],
    every: str = "1h",
    fn: str = "mean",
) -> int:
    """Roll the named ``date=`` partitions of the raw point store up to
    ``every`` resolution per (measurement, field) and append them to
    ``dst_path`` with the same (measurement, date) layout. Returns the
    number of rollup rows written.

    Idempotency contract: run per closed date with a fresh dst
    partition (re-running a date first ``expire_partitions`` it from
    the rollup) — append without dedup double-counts.
    """
    df = spark.read.parquet(src_path).filter(
        F.col("date").isin([str(d) for d in dates])
    )
    rolled = aggregate_window(
        df, every=every, fn=fn, by=["measurement", "field"]
    ).withColumn("date", F.to_date("ts"))
    rolled = rolled.select("measurement", "ts", "field", "value", "date")
    rolled.write.mode("append").partitionBy("measurement", "date").parquet(
        dst_path
    )
    out = spark.read.parquet(dst_path).filter(
        F.col("date").isin([str(d) for d in dates])
    )
    return out.count()


def expire_partitions(table_path: str, before_date: str) -> list[str]:
    """Delete every ``date=<d>`` partition directory with d strictly
    before ``before_date`` (ISO yyyy-mm-dd — lexicographic compare IS
    chronological for this layout). Pure directory metadata: no scan,
    no Spark job. Returns the removed partition paths.
    """
    removed = []
    if not os.path.isdir(table_path):
        return removed
    for meas in sorted(os.listdir(table_path)):
        mdir = os.path.join(table_path, meas)
        if not (os.path.isdir(mdir) and meas.startswith("measurement=")):
            continue
        for part in sorted(os.listdir(mdir)):
            if not part.startswith("date="):
                continue
            if part.split("=", 1)[1] < before_date:
                pdir = os.path.join(mdir, part)
                shutil.rmtree(pdir)
                removed.append(pdir)
    return removed


def apply_retention(
    spark: SparkSession,
    raw_path: str,
    rollup_path: str,
    dates_to_roll: list[str],
    expire_before: str,
    every: str = "1h",
    fn: str = "mean",
) -> dict:
    """The continuous-query + retention-policy pair in one pass: roll
    the given closed dates into the rollup store, then expire raw
    partitions older than the horizon. Roll FIRST, expire SECOND — a
    crash between the two leaves extra raw data (safe), never a gap.
    """
    n_rows = downsample_partitions(
        spark, raw_path, rollup_path, dates_to_roll, every=every, fn=fn
    )
    removed = expire_partitions(raw_path, expire_before)
    return {"rollup_rows": n_rows, "expired_partitions": removed}


def read_merged(
    spark: SparkSession, raw_path: str, rollup_path: str
) -> DataFrame:
    """Query view over the two-tier store: full-resolution points where
    raw still exists, rollup elsewhere (union by name; both tiers share
    the canonical point schema so downstream queries are unchanged)."""
    raw = spark.read.parquet(raw_path).select(
        "measurement", "ts", "field", "value"
    )
    rolled = spark.read.parquet(rollup_path).select(
        "measurement", "ts", "field", "value"
    )
    return raw.unionByName(rolled)
