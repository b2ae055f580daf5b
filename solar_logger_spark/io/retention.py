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
    number of rollup rows written BY THIS RUN.

    Windows are START-labeled here (unlike the query path's Flux
    default of stop labels): a stop-labeled [23:00, 24:00) window
    would land on the NEXT day's midnight and therefore in a rollup
    partition outside ``dates`` — re-rolling that later date would
    then silently clobber the hour, and expiring raw day 1 would lose
    it. Start labels keep every rolled row inside its own date
    partition.

    Idempotency contract: re-running a date first removes exactly that
    rollup partition (``remove_rollup_dates`` — NOT
    ``expire_partitions``, which deletes the whole prefix of older
    dates) — append without dedup double-counts.
    """
    df = spark.read.parquet(src_path).filter(
        F.col("date").isin([str(d) for d in dates])
    )
    rolled = (
        aggregate_window(
            df, every=every, fn=fn, by=["measurement", "field"],
            label="start",
        )
        .withColumn("date", F.to_date("ts"))
        .select("measurement", "ts", "field", "value", "date")
    )
    # count THIS run's output (not a read-back of the appended store,
    # which would report pre-existing rows on a re-run); persist so the
    # aggregation runs once for count + write
    rolled.persist()
    try:
        n = rolled.count()
        rolled.write.mode("append").partitionBy(
            "measurement", "date"
        ).parquet(dst_path)
    finally:
        rolled.unpersist()
    return n


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


def remove_rollup_dates(table_path: str, dates: list[str]) -> list[str]:
    """Delete EXACTLY the named ``date=<d>`` rollup partitions (across
    all measurements) — the safe primitive for re-rolling a failed
    date. ``expire_partitions`` is the wrong tool for that: it deletes
    the whole prefix of OLDER dates, which for a rollup store is
    months of downsampled history whose raw source is already gone.
    """
    wanted = {str(d) for d in dates}
    removed = []
    if not os.path.isdir(table_path):
        return removed
    for meas in sorted(os.listdir(table_path)):
        mdir = os.path.join(table_path, meas)
        if not (os.path.isdir(mdir) and meas.startswith("measurement=")):
            continue
        for part in sorted(os.listdir(mdir)):
            if part.startswith("date=") and part.split("=", 1)[1] in wanted:
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


def _has_parquet(path: str) -> bool:
    for root, _, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def read_merged(
    spark: SparkSession, raw_path: str, rollup_path: str
) -> DataFrame:
    """Query view over the two-tier store: full-resolution points for
    every date still present in raw, rollup rows ONLY for dates raw no
    longer holds (anti-join on the partition date — overlap happens by
    design, since rolling precedes expiry and a crash between the two
    leaves both tiers holding a date; a plain union would double-count
    those). Degrades to raw-only before the first retention pass (no
    rollup files yet). Both tiers share the canonical point schema so
    downstream queries are unchanged."""
    raw = spark.read.parquet(raw_path)
    if not _has_parquet(rollup_path):
        return raw.select("measurement", "ts", "field", "value")
    rolled = spark.read.parquet(rollup_path)
    rolled_only = rolled.join(
        raw.select("date").distinct(), "date", "left_anti"
    )
    return raw.select("measurement", "ts", "field", "value").unionByName(
        rolled_only.select("measurement", "ts", "field", "value")
    )
