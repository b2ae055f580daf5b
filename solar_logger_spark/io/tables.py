"""Parquet table loading — the engine's ``from(bucket)`` source.

The reference's source operator selects an InfluxDB bucket
(``src/classes/query_classes.py:86-93``); ours reads parquet directories
(one per table) with schema/pushdown handled by the vectorized parquet
reader. On a real deployment the point store is partitioned by
(measurement, date) so time-range + measurement predicates become
partition pruning; the flat test files still get row-group/page skipping
from parquet min/max stats.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ns_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark has no native
    nanosecond timestamp, so these are read as long and down-converted."""
    try:
        schema = pq.read_schema(path)
    except Exception:
        return []
    import pyarrow as pa

    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def _epoch_ns(dt) -> int:
    """Naive-UTC datetime → integer epoch nanoseconds (exact; float
    seconds would lose precision at the 1e18 scale)."""
    import calendar

    return calendar.timegm(dt.timetuple()) * 10**9 + dt.microsecond * 1000


_READER_MEMO: dict = {}


def _base_read(spark: SparkSession, path: str):
    """The (lazy DataFrame, ns-column list) for ``path``, memoized per
    (session, path, mtime).

    Caches PLAN METADATA only — a DataFrame is an unexecuted logical
    plan; every action on it still scans the parquet bytes. What the
    memo skips is the per-call schema/footer work (a pyarrow footer
    read plus the JVM-side schema inference + file listing,
    0.1-0.4 s per call) that a production deployment pays once at
    catalog registration, not per query. Keyed by applicationId (a
    restarted session rebuilds — no dead-JVM handles), absolute path,
    and the file/directory mtime (a rewritten fixture invalidates)."""
    sc = spark.sparkContext
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = None
    key = (sc.applicationId, os.path.abspath(path), mtime)
    hit = _READER_MEMO.get(key)
    if hit is None:
        if len(_READER_MEMO) > 64:  # stale sessions / rewritten dirs
            _READER_MEMO.clear()
        ns_cols = _ns_timestamp_cols(path)
        if ns_cols:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        hit = (spark.read.parquet(path), tuple(ns_cols))
        _READER_MEMO[key] = hit
    return hit


def read_parquet(spark: SparkSession, path: str, ns_range=None) -> DataFrame:
    """``spark.read.parquet`` that tolerates TIMESTAMP(NANOS) columns.

    Parquet written at nanosecond precision is unreadable by Spark
    without the legacy nanos-as-long conf, so we enable it and truncate
    ns → µs (matching DuckDB, whose timestamps are µs-native, for oracle
    parity).

    ``ns_range`` — ``{col: (t0, t1)}`` with datetime or None bounds —
    applies the equivalent raw-int64 predicate *before* the conversion.
    Filters on the converted column can't cross ``timestamp_micros(ts
    div 1000)`` into the scan, so without this a time-range query full-
    scans the point table; with it the range reaches PushedFilters and
    prunes row groups/pages (and, on a date-partitioned production
    layout, whole partitions). The caller's post-conversion filter still
    applies — this pushed predicate just has to be a superset.
    """
    df, ns_cols = _base_read(spark, path)
    if ns_range:
        for col, (t0, t1) in ns_range.items():
            if col in ns_cols:
                if t0 is not None:
                    df = df.filter(F.col(col) >= _epoch_ns(t0))
                if t1 is not None:
                    df = df.filter(F.col(col) < _epoch_ns(t1) + 1000)
    for col in ns_cols:
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, ns_range=None
) -> DataFrame:
    """Read one testdata table: ``{sf_dir}/{name}.parquet``."""
    return read_parquet(
        spark, os.path.join(sf_dir, f"{name}.parquet"), ns_range=ns_range
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = read_parquet(spark, path)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table as a temp view so the whole engine
    surface is reachable from plain ``spark.sql`` — the same catalog
    names the DuckDB oracle uses. Returns the registered names."""
    registered = []
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
        registered.append(name)
    return registered


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition a narrow input up to cluster parallelism before a
    fan-out or Python stage, IF the source collapsed to few partitions.
    On a multi-thousand-partition production table the guard makes this
    a no-op. Measured tradeoff: below ~10M rows the shuffle + per-task
    Arrow worker overhead exceeds the parallelism win (the engine's hot
    paths therefore do NOT call it by default); it pays off for
    CPU-heavy per-row work (real media codecs, heavyweight UDFs) on
    narrow single-file inputs.

    Caller contract: the width probe is ``df.inputFiles()``, so only
    FILE-BACKED frames are ever repartitioned — in-memory or
    post-shuffle frames (``createDataFrame``, anything downstream of an
    exchange) return unchanged even when narrow, and one huge splittable
    file (many scan partitions, one file) can still trigger a redundant
    repartition. Both are accepted: the probe stays free (no
    ``df.rdd.getNumPartitions()``, which would force an RDD conversion
    and disable AQE on the branch), and the cost of a wrong guess is one
    bounded extra shuffle, not a wrong result."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    # estimate input width WITHOUT df.rdd (which forces a full
    # DataFrame→RDD conversion and disables AQE on the branch):
    # file-backed frames expose their file list cheaply; anything else
    # (in-memory, post-shuffle) is assumed already spread
    files = df.inputFiles()
    if files and len(files) < max(target // 2, 1):
        return df.repartition(target)
    return df
