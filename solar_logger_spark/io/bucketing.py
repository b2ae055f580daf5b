"""Bucketed tables: co-located joins and aggregations without shuffle.

At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders,
points⋈points self-joins) is the shuffle. Writing both tables bucketed
by the join key with the same bucket count lets Spark's scan report the
hash-partitioning to the planner, so the sort-merge join runs with NO
Exchange on either side — the shuffle is paid once at write time and
amortized over every subsequent join/aggregation on that key.

``write_bucketed`` registers an external parquet table (explicit
``path``) so callers control layout; ``assert_no_shuffle_join`` is the
test hook that proves the plan property this module exists for.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    path: str | None = None,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    parquet table. Sorting by the join key additionally removes the
    per-task sort from later sort-merge joins."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner sees
    compatible output partitioning and elides both Exchanges."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the plan contains a shuffle (Exchange) — used by tests to
    pin the co-location property, and by operators that *require* it."""
    plan = physical_plan(df)
    if "Exchange" in plan:
        raise AssertionError(f"plan contains a shuffle:\n{plan}")
