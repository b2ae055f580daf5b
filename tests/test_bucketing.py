"""Bucketed co-located joins: the plan property (no Exchange) and result
correctness vs the shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solar_logger_spark.io.bucketing import (
    assert_no_shuffle_join,
    co_located_join,
    physical_plan,
    write_bucketed,
)
from solar_logger_spark.io.tables import load_table


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    line = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_totalprice"
    )
    write_bucketed(
        line, "b_lineitem", ["l_orderkey"], n_buckets=4,
        path=str(tmp_path / "b_lineitem"), sort_cols=["l_orderkey"],
    )
    write_bucketed(
        orders, "b_orders", ["l_orderkey"], n_buckets=4,
        path=str(tmp_path / "b_orders"), sort_cols=["l_orderkey"],
    )
    yield line, orders
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, "b_lineitem", "b_orders", ["l_orderkey"])
        assert_no_shuffle_join(joined)  # both sides pre-partitioned
        assert "SortMergeJoin" in physical_plan(joined)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_matches_shuffled_join(spark, bucketed_pair):
    line, orders = bucketed_pair
    plain = line.join(orders, ["l_orderkey"]).count()
    bucketed = co_located_join(
        spark, "b_lineitem", "b_orders", ["l_orderkey"]
    ).count()
    assert bucketed == plain


def test_bucketed_agg_reuses_partitioning(spark, bucketed_pair):
    """Aggregating on the bucket key also needs no shuffle."""
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    assert "Exchange" not in physical_plan(agg)
