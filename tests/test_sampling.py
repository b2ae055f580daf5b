"""Deterministic sampling: stability across partitionings/reruns,
rate accuracy, leakage-free splits, exact stratified quotas."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from solar_logger_spark.operators import sampling


def test_sample_is_partition_independent(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = sampling.sample_fraction(df.repartition(1), 0.2, ["k"], seed=3)
    b = sampling.sample_fraction(df.repartition(17), 0.2, ["k"], seed=3)
    sa = {r.k for r in a.collect()}
    sb = {r.k for r in b.collect()}
    assert sa == sb
    # rate within a few percent of target
    assert abs(len(sa) / 5000 - 0.2) < 0.03


def test_sample_seed_changes_membership(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k for r in sampling.sample_fraction(df, 0.5, ["k"], 1).collect()}
    b = {r.k for r in sampling.sample_fraction(df, 0.5, ["k"], 2).collect()}
    assert a != b
    assert 0 < len(a & b) < min(len(a), len(b))  # overlapping but distinct


def test_split_assign_partitions_completely(spark):
    df = spark.range(0, 3000).withColumnRenamed("id", "k")
    out = sampling.split_assign(
        df, {"train": 0.8, "valid": 0.1, "test": 0.1}, ["k"], seed=5
    )
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 3000
    assert abs(counts["train"] / 3000 - 0.8) < 0.03
    # same key → same split on rerun
    again = sampling.split_assign(
        df, {"train": 0.8, "valid": 0.1, "test": 0.1}, ["k"], seed=5
    )
    assert out.exceptAll(again).isEmpty()


def test_group_level_sampling_keeps_groups_whole(spark):
    rows = [Row(user=u, item=i) for u in range(50) for i in range(4)]
    df = spark.createDataFrame(rows)
    out = sampling.sample_fraction(df, 0.5, key_cols=["user"], seed=9)
    per_user = {
        r.user: r.n
        for r in out.groupBy("user").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 4 for n in per_user.values())  # all-or-nothing per user


def test_stratified_topn_exact_quota(spark):
    rows = [Row(lang=l, doc_id=l * 1000 + i)
            for l in range(3) for i in range(20)] + [Row(lang=9, doc_id=9000)]
    df = spark.createDataFrame(rows)
    out = sampling.stratified_topn(df, ["lang"], n=5, key_cols=["doc_id"])
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 5, 1: 5, 2: 5, 9: 1}  # quota, short stratum kept whole
    # deterministic on rerun
    again = sampling.stratified_topn(df, ["lang"], n=5, key_cols=["doc_id"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_invalid_args(spark):
    import pytest

    df = spark.range(1)
    with pytest.raises(ValueError, match="fraction"):
        sampling.sample_fraction(df, 1.5, ["id"])
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.split_assign(df, {"a": 0.5, "b": 0.1}, ["id"])


def test_stratified_rate_sample(spark):
    import pytest

    rows = [Row(doc_id=i, source=f"s{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows)
    out = sampling.stratified_sample_rates(
        df, {"s0": 0.25, "s1": 1.0}, stratum_col="source",
        key_cols=["doc_id"], seed=4, default=0.0,
    )
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts.get("s1") == 1000            # rate 1.0 keeps everything
    assert "s2" not in counts                  # default 0.0 drops unlisted
    assert abs(counts["s0"] / 1000 - 0.25) < 0.05
    # deterministic rerun; different seed re-deals
    a = {r.doc_id for r in out.collect()}
    b = {r.doc_id for r in sampling.stratified_sample_rates(
        df, {"s0": 0.25, "s1": 1.0}, "source", ["doc_id"], 4, 0.0).collect()}
    c = {r.doc_id for r in sampling.stratified_sample_rates(
        df, {"s0": 0.25, "s1": 1.0}, "source", ["doc_id"], 5, 0.0).collect()}
    assert a == b and a != c
    with pytest.raises(ValueError, match="rate"):
        sampling.stratified_sample_rates(df, {"s0": 1.5}, "source", ["doc_id"])


def test_rate_cut_rounds_not_truncates():
    """0.00397 * 1e6 is 3969.9999999999995 in binary; the cut must
    round to 3970 so hand-written SQL oracles using the round constant
    agree (ADVICE r5)."""
    assert round(0.00397 * sampling._BUCKETS) == 3970
    assert int(0.00397 * sampling._BUCKETS) == 3969  # the trap round() avoids
