"""Market-basket association rules: hand-computed support /
confidence / lift on a tiny basket set."""

import pytest

from solar_logger_spark.operators import basket


def test_frequent_pairs_hand_computed(spark):
    # 4 baskets; pair (1,2) appears in 3 of them, (1,3) in 1.
    rows = [
        (10, 1), (10, 2), (10, 3),
        (20, 1), (20, 2),
        (30, 1), (30, 2),
        (40, 3), (40, 4),
        # duplicate line item in the same basket: must count once
        (10, 2),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = basket.frequent_pairs(
        df, basket_col="basket", item_col="item", min_support=2
    )
    got = {(r.item_a, r.item_b): r for r in out.collect()}
    assert set(got) == {(1, 2)}  # (1,3),(2,3),(3,4) all have support 1
    r = got[(1, 2)]
    assert r.pair_count == 3
    assert r.a_count == 3 and r.b_count == 3 and r.n_baskets == 4
    assert r.confidence == pytest.approx(1.0)
    # lift = 3*4 / (3*3)
    assert r.lift == pytest.approx(12.0 / 9.0)


def test_frequent_pairs_support_one_keeps_all_pairs(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (1, "c")], ["b", "i"])
    out = basket.frequent_pairs(df, "b", "i", min_support=1)
    pairs = {(r.item_a, r.item_b) for r in out.collect()}
    assert pairs == {("a", "b"), ("a", "c"), ("b", "c")}


def test_frequent_pairs_rejects_bad_support(spark):
    df = spark.createDataFrame([(1, 1)], ["b", "i"])
    with pytest.raises(ValueError, match="min_support"):
        basket.frequent_pairs(df, "b", "i", min_support=0)


def test_single_item_baskets_yield_nothing(spark):
    df = spark.createDataFrame([(1, 1), (2, 2), (3, 1)], ["b", "i"])
    out = basket.frequent_pairs(df, "b", "i", min_support=1)
    assert out.count() == 0


def test_null_baskets_and_items_are_dropped(spark):
    # A NULL basket key must not count as a basket, and NULL items must
    # not count toward item/pair statistics — engines disagree on both
    # (DuckDB count(DISTINCT) drops NULL groups, Spark groupBy keeps
    # them; Spark collect_set drops NULL elements, SQL DISTINCT keeps
    # NULL rows), so the operator filters both axes up front.
    rows = [
        (10, 1), (10, 2),
        (20, 1), (20, 2),
        (None, 1), (None, 2),   # NULL basket: not a basket
        (30, None), (30, 1),    # NULL item: dropped, basket 30 remains
    ]
    df = spark.createDataFrame(rows, "basket int, item int")
    out = basket.frequent_pairs(df, "basket", "item", min_support=2)
    got = {(r.item_a, r.item_b): r for r in out.collect()}
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert r.pair_count == 2          # baskets 10, 20 only
    assert r.n_baskets == 3           # 10, 20, 30 — not the NULL group
    assert r.a_count == 3 and r.b_count == 2


def test_apriori_prefilter_is_output_invariant(spark):
    # min_item_support <= min_support must leave the output exactly
    # unchanged: an item in a pair with pair_count >= min_support is
    # itself in >= min_support baskets.
    import random

    rng = random.Random(7)
    rows = [
        (b, rng.randint(1, 30))
        for b in range(60)
        for _ in range(rng.randint(1, 8))
    ]
    df = spark.createDataFrame(rows, ["b", "i"])
    plain = basket.frequent_pairs(df, "b", "i", min_support=3)
    guarded = basket.frequent_pairs(
        df, "b", "i", min_support=3, min_item_support=3
    )
    key = lambda r: (r.item_a, r.item_b)
    assert sorted(map(tuple, plain.collect()), key=None) == sorted(
        map(tuple, guarded.collect()), key=None
    )
    with pytest.raises(ValueError, match="min_item_support"):
        basket.frequent_pairs(df, "b", "i", min_support=2, min_item_support=5)


def test_apriori_prefilter_cuts_heavy_basket_fanout(spark):
    # One pathological basket holding 200 singleton items plus 2
    # frequent ones: the prefilter must shrink its pair fan-out from
    # 202 choose 2 to 2 choose 2 while reporting the same rules.
    rows = [(1, i) for i in range(200)] + [
        (b, it) for b in (1, 2, 3) for it in (900, 901)
    ]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = basket.frequent_pairs(
        df, "b", "i", min_support=3, min_item_support=3
    )
    got = {(r.item_a, r.item_b): r.pair_count for r in out.collect()}
    assert got == {(900, 901): 3}
    # the guarded pair source really is pruned: replicate the
    # operator's semi-join shape and count the surviving fan-out
    from pyspark.sql import functions as F

    rows_df = df.filter(F.col("b").isNotNull() & F.col("i").isNotNull())
    baskets = rows_df.groupBy("b").agg(
        F.array_sort(F.collect_set("i")).alias("items")
    )
    frequent = (
        baskets.select(F.explode("items").alias("i"))
        .groupBy("i").count().filter(F.col("count") >= 3).select("i")
    )
    pruned_fanout = (
        rows_df.join(F.broadcast(frequent), "i", "left_semi")
        .groupBy("b").agg(F.size(F.collect_set("i")).alias("k"))
        .agg(F.sum(F.col("k") * (F.col("k") - 1) / 2))
        .collect()[0][0]
    )
    assert pruned_fanout == 3  # one pair per basket, not 202C2 + 2
