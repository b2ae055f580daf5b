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
