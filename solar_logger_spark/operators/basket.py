"""Market-basket association mining: pairwise co-occurrence with
support / confidence / lift (Agrawal & Srikant, VLDB'94 apriori
family), Spark-first.

Shape: one ``groupBy(basket)`` collects each basket's distinct items
into a sorted array (a single shuffle — no self-join of the item table
against itself), pair generation is a JVM higher-order ``transform`` /
``flatten`` over that array (fan-out bounded by basket size squared,
never by corpus size), and the support filter prunes before the
per-item count joins. Item counts are derived from the same arrays, so
the raw table is scanned once.

100 TB notes: the expensive object is the pair-count aggregate, whose
key space is bounded by sum(|basket| choose 2) — linear in data volume
for bounded baskets (retail orders, session item sets). For unbounded
baskets (a crawl session touching 1e5 items) prefilter items against a
broadcast frequent-item list first (classic apriori pruning) so the
quadratic term only sees frequent items; that prefilter composes as
``df.join(broadcast(frequent), item)`` before this operator. Item
counts are ``|items|``-bounded and broadcast into the final join; the
basket total is a 1-row broadcast.

Float discipline (see scale_ops oracle notes): ``confidence`` and
``lift`` are each a single IEEE division of exactly-representable
integer-valued doubles (counts and count products < 2^53), so both
engines produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _pair_rows(baskets: DataFrame, items_col: str = "items") -> DataFrame:
    """All ordered pairs (a < b) from each row's sorted distinct-item
    array, as exploded rows: posexplode the array, then explode the
    tail slice after each position. Two native Generate operators with
    the pairing itself in whole-stage codegen — the nested
    ``transform`` lambdas this replaces evaluated interpreted, outside
    codegen (~30% slower on the lineitem fan-out at sf0.1 for
    identical rows). ``slice`` is 1-indexed; ``posexplode`` is
    0-based."""
    return (
        baskets.select(
            items_col, F.posexplode(items_col).alias("_i", "item_a")
        )
        .select(
            "item_a",
            F.explode(
                F.slice(
                    F.col(items_col), F.col("_i") + 2, F.size(items_col)
                )
            ).alias("item_b"),
        )
    )


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
    min_item_support: int | None = None,
) -> DataFrame:
    """Pairwise association rules over baskets.

    Returns one row per unordered item pair with ``pair_count >=
    min_support``: ``(item_a, item_b, pair_count, a_count, b_count,
    n_baskets, confidence, lift)`` where ``confidence`` is directional
    a→b (``pair/a_count``) and ``lift = pair·n / (a_count·b_count)``.

    ``min_item_support`` enables the classic apriori item prefilter:
    items appearing in fewer baskets are dropped from the pair fan-out
    (an item in a frequent pair must itself be at least as frequent, so
    any ``min_item_support <= min_support`` leaves the output exactly
    unchanged while cutting the quadratic term on heavy baskets).
    ``a_count``/``b_count``/``n_baskets`` are computed from the
    unfiltered stream, so the reported statistics are unaffected.

    NULL basket keys and NULL items are dropped up front: SQL engines
    disagree on whether NULL groups count as baskets and whether
    DISTINCT keeps NULL items, so the operator's contract is
    NULL-free on both axes (engine-independent).
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if min_item_support is not None and min_item_support > min_support:
        raise ValueError(
            "min_item_support must be <= min_support to leave the "
            f"output unchanged, got {min_item_support} > {min_support}"
        )

    rows = df.filter(
        F.col(basket_col).isNotNull() & F.col(item_col).isNotNull()
    )
    baskets = rows.groupBy(F.col(basket_col).alias("basket")).agg(
        F.array_sort(F.collect_set(F.col(item_col))).alias("items")
    )
    # One cached logical subtree, three consumers (pairs, item counts,
    # basket total). Catalyst reuses the exchange under AQE; the agg
    # itself is recomputed per consumer, which is the cheap part.
    item_counts = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("item_count"))
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))

    pair_src = baskets
    if min_item_support is not None:
        # Apriori pruning: drop infrequent items BEFORE pair fan-out,
        # as a broadcast LEFT SEMI join on the exploded (basket, item)
        # rows — the hash table of frequent items is built once per
        # task and probed O(1) per row. (The tempting alternative, a
        # per-basket array_intersect against one broadcast frequent
        # array, rebuilds the intersection hash set PER ROW: measured
        # 23x slower on lineitem at sf0.1, where ~half the items are
        # frequent and the array is ~100k entries.) The re-collected
        # arrays stay sorted, preserving the pair generator's a < b
        # invariant; one extra groupBy shuffle over the pruned rows is
        # the price, linear and smaller than the input.
        frequent = item_counts.filter(
            F.col("item_count") >= min_item_support
        ).select("item")
        pair_src = (
            rows.select(
                F.col(basket_col).alias("basket"),
                F.col(item_col).alias("item"),
            )
            .join(F.broadcast(frequent), "item", "left_semi")
            .groupBy("basket")
            .agg(F.array_sort(F.collect_set("item")).alias("items"))
        )
    pairs = (
        _pair_rows(pair_src, "items")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_support)
    )

    a = item_counts.select(
        F.col("item").alias("item_a"), F.col("item_count").alias("a_count")
    )
    b = item_counts.select(
        F.col("item").alias("item_b"), F.col("item_count").alias("b_count")
    )
    out = (
        pairs.join(F.broadcast(a), "item_a")
        .join(F.broadcast(b), "item_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    return out.select(
        "item_a",
        "item_b",
        "pair_count",
        "a_count",
        "b_count",
        "n_baskets",
        (
            F.col("pair_count").cast("double")
            / F.col("a_count").cast("double")
        ).alias("confidence"),
        (
            (F.col("pair_count") * F.col("n_baskets")).cast("double")
            / (F.col("a_count") * F.col("b_count")).cast("double")
        ).alias("lift"),
    )
