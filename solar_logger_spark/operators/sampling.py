"""Deterministic sampling — reproducible subsets for training-data
pipelines.

``df.sample()`` draws depend on partitioning and record order, so the
"same" sample differs across runs, cluster sizes, and engines — useless
for reproducible dataset curation. Everything here keys selection off a
content hash instead: the decision for a row is a pure function of its
key columns (+ seed), so any engine, any partitioning, any scale
produces the identical subset. The hash is an md5 prefix (shared
bit-for-bit by DuckDB for the oracle), uniform enough for rate control.

All three shapes are single-pass and shuffle-free except the
exact-per-stratum top-n (one shuffle on the stratum key — unavoidable,
the quota is per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BUCKETS = 1_000_000


def hash_bucket(cols: list[Column | str], seed: int = 0) -> Column:
    """Uniform bucket in [0, 1e6) from the md5 of the concatenated key
    columns and seed — the shared arithmetic both engines reproduce."""
    parts = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
             for c in cols]
    keyed = F.concat_ws("\x1f", *parts, F.lit(str(seed)))
    return (
        F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10)
        .cast("bigint") % _BUCKETS
    )


def sample_fraction(
    df: DataFrame,
    fraction: float,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash: deterministic,
    partition-independent, and stable under reruns and engine changes.
    Rows sharing the key columns are kept or dropped together (use the
    unique id for row-level sampling, a group id for leakage-free
    group-level sampling)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    # round, don't truncate: 0.00397 * 1e6 is 3969.9999... in binary
    # and int() would silently shift the cut by one bucket vs the round
    # constant a hand-written SQL oracle uses (ADVICE r5)
    cut = round(fraction * _BUCKETS)
    return df.filter(hash_bucket(list(key_cols), seed) < cut)


def split_assign(
    df: DataFrame,
    splits: dict[str, float],
    key_cols: list[str],
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (e.g. train/valid/test) by hash
    range; fractions must sum to 1. Same determinism contract as
    :func:`sample_fraction` — a key lands in the same split forever."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket(list(key_cols), seed)
    expr = None
    lo = 0
    for name, frac in splits.items():
        hi = lo + round(frac * _BUCKETS)
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    # rounding shortfall lands in the last split
    last = list(splits)[-1]
    return df.withColumn(split_col, expr.otherwise(last))


def stratified_sample_rates(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_cols: list[str],
    seed: int = 0,
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling at per-stratum RATES — the
    corpus-mixing primitive ("25% of crawl, all of wiki, none of
    spam-feed"): keep a row iff its key hash falls under its stratum's
    cut (``default`` for unlisted strata). The rates vector IS the
    data mixture.

    Complements :func:`stratified_topn` (hard per-stratum QUOTA, one
    shuffle): rate sampling is shuffle-free map-only — the shape that
    reweights 100 TB in a single codegen'd scan — and composes with
    the same determinism contract as :func:`sample_fraction` (a doc's
    fate never depends on partitioning or corpus growth)."""
    for s, frac in rates.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1]: {frac}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default rate must be in [0, 1]: {default}")
    # round() mirrors the literal bucket constants oracles use;
    # int() truncates rates not exactly representable in binary
    cut = F.lit(round(default * _BUCKETS))
    for s, frac in rates.items():
        cut = F.when(
            F.col(stratum_col) == s, F.lit(round(frac * _BUCKETS))
        ).otherwise(cut)
    return df.filter(hash_bucket(list(key_cols), seed) < cut)


def stratified_topn(
    df: DataFrame,
    stratum_cols: list[str],
    n: int,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, selected by smallest
    key hash — a deterministic stand-in for per-stratum random sampling
    with hard quotas. One shuffle on the stratum key."""
    from pyspark.sql import Window

    bucket = hash_bucket(list(key_cols), seed)
    w = Window.partitionBy(*stratum_cols).orderBy(
        bucket.asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
