"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in `session.py`) handles most hot-key
cases at runtime; these operators are the explicit form for when the
skew is known and extreme — a handful of keys holding a double-digit
percentage of a 100 TB fact table:

* ``salted_join`` — the fact side gets a salt in [0, n); the (small)
  dimension side is exploded n× so every (key, salt) bucket finds its
  match. The hot key's rows now spread across n tasks instead of one.
  Results are identical to the unsalted join (verified in tests).
* ``two_phase_agg`` — groupBy(keys+salt) partial → groupBy(keys) final.
  Spark's hash aggregate already does map-side partial combine; the
  explicit salted phase additionally splits a hot *reduce* key across
  tasks (partial combine can't help when one grouping key dominates a
  single reducer).

Salts are deterministic when ``salt_from`` columns are given (hash of a
high-cardinality column, e.g. the fact's primary key); otherwise a
seeded ``rand`` — fine for resilience because both phases tolerate any
salt assignment.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# (partial_fn, final_fn) per supported aggregate — the final must
# combine partials correctly (count combines by summing). ``avg`` is
# handled separately: it is not self-combinable (a mean of partial
# means is wrong under uneven salt buckets) and decomposes as
# (sum, count) partials with a final sum/sum divide.
_TWO_PHASE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}

# Join types under which replicating the dimension side n_salt× is
# result-invariant: every dim row either matches (then exactly one salt
# bucket carries each fact row) or is dropped. right/full would emit
# each UNMATCHED dim row once per salt replica — silently wrong.
_SALT_SAFE_JOINS = {"inner", "left", "leftouter", "left_outer"}


def salt_col(n_salt: int, salt_from: Sequence[str] | None = None) -> Column:
    """A salt in [0, n_salt): hash-derived (deterministic) when
    ``salt_from`` names columns, else seeded-random."""
    if salt_from:
        return F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(n_salt)).cast(
            "int"
        )
    return F.floor(F.rand(seed=42) * n_salt).cast("int")


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Join a skew-keyed fact table to a small dimension, spreading each
    hot key over ``n_salt`` tasks. The dimension replicates n_salt× (it
    must be small — that's also what makes it broadcastable; salting is
    for when the join must shuffle anyway, e.g. the dim exceeds the
    broadcast threshold but the fact's keys are skewed)."""
    if how not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join(how={how!r}) would replicate every unmatched "
            f"dimension row {n_salt}× (the dim side is exploded per "
            f"salt); only {sorted(_SALT_SAFE_JOINS)} are result-"
            "invariant under salting"
        )
    f = facts.withColumn("_salt", salt_col(n_salt, salt_from))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return f.join(d, on=[*on, "_salt"], how=how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    fn: str = "sum",
    n_salt: int = 32,
    alias: str | None = None,
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Aggregate with an intermediate salted phase so one dominant key
    doesn't serialize on a single reducer."""
    alias = alias or f"{fn}_{value_col}"
    return two_phase_agg_multi(
        df, keys, [(fn, value_col, alias)], n_salt=n_salt,
        salt_from=salt_from,
    )


def two_phase_agg_multi(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    n_salt: int = 32,
    salt_from: Sequence[str] | None = None,
) -> DataFrame:
    """Salted two-phase aggregation of SEVERAL ``(fn, value_col,
    alias)`` measures in one pass: one scan of the fact table, one
    salted partial shuffle, one final combine — never one whole-table
    pass per measure, and no per-measure result join (an inner join on
    the group keys would also silently drop a NULL group, which the
    single groupBy keeps)."""
    if not aggs:
        raise ValueError("two_phase_agg_multi needs at least one aggregate")
    partial_cols, final_cols = [], []
    for i, (fn, value_col, alias) in enumerate(aggs):
        if fn == "avg":
            # Not self-combinable: (sum, count) partials, final divide.
            # sum(x)/count(x) matches F.avg's null handling (count(col)
            # skips nulls) and its double division exactly — for
            # numeric NON-decimal columns. DecimalType avg has its own
            # result type ((p+4, s+4)) and rounding that sum/count
            # division does not reproduce: refuse rather than return a
            # near-miss.
            from pyspark.sql.types import DecimalType

            if isinstance(df.schema[value_col].dataType, DecimalType):
                raise ValueError(
                    f"two-phase avg over DECIMAL column {value_col!r} "
                    "would not match F.avg's (p+4, s+4) result type/"
                    "rounding; cast to double first or aggregate "
                    "(sum, count) and divide with your own typing"
                )
            # partial sums track F.avg's own summation TYPE: Average
            # over integral columns sums in DOUBLE, so an exact long
            # sum here would diverge past 2^53 (measured: one ulp at
            # [2^53, 1, 1]) — cast first, divide the same way
            partial_cols.append(
                F.sum(F.col(value_col).cast("double")).alias(f"_p{i}s")
            )
            partial_cols.append(F.count(F.col(value_col)).alias(f"_p{i}c"))
            final_cols.append(
                (F.sum(F.col(f"_p{i}s")) / F.sum(F.col(f"_p{i}c"))).alias(alias)
            )
            continue
        try:
            partial_fn, final_fn = _TWO_PHASE[fn]
        except KeyError:
            raise ValueError(
                f"two-phase decomposition not defined for {fn!r}; "
                f"supported: {sorted(_TWO_PHASE) + ['avg']}"
            ) from None
        partial_cols.append(partial_fn(F.col(value_col)).alias(f"_p{i}"))
        final_cols.append(final_fn(F.col(f"_p{i}")).alias(alias))
    partial = (
        df.withColumn("_salt", salt_col(n_salt, salt_from))
        .groupBy(*keys, "_salt")
        .agg(*partial_cols)
    )
    return partial.groupBy(*keys).agg(*final_cols)
