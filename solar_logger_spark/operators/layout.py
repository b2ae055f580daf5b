"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

Range-partitioning on ONE column gives perfect pruning on that column
and none on any other. Interleaving the bits of several bucketed
dimensions into a single Morton key, then range-partitioning on the
key, gives every interleaved dimension partial locality: a file (or
partition) covering a contiguous z-range covers a bounded rectangle in
(dim1, dim2, ...) space, so min/max column statistics prune scans on
ANY of the dimensions — the standard multi-dim layout trick behind
Delta/Iceberg OPTIMIZE ZORDER, built here from plain Spark expressions.

Everything is JVM bit arithmetic inside whole-stage codegen: no UDF, no
shuffle beyond the single range-exchange that the layout write needs
anyway. At 100 TB the write is one repartitionByRange(zval) before the
parquet sink; readers prune with ordinary min/max stats, nothing at
read time even knows z-ordering was used.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def morton_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each integer column into one
    long: bit i of column j lands at position i * len(cols) + j. With
    two 16-bit dims this is the classic 32-bit Morton code.

    Columns must already be non-negative bucket numbers (caller chooses
    the bucketing: modulo, fixed-width ranges, ...). len(cols) * bits
    must fit a long (<= 63).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    ndim = len(cols)
    if ndim * bits > 63:
        raise ValueError(f"{ndim} dims x {bits} bits exceeds a long")
    parts = []
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)),
                    i * ndim + j,
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts).alias("zval")


def zorder_repartition(
    df: DataFrame,
    cols: Sequence[Column | str],
    bits: int = 16,
    num_partitions: int | None = None,
    key_name: str = "zval",
) -> DataFrame:
    """Add the Morton key and range-partition on it — the write-side
    layout pass. Each output partition covers a contiguous z-range,
    i.e. a bounded rectangle in every interleaved dimension, which is
    what makes downstream min/max pruning work on all of them.

    Note ``repartitionByRange``'s boundary-sampling job executes the
    input plan once before the shuffle does — fine over a bare table
    scan (this function's use case), but persist first when the input
    is an expensive derived plan, or use ``clustered_write`` which
    does so by default."""
    keyed = df.withColumn(key_name, morton_key(cols, bits))
    if num_partitions is None:
        return keyed.repartitionByRange(key_name)
    return keyed.repartitionByRange(num_partitions, key_name)


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
    persist_input: bool = True,
) -> None:
    """Write parquet clustered on ``cluster_cols``: range-partition so
    each output file owns a disjoint key range, then sort inside each
    partition so every ROW GROUP's min/max stats are tight. Readers
    filtering on the cluster columns then skip whole files (driver-side
    listing + file stats) and whole row groups (parquet predicate
    pushdown) — the same bytes-not-read win as Z-ordering, for the
    single-dimension case where plain range clustering dominates. For
    multi-dimension pruning, compute ``morton_key`` first and cluster
    on it.

    ``repartitionByRange`` is NOT free on an unpersisted plan: it runs
    a range-boundary SAMPLING job that executes the entire upstream
    chain once before the real shuffle executes it again — doubling an
    expensive pipeline and double-firing any Observation metrics
    attached to it. ``persist_input=True`` (default) therefore spills
    the input to memory-and-disk first: the sampling job materializes
    the cache (metrics fire exactly once), the shuffle re-reads it, and
    the cache is dropped before returning. Disable only when the input
    is already materialized (a fresh table scan), where re-reading the
    source twice beats writing a cache copy.
    """
    cols = list(cluster_cols)
    src = df.persist() if persist_input else df
    try:
        parted = (
            src.repartitionByRange(num_files, *cols)
            if num_files is not None
            else src.repartitionByRange(*cols)
        )
        parted.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
    finally:
        if persist_input:
            src.unpersist()
