"""Small-file compaction for streaming sink output.

Micro-batch appends produce one file per (batch × partition) — after a
day of 30-second triggers a partition holds thousands of small files and
every scan pays per-file open/footer costs. Compaction rewrites a
partition's files into ~target-sized ones; run it on closed partitions
(yesterday's dates) so it never races the live writer.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def compact_partition(
    spark: SparkSession,
    table_path: str,
    partition_subdir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite one partition directory's parquet files into
    ceil(bytes/target) files. Returns the resulting file count.

    Write-then-swap: the compacted data lands in a sibling temp dir and
    replaces the partition atomically-enough for a read-mostly store
    (a transactional table format makes this a real atomic commit; with
    plain parquet, schedule on partitions no reader is scanning).
    """
    part_dir = os.path.join(table_path, partition_subdir)
    size = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(part_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(part_dir)
    tmp_dir = part_dir.rstrip("/") + "._compact_tmp"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp_dir)

    import shutil

    shutil.rmtree(part_dir)
    os.rename(tmp_dir, part_dir)
    return sum(
        1
        for root, _, files in os.walk(part_dir)
        for f in files
        if f.endswith(".parquet")
    )
