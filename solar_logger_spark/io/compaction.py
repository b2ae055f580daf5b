"""Small-file compaction for streaming sink output.

Micro-batch appends produce one file per (batch × partition) — after a
day of 30-second triggers a partition holds thousands of small files and
every scan pays per-file open/footer costs. Compaction rewrites a
partition's files into ~target-sized ones; run it on closed partitions
(yesterday's dates) so it never races the live writer.

Crash safety (plain parquet has no commit log, so the swap is staged
through HIDDEN dirs Spark readers skip — path segments starting with
``.`` are filtered by the file index, so a concurrent or post-crash
table scan never sees half state):

1. compacted data is written to ``.compact-tmp-<leaf>``
2. the live partition dir is renamed to ``.compact-trash-<leaf>``
3. the tmp dir is renamed into place
4. the trash dir is deleted

Each step is a single POSIX rename/delete; a crash after any step
leaves either a stale hidden dir (harmless, cleaned on rerun) or the
partition parked in trash with the tmp fully written — states the
next :func:`compact_partition` call on that partition, or a
:func:`recover_table` sweep over the whole table, detects and
completes before doing anything else. Honest limits of a log-less
store: between steps 2 and 3 (two renames — microseconds, but real)
the partition is ABSENT from listings, so a reader racing that window
or scanning after a crash inside it sees the table without that
partition until recovery runs; data is never lost (it is parked in
trash), and a partition can never appear doubled. Run
``recover_table`` at maintenance-job startup so crash states heal
before the next reader, and schedule compaction on partitions no
reader scans (closed dates), as the module contract already says. A
transactional table format turns this into a real atomic commit.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _staging_paths(table_path: str, partition_subdir: str) -> tuple[str, str, str]:
    # normpath: a "" / trailing-slash subdir (compact a whole
    # unpartitioned table) must resolve to the table dir itself so the
    # staging dirs land BESIDE it — os.path.split of a trailing-slash
    # path yields an empty leaf and would nest them inside the dir
    # being renamed (EINVAL)
    part_dir = os.path.normpath(os.path.join(table_path, partition_subdir))
    parent, leaf = os.path.split(part_dir)
    # "." prefix: hidden from Spark/Hadoop file listings, so neither a
    # concurrent reader nor a post-crash scan treats staging dirs as a
    # partition (the old sibling-named tmp dir WAS visible as a bogus
    # partition value — silent wrong results during compaction)
    tmp = os.path.join(parent, f".compact-tmp-{leaf}")
    trash = os.path.join(parent, f".compact-trash-{leaf}")
    return part_dir, tmp, trash


def _recover(part_dir: str, tmp: str, trash: str) -> None:
    """Complete or roll back a previous crashed swap before touching
    anything: the invariant is that exactly one of (live, trash) holds
    the authoritative data at all times."""
    if not os.path.isdir(part_dir):
        if os.path.isdir(tmp):
            # crashed between steps 2 and 3: tmp is complete (it is
            # only ever renamed away AFTER the live dir moved to trash)
            os.rename(tmp, part_dir)
        elif os.path.isdir(trash):
            # crashed mid-write with the live dir already parked (not
            # reachable with the current step order, but restoring
            # trash is always safe)
            os.rename(trash, part_dir)
        else:
            raise FileNotFoundError(part_dir)
    for stale in (tmp, trash):
        if os.path.isdir(stale):
            shutil.rmtree(stale)


def recover_table(table_path: str) -> list[str]:
    """Heal every crashed compaction swap under ``table_path``: any
    ``.compact-trash-*`` / ``.compact-tmp-*`` staging dir is completed
    or rolled back via :func:`_recover`. Run at maintenance-job
    startup so a crash inside the two-rename window (partition parked
    in trash) is repaired before the next reader scans the table.
    Returns the partition leaves that needed recovery."""
    healed: list[str] = []
    for root, dirs, _files in os.walk(table_path):
        for d in list(dirs):
            for prefix in (".compact-trash-", ".compact-tmp-"):
                if d.startswith(prefix):
                    leaf = d[len(prefix):]
                    part_dir = os.path.join(root, leaf)
                    tmp = os.path.join(root, f".compact-tmp-{leaf}")
                    trash = os.path.join(root, f".compact-trash-{leaf}")
                    _recover(part_dir, tmp, trash)
                    healed.append(os.path.relpath(part_dir, table_path))
        # never descend into staging dirs (being renamed/deleted)
        dirs[:] = [d for d in dirs if not d.startswith(".compact-")]
    return sorted(set(healed))


def compact_partition(
    spark: SparkSession,
    table_path: str,
    partition_subdir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    verify_rows: bool = True,
) -> int:
    """Rewrite one partition directory's parquet files into
    ceil(bytes/target) files. Returns the resulting file count.

    ``verify_rows``: count the staged rewrite against the source
    before the swap and abort (leaving the live partition untouched)
    on mismatch — a maintenance op that can destroy data earns the
    extra partition scan.
    """
    part_dir, tmp, trash = _staging_paths(table_path, partition_subdir)
    _recover(part_dir, tmp, trash)
    size = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(part_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(part_dir)
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    if verify_rows:
        n_src = df.count()
        n_tmp = spark.read.parquet(tmp).count()
        if n_src != n_tmp:
            shutil.rmtree(tmp)
            raise RuntimeError(
                f"compaction rewrite of {part_dir} holds {n_tmp} rows, "
                f"source holds {n_src}; aborted before swap"
            )
    os.rename(part_dir, trash)
    os.rename(tmp, part_dir)
    shutil.rmtree(trash)
    return sum(
        1
        for root, _, files in os.walk(part_dir)
        for f in files
        if f.endswith(".parquet")
    )
