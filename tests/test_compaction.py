"""Compaction: many small sink files → few target-sized files, data intact."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from solar_logger_spark.io.compaction import compact_partition


def test_compact_partition_merges_small_files(spark, tmp_path):
    store = str(tmp_path / "points")
    # simulate many micro-batch appends into one date partition
    for batch in range(6):
        (
            spark.range(batch * 100, (batch + 1) * 100)
            .select(
                F.lit("mx-1").alias("measurement"),
                F.col("id").alias("value"),
            )
            .coalesce(2)
            .write.mode("append")
            .parquet(store + "/date=2024-01-01")
        )
    before = glob.glob(store + "/date=2024-01-01/*.parquet")
    assert len(before) >= 6
    total_before = spark.read.parquet(store + "/date=2024-01-01").count()

    n_after = compact_partition(spark, store, "date=2024-01-01")
    after = glob.glob(store + "/date=2024-01-01/*.parquet")
    assert len(after) == n_after < len(before)
    assert spark.read.parquet(store + "/date=2024-01-01").count() == total_before


def test_staging_dirs_hidden_from_table_reads(spark, tmp_path):
    """Staging uses '.'-prefixed dirs: a reader scanning the TABLE while
    (or after a crash leaves) staging dirs exist must see exactly the
    live partitions — the old sibling-named tmp dir surfaced as a bogus
    partition value."""
    import os

    from solar_logger_spark.io.compaction import _staging_paths

    store = str(tmp_path / "points")
    spark.range(100).select(
        F.lit("a").alias("m"), F.col("id").alias("value")
    ).write.parquet(store + "/date=2024-01-01")
    part_dir, tmp, trash = _staging_paths(store, "date=2024-01-01")
    # plant a stale tmp as a crash would leave it
    spark.range(5).select(
        F.lit("a").alias("m"), F.col("id").alias("value")
    ).write.parquet(tmp)
    df = spark.read.parquet(store)
    assert df.count() == 100  # hidden dir not read
    assert [str(r.date) for r in df.select("date").distinct().collect()] \
        == ["2024-01-01"]
    os.path.isdir(tmp) and __import__("shutil").rmtree(tmp)


def test_crashed_swap_recovers_on_next_run(spark, tmp_path):
    """Simulate the worst crash point (live dir parked in trash, tmp
    fully written, process died before the final rename): the next
    compact_partition call must first complete the swap, then compact
    normally — no data loss at any point."""
    import os

    from solar_logger_spark.io.compaction import _staging_paths

    store = str(tmp_path / "points")
    for batch in range(4):
        spark.range(batch * 50, (batch + 1) * 50).select(
            F.col("id").alias("value")
        ).coalesce(1).write.mode("append").parquet(
            store + "/date=2024-01-02"
        )
    part_dir, tmp, trash = _staging_paths(store, "date=2024-01-02")
    # stage a completed rewrite, then "crash" after step 2
    df = spark.read.parquet(part_dir)
    df.coalesce(1).write.parquet(tmp)
    os.rename(part_dir, trash)
    assert not os.path.isdir(part_dir)

    n = compact_partition(spark, store, "date=2024-01-02")
    assert n == 1
    assert spark.read.parquet(part_dir).count() == 200
    assert not os.path.isdir(tmp) and not os.path.isdir(trash)


def test_verify_rows_aborts_without_touching_live(spark, tmp_path, monkeypatch):
    """A rewrite that drops rows must abort BEFORE the swap and leave
    the live partition byte-identical."""
    import glob as g
    import os

    import pytest

    import solar_logger_spark.io.compaction as C

    store = str(tmp_path / "points")
    spark.range(300).select(F.col("id").alias("value")).coalesce(
        3
    ).write.parquet(store + "/date=2024-01-03")
    live = sorted(g.glob(store + "/date=2024-01-03/*.parquet"))

    real_read = spark.read.parquet

    class _Reader:
        def parquet(self, path):
            df = real_read(path)
            return df.limit(1) if ".compact-tmp-" in path else df

    monkeypatch.setattr(
        type(spark), "read", property(lambda self: _Reader())
    )
    with pytest.raises(RuntimeError, match="aborted before swap"):
        C.compact_partition(spark, store, "date=2024-01-03")
    monkeypatch.undo()
    assert sorted(g.glob(store + "/date=2024-01-03/*.parquet")) == live
    assert spark.read.parquet(store + "/date=2024-01-03").count() == 300


def test_recover_table_heals_all_crashed_swaps(spark, tmp_path):
    import os

    from solar_logger_spark.io.compaction import (
        _staging_paths, recover_table,
    )

    store = str(tmp_path / "points")
    for date in ("2024-01-01", "2024-01-02"):
        spark.range(100).select(F.col("id").alias("value")).coalesce(
            1
        ).write.parquet(store + f"/date={date}")
    # crash state A: parked in trash with tmp complete
    p1, t1, tr1 = _staging_paths(store, "date=2024-01-01")
    spark.read.parquet(p1).coalesce(1).write.parquet(t1)
    os.rename(p1, tr1)
    # crash state B: stale tmp only, live intact
    p2, t2, _ = _staging_paths(store, "date=2024-01-02")
    spark.read.parquet(p2).coalesce(1).write.parquet(t2)

    healed = recover_table(store)
    assert healed == ["date=2024-01-01", "date=2024-01-02"]
    df = spark.read.parquet(store)
    assert df.count() == 200
    assert not any(
        d.startswith(".compact-") for d in os.listdir(store)
    )


def test_compact_whole_unpartitioned_table(spark, tmp_path):
    import glob as g

    from solar_logger_spark.io.compaction import compact_partition

    store = str(tmp_path / "flat")
    for batch in range(5):
        spark.range(batch * 20, (batch + 1) * 20).coalesce(
            1
        ).write.mode("append").parquet(store)
    assert len(g.glob(store + "/*.parquet")) >= 5
    n = compact_partition(spark, str(tmp_path), "flat")
    assert n == 1
    assert spark.read.parquet(store).count() == 100
    # and the ""-subdir spelling resolves identically (staging lands
    # beside the table, not inside it)
    n2 = compact_partition(spark, store, "")
    assert n2 == 1
    assert spark.read.parquet(store).count() == 100
