"""Streaming incremental near-dup loop == one-shot bipartite results.

The crawl-ingest composition (streaming/dedup_ingest.py): each
micro-batch pairs against the PERSISTED index artifacts and then merges
itself in. The differential: streaming three deliveries through
foreachBatch must produce exactly the union of the one-shot
``incremental_lsh_pairs(prefix, delivery)`` calls on the same corpus —
canonicalized to unordered pairs, since the file source's batch order
is a scheduling detail and each cross-delivery pair is emitted exactly
once whatever the order.
"""

import random

import pytest
from pyspark.sql import Row, functions as F

from solar_logger_spark.io import merge as M
from solar_logger_spark.operators import dedup
from solar_logger_spark.streaming import dedup_ingest as DI

THRESHOLD = 0.5


def _corpus():
    """Three deliveries with planted cross-delivery near-dups."""
    rng = random.Random(97)
    vocab = [f"w{i}" for i in range(12)]
    docs = {}
    for i in range(36):
        docs[i] = " ".join(
            rng.choice(vocab) for _ in range(rng.randint(10, 28))
        )
    # plant near-dups across deliveries: doc 12+i edits doc i, doc 24+i
    # edits doc 12+i (one word each) -> pairs in (d1,d2), (d2,d3), (d1,d3)
    for base, dup in [(0, 12), (1, 13), (12, 24), (2, 25)]:
        ws = docs[base].split(" ")
        ws[len(ws) // 2] = "EDIT"
        docs[dup] = " ".join(ws)
    deliveries = [
        [Row(doc_id=i, text=docs[i]) for i in range(0, 12)],
        [Row(doc_id=i, text=docs[i]) for i in range(12, 24)],
        [Row(doc_id=i, text=docs[i]) for i in range(24, 36)],
    ]
    return deliveries


def _canon(rows):
    return {
        (min(r.batch_id, r.index_id), max(r.batch_id, r.index_id)):
            pytest.approx(r.jaccard)
        for r in rows
    }


def test_streamed_batches_equal_one_shot_bipartite(spark, tmp_path):
    deliveries = _corpus()
    input_dir = tmp_path / "in"
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    for i, rows in enumerate(deliveries):
        spark.createDataFrame(rows).coalesce(1).write.parquet(
            str(input_dir / f"f{i}")
        )

    raw = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(input_dir) + "/*")
    )
    q = (
        raw.writeStream.foreachBatch(
            DI.incremental_dedup_sink(
                index_dir, pairs_dir, threshold=THRESHOLD
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # one-shot comparator: delivery i vs the union of deliveries < i
    expected = {}
    for i in range(1, len(deliveries)):
        prefix = spark.createDataFrame(
            [r for d in deliveries[:i] for r in d]
        )
        batch = spark.createDataFrame(deliveries[i])
        expected.update(
            _canon(
                dedup.incremental_lsh_pairs(
                    prefix, batch, threshold=THRESHOLD
                ).collect()
            )
        )
    assert expected, "corpus must plant at least one near-dup pair"

    got = _canon(
        M.read_table_snapshot(spark, pairs_dir).collect()
    )
    assert got == expected

    # index growth: after the stream, the artifacts hold every doc once
    sh, bk = DI.read_index(spark, index_dir)
    all_ids = {r.doc_id for d in deliveries for r in d}
    assert {r.doc_id for r in sh.select("doc_id").distinct().collect()} \
        == all_ids
    assert {r.doc_id for r in bk.select("doc_id").distinct().collect()} \
        == all_ids
    # 32 bands -> exactly 32 bucket rows per doc
    n_bk = bk.count()
    assert n_bk == 32 * len(all_ids)


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-running a delivery through the sink (foreachBatch crash
    replay) must not emit self-pairs, must not duplicate pairs, and
    must leave the index artifacts unchanged in size."""
    deliveries = _corpus()
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    sink = DI.incremental_dedup_sink(index_dir, pairs_dir,
                                     threshold=THRESHOLD)
    d1 = spark.createDataFrame(deliveries[0])
    d2 = spark.createDataFrame(deliveries[1])
    sink(d1, 0)
    sink(d2, 1)
    pairs_once = _canon(M.read_table_snapshot(spark, pairs_dir).collect())
    sh_once = M.read_table_snapshot(spark, index_dir + "/shingles").count()
    # replay delivery 2: its docs are already merged into the index
    sink(d2, 1)
    pairs_again = _canon(M.read_table_snapshot(spark, pairs_dir).collect())
    sh_again = M.read_table_snapshot(spark, index_dir + "/shingles").count()
    assert pairs_again == pairs_once
    assert sh_again == sh_once
    assert all(a != b for (a, b) in pairs_again)


def test_half_finished_bootstrap_completes_on_replay(spark, tmp_path):
    """A crash between the two bootstrap init_table calls leaves the
    shingles table initialized and buckets missing; the foreachBatch
    replay of the same delivery must complete the bucket half (and a
    dead orphan snap dir without a pointer must be rewritten, not
    collide on errorifexists)."""
    import os

    from pyspark.sql import functions as F

    deliveries = _corpus()
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    sink = DI.incremental_dedup_sink(index_dir, pairs_dir,
                                     threshold=THRESHOLD)
    d1 = spark.createDataFrame(deliveries[0])
    # simulate the crash: only the shingles half of the bootstrap ran
    sh_b, _bk_b = dedup.index_artifacts(d1)
    sh_b = sh_b.withColumn("_ps", F.pmod(F.hash("doc_id"), F.lit(32)))
    M.init_table(sh_b, index_dir + "/shingles", partition_by=["_ps"])
    # ... plus a dead orphan buckets snapshot dir with no _CURRENT
    orphan = os.path.join(index_dir, "buckets", "snap-000000")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "_half_written.parquet"), "w") as fh:
        fh.write("junk")

    sink(d1, 0)  # replay: must not raise, must finish the bootstrap
    sh, bk = DI.read_index(spark, index_dir)
    ids = {r.doc_id for r in d1.select("doc_id").distinct().collect()}
    assert {r.doc_id for r in bk.select("doc_id").distinct().collect()} \
        == ids
    assert {r.doc_id for r in sh.select("doc_id").distinct().collect()} \
        == ids
    # and the loop keeps working: delivery 2 pairs against delivery 1
    sink(spark.createDataFrame(deliveries[1]), 1)
    assert _canon(M.read_table_snapshot(spark, pairs_dir).collect())


def test_delivery_reads_are_partition_pruned(spark, tmp_path):
    """The artifact tables are written hive-partitioned and the
    delivery path reads them through IN-list partition filters: an
    equivalent pruned read must show partition filters in the scan and
    touch strictly fewer files than the table holds."""
    deliveries = _corpus()
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    sink = DI.incremental_dedup_sink(index_dir, pairs_dir,
                                     threshold=THRESHOLD)
    sink(spark.createDataFrame(deliveries[0]), 0)
    sink(spark.createDataFrame(deliveries[1]), 1)

    sh, bk = DI.read_index(spark, index_dir)
    assert DI.PS in sh.columns and DI.PB in bk.columns

    pruned = bk.filter(bk[DI.PB].isin([0, 1, 2]))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = pruned._jdf.queryExecution().explainString(mode)
    scan = plan[plan.index("PartitionFilters"):]
    assert DI.PB in scan[:scan.index("]")], (
        "partition filter on _pb missing from the bucket scan"
    )
    # inputFiles() is not filter-aware; count the files the pruned scan
    # actually touches at execution time instead
    from pyspark.sql import functions as F

    touched = (
        pruned.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert touched < len(bk.inputFiles())


def test_stored_partition_layout_is_authoritative(spark, tmp_path):
    """The index pins its partition count N as a snapshot sidecar: a
    sink reconfigured with a different index_partitions must keep
    using the stored layout (not silently prune wrong partitions), and
    the raw pair API must reject mismatched batch artifacts."""
    deliveries = _corpus()
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    DI.incremental_dedup_sink(index_dir, pairs_dir, threshold=THRESHOLD,
                              index_partitions=8)(
        spark.createDataFrame(deliveries[0]), 0)
    assert DI.stored_partitions(index_dir) == 8
    # reconfigured sink: stored N=8 wins; pairs still found
    DI.incremental_dedup_sink(index_dir, pairs_dir, threshold=THRESHOLD,
                              index_partitions=64)(
        spark.createDataFrame(deliveries[1]), 1)
    assert DI.stored_partitions(index_dir) == 8  # re-pinned, unchanged
    assert _canon(M.read_table_snapshot(spark, pairs_dir).collect())
    # raw API with artifacts built under the wrong N fails loud
    sh_b, bk_b = DI.batch_artifacts(
        spark.createDataFrame(deliveries[2]), index_partitions=64)
    with pytest.raises(ValueError, match="laid out with N=8"):
        DI.pair_batch_against_index(spark, index_dir, sh_b, bk_b,
                                    index_partitions=64)


def test_sink_maintains_component_labels(spark, tmp_path):
    """With components_dir set, the streamed deliveries' labels must
    equal batch connected_components over the final pairs table."""
    from solar_logger_spark.operators.graph import connected_components

    deliveries = _corpus()
    index_dir = str(tmp_path / "index")
    pairs_dir = str(tmp_path / "pairs")
    comp_dir = str(tmp_path / "comps")
    sink = DI.incremental_dedup_sink(
        index_dir, pairs_dir, threshold=THRESHOLD,
        components_dir=comp_dir,
    )
    for i, rows in enumerate(deliveries):
        sink(spark.createDataFrame(rows), i)
    all_pairs = M.read_table_snapshot(spark, pairs_dir)
    assert all_pairs.count() > 1
    exp = {
        r.node: r.component
        for r in connected_components(
            all_pairs, src="batch_id", dst="index_id"
        ).collect()
    }
    got = {
        r.node: r.component
        for r in M.read_table_snapshot(spark, comp_dir).collect()
    }
    assert got == exp


def test_bucket_delta_mode_appends_and_compacts(spark, tmp_path):
    """Default delta mode: deliveries append O(batch) bucket deltas
    (base snapshot untouched), reads see base+deltas, pairing works
    across the delta boundary, and compact_index folds everything into
    a coalesced base equal to the logical table."""
    import os
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]

    def docs(ids):
        return [
            Row(doc_id=i, text=" ".join(
                rng.choice(vocab) for _ in range(rng.randint(10, 28))
            ))
            for i in ids
        ]

    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    sink = DI.incremental_dedup_sink(
        idx, pairs, threshold=0.5, index_partitions=8,
    )
    d1 = docs(range(0, 10))
    sink(spark.createDataFrame(d1), 0)
    bk_dir = os.path.join(idx, "buckets")
    assert M.list_deltas(bk_dir) == []  # bootstrap is the base

    # near-dup of doc 3 in delivery two -> a pair must fire THROUGH
    # the delta-held bucket rows of delivery two's predecessor state
    ws = d1[3].text.split(" ")
    ws[0] = "EDIT"
    sink(spark.createDataFrame(
        docs(range(10, 14)) + [Row(doc_id=99, text=" ".join(ws))]
    ), 1)
    assert M.list_deltas(bk_dir) == ["delta-000000"]
    base_rows = M.read_table_snapshot(spark, bk_dir).count()
    all_rows = M.read_table_with_deltas(spark, bk_dir).count()
    assert all_rows > base_rows  # delivery 2 lives in the delta

    # third delivery: near-dup of doc 12 (whose buckets are DELTA-only)
    sink(spark.createDataFrame([Row(doc_id=200, text=d1[5].text)]), 2)
    got = {
        (r.batch_id, r.index_id)
        for r in M.read_table_snapshot(spark, pairs).collect()
    }
    assert (99, 3) in got and (200, 5) in got

    # compaction folds deltas; logical contents unchanged
    before = sorted(
        tuple(r) for r in
        M.read_table_with_deltas(spark, bk_dir).collect()
    )
    DI.compact_index(spark, idx)
    assert M.list_deltas(bk_dir) == []
    after = sorted(
        tuple(r) for r in
        M.read_table_snapshot(spark, bk_dir).collect()
    )
    assert after == before


def test_bucket_delta_replay_converges_after_compaction(spark, tmp_path):
    """foreachBatch replay appends a duplicate delta; reads stay
    correct (candidates DISTINCT) and compaction's latest-epoch-wins
    restores exactly-one-copy per doc."""
    import os

    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    sink = DI.incremental_dedup_sink(
        idx, pairs, threshold=0.5, index_partitions=8,
    )
    rows = [Row(doc_id=i, text=f"a b c d e f g h{i}") for i in range(4)]
    sink(spark.createDataFrame(rows), 0)
    more = [Row(doc_id=9, text="a b c d e f g zz")]
    sink(spark.createDataFrame(more), 1)
    sink(spark.createDataFrame(more), 1)  # replay
    bk_dir = os.path.join(idx, "buckets")
    assert len(M.list_deltas(bk_dir)) == 2
    once = M.read_table_with_deltas(spark, bk_dir).filter(
        F.col("doc_id") == 9
    ).count()
    DI.compact_index(spark, idx)
    after = M.read_table_snapshot(spark, bk_dir).filter(
        F.col("doc_id") == 9
    ).count()
    assert after == once // 2  # duplicate delta rows folded away
