"""Right-to-be-forgotten: io.merge.delete_keys and the
dedup_ingest.forget_docs cascade over the crawl loop's persisted state.

The binding differential: forgetting delivery B's documents from an
index built over A then B must leave the shingle and bucket artifacts
EXACTLY equal to an index built over A alone (artifact rows are
per-document, so equality is row-set equality) — and a re-delivery of
a forgotten document must behave as if it had never been seen (no
pairs against it, fresh ingestion)."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import Row, functions as F

from solar_logger_spark.io import merge as M
from solar_logger_spark.streaming import dedup_ingest as DI

THRESHOLD = 0.5
NPARTS = 8


def _docs(seed, ids):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    return [
        Row(doc_id=i, text=" ".join(
            rng.choice(vocab) for _ in range(rng.randint(10, 28))
        ))
        for i in ids
    ]


def _deliver(spark, index_dir, pairs_dir, rows, comp_dir=None):
    sink = DI.incremental_dedup_sink(
        index_dir, pairs_dir, threshold=THRESHOLD,
        index_partitions=NPARTS, components_dir=comp_dir,
    )
    sink(spark.createDataFrame(rows), 0)


def _rows(spark, table_dir):
    # read THROUGH the delta log (identical to the snapshot read for
    # tables without delta appends — the buckets table runs log-
    # structured by default since round 8)
    df = M.read_table_with_deltas(spark, table_dir)
    return sorted(tuple(r) for r in df.collect())


# ---------------------------------------------------------------- merge unit

def test_delete_keys_unscoped_and_multirow(spark, tmp_path):
    d = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, v string"
    )
    M.init_table(df, d)
    M.delete_keys(
        spark, d, spark.createDataFrame([(1,)], "k long"), keys=["k"]
    )
    assert _rows(spark, d) == [(2, "c"), (3, "d")]
    # idempotent: deleting absent keys is a no-op rewrite
    M.delete_keys(
        spark, d, spark.createDataFrame([(1,)], "k long"), keys=["k"]
    )
    assert _rows(spark, d) == [(2, "c"), (3, "d")]


def test_delete_keys_scoped_prunes_and_links(spark, tmp_path):
    d = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, i % 4, f"v{i}") for i in range(16)], "k long, p int, v string"
    )
    M.init_table(df, d, partition_by=["p"])
    dk = spark.createDataFrame([(5, 1), (9, 1)], "k long, p int")
    snap = M.delete_keys(
        spark, d, dk, keys=["k"], partition_by=["p"], partition_scoped=True
    )
    left = {r[0] for r in _rows(spark, d)}
    assert left == set(range(16)) - {5, 9}
    # untouched partitions are hardlinked, not rewritten: the same
    # inode appears in old and new snapshots for p=0
    old_dir = os.path.join(d, "snap-000000", "p=0")
    new_dir = os.path.join(d, snap, "p=0")
    old_inodes = {os.stat(os.path.join(old_dir, f)).st_ino
                  for f in os.listdir(old_dir)
                  if f.endswith(".parquet")}
    new_inodes = {os.stat(os.path.join(new_dir, f)).st_ino
                  for f in os.listdir(new_dir)
                  if f.endswith(".parquet")}
    assert old_inodes == new_inodes and old_inodes
    with pytest.raises(ValueError, match="partition_scoped requires"):
        M.delete_keys(spark, d, dk, keys=["k"], partition_scoped=True)


# ------------------------------------------------------------- forget sweep

def test_forget_equals_never_ingested(spark, tmp_path):
    a_rows = _docs(1, range(0, 10))
    b_rows = _docs(2, range(10, 20))
    # planted near-dup across deliveries so the pairs table is nonempty
    ws = a_rows[0].text.split(" ")
    ws[len(ws) // 2] = "EDIT"
    b_rows[0] = Row(doc_id=10, text=" ".join(ws))

    both = str(tmp_path / "both")
    only_a = str(tmp_path / "only_a")
    for base in (both, only_a):
        os.makedirs(base)
    _deliver(spark, f"{both}/idx", f"{both}/pairs", a_rows,
             comp_dir=f"{both}/comp")
    _deliver(spark, f"{both}/idx", f"{both}/pairs", b_rows,
             comp_dir=f"{both}/comp")
    _deliver(spark, f"{only_a}/idx", f"{only_a}/pairs", a_rows,
             comp_dir=f"{only_a}/comp")

    # sanity: B really left traces everywhere before the sweep
    pre_pairs = _rows(spark, f"{both}/pairs")
    assert pre_pairs

    DI.forget_docs(
        spark, f"{both}/idx", [r.doc_id for r in b_rows],
        pairs_dir=f"{both}/pairs", components_dir=f"{both}/comp",
    )
    for table in (DI.SHINGLES, DI.BUCKETS):
        assert _rows(spark, f"{both}/idx/{table}") == \
            _rows(spark, f"{only_a}/idx/{table}")
    # pairs mentioning B are gone; the one component existed only
    # through the forgotten edge, so the repair drops BOTH endpoints
    # (edge-less nodes are implicit singletons)
    assert _rows(spark, f"{both}/pairs") == []
    comp = M.read_table_snapshot(spark, f"{both}/comp")
    assert comp.count() == 0
    # purge, not just delete: the pre-forget snapshot (holding the
    # forgotten rows) is pruned from disk and not time-travelable
    sh_dir = f"{both}/idx/{DI.SHINGLES}"
    snaps = [d for d in os.listdir(sh_dir) if d.startswith("snap-")]
    assert len(snaps) == 1

    # idempotent: a second sweep changes nothing
    DI.forget_docs(
        spark, f"{both}/idx", [r.doc_id for r in b_rows],
        pairs_dir=f"{both}/pairs", components_dir=f"{both}/comp",
    )
    for table in (DI.SHINGLES, DI.BUCKETS):
        assert _rows(spark, f"{both}/idx/{table}") == \
            _rows(spark, f"{only_a}/idx/{table}")


def test_redelivery_of_forgotten_doc_is_fresh(spark, tmp_path):
    """After forgetting, re-delivering an identical document must see
    an index that never held it: no pair fires against the forgotten
    copy (stale artifacts would emit one), and the doc re-ingests."""
    rows = _docs(3, range(0, 8))
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    _deliver(spark, idx, pairs, rows)
    DI.forget_docs(spark, idx, [7], pairs_dir=pairs)
    sh = M.read_table_snapshot(spark, os.path.join(idx, DI.SHINGLES))
    assert sh.filter(F.col("doc_id") == 7).count() == 0

    clone = [Row(doc_id=99, text=rows[7].text)]
    _deliver(spark, idx, pairs, clone)
    got = M.read_table_snapshot(spark, pairs)
    # identical text WOULD pair (jaccard 1.0) against a retained copy
    assert got.filter(
        (F.col("batch_id") == 99) | (F.col("index_id") == 99)
    ).count() == 0
    sh2 = M.read_table_snapshot(spark, os.path.join(idx, DI.SHINGLES))
    assert sh2.filter(F.col("doc_id") == 99).count() > 0


def test_forget_requires_initialized_index(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="initialized"):
        DI.forget_docs(spark, str(tmp_path / "nope"), [1])


def test_forget_repairs_transitive_merges(spark, tmp_path):
    """A~F and F~B merged A and B into one component; forgetting F must
    SEPARATE them (recompute over retained pairs), not just drop F's
    row — while an independent retained pair stays merged. Threshold
    0.2 so the half-overlap chain texts qualify as near-dups."""
    w = [f"w{i}" for i in range(20)]
    v = [f"v{i}" for i in range(20)]
    u = [f"u{i}" for i in range(20)]
    a1 = " ".join(w)
    b1 = " ".join(v)
    f = " ".join(w[:10] + v[:10])          # bridges a1 and b1
    a2 = " ".join(u)
    b2 = " ".join(u[:19] + ["EDIT"])        # near-dup of a2, no bridge
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    comp = str(tmp_path / "comp")
    sink = DI.incremental_dedup_sink(
        idx, pairs, threshold=0.2, index_partitions=NPARTS,
        components_dir=comp,
    )
    sink(spark.createDataFrame(
        [Row(doc_id=1, text=a1), Row(doc_id=2, text=a2)]), 0)
    sink(spark.createDataFrame(
        [Row(doc_id=50, text=f), Row(doc_id=4, text=b2)]), 0)
    sink(spark.createDataFrame([Row(doc_id=3, text=b1)]), 0)

    labels = {r.node: r.component
              for r in M.read_table_snapshot(spark, comp).collect()}
    assert labels[1] == labels[3] == labels[50] == 1  # bridged chain
    assert labels[2] == labels[4] == 2                # independent pair

    DI.forget_docs(spark, idx, [50], pairs_dir=pairs,
                   components_dir=comp)
    labels2 = {r.node: r.component
               for r in M.read_table_snapshot(spark, comp).collect()}
    # chain endpoints are edge-less without the bridge -> dropped;
    # the independent pair survives untouched
    assert labels2 == {2: 2, 4: 2}
    kept_pairs = _rows(spark, pairs)
    assert {frozenset((r[0], r[1])) for r in kept_pairs} == {frozenset((2, 4))}


def test_forget_empty_ids_is_noop(spark, tmp_path):
    rows = _docs(5, range(0, 6))
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    _deliver(spark, idx, pairs, rows)
    before = _rows(spark, os.path.join(idx, DI.SHINGLES))
    out = DI.forget_docs(spark, idx, [])
    assert out[DI.SHINGLES] == M.current_snapshot(
        os.path.join(idx, DI.SHINGLES)
    )
    assert _rows(spark, os.path.join(idx, DI.SHINGLES)) == before


def test_forget_components_requires_pairs(spark, tmp_path):
    rows = _docs(6, range(0, 4))
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    _deliver(spark, idx, pairs, rows)
    with pytest.raises(ValueError, match="pairs_dir"):
        DI.forget_docs(spark, idx, [1], components_dir=str(tmp_path / "c"))


def test_forget_randomized_differential(spark, tmp_path):
    """Randomized end-to-end pin for the privacy contract: random
    deliveries, a random forget set — shingles and buckets must equal
    a never-ingested build EXACTLY, and the repaired labels must equal
    a pure-Python union-find over the retained pair set (min-id
    labels, edge-less nodes absent)."""
    rng = random.Random(4242)
    vocab = [f"w{i}" for i in range(10)]
    docs = {}
    for i in range(30):
        docs[i] = " ".join(
            rng.choice(vocab) for _ in range(rng.randint(10, 24))
        )
    # plant extra near-dups so pair structure is nontrivial
    for base, dup in [(0, 11), (11, 21), (2, 13), (13, 23), (5, 25)]:
        ws = docs[base].split(" ")
        ws[rng.randrange(len(ws))] = "EDIT"
        docs[dup] = " ".join(ws)
    deliveries = [list(range(0, 10)), list(range(10, 20)),
                  list(range(20, 30))]
    forgotten = sorted(rng.sample(range(30), 9))
    kept_ids = [i for i in range(30) if i not in forgotten]

    both = str(tmp_path / "both")
    clean = str(tmp_path / "clean")
    for ids_per_delivery, base in (
        (deliveries, both),
        ([[i for i in d if i not in forgotten] for d in deliveries], clean),
    ):
        sink = DI.incremental_dedup_sink(
            f"{base}/idx", f"{base}/pairs", threshold=THRESHOLD,
            index_partitions=NPARTS, components_dir=f"{base}/comp",
        )
        for k, ids in enumerate(ids_per_delivery):
            rows = [Row(doc_id=i, text=docs[i]) for i in ids]
            if rows:
                sink(spark.createDataFrame(rows), k)

    pre_pairs = {
        (min(r.batch_id, r.index_id), max(r.batch_id, r.index_id))
        for r in M.read_table_snapshot(spark, f"{both}/pairs").collect()
    }
    DI.forget_docs(
        spark, f"{both}/idx", forgotten,
        pairs_dir=f"{both}/pairs", components_dir=f"{both}/comp",
    )
    for table in (DI.SHINGLES, DI.BUCKETS):
        assert _rows(spark, f"{both}/idx/{table}") == \
            _rows(spark, f"{clean}/idx/{table}"), table

    # labels == python union-find over retained pairs
    retained = {
        p for p in pre_pairs
        if p[0] not in forgotten and p[1] not in forgotten
    }
    parent = {i: i for i in kept_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in retained:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    has_edge = {n for p in retained for n in p}
    expected = {n: find(n) for n in kept_ids if n in has_edge}
    got = {
        r.node: r.component
        for r in M.read_table_snapshot(spark, f"{both}/comp").collect()
    }
    assert got == expected


def test_compact_index_preserves_contents_and_cuts_files(spark, tmp_path):
    """Compaction = fresh coalesced snapshot: identical rows, the
    partition-N sidecar re-pinned, and at most one data file per hive
    partition afterwards (scoped merges had accumulated several)."""
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    for k in range(4):  # several deliveries -> several files/partition
        _deliver(spark, idx, pairs, _docs(10 + k, range(k * 6, k * 6 + 6)))

    def _files_per_part(table):
        tdir = os.path.join(idx, table)
        snap = os.path.join(tdir, M.current_snapshot(tdir))
        counts = {}
        for part in os.listdir(snap):
            p = os.path.join(snap, part)
            if os.path.isdir(p):
                counts[part] = sum(
                    1 for f in os.listdir(p) if f.endswith(".parquet")
                )
        return counts

    before_rows = {
        t: _rows(spark, os.path.join(idx, t))
        for t in (DI.SHINGLES, DI.BUCKETS)
    }
    assert max(_files_per_part(DI.SHINGLES).values()) > 1
    DI.compact_index(spark, idx)
    for t in (DI.SHINGLES, DI.BUCKETS):
        assert _rows(spark, os.path.join(idx, t)) == before_rows[t]
    assert max(_files_per_part(DI.SHINGLES).values()) == 1
    assert DI.stored_partitions(idx) == NPARTS
    # the loop keeps working on the compacted index
    _deliver(spark, idx, pairs, _docs(99, range(40, 46)))


def test_forget_reaches_exported_shards(spark, tmp_path):
    """The compliance path end-to-end: docs ingested into the dedup
    index AND shipped as training shards; one forget_docs call with
    ``shards_dirs`` sweeps both — the index differential holds and the
    forgotten ids leave the shipped bytes, with the card re-committed
    and verify green."""
    from solar_logger_spark.io import export as E

    rows = _docs(11, range(0, 12))
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    _deliver(spark, idx, pairs, rows)
    shards = str(tmp_path / "shards")
    corpus = spark.createDataFrame(rows).withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    E.export_training_shards(corpus, shards, n_shards=3, id_col="doc_id")

    out = DI.forget_docs(
        spark, idx, [2, 5], pairs_dir=pairs, shards_dirs=[shards]
    )
    assert out[f"shards:{shards}"] == "2"
    shipped = spark.read.parquet(shards)
    assert shipped.filter(F.col("doc_id").isin([2, 5])).count() == 0
    assert shipped.count() == 10
    assert E.verify_shards(spark, shards)["ok"]
    sh = M.read_table_snapshot(spark, os.path.join(idx, DI.SHINGLES))
    assert sh.filter(F.col("doc_id").isin([2, 5])).count() == 0


def test_forget_components_tolerates_uninitialized_pairs(spark, tmp_path):
    """The sink's crash window on a first delivery: components
    committed, pairs table never initialized. The sweep must treat the
    retained-edge set as empty (affected members become edge-less and
    are deleted) and still complete the index deletes — aborting would
    retain the forgotten rows."""
    rows = _docs(12, range(0, 6))
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    comp = str(tmp_path / "comp")
    _deliver(spark, idx, pairs, rows, comp_dir=comp)
    # near-dup of doc 0 in a SECOND delivery so a cross-delivery pair
    # fires and components is nonempty (0 and 1 merge)
    ws = rows[0].text.split(" ")
    ws[len(ws) // 2] = "EDIT"
    _deliver(
        spark, idx, pairs,
        [Row(doc_id=1_000, text=" ".join(ws))], comp_dir=comp,
    )
    assert M.read_table_snapshot(spark, comp).count() > 0
    # simulate the crash window: pairs table vanishes
    import shutil
    shutil.rmtree(pairs)

    out = DI.forget_docs(
        spark, idx, [0], pairs_dir=pairs, components_dir=comp,
    )
    # the sweep completed: index rows gone, and doc 1000 (the other
    # half of the component) is edge-less without any retained pairs
    # -> gone too
    sh = M.read_table_snapshot(spark, os.path.join(idx, DI.SHINGLES))
    assert sh.filter(F.col("doc_id") == 0).count() == 0
    c = M.read_table_snapshot(spark, comp)
    assert c.filter(F.col("node").isin([0, 1_000])).count() == 0
    assert DI.SHINGLES in out and DI.BUCKETS in out


def test_forget_preserves_components_partition_pin(spark, tmp_path):
    """The components repair must re-commit the _comp_partitions
    sidecar: a sweep that dropped it would disarm the n_partitions
    mismatch guard on the next delivery (silent mis-pruned labels)."""
    from solar_logger_spark.operators import graph as G

    rows = _docs(21, range(0, 6))
    idx = str(tmp_path / "idx")
    pairs = str(tmp_path / "pairs")
    comp = str(tmp_path / "comp")
    _deliver(spark, idx, pairs, rows, comp_dir=comp)
    ws = rows[0].text.split(" ")
    ws[len(ws) // 2] = "EDIT"
    _deliver(spark, idx, pairs,
             [Row(doc_id=500, text=" ".join(ws))], comp_dir=comp)
    pin0 = M.read_sidecar(comp, G.COMP_PARTS_SIDECAR)
    assert pin0 is not None

    DI.forget_docs(
        spark, idx, [0], pairs_dir=pairs, components_dir=comp,
    )
    assert M.read_sidecar(comp, G.COMP_PARTS_SIDECAR) == pin0
    # and the guard still works: a mismatched caller raises
    import pytest
    from solar_logger_spark.operators.graph import incremental_components

    edges = spark.createDataFrame([(2, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="n_partitions"):
        incremental_components(spark, comp, edges, n_partitions=7)
