"""Streaming incremental near-dup detection — the production
crawl-ingest loop.

Composes two shipped pieces: ``operators.dedup.incremental_lsh_pairs``
(bipartite batch x index MinHash-LSH with exact Jaccard verification)
and the ``io.merge`` copy-on-write snapshot store. Each micro-batch of
newly crawled documents is

1. checked against the PERSISTED index artifacts (hashed shingles +
   band-bucket rows — the two frames ``dedup.index_artifacts``
   produces), emitting ``(batch_id, index_id, jaccard)`` near-dup
   pairs into a pairs table, then
2. merged into those index artifacts, so the next delivery sees it.

Scale shape: the index side is NEVER recomputed — per delivery the
work is the batch's own (map-side, linear) shingling/signatures plus
the bipartite bucket join. The index artifacts are written in a
hive-partitioned layout (buckets by ``_pb = pmod(hash(band, bucket),
N)``, shingles by ``_ps = pmod(hash(doc_id), N)``) and every read in
the delivery path carries a partition filter: the bucket scan is
pruned to the partitions the batch's own buckets hash into, and the
shingle scan to the partitions of the (few) candidate index ids — so a
delivery READS O(batch-touched partitions + candidate partitions) of
the index, not the whole thing, and recomputes none of it. WRITES:
the shingles table merges partition-scoped (``_ps`` is a function of
the merge key, so a delivery touches <= |batch| partitions; the merge
falls back to a plain rewrite when a batch covers the whole layout).
The buckets table is LOG-STRUCTURED by default (``bucket_deltas``):
``_pb`` is a content hash that deliberately scatters every document,
so no scoping can localize its writes (measured, SCALING round-8) —
each delivery appends an immutable O(batch) delta, readers union base
+ visible deltas (still partition-pruned per dir), and
``compact_index`` folds deltas latest-epoch-per-doc on the
maintenance cadence. Per-delivery write cost is O(batch) for buckets
and O(touched partitions) for shingles; the index-sized bills
(delta fold + file-count coalesce) are paid once per maintenance
cadence.
(Reference scope: the reference has no dedup/streaming-analytics
surface at all — MQTT->InfluxDB client,
``src/classes/py_functions.py`` — this is the beyond-reference
LLM-pipeline family.)

Replay/idempotency contract (foreachBatch may re-run a batch after a
crash): the current batch's own ids are anti-joined OUT of the index
side before pairing, so a half-committed previous attempt (index
updated, pairs not) cannot make the replay see its own documents in
the index and emit self- or within-batch pairs; the pairs table is
MERGE-upserted by (batch_id, index_id) so rewrites are idempotent;
the shingles upsert is keyed by document id (replace-per-doc), so
re-merging a delivery is a no-op there; and a replayed delivery in
the buckets table's delta mode appends a DUPLICATE delta whose rows
are harmless to reads (candidates are DISTINCT) and fold away at the
next compaction (latest-epoch-per-doc) — replay converges, it is just
not byte-identical until maintenance runs. Within-delivery duplicates are
deliberately out of scope here — run the self-join family
(``minhash_lsh_pairs``) on the delivery itself if needed; this sink is
the batch-vs-corpus check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from solar_logger_spark.io import merge as M
from solar_logger_spark.operators import dedup as D

SHINGLES = "shingles"
BUCKETS = "buckets"
PB = "_pb"  # buckets partition column: pmod(hash(band, bucket), N)
PS = "_ps"  # shingles partition column: pmod(hash(doc_id), N)
PARTS_SIDECAR = "_index_partitions"


def stored_partitions(index_dir: str) -> int | None:
    """The N the persisted index was laid out with, pinned as an
    io/merge sidecar at bootstrap and re-pinned on every merge. An N
    mismatch between layout and reader silently prunes to the WRONG
    partitions (missed near-dups) and mis-scopes the shingle merge —
    so the stored value, not the caller's argument, is authoritative;
    ``None`` only for an uninitialized index."""
    for table in (BUCKETS, SHINGLES):
        v = M.read_sidecar(os.path.join(index_dir, table), PARTS_SIDECAR)
        if v is not None:
            return int(v)
    return None


def _bucket_part(n_parts: int):
    return F.pmod(F.hash("band", "bucket"), F.lit(n_parts)).alias(PB)


def _shingle_part(id_col: str, n_parts: int):
    return F.pmod(F.hash(id_col), F.lit(n_parts)).alias(PS)


def read_index(spark, index_dir: str) -> tuple[DataFrame, DataFrame]:
    """The live (shingles, buckets) artifact frames, or raises
    FileNotFoundError when the index has never been initialized.
    Frames include the partition columns (``_ps`` / ``_pb``); callers
    filtering on them get partition-pruned file reads."""
    return (
        M.read_table_snapshot(spark, os.path.join(index_dir, SHINGLES)),
        # buckets may run in delta-append mode: the union is the base
        # snapshot when no deltas are visible, so this is always right
        M.read_table_with_deltas(spark, os.path.join(index_dir, BUCKETS)),
    )


def pair_batch_against_index(
    spark,
    index_dir: str,
    sh_b: DataFrame,
    bk_b: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    index_partitions: int = 32,
) -> DataFrame:
    """The read-side half of a delivery: partition-pruned candidate
    generation + exact verification of batch artifacts against the
    persisted index. Exposed separately from the sink so its cost can
    be probed independently of the COW artifact merge (SCALING), and
    so batch jobs can pair without mutating the index. Batch frames
    must carry the ``_pb``/``_ps`` partition columns the sink adds —
    computed with the index's OWN stored N (a mismatch raises here
    rather than silently missing pairs)."""
    stored = stored_partitions(index_dir)
    if stored is not None and stored != index_partitions:
        raise ValueError(
            f"index at {index_dir} is laid out with N={stored} "
            f"partitions but the batch artifacts use N={index_partitions}"
            " — rebuild the batch frames with the stored N "
            "(stored_partitions(index_dir))"
        )
    sh_i, bk_i = read_index(spark, index_dir)
    batch_ids = sh_b.select(id_col).distinct()
    # only index bucket partitions the batch's buckets hash into can
    # match (same Murmur3 pmod on both sides); the IN-list is <= N
    pbs = [r[0] for r in bk_b.select(PB).distinct().collect()]
    bk_i = bk_i.filter(F.col(PB).isin(pbs)).join(
        batch_ids, id_col, "left_anti"
    )
    cands = D.bipartite_candidates(bk_i, bk_b, id_col=id_col)
    cands = cands.localCheckpoint()  # reused: prune-list + verify
    # shingle scan pruned to the candidates' partitions — all shingle
    # rows of an id live in its pmod(hash(id), N) partition
    pss = [
        r[0]
        for r in cands.select(
            F.pmod(F.hash("index_id"), F.lit(index_partitions))
        ).distinct().collect()
    ]
    sh_i = sh_i.filter(F.col(PS).isin(pss)).join(
        batch_ids, id_col, "left_anti"
    )
    return D.incremental_pairs_from_artifacts(
        sh_i, bk_i, sh_b, bk_b, id_col=id_col, threshold=threshold,
        candidates=cands,
    )


def batch_artifacts(
    batch_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    index_partitions: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """One pass over a delivery builds both artifact frames WITH the
    partition columns, lineage-cut once (they feed the pair check AND
    the index merge; blocks are freed by the context cleaner when the
    batch's RDDs go out of scope — the graph.py pattern)."""
    sh_b, bk_b = D.index_artifacts(
        batch_df, id_col, text_col, n, num_hashes, bands
    )
    sh_b = sh_b.withColumn(
        PS, _shingle_part(id_col, index_partitions)
    ).localCheckpoint()
    bk_b = bk_b.withColumn(
        PB, _bucket_part(index_partitions)
    ).localCheckpoint()
    return sh_b, bk_b


def incremental_dedup_sink(
    index_dir: str,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    keep_snapshots: int = 2,
    index_partitions: int = 32,
    components_dir: str | None = None,
    bucket_deltas: bool = True,
):
    """``foreachBatch`` function: near-dup-check each micro-batch of
    documents against the persisted index, append verified pairs, then
    merge the batch's artifacts into the index.

    ``components_dir``: when set, each delivery's verified pairs also
    fold into a MAINTAINED connected-components labeling
    (``operators.graph.incremental_components``) — the cluster
    assignment a keep-one-per-cluster dedup policy reads, kept current
    without ever re-running CC over the accumulated pair history.

    ``index_partitions`` (N): both artifact tables are written
    hive-partitioned (buckets by ``pmod(hash(band, bucket), N)``,
    shingles by ``pmod(hash(doc_id), N)``) and the delivery path reads
    them through IN-list partition filters — the batch's own bucket
    partitions, then the candidates' shingle partitions — so file reads
    prune to the partitions that can match instead of scanning the
    whole index. Size N so one partition of the production index is a
    few hundred MB; the two driver-side IN-lists are bounded by N.

    Usage::

        q = (docs_stream.writeStream
             .foreachBatch(incremental_dedup_sink(index_dir, pairs_dir))
             .option("checkpointLocation", ckpt).start())
    """

    sh_dir = os.path.join(index_dir, SHINGLES)
    bk_dir = os.path.join(index_dir, BUCKETS)

    def _write(batch_df: DataFrame, _batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        # the PERSISTED layout's N is authoritative (pinned as a
        # sidecar at bootstrap): a caller reconfigured to a different
        # index_partitions would otherwise prune the wrong partitions
        # (silent missed pairs) and mis-scope the shingle merge
        n_parts = stored_partitions(index_dir)
        if n_parts is None:
            n_parts = index_partitions
        parts_sidecar = {PARTS_SIDECAR: str(n_parts)}
        sh_b, bk_b = batch_artifacts(
            batch_df, id_col, text_col, n, num_hashes, bands, n_parts
        )
        sh_missing = M.current_snapshot(sh_dir) is None
        bk_missing = M.current_snapshot(bk_dir) is None
        if sh_missing or bk_missing:
            # First delivery bootstraps the index; nothing to pair.
            # Each table is checked INDEPENDENTLY: a crash between the
            # two inits leaves one initialized, and the foreachBatch
            # replay of the same delivery must complete the other half
            # instead of failing on the existing one forever.
            if sh_missing:
                M.init_table(sh_b, sh_dir, partition_by=[PS],
                             sidecar=parts_sidecar)
            if bk_missing:
                M.init_table(bk_b, bk_dir, partition_by=[PB],
                             sidecar=parts_sidecar)
            return
        # replay guard (inside pair_batch_against_index): a previous
        # half-committed attempt may have already merged this delivery
        # — the batch's own ids are anti-joined out of the index side
        pairs = pair_batch_against_index(
            spark, index_dir, sh_b, bk_b,
            id_col=id_col, threshold=threshold,
            index_partitions=n_parts,
        )
        if components_dir is not None:
            pairs = pairs.localCheckpoint()  # consumed twice below
            edges = pairs.select("batch_id", "index_id")
            if edges.take(1):
                from solar_logger_spark.operators.graph import (
                    incremental_components,
                )

                incremental_components(
                    spark, components_dir, edges,
                    src="batch_id", dst="index_id",
                    keep_snapshots=keep_snapshots,
                )
        if M.current_snapshot(pairs_dir) is None:
            M.init_table(pairs, pairs_dir)
        else:
            M.upsert(
                spark, pairs_dir, pairs,
                keys=["batch_id", "index_id"],
                keep_snapshots=keep_snapshots,
            )
        # replace-per-doc: all artifact rows of a redelivered id are
        # swapped for the fresh ones, both tables partition-SCOPED
        # with the adaptive full-rewrite fallback. Shingles: _ps is a
        # function of the merge key, so a delivery touches <= |batch|
        # partitions. Buckets: _pb is a function of bucket CONTENTS
        # (the read path needs that layout for candidate pruning), so
        # the scope covers the batch ids' OLD-row partitions too
        # (scope_from_base) — but a batch's bands*|batch| buckets hash
        # WIDE, so when they cover the whole layout the merge falls
        # back to the plain rewrite rather than paying scoping that
        # cannot prune (measured: scoped-at-full-coverage cost MORE
        # than the rewrite — SCALING round-8 probe).
        M.upsert(spark, sh_dir, sh_b, keys=[id_col],
                 keep_snapshots=keep_snapshots, partition_by=[PS],
                 partition_scoped=True, sidecar=parts_sidecar)
        if bucket_deltas:
            # log-structured buckets (SCALING round-8): _pb is a
            # content hash that scatters every doc across the layout,
            # so NO scoping can localize the write — append the
            # delivery's 32-rows/doc as an immutable delta instead
            # (O(batch)), and let compact_index fold deltas on the
            # maintenance cadence. Correctness notes: candidates are
            # DISTINCT (replayed duplicate rows collapse), stale
            # bucket rows of a re-delivered changed doc can only ADD
            # candidates, and verification is exact against the
            # snapshot-merged CURRENT shingles — every emitted pair
            # stays a true near-dup.
            M.append_delta(bk_dir, bk_b, partition_by=[PB])
        else:
            M.upsert(spark, bk_dir, bk_b, keys=[id_col],
                     keep_snapshots=keep_snapshots, partition_by=[PB],
                     partition_scoped=True, scope_from_base=True,
                     sidecar=parts_sidecar)

    return _write


def forget_docs(
    spark,
    index_dir: str,
    doc_ids,
    id_col: str = "doc_id",
    pairs_dir: str | None = None,
    components_dir: str | None = None,
    keep_snapshots: int = 1,
    shards_dirs=None,
) -> dict[str, str]:
    """Right-to-be-forgotten sweep over the crawl loop's persisted
    state: remove every trace of ``doc_ids`` from the dedup index
    (shingle rows, bucket rows) and, when given, the pairs table and
    the maintained component labels — so a future delivery of an
    identical document can neither pair against nor be suppressed by a
    forgotten one. Returns ``{table: live snapshot after the sweep}``.

    ``keep_snapshots`` defaults to **1**, unlike every other io/merge
    mutation: retaining the pre-forget snapshot would retain the
    forgotten rows — on disk and readable via time travel — so the
    sweep rewinds retention to just the swept state. Raise it only
    when a separate retention job owns the purge.

    Scope and order of each delete (the order makes a crash at any
    point self-healing on re-run — see below):

    * **pairs** — both-endpoint anti-join written as ONE snapshot
      (two sequential key-deletes would leave a half-forgotten state
      between their commits).
    * **component labels** — forgetting a node can leave RETAINED
      nodes transitively merged through it (A—F, F—B: A and B share a
      component only because of forgotten F), so the sweep recomputes
      connectivity for every affected component from the retained
      pairs: survivors are re-labeled first (scoped MERGE), then the
      forgotten nodes and edge-less members are deleted. Partition
      values come from the LIVE table rows, never from caller config —
      a config mismatch would silently retain rows (this is the same
      reason the bucket path scans instead of re-deriving). NOTE,
      documented not hidden: a forgotten id may still persist as the
      LABEL VALUE of a surviving component when it was the minimum id;
      the value is a pseudonymous cluster id, not document content.
    * **shingles** — partition-scoped: ``_ps = pmod(hash(id), N)`` is
      a function of the key. The ids are CAST to the stored id type
      first (Murmur3 hashes int and long differently — an uncast
      Python int against an int32 table would scope to the wrong
      partition and silently retain rows).
    * **buckets** — ``_pb`` is a function of bucket CONTENTS, so the
      ids' rows are located with one pruned-column scan of the live
      table (id + ``_pb`` only); the delete rewrites exactly those
      partitions. Read O(index), write O(touched).

    Crash self-healing: pairs are swept first; component survivors are
    re-labeled BEFORE any label row is deleted, so a re-run after a
    crash still finds the forgotten ids in the labels table, recomputes
    the same repair, and completes the remaining deletes. Re-running a
    completed sweep is a no-op. Single-writer with respect to the
    streaming sink, like every io/merge mutation.

    ``shards_dirs``: carded training-shard exports
    (:func:`solar_logger_spark.io.export.export_training_shards`) the
    sweep must ALSO reach — without it, documents already shipped stay
    shipped. Each directory gets
    :func:`solar_logger_spark.io.export.forget_shards` with the same
    ids; requires the export's card ``id_col`` values to BE these doc
    ids (doc-keyed exports). For an export keyed on packed-sequence
    ids, map doc ids to sequence ids and call ``forget_shards``
    directly. Shard sweeps run LAST (after the index is clean), and
    their deleted-row counts land in the returned dict as
    ``shards:<dir>`` entries.

    A maintained ANN index over the same documents' embeddings is
    swept separately — ``ann_ingest.forget_vecs(spark, ann_dir, ids)``
    (vector ids ≡ doc ids in a doc-keyed embedding table); without it
    the forgotten documents keep surfacing as similarity neighbors.
    """
    from pyspark.sql import Row

    if not isinstance(doc_ids, DataFrame):
        doc_ids = list(doc_ids)
        if not doc_ids:
            out = {
                SHINGLES: M.current_snapshot(
                    os.path.join(index_dir, SHINGLES)
                ),
                BUCKETS: M.current_snapshot(
                    os.path.join(index_dir, BUCKETS)
                ),
            }
            return {k: v for k, v in out.items() if v is not None}
        doc_ids = spark.createDataFrame(
            [Row(**{id_col: v}) for v in doc_ids]
        )
    if components_dir is not None and pairs_dir is None:
        raise ValueError(
            "components repair needs the retained pairs: pass pairs_dir "
            "whenever components_dir is given"
        )

    n_parts = stored_partitions(index_dir)
    if n_parts is None:
        raise FileNotFoundError(
            f"no initialized dedup index at {index_dir}"
        )
    parts_sidecar = {PARTS_SIDECAR: str(n_parts)}
    sh_dir = os.path.join(index_dir, SHINGLES)
    bk_dir = os.path.join(index_dir, BUCKETS)
    out: dict[str, str] = {}

    # cast to the STORED id type before anything hashes or joins on it
    sh_live = M.read_table_snapshot(spark, sh_dir)
    id_type = sh_live.schema[id_col].dataType
    ids = (
        doc_ids.select(F.col(id_col).cast(id_type).alias(id_col))
        .distinct()
        .localCheckpoint()
    )

    # -- pairs: both endpoints, one commit --------------------------------
    if pairs_dir is not None and M.current_snapshot(pairs_dir) is not None:
        pr = M.read_table_snapshot(spark, pairs_dir)
        kept = pr.join(
            ids.select(F.col(id_col).alias("batch_id")),
            "batch_id", "left_anti",
        ).join(
            ids.select(F.col(id_col).alias("index_id")),
            "index_id", "left_anti",
        )
        out["pairs"] = M.replace_table(
            kept, pairs_dir, keep_snapshots=keep_snapshots
        )

    # -- component labels: repair then delete ------------------------------
    if (
        components_dir is not None
        and M.current_snapshot(components_dir) is not None
    ):
        from solar_logger_spark.operators import graph as G

        # carry the table's n_partitions pin through the repair
        # commits — a sweep that dropped the sidecar would disarm
        # incremental_components' mismatch guard on the NEXT delivery
        comp_stored = M.read_sidecar(components_dir, G.COMP_PARTS_SIDECAR)
        comp_sidecar = (
            {G.COMP_PARTS_SIDECAR: comp_stored}
            if comp_stored is not None else None
        )
        comp = M.read_table_snapshot(spark, components_dir)
        nodes = ids.select(F.col(id_col).alias("node"))
        affected = [
            r[0] for r in comp.join(nodes, "node", "left_semi")
            .select("component").distinct().collect()
        ]
        if affected:
            members = comp.filter(
                F.col("component").isin(affected)
            ).select("node", G.PC).localCheckpoint()
            retained_nodes = members.join(nodes, "node", "left_anti")
            if M.current_snapshot(pairs_dir) is not None:
                pr = M.read_table_snapshot(spark, pairs_dir)
                edges = (
                    pr.select("batch_id", "index_id")
                    .join(
                        retained_nodes.select(
                            F.col("node").alias("batch_id")
                        ),
                        "batch_id", "left_semi",
                    )
                    .join(
                        retained_nodes.select(
                            F.col("node").alias("index_id")
                        ),
                        "index_id", "left_semi",
                    )
                )
            else:
                # pairs table never initialized (the sink's crash
                # window on a first delivery commits components before
                # the pairs init): no retained edges exist, so every
                # affected member is edge-less — the sweep must still
                # run to completion and delete the index rows, not
                # abort with the forgotten ids retained
                edges = retained_nodes.select(
                    F.col("node").alias("batch_id"),
                    F.col("node").alias("index_id"),
                ).limit(0)
            relabeled = G.connected_components(
                edges.toDF("src", "dst")
            ).join(members, "node")
            # survivors first (crash here leaves the forgotten rows in
            # place, so a re-run repeats the repair)
            if relabeled.take(1):
                M.upsert(
                    spark, components_dir, relabeled, keys=["node"],
                    partition_by=[G.PC], partition_scoped=True,
                    keep_snapshots=keep_snapshots, sidecar=comp_sidecar,
                )
            dropped = members.join(
                relabeled.select("node"), "node", "left_anti"
            )
            out["components"] = M.delete_keys(
                spark, components_dir, dropped, keys=["node"],
                partition_by=[G.PC], partition_scoped=True,
                keep_snapshots=keep_snapshots, sidecar=comp_sidecar,
            )
        else:
            out["components"] = M.current_snapshot(components_dir)

    # -- shingles: scoped by the key-derived partition ----------------------
    sh_keys = ids.withColumn(PS, _shingle_part(id_col, n_parts))
    out[SHINGLES] = M.delete_keys(
        spark, sh_dir, sh_keys, keys=[id_col],
        partition_by=[PS], partition_scoped=True,
        keep_snapshots=keep_snapshots, sidecar=parts_sidecar,
    )

    # -- buckets: locate rows in the live table, then scoped delete --------
    if M.list_deltas(bk_dir):
        # delta-append mode: fold first (latest epoch per doc) so the
        # scoped snapshot delete below reaches EVERY row of the ids —
        # a delete that skipped delta rows would silently retain them.
        # O(index) on the rare compliance path, documented trade.
        M.compact_deltas(
            spark, bk_dir, keys=[id_col], partition_by=[PB],
            keep_snapshots=keep_snapshots, sidecar=parts_sidecar,
        )
    # privacy beats reader grace on this path: folded/stage delta
    # dirs are invisible to readers but their parquet BYTES persist —
    # exactly the silent-retention class this sweep exists to close
    M.purge_dead_deltas(bk_dir)
    bk_live = M.read_table_snapshot(spark, bk_dir)
    bk_keys = (
        bk_live.join(ids, id_col, "left_semi")
        .select(id_col, PB).distinct()
    )
    out[BUCKETS] = M.delete_keys(
        spark, bk_dir, bk_keys, keys=[id_col],
        partition_by=[PB], partition_scoped=True,
        keep_snapshots=keep_snapshots, sidecar=parts_sidecar,
    )

    # -- shipped training shards: the export-side completion ---------------
    if shards_dirs:
        from solar_logger_spark.io.export import forget_shards

        for sd in shards_dirs:
            res = forget_shards(spark, sd, ids)
            out[f"shards:{sd}"] = str(res["deleted_rows"])
    return out


def compact_index(
    spark,
    index_dir: str,
    keep_snapshots: int = 2,
    id_col: str = "doc_id",
) -> dict[str, str]:
    """File-count maintenance for the index artifacts: every
    partition-scoped merge and forget adds files to the partitions it
    rewrites, and after thousands of deliveries a hot partition pays
    per-file open/footer costs on every pruned read. For a SNAPSHOT
    store the safe compaction is simply a fresh coalesced snapshot —
    read the live table, cluster rows by the partition column so each
    hive partition lands in one task (one output file), and commit via
    ``replace_table``'s atomic pointer swap. No in-place rewrites, no
    reader absence window (contrast io/compaction.py's staged-rename
    dance for the NON-snapshot streaming sink dirs — the snapshot
    layout is what buys the simpler story here). Cost is O(index),
    the documented price of log-less COW maintenance; run it on the
    maintenance cadence, not per delivery. Sidecars (the partition-N
    pin) are re-committed with the new snapshot. Single-writer, like
    every io/merge mutation."""
    n_parts = stored_partitions(index_dir)
    if n_parts is None:
        raise FileNotFoundError(
            f"no initialized dedup index at {index_dir}"
        )
    parts_sidecar = {PARTS_SIDECAR: str(n_parts)}
    out: dict[str, str] = {}
    for table, pcol in ((SHINGLES, PS), (BUCKETS, PB)):
        tdir = os.path.join(index_dir, table)
        if M.list_deltas(tdir):
            # ONE commit does both maintenance jobs: fold the delta
            # appends (latest epoch per doc — a replayed or
            # re-delivered doc's superseded rows drop out) AND cluster
            # by the partition column so the new base lands one file
            # per hive partition. No second O(index) rewrite.
            out[table] = M.compact_deltas(
                spark, tdir, keys=[id_col], partition_by=[pcol],
                keep_snapshots=keep_snapshots,
                repartition=(n_parts, pcol), sidecar=parts_sidecar,
            )
            continue
        live = M.read_table_snapshot(spark, tdir)
        out[table] = M.replace_table(
            live.repartition(n_parts, pcol), tdir,
            keep_snapshots=keep_snapshots,
            partition_by=[pcol], sidecar=parts_sidecar,
        )
    return out
