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
the bipartite bucket join, i.e. O(batch + matching buckets) however
large the accumulated corpus grows. That is the whole point of the
bipartite design at 100 TB: the crawl index's signatures are artifacts,
not a per-run computation. (Reference scope: the reference has no
dedup/streaming-analytics surface at all — MQTT->InfluxDB client,
``src/classes/py_functions.py`` — this is the beyond-reference
LLM-pipeline family.)

Replay/idempotency contract (foreachBatch may re-run a batch after a
crash): the current batch's own ids are anti-joined OUT of the index
side before pairing, so a half-committed previous attempt (index
updated, pairs not) cannot make the replay see its own documents in
the index and emit self- or within-batch pairs; the pairs table is
MERGE-upserted by (batch_id, index_id) so rewrites are idempotent; and
the index artifact upsert is keyed by document id (replace-per-doc),
so re-merging a delivery is a no-op. Within-delivery duplicates are
deliberately out of scope here — run the self-join family
(``minhash_lsh_pairs``) on the delivery itself if needed; this sink is
the batch-vs-corpus check.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from solar_logger_spark.io import merge as M
from solar_logger_spark.operators import dedup as D

SHINGLES = "shingles"
BUCKETS = "buckets"


def read_index(spark, index_dir: str) -> tuple[DataFrame, DataFrame]:
    """The live (shingles, buckets) artifact frames, or raises
    FileNotFoundError when the index has never been initialized."""
    return (
        M.read_table_snapshot(spark, os.path.join(index_dir, SHINGLES)),
        M.read_table_snapshot(spark, os.path.join(index_dir, BUCKETS)),
    )


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
):
    """``foreachBatch`` function: near-dup-check each micro-batch of
    documents against the persisted index, append verified pairs, then
    merge the batch's artifacts into the index.

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
        # one pass over the delivery builds both artifact frames; they
        # feed the pair check AND the index merge, so cut lineage once
        # (blocks are freed by the context cleaner when the batch's
        # RDDs go out of scope — the graph.py pattern)
        sh_b, bk_b = D.index_artifacts(
            batch_df, id_col, text_col, n, num_hashes, bands
        )
        sh_b = sh_b.localCheckpoint()
        bk_b = bk_b.localCheckpoint()
        if M.current_snapshot(sh_dir) is None:
            # first delivery bootstraps the index; nothing to pair
            M.init_table(sh_b, sh_dir)
            M.init_table(bk_b, bk_dir)
            return
        sh_i, bk_i = read_index(spark, index_dir)
        # replay guard: a previous half-committed attempt may have
        # already merged this delivery — never pair the batch against
        # its own documents
        batch_ids = sh_b.select(id_col).distinct()
        sh_i = sh_i.join(batch_ids, id_col, "left_anti")
        bk_i = bk_i.join(batch_ids, id_col, "left_anti")
        pairs = D.incremental_pairs_from_artifacts(
            sh_i, bk_i, sh_b, bk_b, id_col=id_col, threshold=threshold
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
        # swapped for the fresh ones
        M.upsert(spark, sh_dir, sh_b, keys=[id_col],
                 keep_snapshots=keep_snapshots)
        M.upsert(spark, bk_dir, bk_b, keys=[id_col],
                 keep_snapshots=keep_snapshots)

    return _write
