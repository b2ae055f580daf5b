#!/usr/bin/env python
"""Per-delivery latency growth probe for the streaming dedup loop
(VERDICT r6 #5): replay a FIXED batch against an index grown
1x / 4x / 10x and measure, separately,

- the pair-check phase (partition-pruned index reads + bipartite
  candidate join + exact verification — the part the r7 partitioned
  artifact layout is supposed to keep flat-ish in index size), and
- the full delivery (pair check + pairs upsert + the copy-on-write
  artifact merge — the merge is O(index) by design in a log-less COW
  store, so the total is expected to grow with the index; the honest
  split is the point of this probe).

Corpus: .probe/sf1 documents (50k docs — tools/make_probe_sf.py).
Index sizes 4k / 16k / 40k docs; the probed batch is the SAME 500
docs each time (ids disjoint from every index), so measured work
differs only by index size. Writes a markdown table to stdout
(redirect into SCALING.md).

Usage: python tools/probe_dedup_ingest.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DOCS = os.path.join(REPO, ".probe", "sf1", "documents.parquet")
WORK = os.path.join(REPO, ".probe", "dedup_ingest_probe")

BATCH = 500
BASE = 4_000
SCALES = [1, 4, 10]
REPS = 3


def main() -> int:
    if not os.path.exists(SF1_DOCS):
        raise SystemExit("run tools/make_probe_sf.py first")

    from pyspark.sql import functions as F

    from solar_logger_spark.session import get_spark
    from solar_logger_spark.streaming import dedup_ingest as DI

    spark = get_spark(app_name="dedup-ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(SF1_DOCS).select("doc_id", "text")
    batch_df = docs.filter(F.col("doc_id") < BATCH).localCheckpoint()

    rows = []
    for scale in SCALES:
        n_index = BASE * scale
        work = os.path.join(WORK, f"x{scale}")
        shutil.rmtree(work, ignore_errors=True)
        index_dir = os.path.join(work, "index")
        pairs_dir = os.path.join(work, "pairs")
        sink = DI.incremental_dedup_sink(index_dir, pairs_dir)
        index_docs = docs.filter(
            (F.col("doc_id") >= BATCH) & (F.col("doc_id") < BATCH + n_index)
        )
        sink(index_docs, 0)  # bootstrap: index artifacts persisted
        sh_b, bk_b = DI.batch_artifacts(batch_df)

        pair_t, total_t, n_pairs = [], [], 0
        for rep in range(REPS):
            t0 = time.perf_counter()
            n_pairs = DI.pair_batch_against_index(
                spark, index_dir, sh_b, bk_b
            ).count()
            pair_t.append(time.perf_counter() - t0)
        for rep in range(REPS):
            # replay the same delivery: the merge replaces the batch's
            # own rows each time, so index size stays n_index + BATCH
            t0 = time.perf_counter()
            sink(batch_df, 1)
            total_t.append(time.perf_counter() - t0)
        rows.append(
            (scale, n_index, min(pair_t), min(total_t), n_pairs)
        )
        print(
            f"# x{scale}: index={n_index} docs, "
            f"pair-check={min(pair_t):.2f}s, delivery={min(total_t):.2f}s, "
            f"pairs={n_pairs}",
            file=sys.stderr,
        )

    print("| index scale | index docs | pair-check (s) | full delivery (s) |"
          " pairs found |")
    print("|---|---|---|---|---|")
    for scale, n_index, p, t, np_ in rows:
        print(f"| {scale}x | {n_index:,} | {p:.2f} | {t:.2f} | {np_} |")
    p1, p10 = rows[0][2], rows[-1][2]
    t1, t10 = rows[0][3], rows[-1][3]
    print(
        f"\npair-check growth on the 10x decade: {p10 / p1:.2f}x; "
        f"full delivery (includes the O(index) COW merge): "
        f"{t10 / t1:.2f}x"
    )
    shutil.rmtree(WORK, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
