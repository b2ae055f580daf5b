#!/usr/bin/env python
"""Delta-log read fan-in probe: per-delivery pair-check latency as a
function of the number of UNFOLDED bucket deltas — the measurement
that sizes the compaction cadence. Builds a 4k-doc index, appends K
one-batch deltas (50 docs each), then times the pair check of a fixed
500-doc probe batch at K = 0 / 10 / 30.

Usage: python tools/probe_delta_fanin.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DOCS = os.path.join(REPO, ".probe", "sf1", "documents.parquet")
WORK = os.path.join(REPO, ".probe", "delta_fanin_probe")


def main() -> int:
    if not os.path.exists(SF1_DOCS):
        raise SystemExit("run tools/make_probe_sf.py first")

    from pyspark.sql import functions as F

    from solar_logger_spark.io.tables import read_parquet
    from solar_logger_spark.session import get_spark
    from solar_logger_spark.streaming import dedup_ingest as DI

    spark = get_spark(app_name="probe-delta-fanin")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_parquet(spark, SF1_DOCS).select("doc_id", "text")
    if os.path.isdir(WORK):
        shutil.rmtree(WORK)
    idx = os.path.join(WORK, "idx")
    pairs = os.path.join(WORK, "pairs")
    sink = DI.incremental_dedup_sink(idx, pairs, index_partitions=32)

    base = docs.filter(F.col("doc_id") < 4_000).localCheckpoint()
    sink(base, 0)  # bootstrap: the base snapshot

    probe = docs.filter(
        (F.col("doc_id") >= 40_000) & (F.col("doc_id") < 40_500)
    ).localCheckpoint()
    sh_b, bk_b = DI.batch_artifacts(probe, index_partitions=32)

    def timed_check():
        best = 1e18
        for _ in range(3):
            t0 = time.time()
            DI.pair_batch_against_index(
                spark, idx, sh_b, bk_b, index_partitions=32
            ).count()
            best = min(best, time.time() - t0)
        return best

    print("| unfolded deltas | pair-check (s) |")
    print("|---|---|")
    appended = 0
    for target in (0, 10, 30):
        while appended < target:
            lo = 10_000 + appended * 50
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 50)
            )
            sink(batch, appended + 1)
            appended += 1
        print(f"| {target} | {timed_check():.2f} |")

    # and the post-compaction baseline at the same logical contents
    DI.compact_index(spark, idx)
    print(f"| 0 (post-compaction, same contents) | {timed_check():.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
