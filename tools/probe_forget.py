#!/usr/bin/env python
"""Growth probe for the right-to-be-forgotten sweep: forget the SAME
20-document batch from dedup indexes built over 500 / 5k / 50k
documents (sf0.01, sf0.1, .probe/sf1) and time forget_docs.

Design expectation: the shingle delete is partition-scoped (touched
partitions only — flat in index size at fixed N), the bucket delete is
one pruned-column full scan to locate rows + a scoped rewrite (read
grows with the index, write doesn't). Writes a markdown table row set
for SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solar_logger_spark.io.tables import load_table  # noqa: E402
from solar_logger_spark.streaming import dedup_ingest as DI  # noqa: E402


def main() -> int:
    import shutil
    import tempfile

    from solar_logger_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dirs = [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.path.join(repo, ".probe", "sf1"),
    ]
    spark = get_spark(app_name="probe-forget")
    spark.sparkContext.setLogLevel("ERROR")

    print("| index docs | build (s) | forget 20 ids (s) | re-forget (s) |")
    print("|---|---|---|---|")
    for sf in sf_dirs:
        docs = load_table(spark, sf, "documents")
        n = docs.count()
        work = tempfile.mkdtemp(prefix="forget_probe_")
        try:
            idx = os.path.join(work, "idx")
            pairs = os.path.join(work, "pairs")
            sink = DI.incremental_dedup_sink(
                idx, pairs, index_partitions=32
            )
            # TWO deliveries: the first bootstraps the index and
            # returns before pairs init — a one-delivery build would
            # leave no pairs table and the probe would silently skip
            # the pairs delete it claims to measure
            half = docs.filter("doc_id % 2 = 0").localCheckpoint()
            rest = docs.filter("doc_id % 2 = 1").localCheckpoint()
            t0 = time.time()
            sink(half, 0)
            sink(rest, 1)
            build = time.time() - t0
            ids = [r[0] for r in docs.select("doc_id").limit(20).collect()]
            t0 = time.time()
            DI.forget_docs(spark, idx, ids, pairs_dir=pairs)
            t_forget = time.time() - t0
            t0 = time.time()
            DI.forget_docs(spark, idx, ids, pairs_dir=pairs)
            t_again = time.time() - t0
            print(
                f"| {n} | {build:.2f}s | {t_forget:.2f}s | {t_again:.2f}s |"
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
