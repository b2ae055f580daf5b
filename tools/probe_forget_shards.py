#!/usr/bin/env python
"""Growth probe for the export-side forget sweep (round-8 headline):
forget a FIXED 20-id set from a carded shard export at 1x (10k rows)
and 10x (100k rows). The deterministic id->shard assignment means cost
should track the AFFECTED SHARDS' bytes, not the dataset: with
n_shards=64 and 20 ids, <=20 of 64 shards rewrite at either scale, so
the per-shard rewrite grows ~10x while untouched shards cost zero.
Writes a markdown table to stdout (redirect into SCALING.md).

Usage: python tools/probe_forget_shards.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.path.join(REPO, ".probe", "forget_shards_probe")


def main() -> int:
    from pyspark.sql import functions as F

    from solar_logger_spark.io import export as E
    from solar_logger_spark.session import get_spark

    spark = get_spark(app_name="probe-forget-shards")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.isdir(WORK):
        shutil.rmtree(WORK)
    os.makedirs(WORK)

    print("| scale | rows | affected shards | forget (s) | verify ok |")
    print("|---|---|---|---|---|")
    for label, n_rows in (("1x", 10_000), ("10x", 100_000)):
        df = (
            spark.range(n_rows)
            .select(
                F.col("id").alias("seq_id"),
                F.concat(F.lit("text payload "),
                         F.col("id").cast("string")).alias("text"),
                (F.col("id") % 37 + 5).alias("n_tokens"),
            )
        )
        out = os.path.join(WORK, label)
        E.export_training_shards(df, out, n_shards=64)
        gone = list(range(0, 2_000, 100))  # fixed 20-id forget set
        best = 1e18
        # one timed run (forget mutates; re-create per rep is the cost
        # of min-of-N — 2 reps on fresh exports)
        for rep in range(2):
            out_r = f"{out}-rep{rep}"
            E.export_training_shards(df, out_r, n_shards=64)
            t0 = time.time()
            res = E.forget_shards(spark, out_r, gone)
            best = min(best, time.time() - t0)
            assert res["deleted_rows"] == len(gone)
        ok = E.verify_shards(spark, out_r)["ok"]
        print(f"| {label} | {n_rows:,} | {len(res['affected_shards'])} "
              f"| {best:.2f} | {ok} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
