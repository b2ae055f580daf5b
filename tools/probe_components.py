#!/usr/bin/env python
"""Per-delivery latency growth probe for incremental connected
components: apply the SAME 500-edge delivery to label tables of
50k / 200k / 500k nodes and measure the update wall time — evidence
that the contracted-graph + partition-scoped-merge design keeps
per-delivery cost bounded by the delivery (plus the honest relabel
scan on merges), not by the accumulated graph.

The label tables are synthesized directly (pairs of consecutive ids
share a component — realistic small-cluster shape); the delivery
touches a fixed window of nodes, so measured work differs only by
table size. Writes a markdown table to stdout.

Usage: python tools/probe_components.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = os.path.join(REPO, ".probe", "components_probe")

SIZES = [50_000, 200_000, 500_000]
DELIVERY_EDGES = 500
REPS = 3


def main() -> int:
    from pyspark.sql import functions as F

    from solar_logger_spark.io import merge as M
    from solar_logger_spark.operators.graph import incremental_components
    from solar_logger_spark.session import get_spark

    spark = get_spark(app_name="components-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n_nodes in SIZES:
        d = os.path.join(WORK, f"n{n_nodes}")
        shutil.rmtree(d, ignore_errors=True)
        # synthesize labels: node 2k and 2k+1 share component 2k
        base = spark.range(n_nodes).select(
            F.col("id").alias("node"),
            (F.col("id") - F.col("id") % 2).alias("component"),
            F.pmod(F.hash(F.col("id")), F.lit(32)).alias("_pc"),
        )
        M.init_table(base, d, partition_by=["_pc"])
        # the delivery merges consecutive even components in a fixed
        # window — same edges at every size
        edges = spark.range(DELIVERY_EDGES).select(
            (F.col("id") * 4).alias("src"),
            (F.col("id") * 4 + 2).alias("dst"),
        ).localCheckpoint()
        times = []
        for _rep in range(REPS):
            t0 = time.perf_counter()
            incremental_components(spark, d, edges)
            times.append(time.perf_counter() - t0)
        # rep 0 merges components (relabel scan + scoped rewrite);
        # later reps replay an already-applied delivery (no merges) —
        # the two paths have different costs, report both
        rows.append((n_nodes, times[0], min(times[1:])))
        print(
            f"# n={n_nodes}: merge={times[0]:.2f}s "
            f"replay={min(times[1:]):.2f}s",
            file=sys.stderr,
        )

    print("| label-table nodes | merging delivery (s) |"
          " no-merge replay (s) |")
    print("|---|---|---|")
    for n_nodes, tm, tr in rows:
        print(f"| {n_nodes:,} | {tm:.2f} | {tr:.2f} |")
    print(
        f"\n10x table growth -> merging {rows[-1][1] / rows[0][1]:.2f}x,"
        f" replay {rows[-1][2] / rows[0][2]:.2f}x"
        f" (same {DELIVERY_EDGES}-edge delivery)"
    )
    shutil.rmtree(WORK, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
