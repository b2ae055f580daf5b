#!/usr/bin/env python
"""Scaling probe: run representative queries at every available scale
factor and report steady-state runtimes + the observed scaling exponent.

The point is evidence for the 100 TB question: a plan whose runtime
grows like O(rows) (exponent ~1 on the sf0.01 → sf0.1 step, i.e. 10×
data → ~10× time, usually much less here because fixed overheads still
dominate at these sizes) keeps working when the cluster and the data
both grow 1000×; an exponent ≫ 1 marks a quadratic-ish plan that will
not. Writes a markdown table to stdout (redirect into SCALING.md).

Usage: python tools/scale_probe.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
DEFAULT_QUERIES = [
    "tpch_q1_pricing_summary",      # full-scan agg
    "tpch_q3_shipping_priority",    # join + top-k
    "tpch_q9_product_profit",       # 6-table star join
    "tpch_q13_order_distribution",  # left join + double agg
    "flux_pipeline_full",           # range+filter+window+sort
    "packet_decode_points",         # pandas-UDF decode + unpivot
    "window_running_totals",        # analytic windows
    "dedup_minhash_lsh_docs",       # shingle/LSH/verify
    "dedup_simhash_docs",           # row-wise bit votes
    "similarity_cosine_topk",       # broadcast brute-force scorer
    "sessionize_events",            # session windows
]


def main() -> int:
    argv = list(sys.argv[1:])
    dirs = list(SFS)
    if "--with-sf1" in argv:
        # synthetic sf1-scale documents/embeddings (tools/make_probe_sf.py)
        # extends the growth table a decade for the dedup/ANN family
        argv.remove("--with-sf1")
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sf1 = os.path.join(repo, ".probe", "sf1")
        if not os.path.exists(os.path.join(sf1, "documents.parquet")):
            raise SystemExit("run tools/make_probe_sf.py first")
        dirs.append(sf1)
    names = argv or DEFAULT_QUERIES

    import __spark_entry__ as entry_mod
    from solar_logger_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entry_mod.queries()

    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qmap[name]
        results[name] = {}
        for sf_dir in dirs:
            best = math.inf
            for _ in range(3):  # min-of-3: steady state, planning warm
                t0 = time.time()
                # noop sink (same as bench.py): materializes EVERY
                # column — .count() would let Catalyst prune the
                # projections of map-only queries and time just the scan
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            results[name][sf_dir] = best

    labels = [os.path.basename(d.rstrip("/")) for d in dirs]
    print("| query | " + " | ".join(labels) + " | last 10x-data time ratio |")
    print("|---|" + "---|" * (len(dirs) + 1))
    for name, times in results.items():
        ts = [times[d] for d in dirs]
        ratio = ts[-1] / ts[-2] if ts[-2] > 0 else float("nan")
        cells = " | ".join(f"{t:.2f}s" for t in ts)
        print(f"| {name} | {cells} | {ratio:.2f}x |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
