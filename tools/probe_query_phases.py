#!/usr/bin/env python
"""Split a query's wall time into BUILD (driver-side plan construction,
incl. any training collects the builder runs) and EXEC (the noop save).

Usage::

    python tools/probe_query_phases.py [sf_dir] query [query ...]

Prints per-rep build/exec seconds plus min-of-reps, after one untimed
warmup rep of the first query (JVM/codegen/worker-pool warmup, same
discipline as bench.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from solar_logger_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    reps = int(os.environ.get("PROBE_REPS", "3"))

    spark = get_spark(app_name="probe-query-phases")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()

    # session warmup (bench.py discipline)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    for name in args:
        fn = qmap[name]
        # one untimed warmup rep
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best_b = best_e = best_t = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            b, e = t1 - t0, t2 - t1
            best_b, best_e = min(best_b, b), min(best_e, e)
            best_t = min(best_t, t2 - t0)
            print(f"{name} rep{i}: build={b:.3f}s exec={e:.3f}s "
                  f"total={t2-t0:.3f}s", flush=True)
        print(f"{name} BEST: build={best_b:.3f}s exec={best_e:.3f}s "
              f"min_total={best_t:.3f}s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
