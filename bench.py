#!/usr/bin/env python
"""Benchmark harness — driver contract.

Runs every query declared in ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall-clock seconds across all queries (each timed to
full materialization via a count action over the result DataFrame).
Per-query seconds land in ``queries``. Noise from Spark's own stderr is
kept off stdout so the driver can parse the single line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Machine-state snapshot BEFORE the session spins up: a loadavg far
    # above idle means something (a sweep, pytest) is still competing
    # for the 32 cores and the total will read slow through no fault of
    # the code under test.
    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        load1 = load5 = -1.0

    from solar_logger_spark.session import get_spark

    spark = get_spark(app_name="solar-logger-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()

    # Warm the JVM/codegen/parquet-footer caches so the first timed query
    # isn't charged session startup (a cluster service pays this once).
    from solar_logger_spark.io.tables import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, sf_dir, "events").limit(1000).count()
    # ...and the Python/Arrow worker pool: the first Pandas-UDF query
    # otherwise pays a ~7 s one-time worker spawn (measured on
    # packet_decode_points, SCALING round-10 batch two) that belongs to
    # session startup, not to whichever query reaches it first.
    spark.range(10_000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # Calibration canary: a pinned, data-independent, pure-CPU Spark job
    # timed before the registry. Cross-round totals can be deflated by
    # the canary ratio to separate ambient machine drift from real code
    # regressions (round-9 lesson: raw totals moved 1.2-1.3x between
    # runs on untouched code). min-of-2, same discipline as the queries.
    # (double-cast: a long sum of id*id overflows at this range, which
    # under the engine session's ANSI mode is a hard error)
    def _canary() -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            spark.range(500_000_000).selectExpr(
                "sum(CAST(id AS DOUBLE) * id) AS s"
            ).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    canary = _canary()

    # Ambient guard (r12; the BENCH_r11 lesson): that record went into
    # the permanent history at canary 0.624 s / loadavg 9 and read as a
    # fake 1.23x regression. If the start looks busy — canary beyond
    # ~1.5x the best committed quiet canary (0.244 s, BENCH_r10/r11
    # quiet runs), or a loaded machine — sleep once, re-measure, and
    # flag the record either way so bench_compare and any later reader
    # can discount mechanically instead of forensically.
    REF_CANARY = 0.28  # best committed quiet-run canary band
    ambient_flag = "clean"
    if canary > 1.5 * REF_CANARY or load1 > 4.0:
        time.sleep(30)
        canary = min(canary, _canary())
        try:
            load1 = os.getloadavg()[0]
        except OSError:
            pass
        ambient_flag = (
            "busy_retried_clean"
            if canary <= 1.5 * REF_CANARY
            else "busy"
        )

    # Two passes, min per query: pass 1 absorbs per-plan codegen/JIT
    # compilation (a long-lived cluster service pays that once, not per
    # query); min-of-2 is the steady-state number and kills most
    # run-to-run scheduler noise. Reported via "passes" for honesty.
    PASSES = 2
    per_query: dict[str, float] = {}
    failed: set[str] = set()
    for _ in range(PASSES):
        for name, fn in qmap.items():
            if name in failed:
                continue
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                # Materialize fully (all partitions, all expressions)
                # without paying driver-side collect serialization.
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # keep the bench line parseable
                print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
                per_query[name] = -1.0
                failed.add(name)
                continue
            dt = time.perf_counter() - t0
            prev = per_query.get(name)
            per_query[name] = round(dt if prev is None else min(prev, dt), 3)

    total = sum(v for v in per_query.values() if v >= 0)
    # Ascending by time: the driver keeps only a 2000-char tail of this
    # line, so the slowest (most informative) queries must print last —
    # and failures (-1.0) must sort to the very end, not the truncated
    # head, or a failed query would vanish from the kept record.
    per_query = dict(
        sorted(
            per_query.items(),
            key=lambda kv: kv[1] if kv[1] >= 0 else float("inf"),
        )
    )
    result = {
        "metric": "total_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "passes": PASSES,
        "timing": "min_per_query",
        "queries": per_query,
        # Re-stated AFTER the queries map: the driver keeps only a
        # 2000-char tail of this line, so the leading "value" total is
        # truncated away every round. These trailing keys keep the
        # committed record self-describing.
        "total": round(total, 3),
        "n_queries": len(per_query),
        "n_failed": len(failed),
        # Run-context record (round-10): lets any later reader deflate
        # this total by measured ambient drift instead of guessing.
        "canary_sec": round(canary, 3),
        # "clean" | "busy_retried_clean" | "busy" — a "busy" record's
        # total is ambient-contaminated and should be read only
        # through bench_compare's deflation
        "ambient_flag": ambient_flag,
        "loadavg_1m": round(load1, 2),
        "loadavg_5m": round(load5, 2),
        "preceded_by": os.environ.get("SPARK_GRAFT_BENCH_CONTEXT", "unspecified"),
        "sf": _sf_of(sf_dir),
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
