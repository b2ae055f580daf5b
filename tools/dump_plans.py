#!/usr/bin/env python
"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> [query ...]

With no query names, dumps every declared query. Writes
``<out_dir>/<query>_<suffix>.txt`` — the round-12 deliverable layout
(``plans/r12/<query>_before.txt`` / ``..._after.txt``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from solar_logger_spark.session import get_spark

    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    if not names:
        names = list(qmap)
    for name in names:
        if name not in qmap:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = qmap[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
