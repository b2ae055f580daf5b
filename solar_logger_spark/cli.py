"""Command-line entry points — twins of the reference's runnable files.

The reference ships two top-level scripts: ``start_query.py`` (→
``src/app/influx_query.py:115-126``, interactive query runner with an
example Flux pipeline) and ``start_logger.py`` (→
``src/app/solar_main.py``, the MQTT→store ingest service). This module
provides the same two operations, plus the startup health check the
reference performs before a session, as ``python -m solar_logger_spark``
subcommands::

    python -m solar_logger_spark query --sf-dir /root/testdata/sf0.001
    python -m solar_logger_spark query --sf-dir DIR \
        --flux 'from(bucket: "b") |> range(start: -5m)' --mode csv
    python -m solar_logger_spark query --sf-dir DIR --config config.ini
    python -m solar_logger_spark sql --sf-dir DIR "SELECT count(*) FROM events"
    python -m solar_logger_spark logger --input DIR --store DIR --timeout 30
    python -m solar_logger_spark health

``query`` with no ``--flux`` runs the reference's example pipeline shape
(``influx_query.py:88-100``: range + measurement filter bands) against
the events table.

Beyond-reference operations (the LLM-pipeline compliance surface)::

    python -m solar_logger_spark forget --index-dir IDX --ids 3,17 \
        --pairs-dir P --components-dir C --shards-dir SHARDS \
        --ann-dir ANN
    python -m solar_logger_spark verify-shards SHARDS

``forget`` drives ``streaming.dedup_ingest.forget_docs`` — the full
sweep across index artifacts, pairs, CC labels, and shipped training
shards — plus ``ann_ingest.forget_vecs`` for each ``--ann-dir``
maintained ANN index (without it, forgotten documents keep surfacing
as similarity neighbors); ``verify-shards`` is the consumer-side card
audit (exit code 1 on mismatch).
"""

from __future__ import annotations

import argparse
import sys


# The reference's run_example() query, re-expressed for the events table
# (its _measurement filter bands become event_type bands).
EXAMPLE_FLUX = (
    'from(bucket: "events") |> range(start: 2024-01-05T00:00:00Z) '
    '|> filter(fn: (r) => r["event_type"] == "click" or '
    'r["event_type"] == "view")'
)


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="solar_logger_spark",
        description="PySpark-native solar-logger engine entry points",
    )
    sub = p.add_subparsers(dest="command", required=True)

    q = sub.add_parser("query", help="run a Flux query (start_query.py twin)")
    q.add_argument("--sf-dir", required=True, help="parquet table directory")
    q.add_argument("--table", default="events", help="source table name")
    q.add_argument("--flux", default=None, help="Flux query text (default: example)")
    q.add_argument(
        "--mode",
        default=None,
        choices=("csv", "flux", "stream"),
        help="result mode (reference S6; default: config query_mode, else flux)",
    )
    q.add_argument(
        "--config",
        default=None,
        help="reference-format config.ini — reads [query_settings] "
             "query_mode/csv_location/csv_name/csv_mode "
             "(src/helpers/py_functions.py compatibility shim)",
    )
    q.add_argument("--out", default=None, help="write result CSV to this path")
    q.add_argument("--limit", type=int, default=20, help="max rows to print")

    s = sub.add_parser("sql", help="run ANSI SQL over the registered tables")
    s.add_argument("--sf-dir", required=True)
    s.add_argument("statement", help="SQL text")
    s.add_argument("--limit", type=int, default=20)

    lg = sub.add_parser(
        "logger", help="run the streaming ingest ETL (start_logger.py twin)"
    )
    lg.add_argument("--input", required=True, help="raw message directory")
    lg.add_argument("--store", required=True, help="point-store output directory")
    lg.add_argument("--checkpoint", default=None)
    lg.add_argument(
        "--no-gate",
        action="store_true",
        help="skip the online-status gate (reference P7)",
    )
    lg.add_argument(
        "--timeout",
        type=float,
        default=None,
        help="stop the stream after N seconds (default: run until signal)",
    )

    sub.add_parser("health", help="engine health check (reference S7)")

    fg = sub.add_parser(
        "forget",
        help="right-to-be-forgotten sweep over the crawl-loop state "
             "and (optionally) shipped training shards",
    )
    fg.add_argument("--index-dir", required=True,
                    help="dedup index root (shingles/ + buckets/)")
    fg.add_argument("--ids", required=True,
                    help="comma-separated document ids to forget")
    fg.add_argument("--pairs-dir", default=None)
    fg.add_argument("--components-dir", default=None)
    fg.add_argument("--shards-dir", action="append", default=[],
                    help="carded shard export to sweep too (repeatable)")
    fg.add_argument("--ann-dir", action="append", default=[],
                    help="maintained ANN index to sweep too "
                         "(streaming.ann_ingest.forget_vecs; repeatable)")
    fg.add_argument("--allow-model-residue", action="store_true",
                    help="proceed even when an id seeded an ANN "
                         "index's model (residue reported, not removed"
                         " — recenter is the complete remedy)")
    fg.add_argument("--id-type", default="long",
                    choices=("long", "str"),
                    help="python type of the ids (default long)")

    vs = sub.add_parser(
        "verify-shards",
        help="consumer-side audit of a carded shard export",
    )
    vs.add_argument("shards_dir")
    return p


def _get_spark():
    from solar_logger_spark.session import get_spark

    return get_spark(app_name="solar-logger-cli")


def _cmd_query(args) -> int:
    from solar_logger_spark.engine import SolarEngine
    from solar_logger_spark.io.results import csv_lines, write_results_to_csv

    file_settings = None
    if args.config:
        from solar_logger_spark.config import read_query_settings

        file_settings = read_query_settings(args.config)
    # precedence: explicit --mode flag > config.ini query_mode > flux
    mode = args.mode or (file_settings.query_mode if file_settings else "flux")

    engine = SolarEngine(_get_spark())
    flux = args.flux or EXAMPLE_FLUX
    builder = engine.query_flux(flux, args.table, args.sf_dir)
    df = builder.to_df()
    if args.out:
        write_results_to_csv(df, args.out)
        print(f"wrote {args.out}")
        return 0
    # csv + config ⇒ the reference's file sink. Binds when the mode came
    # from the config itself (then a missing csv_location is a named
    # fail-fast error, like every other missing setting) or when the
    # config carries a destination; an explicit --mode csv against a
    # destination-less config falls through to stdout.
    use_file_sink = (
        mode == "csv"
        and file_settings is not None
        and (args.mode is None or file_settings.csv_location is not None)
    )
    if use_file_sink:
        # reference behavior (py_functions.write_results_to_csv:13-35):
        # csv mode + config ⇒ one local file at csv_location + csv_name,
        # honoring csv_mode ('w' overwrite / 'a' append), creating the
        # directory. Driver-side on purpose — this is the reference's
        # interactive small-result path; the distributed sink stays
        # write_results_to_csv (--out).
        import os

        path = file_settings.csv_path()
        loc = file_settings.csv_location
        if loc and not os.path.exists(loc):
            os.makedirs(loc)
        lines = csv_lines(df.limit(args.limit))
        with open(path, file_settings.csv_mode) as fh:
            fh.write("\n".join(lines) + "\n")
        print(f"wrote {path}")
        return 0
    result = engine.execute(df.limit(args.limit), mode)
    if mode == "csv":
        for line in result:
            print(line)
    else:  # flux (list of dicts) or stream (lazy iterator)
        for rec in result:
            print(rec)
    return 0


def _cmd_sql(args) -> int:
    from solar_logger_spark.engine import SolarEngine

    engine = SolarEngine(_get_spark())
    engine.register(args.sf_dir)
    engine.sql(args.statement).show(args.limit, truncate=False)
    return 0


def _cmd_logger(args) -> int:
    from solar_logger_spark.engine import SolarEngine

    engine = SolarEngine(_get_spark(), store_dir=args.store)
    query = engine.ingest(
        args.input,
        checkpoint_dir=args.checkpoint,
        gate_online=not args.no_gate,
    )
    print(f"ingest stream started: {query.name or query.id}")
    try:
        if args.timeout is not None:
            query.awaitTermination(args.timeout)
            query.stop()
        else:
            query.awaitTermination()
    except KeyboardInterrupt:
        # the reference's SIGINT handler drains and stops its threads
        # (solar_main.py sigint_handler); stop() checkpoints and exits
        print("received interrupt, stopping ingest", file=sys.stderr)
        query.stop()
    return 0


def _cmd_health(args) -> int:
    from solar_logger_spark.io.results import health_check

    ok = health_check(_get_spark())
    print("healthy" if ok else "unhealthy")
    return 0 if ok else 1


def _cmd_forget(args) -> int:
    import json

    from solar_logger_spark.streaming.dedup_ingest import forget_docs

    conv = int if args.id_type == "long" else str
    ids = [conv(x) for x in args.ids.split(",") if x != ""]
    if not ids:
        print("no ids given", file=sys.stderr)
        return 2
    spark = _get_spark()
    out = forget_docs(
        spark, args.index_dir, ids,
        pairs_dir=args.pairs_dir,
        components_dir=args.components_dir,
        shards_dirs=args.shards_dir or None,
    )
    rc = 0
    for ann_dir in args.ann_dir:
        from solar_logger_spark.streaming.ann_ingest import forget_vecs

        try:
            out[f"ann:{ann_dir}"] = forget_vecs(
                spark, ann_dir, ids,
                allow_model_residue=args.allow_model_residue,
            )
        except (ValueError, FileNotFoundError) as exc:
            # a refused/missing ANN sweep must not swallow the already-
            # completed sweeps' compliance evidence, nor skip the
            # remaining --ann-dir targets: record, continue, exit 1
            out[f"ann:{ann_dir}"] = {"error": str(exc)}
            rc = 1
    print(json.dumps(out, indent=1, sort_keys=True))
    return rc


def _cmd_verify_shards(args) -> int:
    import json

    from solar_logger_spark.io.export import verify_shards

    res = verify_shards(_get_spark(), args.shards_dir)
    print(json.dumps(res, sort_keys=True))
    return 0 if res["ok"] else 1


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    return {
        "query": _cmd_query,
        "sql": _cmd_sql,
        "logger": _cmd_logger,
        "health": _cmd_health,
        "forget": _cmd_forget,
        "verify-shards": _cmd_verify_shards,
    }[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
