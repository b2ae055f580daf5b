"""Query result delivery — the reference's three result modes + CSV sink.

Reference (S6, ``src/classes/influx_classes.py:84-105``): a query is
executed in one of three modes — ``csv`` (raw CSV lines), ``flux``
(record tables flattened to dicts, ``influx_query.py:35-54``), or
``stream`` (record iterator; the reference's ``parse_stream`` is
``NotImplemented`` at ``influx_query.py:56-62`` — implemented here).
The CSV sink (S5, ``src/helpers/py_functions.py:13-35``) writes the
flattened records to a configured path with append/overwrite mode.

Scale notes: ``records``/``csv_lines`` materialize on the driver and are
for interactive/small results only (the reference's use case — its whole
result set was a few hundred points); ``stream`` uses
``toLocalIterator`` which holds one partition at a time;
``write_results_to_csv`` is the distributed path — executors write in
parallel, with ``single_file=True`` only coalescing at the very end for
the reference's one-file-on-disk behavior.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

RESULT_MODES = ("csv", "flux", "stream")


def records(df: DataFrame) -> list[dict]:
    """``flux`` mode: the flattened record list the reference's
    ``parse_flux`` produces (P5) — one dict per row."""
    return [row.asDict(recursive=True) for row in df.collect()]


def csv_lines(df: DataFrame) -> list[str]:
    """``csv`` mode: header + one comma-joined line per row (driver-side,
    interactive use)."""
    cols = df.columns
    out = [",".join(cols)]
    for row in df.collect():
        out.append(",".join("" if v is None else str(v) for v in row))
    return out


def stream_records(df: DataFrame) -> Iterator[dict]:
    """``stream`` mode: lazy record iterator — implements the mode the
    reference declared but left ``NotImplemented``
    (``influx_query.py:56-62``). One partition in driver memory at a
    time."""
    for row in df.toLocalIterator():
        yield row.asDict(recursive=True)


def execute(df: DataFrame, query_mode: str):
    """Mode dispatch, mirroring ``query_database``'s contract: unknown
    modes raise (the reference logs-and-raises likewise)."""
    if query_mode == "csv":
        return csv_lines(df)
    if query_mode == "flux":
        return records(df)
    if query_mode == "stream":
        return stream_records(df)
    raise ValueError(f"query_mode must be one of {RESULT_MODES}, got {query_mode!r}")


def write_results_to_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    single_file: bool = True,
    header: bool = True,
) -> None:
    """S5 CSV sink. ``single_file`` reproduces the reference's
    one-file-per-run layout via a final ``coalesce(1)``; leave it False
    for large results so every executor writes its own part file."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", str(header).lower()).csv(path)


def health_check(spark) -> bool:
    """S7 (``influx_classes.py:43-48``): verify the engine answers
    trivial work before a session begins."""
    return spark.sql("SELECT 1 AS ok").collect()[0].ok == 1
