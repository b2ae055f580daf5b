"""Tumbling-window aggregation — the engine's ``aggregateWindow``.

The reference declares ``|> aggregateWindow(every: <dur>, fn: <agg>)``
(reference: ``src/classes/query_classes.py:127-137``) and lets InfluxDB
execute it: tumbling event-time windows of width ``every``, one aggregate
per (window, series) where a series is (measurement, field). Flux labels
each output row with the window *stop* time.

Spark-first realization: ``groupBy(window(ts, every), *keys)`` — a single
hash aggregation with map-side partial combine, whole-stage codegen, and
one shuffle on (window, keys). At 100 TB this is the plan you want: the
partial agg collapses each input partition to ~|windows × keys| rows
before the exchange, so shuffle volume is bounded by output cardinality,
not input rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from solar_logger_spark.durations import duration_to_spark_window

# Flux's standard aggregate set (README of the reference names min/max;
# `fn` is free-form, reference src/classes/query_classes.py:134-137).
# first/last are time-ordered in Flux, hence min_by/max_by on the event
# time — still a single-pass hash aggregate, no sort needed.
AGG_FNS: dict[str, object] = {
    "mean": lambda v, t: F.avg(v),
    "median": lambda v, t: F.median(v),
    "min": lambda v, t: F.min(v),
    "max": lambda v, t: F.max(v),
    "sum": lambda v, t: F.sum(v),
    "count": lambda v, t: F.count(v),
    "stddev": lambda v, t: F.stddev_samp(v),
    "first": lambda v, t: F.min_by(v, t),
    "last": lambda v, t: F.max_by(v, t),
}


def agg_expr(fn: str, value_col: str, ts_col: str) -> Column:
    """Resolve a Flux aggregate-function name to a Spark Column."""
    try:
        make = AGG_FNS[fn]
    except KeyError:
        raise ValueError(
            f"unknown aggregate fn {fn!r}; supported: {sorted(AGG_FNS)}"
        ) from None
    return make(F.col(value_col), F.col(ts_col))


def aggregate_window(
    df: DataFrame,
    every: str,
    fn: str,
    by: Sequence[str] = (),
    ts_col: str = "ts",
    value_col: str = "value",
    alias: str = "value",
    label: str = "stop",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or hopping) window aggregate.

    Parameters mirror Flux ``aggregateWindow``: ``every`` is a Flux
    duration (``"1h"``), ``fn`` one of :data:`AGG_FNS`. ``by`` are the
    series key columns. ``label`` picks the output timestamp: ``"stop"``
    (Flux default — window end), ``"start"``, or ``"both"`` (emit
    ``window_start`` and ``window_end`` columns, no ``ts``).

    ``slide`` (a Flux duration < ``every``) makes the windows hopping —
    Flux ``window(every: slide, period: every)``: each row lands in
    ``every/slide`` overlapping windows. Spark's ``window()`` expands
    that fan-out JVM-side before the same single hash aggregation.

    Windows are epoch-aligned (Spark ``window()`` semantics), matching
    DuckDB ``time_bucket`` for the oracle comparison.
    """
    if fn not in AGG_FNS:
        raise ValueError(
            f"unknown aggregate fn {fn!r}; supported: {sorted(AGG_FNS)}"
        )
    width = duration_to_spark_window(every)
    if slide is not None:
        win = F.window(F.col(ts_col), width, duration_to_spark_window(slide))
    else:
        win = F.window(F.col(ts_col), width)
    grouped = df.groupBy(win.alias("window"), *[F.col(c) for c in by])
    out = grouped.agg(agg_expr(fn, value_col, ts_col).alias(alias))

    if label == "stop":
        return out.select(
            F.col("window.end").alias(ts_col), *by, alias
        )
    if label == "start":
        return out.select(
            F.col("window.start").alias(ts_col), *by, alias
        )
    if label == "both":
        return out.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *by,
            alias,
        )
    raise ValueError(f"label must be start|stop|both, got {label!r}")
