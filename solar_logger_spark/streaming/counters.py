"""Streaming monotonic-counter accumulation — stateful ``increase()``.

The solar domain's headline metrics are daily-resetting counters
(``bat_kwh_today``, ``in_ah_today`` … — 12 of the reference's 31 DC
channels are ``*_today`` counters, ``tests/config/consts.py:98-138``).
The number a dashboard wants is the *total advance* across resets:
batch ``operators/timeseries.increase`` computes it over history; this
module computes it **live** on the point stream, carrying
(last_value, cumulative_increase) per (measurement, field) in the
checkpointed state store via ``applyInPandasWithState``.

Per-key state is two doubles — O(#series), independent of throughput;
the stream shuffles once on the series key (required for per-key
ordering) and each micro-batch applies its points in event-time order
against the carried state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, StringType, StructField, StructType, TimestampType,
)

OUTPUT_SCHEMA = StructType([
    StructField("measurement", StringType()),
    StructField("field", StringType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
    StructField("increase", DoubleType()),
])

_STATE_SCHEMA = StructType([
    StructField("last_value", DoubleType()),
    StructField("cum_increase", DoubleType()),
])


def _accumulate(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last, cum = state.get if state.exists else (None, 0.0)
    measurement, field = key
    for pdf in pdfs:
        pdf = pdf.sort_values("ts", kind="mergesort")
        out_rows = []
        for row in pdf.itertuples(index=False):
            v = row.value
            if v is None:
                continue
            if last is not None and v > last:
                cum += v - last  # reset (v <= last) contributes zero
            last = float(v)
            out_rows.append(
                {
                    "measurement": measurement,
                    "field": field,
                    "ts": row.ts,
                    "value": float(v),
                    "increase": cum,
                }
            )
        if out_rows:
            yield pd.DataFrame(out_rows)
    state.update((last, cum))


def running_increase(points: DataFrame) -> DataFrame:
    """Per-(measurement, field) streaming counter accumulation over the
    canonical point stream. Works on batch DataFrames too (same code
    path) — state then lives only for the single invocation."""
    return (
        points.select("measurement", "field", "ts", "value")
        .groupBy("measurement", "field")
        .applyInPandasWithState(
            _accumulate,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
