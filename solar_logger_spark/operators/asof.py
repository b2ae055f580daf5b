"""Latest-per-key, status-gating, and as-of joins.

The reference's only join-like semantics is the *status gate*: a data
message is processed only while the device's **latest** status message
says ``online`` (reference: ``src/classes/mqtt_classes.py:114-119,
187-198,229-233``). Semantically that is a per-key as-of semi-join of the
data stream against the status stream.

Scale notes:

* ``latest_per_key`` is a hash aggregate (``max_by``), NOT a
  ``row_number()`` window — the aggregate gets map-side partial combine
  and shuffles one row per key; the window variant shuffles *every* row
  and then sorts each partition. At 100 TB of status messages the
  difference is the job.
* ``status_gate`` broadcasts the (tiny) latest-status table into the data
  scan — no shuffle of the fact side at all.
* ``asof_join`` (generic event-time as-of) is implemented as a
  union-and-window merge: O(n log n) in each key partition, one shuffle
  per side, no range cross-product — the standard scalable as-of plan
  (same family as pandas ``merge_asof`` / QuestDB ASOF JOIN).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """One row per key holding the latest (by ``ts_col``) payload values.

    Emits ``keys + [ts_col] + payload_cols`` where ``ts_col`` is the max
    event time and each payload column carries the value from that row.
    """
    if payload_cols is None:
        payload_cols = [c for c in df.columns if c not in keys and c != ts_col]
    aggs = [F.max(ts_col).alias(ts_col)] + [
        F.max_by(c, ts_col).alias(c) for c in payload_cols
    ]
    return df.groupBy(*keys).agg(*aggs)


def status_gate(
    data: DataFrame,
    status: DataFrame,
    keys: Sequence[str],
    status_col: str = "status",
    online_value: str = "online",
    status_ts_col: str = "ts",
) -> DataFrame:
    """Keep data rows whose device's *latest* status is online.

    ``status`` is the raw status stream (key columns + status + ts); its
    latest-per-key reduction is broadcast so the (large) data side never
    shuffles — a broadcast semi-join.
    """
    latest = latest_per_key(status, keys, ts_col=status_ts_col,
                            payload_cols=[status_col])
    online = latest.filter(F.col(status_col) == online_value).select(*keys)
    return data.join(F.broadcast(online), on=list(keys), how="left_semi")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right.ts <= left.ts`` within the same key.

    Implemented as a union-merge: tag both sides, union, and carry the
    last-seen right payload forward with a running ``last(..., ignorenulls)``
    over (key, time). One shuffle per side, sort within key partitions,
    no range cross-product — survives 100× scale-up where an inequality
    join would degenerate to a per-key nested loop.
    """
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    keys = list(keys)

    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_asof_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_asof_r_{c}")
          for c in right_payload],
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.lit(None).cast(
            lhs.schema["_asof_left"].dataType
        ).alias("_asof_left"),
        *[F.col(c).alias(f"_asof_r_{c}") for c in right_payload],
    )
    merged = lhs.unionByName(rhs)

    # right rows (side=0) sort before left rows at identical timestamps,
    # so a right row at exactly left.ts IS visible to that left row
    win = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_asof_ts"), F.col("_asof_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"_asof_r_{c}", ignorenulls=True).over(win).alias(f"_carry_{c}")
            for c in right_payload
        ],
    ).filter(F.col("_asof_side") == 1)

    out = carried.select(
        F.col("_asof_left.*"),
        *[F.col(f"_carry_{c}").alias(c) for c in right_payload],
    )
    if how == "inner":
        out = out.na.drop(subset=[right_payload[0]]) if right_payload else out
    return out
