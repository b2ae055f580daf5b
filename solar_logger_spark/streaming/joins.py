"""Stream-stream event-time joins.

Structured Streaming's watermarked inner join buffers each side's rows
in state ONLY for the interval the join condition can still match, so a
time-bounded condition (attribution windows, request/response pairing,
status correlation) runs with bounded state at any input rate — the
streaming counterpart of `operators/interval_join.py`. State per side
is O(rate × (watermark delay + join window)); without the time bound
Spark rejects the inner stream-stream join outright rather than buffer
forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_attribution_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str,
    watermark: str = "10 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Attribute each right-side event to the left-side events it
    follows within ``within`` (e.g. purchases to the clicks they
    followed): inner join on ``key`` with the event-time band
    ``left_ts <= right_ts <= left_ts + within``.

    Both sides are watermarked with ``watermark``: rows later than that
    relative to each stream's max event time may be dropped, and —
    because the band bounds how long a left row can still match — the
    join state store evicts left rows once the watermark passes
    ``left_ts + within`` and right rows once it passes ``right_ts``.
    Output columns: ``key`` (original name), left ts/columns prefixed
    ``l_``, right prefixed ``r_``.
    """
    for side, df, ts_col, pre in (
        ("left", left, left_ts, "l_"),
        ("right", right, right_ts, "r_"),
    ):
        clash = {"_sj_k", "_sj_rk"} & set(df.columns)
        if clash:
            raise ValueError(
                f"{side} stream carries reserved column(s) {sorted(clash)}"
            )
        # the output prefixes every non-key column with l_/r_; an input
        # already carrying a prefixed name (e.g. both `ts` and `l_ts`)
        # would produce duplicate/ambiguous output columns
        out_names = [f"{pre}ts"] + [
            f"{pre}{c}" for c in df.columns if c not in (key, ts_col)
        ] + [key]
        dups = {n for n in out_names if out_names.count(n) > 1}
        if dups:
            raise ValueError(
                f"{side} stream columns collide after {pre} prefixing: "
                f"{sorted(dups)} — rename the input column(s)"
            )
    l = left.withWatermark(left_ts, watermark).select(
        F.col(key).alias("_sj_k"),
        F.col(left_ts).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (key, left_ts)
        ],
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(key).alias("_sj_rk"),
        F.col(right_ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
    cond = (
        (l["_sj_k"] == r["_sj_rk"])
        & (r["r_ts"] >= l["l_ts"])
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {within}"))
    )
    return (
        l.join(r, cond, "inner")
        .drop("_sj_rk")
        .withColumnRenamed("_sj_k", key)
    )
