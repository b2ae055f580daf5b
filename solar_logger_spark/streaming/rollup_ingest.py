"""Incrementally maintained windowed rollups — a materialized
aggregate view over the snapshot store.

The downsample/retention module (io/retention.py) REBUILDS rollup
tiers from raw points; the streaming engine's windowed aggregation
(ingest.windowed_rollup_query) holds open windows in state-store
memory. This sink is the third, lakehouse-shaped option: each
micro-batch folds into a per-(key, window) table of MERGEABLE partial
aggregates — ``n`` (count), ``sum_dec`` (exact DECIMAL sum), ``vmin``,
``vmax`` — via the io/merge MERGE, so the rollup is always queryable,
survives restarts with no state store, and never recomputes history.
Mean/count/min/max finalize at read time (:func:`read_rollup`).

Scale shape: the per-delivery work is one partial aggregation of the
batch (map-side combine; the batch's window-key set is tiny next to
the batch), a key-semi-joined read of just the touched rollup rows,
and a MERGE keyed by (keys, window_start). Partial aggregates are the
same trick Spark's own hash aggregation uses between map and reduce —
materialized as table state instead of shuffle blocks. Decimal sums
make the merge ASSOCIATION-FREE: any replay/merge order yields the
same stored value, so the finalized mean is one IEEE divide of
exactly-represented operands (the repo's oracle float discipline).

Replay exactness (the additive-merge trap): an at-least-once replay
of a delivery must not double-count into ``n``/``sum_dec``. Commit
markers next to the table cannot close the crash window between data
commit and marker write — so the applied epoch id rides INSIDE the
snapshot as an io/merge sidecar file, committed by the same atomic
pointer swap as the data. A replayed epoch compares itself against
the LIVE snapshot's ``_last_epoch`` and skips; a crash before the
swap left the old snapshot (epoch not applied) and the replay
applies cleanly. Requires the engine's per-query monotonic epoch ids
(foreachBatch contract).

Reference scope: the reference has no aggregate maintenance at all
(MQTT->InfluxDB client; InfluxDB's continuous queries would be the
closest managed analogue) — this is the beyond-reference scale
family.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from solar_logger_spark.io import merge as M

EPOCH_SIDECAR = "_last_epoch"
# DECIMAL(28,6): exact for any value with <= 6 decimal places (the
# events.value contract) summed over < 10^22 rows — mergeable with no
# float association anywhere
_SUM_DEC = "decimal(28,6)"


def partial_rollup(
    df: DataFrame,
    every: str = "1 hour",
    keys: Sequence[str] = ("measurement", "field"),
    ts_col: str = "ts",
    value_col: str = "value",
    distinct_col: str | None = None,
    lg_config_k: int = 12,
) -> DataFrame:
    """One batch's mergeable partial aggregates per (keys, window).

    ``distinct_col``: when given, each row also carries a Datasketches
    HLL sketch (BINARY) of that column — register-max merge is
    idempotent and order-independent, so approximate distinct counts
    ride the same replay-exact maintenance as the exact aggregates
    (streamed == one-shot, differential-pinned). ``lg_config_k`` pins
    the sketch precision EXPLICITLY (the operators/sketches.py
    convention): hll_union_agg refuses to merge differing-precision
    sketches, so the value is frozen at table creation — every later
    delivery must build partials with the same one.

    Rows with a NULL timestamp or NULL key are dropped up front: the
    maintenance joins (touched semi-join, MERGE anti-join) use
    null-unsafe equality, so a NULL group would never match its
    existing row and the table would grow one junk (keys, NULL) row
    per delivery forever."""
    cond = F.col(ts_col).isNotNull()
    for k in keys:
        cond = cond & F.col(k).isNotNull()
    df = df.filter(cond)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast(_SUM_DEC)).alias("sum_dec"),
        F.min(F.col(value_col)).alias("vmin"),
        F.max(F.col(value_col)).alias("vmax"),
    ]
    if distinct_col is not None:
        aggs.append(
            F.hll_sketch_agg(
                F.col(distinct_col), F.lit(lg_config_k)
            ).alias("hll")
        )
    return df.groupBy(
        *keys,
        F.window(F.col(ts_col), every)["start"].alias("window_start"),
    ).agg(*aggs)


def merge_partials(combined: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Re-combine stacked partial rows (base ∪ batch) — every column
    merges associatively, which is the whole point of the layout."""
    aggs = [
        F.sum("n").alias("n"),
        F.sum("sum_dec").cast(_SUM_DEC).alias("sum_dec"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    ]
    if "hll" in combined.columns:
        aggs.append(F.hll_union_agg(F.col("hll")).alias("hll"))
    return combined.groupBy(*keys, "window_start").agg(*aggs)


def rollup_maintenance_sink(
    table_dir: str,
    every: str = "1 hour",
    keys: Sequence[str] = ("measurement", "field"),
    ts_col: str = "ts",
    value_col: str = "value",
    keep_snapshots: int = 2,
    distinct_col: str | None = None,
    lg_config_k: int = 12,
):
    """``foreachBatch`` function maintaining the rollup table.

    Usage::

        q = (points.writeStream
             .foreachBatch(rollup_maintenance_sink(dir, every="1 hour"))
             .option("checkpointLocation", ckpt).start())
    """
    keys = list(keys)
    merge_keys = keys + ["window_start"]

    def _write(batch: DataFrame, epoch_id: int) -> None:
        if not batch.take(1):
            return
        applied = M.read_sidecar(table_dir, EPOCH_SIDECAR)
        if applied is not None and int(applied) == epoch_id:
            return  # crash replay of the epoch the live snapshot holds
        if applied is not None and int(applied) > epoch_id:
            # foreachBatch only ever replays the LATEST epoch, so a
            # lower id means a NEW query (fresh checkpoint) is writing
            # to an old table — silently skipping would discard every
            # delivery until the new query catches up. Fail loud; the
            # operator either restores the checkpoint or starts a new
            # table.
            raise ValueError(
                f"epoch {epoch_id} is behind the table's applied epoch "
                f"{applied} in {table_dir}: a query with a fresh "
                "checkpoint must not write to an existing rollup table"
            )
        spark = batch.sparkSession
        partial = partial_rollup(
            batch, every, keys, ts_col, value_col, distinct_col,
            lg_config_k,
        )
        if not partial.take(1):
            return  # every row had a NULL key/ts: nothing to fold
        sidecar = {EPOCH_SIDECAR: str(epoch_id)}
        if M.current_snapshot(table_dir) is None:
            M.init_table(partial, table_dir, sidecar=sidecar)
            return
        partial = partial.localCheckpoint()  # consumed twice below
        base = M.read_table_snapshot(spark, table_dir)
        touched = base.join(
            partial.select(*merge_keys).distinct(), merge_keys, "left_semi"
        )
        combined = merge_partials(
            touched.unionByName(partial), merge_keys[:-1]
        )
        M.upsert(
            spark, table_dir, combined, keys=merge_keys,
            keep_snapshots=keep_snapshots, sidecar=sidecar,
        )

    return _write


def read_rollup(spark: SparkSession, table_dir: str) -> DataFrame:
    """The finalized view: count / mean / min / max per (keys, window).
    ``mean`` is one IEEE divide of an exactly-stored decimal sum by an
    integer count — engine-reproducible."""
    t = M.read_table_snapshot(spark, table_dir)
    aux = {"n", "sum_dec", "vmin", "vmax", "window_start", "hll"}
    keys = [c for c in t.columns if c not in aux]
    cols = [
        F.col("n").alias("count"),
        (F.col("sum_dec").cast("double") / F.col("n").cast("double")).alias(
            "mean"
        ),
        F.col("vmin").alias("min"),
        F.col("vmax").alias("max"),
    ]
    if "hll" in t.columns:
        cols.append(
            F.hll_sketch_estimate(F.col("hll")).cast("long")
            .alias("approx_distinct")
        )
    return t.select(*keys, "window_start", *cols)
