"""Training-shard export: the pipeline's last mile.

Everything upstream (clean → dedup → chunk → pack) produces TABLES;
a training run consumes SHARDS — a fixed number of independently
readable file groups, each internally ordered, with a dataset card
stating exactly what shipped. This module writes that layout:

    out_dir/
      _dataset_card.json      <- totals + one entry per shard
      shard=0/*.parquet
      shard=1/*.parquet
      ...

* **Shard + position** come from the repo's seeded-md5 shuffle recipe
  (cf. the ``text_training_order`` declared query): engine- and
  partitioning-independent, so the same input and seed yield the SAME
  shard assignment and in-shard order on every rerun — reproducibility
  is pinned by test, not promised. Position is a window per shard
  (parallel, no global sort); it ships as a COLUMN because row order
  across a shard's files is not a parquet guarantee — consumers order
  by ``pos``, not by file listing.
* **The card is derived from the shipped bytes**: after the write, the
  shard dirs are read back and fingerprinted with the io/manifest
  recipe (order-independent DECIMAL sum of per-row md5 prefixes, hex
  digits rendered as decimal strings) — so the card attests to what is
  on disk, not to what the writer intended, and any engine can
  re-derive it per shard (pytest-pinned in DuckDB). Per-shard
  fingerprints sum, as integers, to the dataset fingerprint (the
  manifest partitionability property).
* **Atomic-enough commit**: the card is written last, to a temp name,
  then renamed — a crash mid-export leaves shard dirs but no card, and
  "no card" is the unshipped state (consumers require the card).

Scale shape: one shuffle to co-locate shards (``repartition(n_shards,
shard)``), window work partitioned per shard, one read-back aggregate
for the card. ``n_shards`` should be >= the cluster's parallelism for
write bandwidth; at 100 TB you raise it, never the file count per
task.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from solar_logger_spark.io.manifest import row_hash_expr

DATASET_CARD = "_dataset_card.json"


def shuffle_assignment(
    id_col: str, n_shards: int, seed: int = 42
) -> tuple[Column, Column]:
    """(shard, shuffle_key) for a deterministic, engine-portable
    corpus shuffle: md5 of ``seed:id``; shard = first 15 hex digits
    mod ``n_shards`` (uniform for any shard count, not just 16)."""
    key = F.md5(
        F.concat(F.lit(f"shuffle-{seed}:"), F.col(id_col).cast("string"))
    )
    shard = (
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
        % F.lit(n_shards)
    ).cast("int")
    return shard, key


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "seq_id",
    token_col: str | None = "n_tokens",
    seed: int = 42,
    order_cols: Sequence[str] = (),
) -> dict[str, Any]:
    """Write ``df`` as ``n_shards`` shuffled training shards under
    ``out_dir`` and return the dataset card (also committed as
    ``_dataset_card.json``). Adds ``shard`` and ``pos`` columns;
    refuses to overwrite an already-carded export.

    Determinism contract, ENFORCED not assumed: ``pos`` comes from a
    window ordered by ``(md5 key, id_col, *order_cols)``, so
    ``(id_col, *order_cols)`` must uniquely identify a row — tied sort
    keys would make ``row_number`` (and hence the fingerprint, which
    hashes ``pos``) vary run to run. Rows sharing an ``id_col`` value
    get the same shard and stay ADJACENT, ordered by ``order_cols`` —
    the right granularity for multi-row units like packed sequences
    (shuffle by sequence id, order chunks by offset)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    reserved = {"shard", "pos", "_k"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input already has reserved export column(s) {sorted(reserved)};"
            " rename them first (they would be silently overwritten)"
        )
    card_path = os.path.join(out_dir, DATASET_CARD)
    if os.path.exists(card_path):
        raise FileExistsError(
            f"{out_dir} already holds a carded export; write a new dir"
        )
    if not df.take(1):
        raise ValueError(
            "refusing to export an empty dataset (a partitioned write of"
            " zero rows leaves no schema-bearing file)"
        )
    sort_cols = [id_col, *order_cols]
    uniq = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(c) for c in sort_cols]).alias("d"),
    ).collect()[0]
    if uniq["n"] != uniq["d"]:
        raise ValueError(
            f"(id_col, *order_cols) = {sort_cols} does not uniquely "
            f"identify rows ({uniq['n']} rows, {uniq['d']} distinct keys):"
            " pos would be nondeterministic — pass order_cols that break"
            " the ties"
        )
    shard, key = shuffle_assignment(id_col, n_shards, seed)
    # repartition BEFORE the window: the window's ClusteredDistribution
    # on shard is satisfied by the existing HashPartitioning, so the
    # full dataset shuffles once, not twice
    keyed = (
        df.withColumn("shard", shard)
        .withColumn("_k", key)
        .repartition(n_shards, "shard")
    )
    w = Window.partitionBy("shard").orderBy(
        "_k", *[F.col(c) for c in sort_cols]
    )
    out = keyed.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).drop("_k")
    out.write.mode("errorifexists").partitionBy("shard").parquet(out_dir)

    # the card attests to the SHIPPED bytes: read back and fingerprint
    spark = df.sparkSession
    shipped = spark.read.parquet(out_dir)
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.sum(row_hash_expr(shipped.columns))
        .cast("decimal(38,0)").cast("string").alias("fingerprint"),
    ]
    if token_col is not None and token_col in shipped.columns:
        # coalesce: an all-NULL token column in a shard sums to NULL,
        # and int(None) would crash AFTER the shards are on disk
        aggs.append(
            F.coalesce(F.sum(token_col), F.lit(0))
            .cast("long").alias("tokens")
        )
    per_shard = {
        int(r["shard"]): {
            k: (int(v) if k != "fingerprint" else v)
            for k, v in r.asDict().items() if k != "shard"
        }
        for r in shipped.groupBy("shard").agg(*aggs).collect()
    }
    card = {
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "schema": shipped.schema.simpleString(),
        "rows": sum(s["rows"] for s in per_shard.values()),
        "fingerprint": str(
            sum(int(s["fingerprint"]) for s in per_shard.values())
        ),
        "shards": {str(k): per_shard[k] for k in sorted(per_shard)},
    }
    if token_col is not None and any("tokens" in s for s in per_shard.values()):
        card["tokens"] = sum(s.get("tokens", 0) for s in per_shard.values())
    tmp = card_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(card, fh, sort_keys=True, indent=1)
    os.rename(tmp, card_path)
    return card


def read_dataset_card(out_dir: str) -> dict[str, Any] | None:
    """The committed card, or ``None`` for an uncarded (unshipped or
    crashed-mid-export) directory."""
    p = os.path.join(out_dir, DATASET_CARD)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def verify_shards(spark: SparkSession, out_dir: str) -> dict[str, Any]:
    """Consumer-side audit: recompute every shard's row count and
    fingerprint from the files and diff against the card. Returns
    ``{"ok": bool, "mismatched": [shard, ...]}`` — the receiving end
    of the manifest discipline."""
    card = read_dataset_card(out_dir)
    if card is None:
        raise FileNotFoundError(f"no {DATASET_CARD} in {out_dir}")
    try:
        shipped = spark.read.parquet(out_dir)
    except Exception:
        # every shard dir gone: nothing readable, everything carded is
        # missing — report it, don't crash the audit
        return {"ok": False, "mismatched": sorted(card["shards"])}
    got = {
        str(r["shard"]): (int(r["rows"]), r["fp"])
        for r in shipped.groupBy("shard").agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(row_hash_expr(shipped.columns))
            .cast("decimal(38,0)").cast("string").alias("fp"),
        ).collect()
    }
    mismatched = []
    for k, entry in card["shards"].items():
        if got.get(k) != (entry["rows"], entry["fingerprint"]):
            mismatched.append(k)
    for k in got:
        if k not in card["shards"]:
            mismatched.append(k)
    return {"ok": not mismatched, "mismatched": sorted(mismatched)}
