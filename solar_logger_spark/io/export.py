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
* **Staged commit**: everything (shards, then the card) is written
  into a sibling ``.inprogress`` directory and RENAMED into place as
  the last step — a crash at any point leaves ``out_dir`` nonexistent
  (the unshipped state) plus a dead stage dir the next run replaces;
  nothing pre-existing at ``out_dir`` is ever deleted (an uncarded
  ``out_dir`` is refused loudly, not cleared — it could be foreign
  data that merely looks hive-partitioned).

Scale shape: one shuffle to co-locate shards (``repartition(n_shards,
shard)``), window work partitioned per shard, one read-back aggregate
for the card. ``n_shards`` should be >= the cluster's parallelism for
write bandwidth; at 100 TB you raise it, never the file count per
task.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from solar_logger_spark.io.manifest import row_hash_expr

DATASET_CARD = "_dataset_card.json"
_STAGE_SUFFIX = ".inprogress"


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
    if os.path.exists(os.path.join(out_dir, DATASET_CARD)):
        raise FileExistsError(
            f"{out_dir} already holds a carded export; write a new dir"
        )
    if os.path.exists(out_dir):
        # NEVER delete a directory this export didn't stage: an
        # uncarded out_dir is either foreign data (e.g. another
        # pipeline's shard=-partitioned table) or a pre-staging
        # artifact — the operator decides, loudly
        raise FileExistsError(
            f"{out_dir} exists without a {DATASET_CARD}; refusing to "
            "write into or remove a directory this export did not "
            "stage — remove it or pick another path"
        )
    # stage everything in a sibling dir and RENAME into place at the
    # end: a crash at any point leaves out_dir nonexistent (the
    # unshipped state), and the stage dir — ours by construction —
    # is simply replaced on the next run
    stage = out_dir.rstrip("/") + _STAGE_SUFFIX
    if os.path.isdir(stage):
        shutil.rmtree(stage)  # dead leftover from a crashed export
    card_path = os.path.join(stage, DATASET_CARD)
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
    out.write.mode("errorifexists").partitionBy("shard").parquet(stage)

    # the card attests to the SHIPPED bytes: read back and fingerprint
    spark = df.sparkSession
    shipped = spark.read.parquet(stage)
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
        card["token_col"] = token_col  # forget_shards re-derives with it
    tmp = card_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(card, fh, sort_keys=True, indent=1)
    os.rename(tmp, card_path)
    os.rename(stage, out_dir)  # the commit: out_dir appears fully carded
    return card


def read_dataset_card(out_dir: str) -> dict[str, Any] | None:
    """The committed card, or ``None`` for an uncarded (unshipped or
    crashed-mid-export) directory."""
    p = os.path.join(out_dir, DATASET_CARD)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


_FORGET_TMP = "_forget_tmp_shard_"
_FORGET_OLD = "_forget_old_shard_"
_FORGET_EMPTY = "_forget_empty_shard_"


def _recover_forget_crash(out_dir: str) -> None:
    """Self-heal a crashed :func:`forget_shards`: tmp dirs are always
    dead (never referenced until renamed into place); an ``_OLD`` dir
    with its ``shard=K`` present means the swap completed (old is
    dead), without it the crash hit between the two renames — restore
    the old dir so the re-run starts from the live state.

    An ``_EMPTY`` intent marker means a sweep decided shard K was
    FULLY emptied: its removal must be COMPLETED, never rolled back —
    without the marker, the post-removal crash state (aside dir, no
    live) is indistinguishable from a rewritten shard's mid-swap state
    and the restore branch would resurrect rows the crashed request
    had already removed (ADVICE r8). Markers are handled FIRST for
    exactly that reason. A marker with the live dir still present
    means the crash hit before any rename — no row was removed yet, so
    dropping the marker restores the ordinary path."""
    entries = os.listdir(out_dir)
    for entry in entries:
        if not entry.startswith(_FORGET_EMPTY):
            continue
        k = entry[len(_FORGET_EMPTY):]
        live = os.path.join(out_dir, f"shard={k}")
        aside = os.path.join(out_dir, f"{_FORGET_OLD}{k}")
        if not os.path.isdir(live) and os.path.isdir(aside):
            shutil.rmtree(aside)  # complete the removal
        os.remove(os.path.join(out_dir, entry))
    for entry in entries:
        p = os.path.join(out_dir, entry)
        if entry.startswith(_FORGET_TMP):
            shutil.rmtree(p)
        elif entry.startswith(_FORGET_OLD) and os.path.isdir(p):
            k = entry[len(_FORGET_OLD):]
            live = os.path.join(out_dir, f"shard={k}")
            if os.path.isdir(live):
                shutil.rmtree(p)
            else:
                os.rename(p, live)


def forget_shards(
    spark: SparkSession,
    out_dir: str,
    del_ids,
    keep_card_backup: bool = False,
) -> dict[str, Any]:
    """Right-to-be-forgotten over SHIPPED training shards: remove every
    row whose ``id_col`` (the card's) is in ``del_ids``, rewriting ONLY
    the affected shard directories, and re-commit the dataset card from
    the re-shipped bytes. The export-side completion of
    ``streaming.dedup_ingest.forget_docs`` — without it a forget
    request arriving after shards shipped leaves the forgotten
    documents in the shipped bytes.

    Which shards a given id lives in is DETERMINISTIC
    (:func:`shuffle_assignment` with the card's seed/n_shards), so the
    affected set is computed from the ids alone — cost is O(affected
    shards' bytes), never O(dataset). Untouched shard dirs are not
    opened, written, or relinked: byte-identical by construction.

    Surviving rows keep their original ``pos`` (consumers order by
    ``pos``; density was never the contract) — so a surviving row's
    bytes are identical before and after, and the new fingerprints
    attest to exactly "the old shard minus the forgotten rows".
    A shard emptied entirely is REMOVED and its card entry dropped
    (the same representation the original export gives a shard that
    received zero rows). Per-shard fingerprints still sum to the
    dataset fingerprint.

    Crash-safe per shard: filtered rows land in a ``_forget_tmp`` dir
    (underscore names are invisible to parquet discovery), then an
    old→aside / tmp→live rename pair; every intermediate state is
    restored or completed by the next call (:func:`_recover_forget_crash`).
    The card is rewritten LAST — a crash mid-sweep leaves the old card
    over partially swept shards, which ``verify_shards`` reports as
    mismatched rather than silently passing. Re-running the same
    forget converges (already-removed ids delete zero rows and the
    recomputed card matches the bytes).

    No record of the forgotten ids is kept anywhere in the layout —
    writing them to an audit file would itself retain them.

    ``del_ids``: iterable of id values or a single-column DataFrame.
    Values are cast to the shipped id column's type before comparing
    (and to string inside the md5 assignment, matching the export).
    Returns ``{"deleted_rows": n, "affected_shards": [...], "card":
    new_card}``.
    """
    card = read_dataset_card(out_dir)
    if card is None:
        raise FileNotFoundError(
            f"no {DATASET_CARD} in {out_dir} — nothing shipped, "
            "nothing to forget (a crashed export re-ships on rerun)"
        )
    _recover_forget_crash(out_dir)
    id_col, n_shards, seed = card["id_col"], card["n_shards"], card["seed"]
    if not card["shards"]:
        # a previous sweep legally emptied the dataset: nothing left
        # to delete, and the directory holds no parquet to read a
        # schema from — the idempotent re-sweep must return, not crash
        return {
            "deleted_rows": 0, "recovered_rows": 0,
            "affected_shards": [], "card": card,
        }

    if not isinstance(del_ids, DataFrame):
        from pyspark.sql import Row

        del_ids = list(del_ids)
        if not del_ids:
            return {
                "deleted_rows": 0, "recovered_rows": 0,
                "affected_shards": [], "card": card,
            }
        del_ids = spark.createDataFrame(
            [Row(**{id_col: v}) for v in del_ids]
        )
    else:
        del_ids = del_ids.toDF(id_col)

    shipped_schema = spark.read.parquet(out_dir).schema
    id_type = shipped_schema[id_col].dataType
    ids = (
        del_ids.select(F.col(id_col).cast(id_type).alias(id_col))
        .distinct().localCheckpoint()
    )
    shard_col, _ = shuffle_assignment(id_col, n_shards, seed)
    # bounded collect: <= min(|del set|, n_shards) values
    affected = sorted(
        r[0] for r in ids.select(shard_col.alias("s")).distinct().collect()
    )
    # only shards that actually shipped rows can hold anything
    affected = [k for k in affected if str(k) in card["shards"]]
    if not affected:
        return {
            "deleted_rows": 0, "recovered_rows": 0,
            "affected_shards": [], "card": card,
        }

    deleted_total = 0
    recovered_total = 0
    emptied: list[int] = []
    rewritten: list[int] = []
    for k in affected:
        live = os.path.join(out_dir, f"shard={k}")
        if not os.path.isdir(live):
            # a previous sweep emptied and removed this shard but died
            # before the card rewrite: the stale card still lists it.
            # Drop the entry so the re-run CONVERGES — but attribute
            # those rows to the CRASHED sweep (recovered_rows), not to
            # this request's deleted_rows: a compliance log must not
            # credit request B with request A's deletions.
            recovered_total += card["shards"][str(k)]["rows"]
            emptied.append(k)
            continue
        # reading the shard dir directly yields the DATA columns only
        # (partition col lives in the dir name); re-select the file's
        # own column order after the join — an equi-join moves the key
        # column first, and files with a different column order would
        # flip the merged read schema (and hence the fingerprint's
        # JSON field order) depending on which file is listed first
        df_live = spark.read.parquet(live)
        # count the LIVE bytes, not the card: after a crashed sweep
        # that swapped a rewritten shard but died before the card
        # rewrite, the card's row count is stale-high — diffing
        # against it would credit the crashed request's deletions to
        # whatever request happens to hash here next (ADVICE r8). The
        # stale delta is the crashed sweep's work: recovered_rows.
        n_live = df_live.count()
        stale = card["shards"][str(k)]["rows"] - n_live
        if stale > 0:
            recovered_total += stale
        kept = df_live.join(
            F.broadcast(ids), id_col, "left_anti"
        ).select(*df_live.columns)
        tmp = os.path.join(out_dir, f"{_FORGET_TMP}{k}")
        kept.write.mode("errorifexists").parquet(tmp)
        # count from the WRITTEN bytes (one execution of the filter;
        # no shard-sized checkpoint held in memory). A zero-row write
        # emits no schema-bearing parquet file — don't ask Spark to
        # infer a schema from _SUCCESS alone
        if any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(tmp) for f in fs
        ):
            n_kept = spark.read.parquet(tmp).count()
        else:
            n_kept = 0
        n_del = n_live - n_kept
        if n_del == 0:
            # the ids hash here but no row matched (already forgotten,
            # or never shipped): keep the live bytes untouched. If the
            # card entry was stale (crashed sweep), re-derive it from
            # the live bytes so the card heals without a byte rewrite.
            shutil.rmtree(tmp)
            if stale > 0:
                rewritten.append(k)
            continue
        deleted_total += n_del
        old = os.path.join(out_dir, f"{_FORGET_OLD}{k}")
        if n_kept == 0:
            # intent marker: distinguishes "this shard's removal is in
            # flight / complete" from the rewritten path's mid-swap
            # state, so crash recovery COMPLETES the removal instead
            # of renaming the aside dir back to live and resurrecting
            # rows this request already fully removed (ADVICE r8)
            emptied.append(k)
            shutil.rmtree(tmp)
            marker = os.path.join(out_dir, f"{_FORGET_EMPTY}{k}")
            with open(marker, "w") as fh:
                fh.write(str(k))
            os.rename(live, old)
            shutil.rmtree(old)
            os.remove(marker)
            continue
        rewritten.append(k)
        os.rename(live, old)
        os.rename(tmp, live)
        shutil.rmtree(old)

    # re-derive the affected entries from the re-shipped bytes (same
    # attestation discipline as the original export)
    new_shards = dict(card["shards"])
    for k in emptied:
        new_shards.pop(str(k), None)
    if rewritten:
        shipped = spark.read.parquet(out_dir).filter(
            F.col("shard").isin(rewritten)
        )
        aggs = [
            F.count(F.lit(1)).alias("rows"),
            F.sum(row_hash_expr(shipped.columns))
            .cast("decimal(38,0)").cast("string").alias("fingerprint"),
        ]
        has_tokens = any(
            "tokens" in s for s in card["shards"].values()
        )
        if has_tokens:
            tok = card.get("token_col")
            if tok is None and "n_tokens" in shipped.columns:
                tok = "n_tokens"  # pre-token_col cards: export default
            if tok is None or tok not in shipped.columns:
                raise ValueError(
                    "card carries token totals but records no "
                    "token_col and the default 'n_tokens' column is "
                    "absent — refusing to silently drop token counts; "
                    "add 'token_col' to the card"
                )
            aggs.append(
                F.coalesce(F.sum(tok), F.lit(0))
                .cast("long").alias("tokens")
            )
        for r in shipped.groupBy("shard").agg(*aggs).collect():
            new_shards[str(int(r["shard"]))] = {
                k: (int(v) if k != "fingerprint" else v)
                for k, v in r.asDict().items() if k != "shard"
            }

    new_card = dict(card)
    new_card["shards"] = {
        str(k): new_shards[str(k)]
        for k in sorted(int(x) for x in new_shards)
    }
    new_card["rows"] = sum(s["rows"] for s in new_shards.values())
    new_card["fingerprint"] = str(
        sum(int(s["fingerprint"]) for s in new_shards.values())
    )
    if "tokens" in card:
        new_card["tokens"] = sum(
            s.get("tokens", 0) for s in new_shards.values()
        )
    card_path = os.path.join(out_dir, DATASET_CARD)
    if keep_card_backup:
        shutil.copy2(card_path, card_path + ".pre-forget")
    tmp = card_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(new_card, fh, sort_keys=True, indent=1)
    os.rename(tmp, card_path)
    return {
        "deleted_rows": deleted_total,
        "recovered_rows": recovered_total,
        "affected_shards": sorted(rewritten + emptied),
        "card": new_card,
    }


def verify_shards(
    spark: SparkSession,
    out_dir: str,
    shards: Sequence[int] | None = None,
) -> dict[str, Any]:
    """Consumer-side audit: recompute every shard's row count and
    fingerprint from the files and diff against the card. Returns
    ``{"ok": bool, "mismatched": [shard, ...]}`` — the receiving end
    of the manifest discipline.

    ``shards``: audit only these shard ids (e.g. the affected set a
    ``forget_shards`` call just rewrote) — cost bounded by those
    shards' bytes instead of the dataset; unknown shard detection is
    skipped in subset mode (it needs the full listing)."""
    card = read_dataset_card(out_dir)
    if card is None:
        raise FileNotFoundError(f"no {DATASET_CARD} in {out_dir}")
    try:
        shipped = spark.read.parquet(out_dir)
    except Exception:
        # nothing readable. With carded shards that means everything
        # is missing; a card with ZERO shards (a forget sweep legally
        # emptied the dataset) is consistent with the empty directory
        # and must audit green, not flag forever.
        carded = (
            {str(k) for k in shards} & set(card["shards"])
            if shards is not None else set(card["shards"])
        )
        return {"ok": not carded, "mismatched": sorted(carded)}
    if shards is not None:
        shipped = shipped.filter(
            F.col("shard").isin([int(x) for x in shards])
        )
    got = {
        str(r["shard"]): (int(r["rows"]), r["fp"])
        for r in shipped.groupBy("shard").agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(row_hash_expr(shipped.columns))
            .cast("decimal(38,0)").cast("string").alias("fp"),
        ).collect()
    }
    audit = (
        {str(k) for k in shards} if shards is not None
        else set(card["shards"])
    )
    mismatched = []
    for k in audit:
        entry = card["shards"].get(k)
        want = (entry["rows"], entry["fingerprint"]) if entry else None
        if got.get(k) != want:
            mismatched.append(k)
    if shards is None:
        for k in got:
            if k not in card["shards"]:
                mismatched.append(k)
    return {"ok": not mismatched, "mismatched": sorted(mismatched)}
