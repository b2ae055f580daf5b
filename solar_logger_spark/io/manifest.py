"""Dataset manifests: per-stage reproducibility cards for pipeline
tables in the snapshot store.

A training-data build is only auditable if every stage records WHAT it
produced (row count, an order-independent content fingerprint) and
UNDER WHAT configuration — the "dataset card" a 100 TB corpus ships
with. The manifest rides each snapshot as an io/merge SIDECAR file
(``_manifest``), so the card commits ATOMICALLY with the data it
describes and time travel shows the card of every retained snapshot.

The fingerprint is engine-reproducible by the repo's usual md5
discipline: per row, the first 15 hex digits of ``md5(to_json(
struct(*columns)))`` as a 60-bit integer, summed as DECIMAL (exact,
order-independent — commutative integer addition), then rendered as
the decimal-digit string (NOT hex: digits are what both engines can
emit in-query — ``CAST(decimal AS VARCHAR)`` — so audit queries like
``corpus_content_fingerprints`` can hash-compare the recipe itself).
Any engine that can md5 a canonical JSON row derives the same value;
row order, partitioning, and file layout do not matter. Decimal
addition also makes the fingerprint PARTITIONABLE: per-slice
fingerprints (per source, per shard) sum as integers to the
whole-table card value. (Caveat, documented not hidden: to_json of
MAP columns is order-sensitive; stages with map columns should
project a canonical form first.)
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from solar_logger_spark.io import merge as M

MANIFEST_SIDECAR = "_manifest"


def row_hash_expr(columns: list[str]) -> Column:
    """The per-row 60-bit hash the manifest fingerprint sums: first 15
    hex digits of md5 over the row's canonical JSON (field order =
    ``columns`` order, NULL fields omitted — to_json semantics), as a
    DECIMAL(38,0). Shared by ``content_fingerprint`` and the declared
    audit query so the two recipes cannot drift."""
    return F.conv(
        F.substring(
            F.md5(F.to_json(F.struct(*[F.col(c) for c in columns]))),
            1, 15,
        ),
        16, 10,
    ).cast("decimal(38,0)")


def content_fingerprint(df: DataFrame) -> tuple[int, str]:
    """(row_count, decimal-digit fingerprint) of a DataFrame's full
    contents. One pass: count + an order-independent DECIMAL sum of
    per-row 60-bit md5 prefixes over the canonical JSON of all
    columns."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(row_hash_expr(df.columns)),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(agg["n"]), str(int(agg["h"]))


def write_stage(
    df: DataFrame,
    table_dir: str,
    config: dict[str, Any] | None = None,
    keep_snapshots: int = 2,
) -> str:
    """``io.merge.replace_table`` plus an atomically-committed
    manifest card: row count, content fingerprint, column schema, and
    the caller's stage configuration. Returns the snapshot name."""
    n, fp = content_fingerprint(df)
    card = {
        "rows": n,
        "fingerprint": fp,
        "schema": df.schema.simpleString(),
        "config": config or {},
    }
    return M.replace_table(
        df, table_dir, keep_snapshots=keep_snapshots,
        sidecar={MANIFEST_SIDECAR: json.dumps(card, sort_keys=True)},
    )


def read_stage_manifest(
    table_dir: str, at: str | None = None
) -> dict[str, Any] | None:
    """The manifest card committed with a (live or retained) snapshot,
    or ``None`` for tables/snapshots without one."""
    raw = M.read_sidecar(table_dir, MANIFEST_SIDECAR, at=at)
    return None if raw is None else json.loads(raw)


def dataset_card(
    spark: SparkSession, work_dir: str, stages: list[str]
) -> list[dict[str, Any]]:
    """The full dataset card of a staged pipeline: one entry per stage
    table under ``work_dir``, each carrying its live snapshot name and
    manifest. Stages without a manifest card appear with
    ``manifest: None`` (honest gaps, not silence)."""
    import os

    out = []
    for name in stages:
        tdir = os.path.join(work_dir, name)
        out.append(
            {
                "stage": name,
                "snapshot": M.current_snapshot(tdir),
                "manifest": read_stage_manifest(tdir),
            }
        )
    return out
