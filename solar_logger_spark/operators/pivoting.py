"""Long ↔ wide reshaping: unpivot (the ingest fan-out) and pivot.

The reference's ``_load_queue`` unpivots each decoded packet dict into
one point per field sharing a single timestamp (reference:
``src/classes/mqtt_classes.py:200-219``). Spark-first that is
``df.unpivot`` (a narrow ``Expand`` — no shuffle, codegen-friendly);
the reverse (wide per-measurement views, SURVEY.md §1.3) is
``groupBy().pivot()`` with an explicit value list so Spark skips the
extra distinct-values job and the output schema is deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    field_col: str = "field",
    value_col: str = "value",
) -> DataFrame:
    """Wide → long: one output row per (input row, value column)."""
    cast = df.select(
        *ids, *[F.col(c).cast("double").alias(c) for c in values]
    )
    return cast.unpivot(list(ids), list(values), field_col, value_col)


def pivot(
    df: DataFrame,
    keys: Sequence[str],
    field_col: str = "field",
    value_col: str = "value",
    field_values: Sequence[str] | None = None,
    agg: str = "avg",
) -> DataFrame:
    """Long → wide: one column per field value.

    Pass ``field_values`` whenever known — it removes the driver-side
    distinct job AND pins column order (determinism for the oracle).
    """
    grouped = df.groupBy(*keys)
    piv = grouped.pivot(field_col, list(field_values) if field_values else None)
    return piv.agg(getattr(F, agg)(value_col))
