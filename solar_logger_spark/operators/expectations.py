"""Declarative expectation suites — the dbt-test / Great-Expectations
gate a pipeline runs BEFORE training data ships: every check compiles
to Spark aggregates and the suite returns one report row per check
(name, rows scanned, violation count, pass flag) instead of failing
row-by-row.

Check surface (the dbt core four, plus ranges and regex):

* ``not_null(col)`` — violations are NULL rows.
* ``unique(col)`` — violations are EXCESS duplicate rows among
  non-null keys: ``count(col) - count(DISTINCT col)`` (NULL keys are
  not_null's job, so they're excluded here — engine-independent, since
  DuckDB's count(DISTINCT) also skips NULLs).
* ``accepted_values(col, values)`` — violations are non-NULL values
  outside the set (NULL passes; pair with not_null to forbid it).
* ``in_range(col, lo, hi)`` — violations are non-NULL values outside
  [lo, hi] inclusive.
* ``matches_regex(col, pattern)`` — violations are non-NULL values
  not matching. Stick to RE2-compatible patterns if a DuckDB oracle
  must agree (Spark uses Java regex, DuckDB RE2).
* ``referential(col, ref_df, ref_col)`` — violations are non-NULL
  foreign keys absent from the reference column.

Spark shape, sized for 100 TB fact tables:

* ALL row-predicate checks on a table fold into ONE aggregate scan
  (map-side partials; each check is a ``sum(CASE WHEN violated)``
  buffer), then the single result row explodes into report rows —
  no per-check jobs, no driver loop.
* ``unique`` runs as its OWN aggregation per key rather than fusing
  count(DISTINCT) into the predicate scan: a fused multi-distinct
  makes Catalyst Expand every input row across duplicate groups and
  drag the other buffers with it (operators/profile.py measured the
  fused form ~1.8x slower — same lesson applied here).
* ``referential`` is a left join against the DISTINCT reference keys
  (broadcast when the dimension is small, AQE decides) folded into
  one aggregate — never a crossJoin of two counts.
* The per-check report frames are single-row; the final union is
  driver-trivial.

Reference parity: the reference engine has no data-quality surface —
this is part of the beyond-reference training-pipeline layer
(SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_ROW_PREDICATE = {"not_null", "accepted_values", "in_range", "matches_regex"}


def not_null(col: str, name: str | None = None) -> dict:
    return {"type": "not_null", "col": col, "name": name}


def unique(col: str, name: str | None = None) -> dict:
    return {"type": "unique", "col": col, "name": name}


def accepted_values(
    col: str, values: Sequence, name: str | None = None
) -> dict:
    return {"type": "accepted_values", "col": col, "values": list(values),
            "name": name}


def in_range(col: str, lo, hi, name: str | None = None) -> dict:
    return {"type": "in_range", "col": col, "lo": lo, "hi": hi,
            "name": name}


def matches_regex(col: str, pattern: str, name: str | None = None) -> dict:
    return {"type": "matches_regex", "col": col, "pattern": pattern,
            "name": name}


def referential(
    col: str, ref_df: DataFrame, ref_col: str, name: str | None = None
) -> dict:
    return {"type": "referential", "col": col, "ref_df": ref_df,
            "ref_col": ref_col, "name": name}


def _check_name(table: str, chk: dict) -> str:
    """Default report name. Parameterized checks carry their
    parameterization so two checks of the same (type, col) — two
    range bands, FKs into two reference tables — stay distinguishable
    in a name-keyed report; ``name=`` overrides when that's not
    enough (e.g. same ref_col name in two reference tables)."""
    if chk.get("name"):
        return f"{table}.{chk['name']}"
    base = f"{table}.{chk['type']}.{chk['col']}"
    if chk["type"] == "in_range":
        return f"{base}[{chk['lo']},{chk['hi']}]"
    if chk["type"] == "referential":
        return f"{base}->{chk['ref_col']}"
    return base


def _violation_indicator(chk: dict) -> Column:
    c = F.col(chk["col"])
    t = chk["type"]
    if t == "not_null":
        viol = c.isNull()
    elif t == "accepted_values":
        viol = c.isNotNull() & ~c.isin(chk["values"])
    elif t == "in_range":
        viol = c.isNotNull() & ((c < F.lit(chk["lo"])) | (c > F.lit(chk["hi"])))
    elif t == "matches_regex":
        viol = c.isNotNull() & ~c.rlike(chk["pattern"])
    else:  # pragma: no cover - guarded by run_suite
        raise ValueError(f"not a row predicate: {t!r}")
    return F.when(viol, F.lit(1)).otherwise(F.lit(0))


_REPORT_COLS = ["check_name", "check_type", "column_name",
                "n_rows", "n_violations", "passed"]


def _report_row(name: str, ctype: str, col: str,
                n_rows: Column, n_viol: Column) -> list[Column]:
    return [
        F.lit(name).alias("check_name"),
        F.lit(ctype).alias("check_type"),
        F.lit(col).alias("column_name"),
        n_rows.cast("long").alias("n_rows"),
        n_viol.cast("long").alias("n_violations"),
        (n_viol.cast("long") == F.lit(0)).alias("passed"),
    ]


def run_suite(df: DataFrame, checks: Sequence[dict],
              table: str = "table") -> DataFrame:
    """Evaluate ``checks`` against ``df``; one report row per check,
    ordered by check_name. Row-predicate checks share a single scan."""
    if not checks:
        raise ValueError("empty expectation suite")
    names = [_check_name(table, c) for c in checks]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"duplicate check names {sorted(dupes)}; pass name= to "
            "disambiguate"
        )
    frames: list[DataFrame] = []

    predicates = [c for c in checks if c["type"] in _ROW_PREDICATE]
    if predicates:
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, chk in enumerate(predicates):
            aggs.append(F.sum(_violation_indicator(chk)).alias(f"_v{i}"))
        one = df.agg(*aggs)
        structs = [
            F.struct(*_report_row(
                _check_name(table, chk), chk["type"], chk["col"],
                F.col("_n"), F.coalesce(F.col(f"_v{i}"), F.lit(0)),
            ))
            for i, chk in enumerate(predicates)
        ]
        frames.append(
            one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
        )

    for chk in checks:
        if chk["type"] == "unique":
            col = chk["col"]
            one = df.agg(
                F.count(F.lit(1)).alias("_n"),
                (F.count(col) - F.count_distinct(F.col(col))).alias("_v"),
            )
            frames.append(one.select(*_report_row(
                _check_name(table, chk), "unique", col,
                F.col("_n"), F.col("_v"),
            )))
        elif chk["type"] == "referential":
            col, ref_col = chk["col"], chk["ref_col"]
            ref = chk["ref_df"].select(
                F.col(ref_col).alias("_ref_key")
            ).distinct()
            joined = df.select(F.col(col)).join(
                ref, F.col(col) == F.col("_ref_key"), "left"
            )
            one = joined.agg(
                F.count(F.lit(1)).alias("_n"),
                F.sum(
                    F.when(
                        F.col(col).isNotNull() & F.col("_ref_key").isNull(),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                ).alias("_v"),
            )
            frames.append(one.select(*_report_row(
                _check_name(table, chk), "referential", col,
                F.col("_n"), F.coalesce(F.col("_v"), F.lit(0)),
            )))
        elif chk["type"] not in _ROW_PREDICATE:
            raise ValueError(f"unknown check type: {chk['type']!r}")

    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("check_name")
