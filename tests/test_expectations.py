"""Expectation-suite semantics on constructed data: every check type's
NULL / boundary behavior is pinned here (the declared registry query
exercises only the clean-data paths)."""

from __future__ import annotations

import pytest

from solar_logger_spark.operators import expectations as ex


def _report(df):
    return {
        r["check_name"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        # id, fk, kind, score, code
        (1, 10, "view", 5.0, "abc"),
        (1, 10, "view", 150.0, "abc"),      # dup id; score over range
        (2, 99, "bogus", -1.0, "ABC"),      # fk missing; bad kind; under
        (3, None, "click", None, None),     # null fk/score/code pass range
        (None, 10, None, 50.0, "a1"),       # null id/kind; code regex fail
    ]
    return spark.createDataFrame(
        rows, "id long, fk long, kind string, score double, code string"
    )


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame(
        [(10,), (10,), (11,), (None,)], "key long"
    )  # duplicate + NULL ref keys must not inflate/contaminate counts


def test_each_check_type_counts_violations_exactly(spark, dirty, ref):
    rep = _report(
        ex.run_suite(
            dirty,
            [
                ex.not_null("id"),
                ex.unique("id"),
                ex.accepted_values("kind", ["view", "click"]),
                ex.in_range("score", 0, 100),
                ex.matches_regex("code", "^[a-z]+$"),
                ex.referential("fk", ref, "key"),
            ],
            table="t",
        )
    )
    assert rep["t.not_null.id"] == (5, 1, False)
    # 4 non-null ids, 3 distinct -> 1 excess duplicate; NULL not counted
    assert rep["t.unique.id"] == (5, 1, False)
    # 'bogus' violates; NULL kind passes accepted_values
    assert rep["t.accepted_values.kind"] == (5, 1, False)
    # 150 over, -1 under; NULL passes
    assert rep["t.in_range.score[0,100]"] == (5, 2, False)
    # 'ABC' and 'a1' fail; NULL passes
    assert rep["t.matches_regex.code"] == (5, 2, False)
    # fk=99 absent from ref; NULL fk passes; duplicate ref keys don't
    # inflate n_rows (left join against DISTINCT keys)
    assert rep["t.referential.fk->key"] == (5, 1, False)


def test_clean_table_passes_everything(spark, ref):
    clean = spark.createDataFrame([(1, 10), (2, 11)], "id long, fk long")
    rep = _report(
        ex.run_suite(
            clean,
            [ex.not_null("id"), ex.unique("id"),
             ex.referential("fk", ref, "key")],
            table="c",
        )
    )
    assert all(v == (2, 0, True) for v in rep.values())


def test_report_is_ordered_and_typed(spark, dirty, ref):
    df = ex.run_suite(
        dirty, [ex.unique("id"), ex.not_null("fk")], table="t"
    )
    assert [f.name for f in df.schema.fields] == [
        "check_name", "check_type", "column_name",
        "n_rows", "n_violations", "passed",
    ]
    names = [r["check_name"] for r in df.collect()]
    assert names == sorted(names)


def test_empty_suite_and_unknown_type_raise(spark, dirty):
    with pytest.raises(ValueError, match="empty"):
        ex.run_suite(dirty, [])
    with pytest.raises(ValueError, match="unknown check type"):
        ex.run_suite(dirty, [{"type": "nope", "col": "id"}])


def test_empty_table_reports_zero_rows_and_passes(spark):
    empty = spark.createDataFrame([], "id long")
    rep = _report(ex.run_suite(empty, [ex.not_null("id"), ex.unique("id")]))
    # sum() over zero rows is NULL -> coalesced to 0; checks pass
    assert rep["table.not_null.id"] == (0, 0, True)
    assert rep["table.unique.id"] == (0, 0, True)


def test_single_scan_for_row_predicates(spark, dirty):
    """All row-predicate checks must fold into one aggregate over the
    input — the explain should contain exactly one scan of the source
    for the predicate frame (unique/referential add their own)."""
    df = ex.run_suite(
        dirty,
        [ex.not_null("id"), ex.in_range("score", 0, 100),
         ex.accepted_values("kind", ["view", "click"])],
        table="t",
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("localtablescan") + plan.lower().count(
        "logicalrdd"
    ) == 1


def test_parameterized_names_and_duplicate_guard(spark, ref):
    """Two checks of the same (type, col) with different parameters
    get distinguishable names; truly colliding checks are rejected
    rather than silently collapsing in a name-keyed report."""
    df = spark.createDataFrame([(1, 5)], "fk long, score long")
    rep = _report(ex.run_suite(
        df,
        [ex.in_range("score", 0, 10), ex.in_range("score", 100, 200),
         ex.referential("fk", ref, "key")],
        table="t",
    ))
    assert set(rep) == {
        "t.in_range.score[0,10]", "t.in_range.score[100,200]",
        "t.referential.fk->key",
    }
    assert rep["t.in_range.score[0,10]"][2] is True
    assert rep["t.in_range.score[100,200]"][2] is False
    # explicit name= disambiguates otherwise-identical checks
    rep2 = _report(ex.run_suite(
        df,
        [ex.referential("fk", ref, "key", name="fk_vs_a"),
         ex.referential("fk", ref, "key", name="fk_vs_b")],
        table="t",
    ))
    assert set(rep2) == {"t.fk_vs_a", "t.fk_vs_b"}
    with pytest.raises(ValueError, match="duplicate check names"):
        ex.run_suite(
            df, [ex.not_null("fk"), ex.not_null("fk")], table="t"
        )
