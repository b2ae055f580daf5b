"""End-to-end corpus-build funnel invariants."""

import pytest

from solar_logger_spark.io.tables import load_table
from solar_logger_spark.queries import scale_ops


@pytest.fixture(scope="module")
def funnel(spark, sf_dir):
    return scale_ops.pipeline_corpus_build(spark, sf_dir).collect()


def test_funnel_is_monotone(funnel):
    for r in funnel:
        assert (
            r.n_docs_in >= r.n_docs_lang >= r.n_docs_quality
            >= r.n_docs_kept >= 0
        )
        assert r.n_chunks >= r.n_docs_kept  # every kept doc chunks >= once
        assert r.total_tokens >= r.n_chunks  # chunks are non-empty
        # packing is shard-dense: sequences within [floor, ceil] of the
        # token budget, and zero iff the shard is empty
        assert r.n_sequences <= (r.total_tokens + 511) // 512
        if r.n_docs_kept:
            assert r.n_sequences >= 1


def test_funnel_totals(funnel, spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs_in for r in funnel) == docs.count()
    # every stage drops something on the standard corpus — the declared
    # thresholds are non-vacuous
    assert sum(r.n_docs_lang for r in funnel) < sum(
        r.n_docs_in for r in funnel
    )
    assert sum(r.n_docs_quality for r in funnel) < sum(
        r.n_docs_lang for r in funnel
    )
    assert sum(r.n_docs_kept for r in funnel) < sum(
        r.n_docs_quality for r in funnel
    )


def test_token_budget_selection_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    out = scale_ops.corpus_token_budget_select(spark, sf_dir)
    per_src = (
        out.filter("selected")
        .groupBy("source")
        .agg(
            F.sum("n_tokens").alias("toks"),
            F.min("quality_score").alias("worst_sel"),
        )
    )
    rows = {r.source: r for r in per_src.collect()}
    rejected = {
        r.source: r
        for r in out.filter("NOT selected")
        .groupBy("source")
        .agg(F.max("quality_score").alias("best_rej"))
        .collect()
    }
    for src, r in rows.items():
        assert r.toks <= 2000  # budget respected
        if src in rejected:
            # greedy by quality: no rejected doc outranks a selected one
            assert rejected[src].best_rej <= r.worst_sel + 1e-12


def test_staged_pipeline_matches_one_shot(spark, sf_dir, tmp_path):
    """The production topology (each stage materialized to the
    copy-on-write store and re-read — tools/run_corpus_pipeline.py)
    must produce byte-identical funnel rows to the one-shot declared
    query: materialize/re-read changes execution topology, never
    results."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    from run_corpus_pipeline import run_staged

    staged = [
        r.asDict()
        for r in run_staged(spark, sf_dir, str(tmp_path / "store")).collect()
    ]
    oneshot = [
        r.asDict()
        for r in scale_ops.pipeline_corpus_build(spark, sf_dir)
        .orderBy("source")
        .collect()
    ]
    assert staged == oneshot
    # the store really holds every stage as a readable snapshot table
    from solar_logger_spark.io import merge as M

    for stage in (
        "stage_lang", "stage_quality", "stage_dedup",
        "stage_chunks", "stage_packed",
    ):
        assert M.read_table_snapshot(
            spark, str(tmp_path / "store" / stage)
        ).count() > 0


def test_windowed_funnel_boundary_semantics(spark, monkeypatch):
    """Pins the chain rule of funnel_windowed_events on constructed
    data: strict lower bound (same-instant events do not chain),
    inclusive upper bound, the purchase window anchored on the CLICK
    (not the view), and EXISTS semantics (a later view can succeed
    where the first view's chain fails)."""
    from datetime import datetime, timedelta
    from solar_logger_spark.queries import scale_ops
    from solar_logger_spark.io import tables as T

    t0 = datetime(2024, 1, 1)

    def ev(i, u, typ, minutes):
        return (i, u, typ, t0 + timedelta(minutes=minutes), 1.0)

    H12 = 12 * 60
    rows = [
        # u1: full chain, upper bounds hit EXACTLY (inclusive)
        ev(1, 1, "view", 0), ev(2, 1, "click", H12),
        ev(3, 1, "purchase", H12 + H12),
        # u2: click at the same instant as view -> strict '>' fails
        ev(4, 2, "view", 0), ev(5, 2, "click", 0),
        # u3: purchase within 12h of the VIEW but NOT of the click
        ev(6, 3, "view", 0), ev(7, 3, "click", 10),
        ev(8, 3, "purchase", 10 + H12 + 1),
        # u4: first view's chain dead, later view's chain works
        ev(9, 4, "view", 0),
        ev(10, 4, "view", 5000), ev(11, 4, "click", 5010),
        ev(12, 4, "purchase", 5020),
        # u5: click outside the view window
        ev(13, 5, "view", 0), ev(14, 5, "click", H12 + 1),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double"
    )
    monkeypatch.setattr(
        scale_ops, "load_table", lambda _s, _d, _t: df
    )
    got = {
        r.user_id: (r.viewed, r.clicked_within_12h, r.purchased_within_12h)
        for r in scale_ops.funnel_windowed_events(spark, "ignored").collect()
    }
    assert got[1] == (True, True, True)     # inclusive upper bounds
    assert got[2] == (True, False, False)   # same-instant: strict >
    assert got[3] == (True, True, False)    # purchase anchored on click
    assert got[4] == (True, True, True)     # EXISTS: later view wins
    assert got[5] == (True, False, False)   # click window exceeded
