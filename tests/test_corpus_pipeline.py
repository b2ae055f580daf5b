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
