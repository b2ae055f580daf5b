"""Product quantization: codebook shapes, encode determinism, and ADC
recall vs exact brute force (raw and with exact shortlist re-ranking —
the synthetic embeddings are near-uniform on the sphere, the hardest
case for compressed-domain ranking)."""

from __future__ import annotations

import numpy as np

from solar_logger_spark.io.tables import load_table
from solar_logger_spark.operators import pq


def test_codebook_shape_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = pq.train_codebooks(emb, m=8, ks=16)
    b = pq.train_codebooks(emb, m=8, ks=16)
    d = len(emb.select("embedding").first()[0])
    assert a.shape == (8, 16, d // 8)
    assert np.array_equal(a, b)


def test_encode_codes_in_range_and_stable(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq.train_codebooks(emb, m=8, ks=16)
    enc1 = {r.vec_id: tuple(r.codes) for r in pq.encode(emb, books).collect()}
    enc2 = {
        r.vec_id: tuple(r.codes)
        for r in pq.encode(emb.repartition(7), books).collect()
    }
    assert enc1 == enc2  # partition-independent
    assert all(0 <= c < 16 for codes in enc1.values() for c in codes)


def test_adc_recall_vs_bruteforce(spark, sf_dir):
    from solar_logger_spark.operators.similarity import topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, queries, k=5).collect()
    }
    books = pq.train_codebooks(emb, m=8, ks=16)
    encoded = pq.encode(emb, books)
    shortlist_only = {
        (r.query_id, r.neighbor_id)
        for r in pq.topk_adc(encoded, queries, books, k=5).collect()
    }
    # raw ADC on near-uniform synthetic vectors: must beat chance
    # (chance recall of a 5-of-499 draw is ~1%)
    assert len(shortlist_only & exact) / len(exact) >= 0.05
    # two-stage: ADC shortlist + exact re-rank — the production path
    reranked = {
        (r.query_id, r.neighbor_id)
        for r in pq.topk_adc(
            encoded, queries, books, k=5, rerank=100, raw=emb
        ).collect()
    }
    assert len(reranked & exact) / len(exact) >= 0.7


def test_ivfpq_recall_and_pruned_scan(spark, sf_dir):
    from solar_logger_spark.operators.similarity import topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, queries, k=5).collect()
    }
    encoded, cents, books = pq.build_ivfpq(emb, n_cells=8, m=8, ks=16)
    out = pq.topk_ivfpq(
        encoded, queries, cents, books, k=5, n_probe=4, rerank=100, raw=emb
    ).collect()
    # every query answered with exactly k ranked rows
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
    # probing half the cells + exact re-rank: recall well above chance;
    # near-uniform sphere vectors are the worst case, so the bar is the
    # same as two-stage flat PQ
    got = {(r.query_id, r.neighbor_id) for r in out}
    assert len(got & exact) / len(exact) >= 0.6


def test_ivfpq_residual_beats_or_matches_flat_adc(spark, sf_dir):
    """Shortlist-only (no re-rank) recall of residual-encoded IVF-PQ
    probing ALL cells should at least match flat PQ at equal code
    budget — residuals concentrate, codes get finer."""
    from solar_logger_spark.operators.similarity import topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, queries, k=5).collect()
    }
    books_flat = pq.train_codebooks(emb, m=8, ks=16)
    flat = {
        (r.query_id, r.neighbor_id)
        for r in pq.topk_adc(
            pq.encode(emb, books_flat), queries, books_flat, k=5
        ).collect()
    }
    encoded, cents, books = pq.build_ivfpq(emb, n_cells=8, m=8, ks=16)
    comp = {
        (r.query_id, r.neighbor_id)
        for r in pq.topk_ivfpq(
            encoded, queries, cents, books, k=5, n_probe=8
        ).collect()
    }
    assert len(comp & exact) >= len(flat & exact)


def test_ivfpq_persistence_roundtrip(spark, sf_dir, tmp_path):
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.limit(5)
    encoded, cents, books = pq.build_ivfpq(emb, n_cells=8, m=8, ks=16)
    before = {
        (r.query_id, r.neighbor_id, round(r.approx_dist, 12))
        for r in pq.topk_ivfpq(
            encoded, queries, cents, books, k=5, n_probe=3
        ).collect()
    }
    path = str(tmp_path / "ivfpq")
    pq.save_ivfpq(encoded, cents, books, path)
    enc2, cents2, books2 = pq.load_ivfpq(spark, path)
    assert np.allclose(cents, cents2) and np.allclose(books, books2)
    after = {
        (r.query_id, r.neighbor_id, round(r.approx_dist, 12))
        for r in pq.topk_ivfpq(
            enc2, queries, cents2, books2, k=5, n_probe=3
        ).collect()
    }
    assert before == after
    # the persisted layout is cell-partitioned: probing must prune
    plan = pq.topk_ivfpq(
        enc2, queries, cents2, books2, k=5, n_probe=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "cell" in plan


def test_pq_deterministic_partition_invariant(spark, sf_dir):
    """Both oracle-backed deterministic retrievers must produce
    BIT-identical output under any input partitioning (fold orders
    pinned to id order, never arrival order)."""
    from pyspark.sql import functions as F

    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.operators.pq import (
        topk_ivfpq_deterministic,
        topk_pq_deterministic,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)

    def runs(fn, **kw):
        out = []
        for corpus in (emb, emb.repartition(5, "vec_id"), emb.coalesce(1)):
            rows = fn(corpus, q, k=3, **kw).collect()
            out.append(sorted(
                (r.query_id, r.neighbor_id, r.approx_dist.hex(), r.rank)
                for r in rows
            ))
        return out

    a, b, c = runs(topk_pq_deterministic, m=8, ks=8, rerank=50)
    assert a == b == c and len(a) == 15
    a, b, c = runs(
        topk_ivfpq_deterministic, n_cells=8, n_probe=4, m=8, ks=8,
        rerank=50, coarse_rounds=0,
    )
    assert a == b == c and len(a) == 15
