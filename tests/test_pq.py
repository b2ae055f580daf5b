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
