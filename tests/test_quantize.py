"""Int8 quantization, seeded-centroid cluster balance, DSIR weights."""

import pytest
from pyspark.sql import Row, functions as F

from solar_logger_spark.io.tables import load_table
from solar_logger_spark.operators import quantize, text
from solar_logger_spark.queries import scale_ops


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_fit_minmax_shape(emb):
    mins, maxs = quantize.fit_minmax(emb)
    dim = len(emb.first()["embedding"])
    assert len(mins) == len(maxs) == dim
    assert all(a <= b for a, b in zip(mins, maxs))


def test_quantize_code_range_and_error_bound(emb):
    mins, maxs = quantize.fit_minmax(emb)
    out = quantize.quantize_int8(emb, mins, maxs)
    rows = out.select("min_code", "max_code", "max_abs_err").collect()
    # codes stay in the int8-representable 0..254 window
    assert min(r.min_code for r in rows) >= 0
    assert max(r.max_code for r in rows) <= 254
    # reconstruction error is bounded by half the widest dimension step
    half_step = max(
        (b - a) / quantize.LEVELS_MINUS_1 for a, b in zip(mins, maxs)
    ) / 2.0
    assert max(r.max_abs_err for r in rows) <= half_step * (1 + 1e-12)


def test_quantize_degenerate_dim(spark):
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.5, 7.0]),
         Row(vec_id=1, embedding=[1.5, 3.0])]
    )
    mins, maxs = quantize.fit_minmax(df)
    assert mins[0] == maxs[0] == 1.5
    out = {r.vec_id: r for r in quantize.quantize_int8(df, mins, maxs)
           .collect()}
    # constant dimension encodes to 0 with zero error; varying dimension
    # hits the endpoints exactly
    assert out[0].codes[0] == out[1].codes[0] == 0
    assert out[0].codes[1] == 254 and out[1].codes[1] == 0
    assert out[0].max_abs_err == 0.0 and out[1].max_abs_err == 0.0


def test_cluster_balance_partition(spark, sf_dir, emb):
    res = scale_ops.embedding_cluster_balance(spark, sf_dir).collect()
    assert sum(r.n_members for r in res) == emb.count()
    assert {r.cluster_id for r in res} <= set(range(8))
    # every centroid is its own nearest centroid -> its cluster's min
    # distance is exactly zero
    assert all(r.min_d2 == 0.0 for r in res)
    assert all(r.max_d2 >= r.min_d2 for r in res)


def test_dsir_weights_semantics(spark):
    # target slice = lang 'en'; 'en'-vocab docs must outscore the
    # disjoint-vocab doc, and masses are exact integer sums
    df = spark.createDataFrame(
        [
            Row(doc_id=0, lang="en", text="alpha beta alpha"),
            Row(doc_id=1, lang="en", text="alpha gamma"),
            Row(doc_id=2, lang="de", text="zeta zeta eta"),
        ]
    )
    out = {
        r.doc_id: r
        for r in text.dsir_weights(df, target=F.col("lang") == "en")
        .collect()
    }
    # corpus totals: 8 tokens, target totals: 5
    # doc 0: tc over [alpha, beta, alpha] = 3+1+3 = 7; cc = 7
    assert out[0].target_mass == 7 and out[0].corpus_mass == 7
    assert out[0].importance == pytest.approx((7 * 8) / (7 * 5))
    # doc 2 shares no vocab with the target slice
    assert out[2].target_mass == 0 and out[2].importance == 0.0
    assert out[1].importance > out[2].importance


def test_dsir_weights_on_corpus(spark, sf_dir):
    out = scale_ops.text_dsir_weights(spark, sf_dir)
    pdf = out.join(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang"),
        "doc_id",
    ).groupBy(F.col("lang") == "en").agg(F.avg("importance")).collect()
    by_target = {r[0]: r[1] for r in pdf}
    # the target slice scores itself higher than the rest of the corpus
    assert by_target[True] > by_target[False]
