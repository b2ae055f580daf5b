"""Multimodal binary plumbing: schema, batching, stub codec gating."""

import pytest
from pyspark.sql import Row

from solar_logger_spark.operators import multimodal


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"document number {i} with some payload text")
         for i in range(10)]
    )


def test_attach_blob_schema(docs):
    out = multimodal.attach_blob(docs)
    kinds = dict(out.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct")
    row = out.filter("doc_id = 3").collect()[0]
    assert row.meta.n_bytes == len(row.payload)


def test_extract_features_deterministic(docs):
    blobs = multimodal.attach_blob(docs)
    a = {r.doc_id: (r.width, r.height, r.mode, r.media_md5)
         for r in multimodal.extract_features(blobs, fake=True).collect()}
    b = {r.doc_id: (r.width, r.height, r.mode, r.media_md5)
         for r in multimodal.extract_features(blobs, fake=True).collect()}
    assert a == b
    assert all(64 <= v[0] <= 255 and v[2] in {"RGB", "RGBA", "L"}
               for v in a.values())


def test_real_decode_path_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_stub(b"bytes", fake=False)


def test_blob_meta_matches_payload(docs):
    meta = {r.doc_id: r for r in multimodal.blob_meta(docs).collect()}
    src = {r.doc_id: r.text for r in docs.collect()}
    for i, t in src.items():
        assert meta[i].n_bytes == len(t.encode())
