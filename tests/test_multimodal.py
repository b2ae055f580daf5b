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


def test_resize_images_plumbing(spark, sf_dir):
    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.operators.multimodal import attach_blob, resize_images

    docs = attach_blob(load_table(spark, sf_dir, "documents").limit(20))
    out = resize_images(docs, width=32, height=8).collect()
    assert len(out) == 20
    assert all(len(r.payload) == 32 * 8 for r in out)
    assert all((r.width, r.height) == (32, 8) for r in out)


def test_resize_real_codec_is_explicitly_stubbed():
    import pytest

    from solar_logger_spark.operators.multimodal import resize_stub

    with pytest.raises(NotImplementedError):
        resize_stub(b"x", 4, 4, fake=False)


def test_sample_frames_fanout(spark, sf_dir):
    from solar_logger_spark.io.tables import load_table
    from solar_logger_spark.operators.multimodal import attach_blob, sample_frames

    docs = attach_blob(load_table(spark, sf_dir, "documents").limit(5))
    src = {r.doc_id: bytes(r.payload) for r in docs.collect()}
    out = sample_frames(docs, every_n=2, frame_bytes=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        n_frames = max(len(src[doc_id]) // 64, 1)
        assert len(rows) == len(range(0, n_frames, 2))
        for r in rows:
            lo = r.frame_idx * 64
            assert bytes(r.frame) == src[doc_id][lo : lo + 64]


def test_decode_media_real_formats(spark):
    """Real stdlib decode: authentic WAV bytes (written by the wave
    module) and PPM headers parse exactly; unknown formats raise."""
    import io
    import struct
    import wave

    import pytest
    from pyspark.sql import Row

    from solar_logger_spark.operators import multimodal as mm

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<6h", 1, -2, 3, -4, 5, -6))  # 3 frames
    wav = buf.getvalue()
    ppm = b"P6\n12 7\n255\n" + b"\x00" * (12 * 7 * 3)

    assert mm.decode_media(ppm) == ("ppm", 12, 7, "RGB")
    assert mm.decode_media(wav) == ("wav", 3, 2, "PCM16")
    with pytest.raises(ValueError, match="unsupported media format"):
        mm.decode_media(b"GIF89a....")
    with pytest.raises(ValueError, match="malformed PPM"):
        mm.decode_media(b"P6garbage")

    df = spark.createDataFrame(
        [Row(doc_id=1, payload=bytearray(ppm)), Row(doc_id=2, payload=bytearray(wav))]
    )
    out = {r.doc_id: r for r in mm.extract_real_features(df).collect()}
    assert (out[1].width, out[1].height, out[1].mode) == (12, 7, "RGB")
    assert (out[2].width, out[2].height, out[2].mode) == (3, 2, "PCM16")
    assert out[1].n_bytes == len(ppm)


def test_decode_media_malformed_wav_raises_valueerror():
    import pytest

    from solar_logger_spark.operators import multimodal as mm

    truncated = b"RIFF\x10\x00\x00\x00WAVEfmt "  # valid magic, dead body
    with pytest.raises(ValueError, match="malformed WAV"):
        mm.decode_media(truncated)


def test_codec_arg_validation_and_auto_fallback(spark):
    """codec="auto" must fall back to the stub when Pillow is absent
    (this container ships none), and bad codec names fail fast."""
    import pytest
    from pyspark.sql import Row

    from solar_logger_spark.operators import multimodal as MM

    df = spark.createDataFrame([Row(doc_id=1, payload=b"abc")])
    with pytest.raises(ValueError, match="unknown codec"):
        MM.extract_features(df, codec="jpegxl")
    with pytest.raises(ValueError, match="unknown codec"):
        MM.resize_images(df, codec="jpegxl")
    if not MM.have_pil():
        got = MM.extract_features(df, codec="auto").collect()
        assert len(got) == 1 and got[0].width >= 64  # stub path ran


def test_pil_roundtrip_when_available(spark):
    """Real-codec round-trip: encode a tiny PNG, extract features (real
    dims/mode), resize and re-decode (target dims). Skipped where
    Pillow is not installed — the plumbing is identical either way."""
    import pytest

    PIL = pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image
    from pyspark.sql import Row

    from solar_logger_spark.operators import multimodal as MM

    def png(w, h, color):
        buf = BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        Row(doc_id=1, payload=png(10, 20, (255, 0, 0))),
        Row(doc_id=2, payload=png(33, 7, (0, 255, 0))),
    ]
    df = spark.createDataFrame(rows)
    feats = {r.doc_id: r for r in MM.extract_features(df, codec="pil").collect()}
    assert (feats[1].width, feats[1].height, feats[1].mode) == (10, 20, "RGB")
    assert (feats[2].width, feats[2].height) == (33, 7)

    rez = {r.doc_id: r for r in MM.resize_images(df, width=8, height=8, codec="pil").collect()}
    for did in (1, 2):
        with Image.open(BytesIO(bytes(rez[did].payload))) as im:
            assert (im.width, im.height) == (8, 8)
