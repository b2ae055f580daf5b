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


def _ref_png_bytes(w, h, mode="RGB"):
    """Deterministic test pixels + their stdlib-encoded PNG."""
    from solar_logger_spark.operators.png_codec import png_encode

    ch = {"L": 1, "RGB": 3, "RGBA": 4}[mode]
    px = bytes(
        (x * 7 + y * 13 + c * 29) % 251
        for y in range(h) for x in range(w) for c in range(ch)
    )
    return px, png_encode(px, w, h, mode)


def test_png_codec_roundtrip_all_modes():
    """r9 stdlib codec: encode -> decode returns the identical pixel
    buffer for every supported mode; no image library involved."""
    from solar_logger_spark.operators import png_codec as P

    for mode in ("L", "RGB", "RGBA"):
        px, blob = _ref_png_bytes(9, 5, mode)
        assert P.is_png(blob)
        w, h, m, got = P.png_decode(blob)
        assert (w, h, m) == (9, 5, mode)
        assert bytes(got) == px


def test_png_codec_unfilters_every_filter_type():
    """Hand-filter scanlines with each PNG filter (Sub/Up/Average/
    Paeth) and require the decoder to recover the original pixels."""
    import struct
    import zlib

    from solar_logger_spark.operators import png_codec as P

    w, h, ch = 6, 5, 3
    px, _ = _ref_png_bytes(w, h, "RGB")
    stride = w * ch

    def flt(f, line, prev):
        out = bytearray([f])
        for i, x in enumerate(line):
            a = line[i - ch] if i >= ch else 0
            b = prev[i] if prev else 0
            c = prev[i - ch] if (prev and i >= ch) else 0
            sub = {
                0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: P._paeth(a, b, c),
            }[f]
            out.append((x - sub) & 0xFF)
        return bytes(out)

    raw = bytearray()
    prev = None
    for y in range(h):
        line = px[y * stride:(y + 1) * stride]
        raw += flt(y % 5, line, prev)  # rows cycle through all filters
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        P._SIG + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + P._chunk(b"IEND", b"")
    )
    got_w, got_h, mode, got = P.png_decode(blob)
    assert (got_w, got_h, mode) == (w, h, "RGB")
    assert bytes(got) == px


def test_png_codec_rejects_unsupported_forms():
    import struct
    import zlib

    import pytest

    from solar_logger_spark.operators import png_codec as P

    def ihdr_png(depth=8, color=2, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        return (
            P._SIG + P._chunk(b"IHDR", ihdr)
            + P._chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + P._chunk(b"IEND", b"")
        )

    with pytest.raises(ValueError, match="bad signature"):
        P.png_decode(b"JFIF....")
    with pytest.raises(ValueError, match="bit depth"):
        P.png_decode(ihdr_png(depth=16))
    with pytest.raises(ValueError, match="color type"):
        P.png_decode(ihdr_png(color=3))  # palette
    with pytest.raises(ValueError, match="interlace"):
        P.png_decode(ihdr_png(interlace=1))
    _, blob = _ref_png_bytes(4, 4)
    with pytest.raises(ValueError, match="no IEND"):
        P.png_decode(blob[:-12])


def test_png_real_codec_branch_in_spark(spark):
    """The real-codec branch runs HERE (no Pillow needed): stdlib PNGs
    through extract_features(codec='png') report true dimensions, and
    resize_images(codec='png') emits PNGs that re-decode at the target
    dims with pixels drawn from the source (nearest neighbor)."""
    from pyspark.sql import Row

    from solar_logger_spark.operators import multimodal as MM
    from solar_logger_spark.operators import png_codec as P

    px1, b1 = _ref_png_bytes(10, 20, "RGB")
    px2, b2 = _ref_png_bytes(33, 7, "RGBA")
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=b1), Row(doc_id=2, payload=b2)]
    )
    feats = {
        r.doc_id: r
        for r in MM.extract_features(df, codec="png").collect()
    }
    assert (feats[1].width, feats[1].height, feats[1].mode) == (10, 20, "RGB")
    assert (feats[2].width, feats[2].height, feats[2].mode) == (33, 7, "RGBA")

    rez = {
        r.doc_id: r
        for r in MM.resize_images(df, width=8, height=8, codec="png").collect()
    }
    for did, src_px, src_w, ch in ((1, px1, 10, 3), (2, px2, 33, 4)):
        w, h, _m, got = P.png_decode(bytes(rez[did].payload))
        assert (w, h) == (8, 8)
        # nearest-neighbor: output pixel (0,0) is source pixel (0,0)
        assert bytes(got[:ch]) == src_px[:ch]

    # same plumbing as the stub path: identical output schema
    stub = MM.extract_features(df, codec="stub")
    assert stub.schema == MM.extract_features(df, codec="png").schema
