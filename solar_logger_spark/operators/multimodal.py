"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so the (CPU-heavy) per-item work is vectorized per
partition and never touches the driver.

The actual codec step is STUBBED (`decode_stub` below) because no
image/audio libraries exist in this environment — it raises
``NotImplementedError`` unless ``fake=True``, in which case it derives
deterministic pseudo-features from the payload bytes. Everything
Spark-side — schema, batching, partitioning, UDF signature — is real
and tested; swapping in a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# what a decoded media item looks like to downstream operators
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("media_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)


def attach_blob(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload + metadata struct (stand-in
    for real image/audio bytes; the testdata ships no media columns)."""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        blob.alias("payload"),
        F.struct(
            F.length(blob).alias("n_bytes"),
            F.md5(blob).alias("md5"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, fake: bool) -> tuple[int, int, str]:
    """The codec boundary. Real decoding needs PIL/ffmpeg — not present
    in this container, so it is explicitly stubbed.

    With ``fake=True``: deterministic pseudo-dimensions derived from the
    payload digest, so tests exercise the full Spark plumbing with
    stable outputs.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires an image/audio codec library; "
            "swap decode_stub for a real decoder in production"
        )
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192          # 64..255
    height = 64 + digest[1] % 192
    mode = ["RGB", "RGBA", "L"][digest[2] % 3]
    return width, height, mode


def _extract_with(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    decode_fn,
) -> DataFrame:
    """Shared Arrow-batched extraction body: ``decode_fn(payload) ->
    (width, height, mode)`` is the only pluggable piece (the
    "swap in a real codec is a one-function change" boundary)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            dims = [decode_fn(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "media_md5": payloads.map(
                        lambda p: hashlib.md5(p).hexdigest()
                    ),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "mode": [d[2] for d in dims],
                }
            )

    src = df.select(F.col(id_col), F.col(payload_col))
    return src.mapInPandas(batches, FEATURE_SCHEMA)


def have_pil() -> bool:
    """True when Pillow is importable — the optional real codec. Never
    a hard dependency: this container ships no image libraries, so the
    oracle-verified path stays the deterministic stub."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def pil_decode(payload: bytes) -> tuple[int, int, str]:
    """Real image decode via Pillow: (width, height, mode). Import is
    local so the module loads without Pillow installed; executors
    raise ImportError loudly if the codec is requested but absent."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        return im.width, im.height, im.mode


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
    codec: str = "stub",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``codec``: ``"stub"`` (default — ``decode_stub``; ``fake=True``
    derives deterministic pseudo-features, the oracle-verified path),
    ``"pil"`` (real Pillow decode; ImportError without Pillow),
    ``"png"`` (real decode via the pure-stdlib
    ``operators.png_codec`` — no image library needed, so the
    real-codec branch is testable in this container; PNG-only), or
    ``"auto"`` (Pillow when importable, else the stub). The Spark
    plumbing — schema, Arrow batching, signature — is identical in
    every mode; the codec is the one pluggable function.

    ``mapInPandas`` keeps each executor working on whole record batches
    (no per-row Python overhead) and the output schema is fixed, so the
    operator composes with normal DataFrame code downstream.
    """
    if codec not in ("stub", "pil", "png", "auto"):
        raise ValueError(f"unknown codec {codec!r}")
    if codec == "auto":
        codec = "pil" if have_pil() else "stub"
    if codec == "pil":
        return _extract_with(df, id_col, payload_col, pil_decode)
    if codec == "png":
        from solar_logger_spark.operators.png_codec import png_dims

        return _extract_with(df, id_col, payload_col, png_dims)
    return _extract_with(
        df, id_col, payload_col, lambda p: decode_stub(p, fake)
    )


def blob_meta(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Pure-JVM metadata over binary payloads (no Python): byte length,
    digest, hex prefix — the cheap pre-filter columns a media pipeline
    partitions and dedups on before any decode."""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        F.length(blob).cast("long").alias("n_bytes"),
        F.md5(blob).alias("blob_md5"),
        F.substring(F.hex(blob), 1, 16).alias("head_hex"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_stub(
    payload: bytes, width: int, height: int, fake: bool
) -> bytes:
    """Codec boundary for resize. Real implementation needs PIL/ffmpeg;
    the fake produces a deterministic byte string of size width*height
    derived from the payload (digest-seeded repetition), so output
    sizing and schema behave like the real thing."""
    if not fake:
        raise NotImplementedError(
            "image resize requires a codec library; swap resize_stub "
            "for a real resizer in production"
        )
    seed = hashlib.md5(payload).digest()
    need = width * height
    return (seed * (need // len(seed) + 1))[:need]


def pil_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real resize via Pillow: decode, LANCZOS-resample, re-encode as
    PNG bytes (lossless — the round-trip is deterministic)."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        out = BytesIO()
        im.resize((width, height), Image.LANCZOS).save(out, format="PNG")
        return out.getvalue()


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
    codec: str = "stub",
) -> DataFrame:
    """Batch resize over binary payloads — one output row per input, new
    payload bytes sized to the target dimensions. ``mapInPandas`` so the
    (real) codec gets whole Arrow batches per call. ``codec`` as in
    :func:`extract_features`: "stub" (default), "pil", "png"
    (stdlib nearest-neighbor — deterministic, no image library), or
    "auto"."""
    if codec not in ("stub", "pil", "png", "auto"):
        raise ValueError(f"unknown codec {codec!r}")
    if codec == "auto":
        codec = "pil" if have_pil() else "stub"
    if codec == "pil":
        def _one(p: bytes) -> bytes:
            return pil_resize(p, width, height)
    elif codec == "png":
        from solar_logger_spark.operators.png_codec import png_resize

        def _one(p: bytes) -> bytes:
            return png_resize(p, width, height)
    else:
        def _one(p: bytes) -> bytes:
            return resize_stub(p, width, height, fake)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [_one(bytes(p)) for p in pdf[payload_col]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, RESIZED_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 4,
    frame_bytes: int = 256,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling: one binary payload fans out to every n-th
    "frame" row — the one→many decode shape (a real implementation
    seeks keyframes; the stub treats the payload as fixed-size frame
    chunks). The fan-out happens inside ``mapInPandas`` so frames land
    already distributed — no driver round-trip, no explode of a
    pre-materialized array."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = max(len(payload) // frame_bytes, 1)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(
                        bytes(payload[i * frame_bytes : (i + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, FRAME_SCHEMA
    )


def decode_media(payload: bytes) -> tuple[str, int, int, str]:
    """REAL (stdlib-only) decoding for the two formats that need no
    codec library, upgrading the stub boundary for them:

    * PPM (P6): ASCII header parse → ("ppm", width, height, "RGB")
    * WAV (RIFF/WAVE): stdlib ``wave`` → ("wav", n_frames, n_channels,
      "PCM<bits>") — frame count / channel count ride in the
      width/height slots of FEATURE_SCHEMA (documented mapping)

    Anything else raises ValueError — PIL/ffmpeg formats stay behind
    the explicit stub (`decode_stub`). This is the "swap in a real
    codec" one-function change the stub docstring promises, done for
    the formats pure Python can own.
    """
    if payload[:2] == b"P6":
        # header: "P6" ws width ws height ws maxval single-ws, then raster
        import re

        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
        if not m:
            raise ValueError("malformed PPM header")
        return "ppm", int(m.group(1)), int(m.group(2)), "RGB"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload)) as w:
                return (
                    "wav",
                    w.getnframes(),
                    w.getnchannels(),
                    f"PCM{8 * w.getsampwidth()}",
                )
        except (wave.Error, EOFError) as exc:
            # keep the documented contract: malformed media ⇒ ValueError
            raise ValueError(f"malformed WAV payload: {exc}") from exc
    raise ValueError(
        f"unsupported media format (head={payload[:4]!r}); "
        "PIL/ffmpeg formats remain stubbed (decode_stub)"
    )


def extract_real_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """`extract_features` with the REAL stdlib codec (`decode_media`)
    instead of the stub: same shared Arrow-batched body, same
    FEATURE_SCHEMA, actual binary parsing. Raises ValueError on
    non-PPM/WAV payloads — honest failure, not silent fake features."""
    return _extract_with(
        df, id_col, payload_col, lambda p: decode_media(p)[1:]
    )
