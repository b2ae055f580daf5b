"""Pure-stdlib PNG codec — the real-codec path that runs where no
image library is installed (this container ships none, so the Pillow
branch of ``operators.multimodal`` was an untestable skip until r9).

Scope: non-interlaced 8-bit-per-sample PNGs in grayscale (``L``),
RGB, and RGBA — the forms a training-data pipeline's thumbnails and
fixtures actually use. Everything else raises ``ValueError`` loudly
(palette, 16-bit, Adam7) rather than mis-decoding. Decode implements
the full spec path: chunk walk, IHDR parse, zlib-inflated IDAT
concatenation, and per-scanline unfiltering (None/Sub/Up/Average/
Paeth). Encode writes filter-0 scanlines through zlib — bytes any
conformant reader (including Pillow) accepts.

Resize is deterministic nearest-neighbor (integer index math, no
float resampling) — reproducible across platforms, which matters more
here than resample quality; swap in Pillow's LANCZOS via
``multimodal.resize_images(codec="pil")`` when quality does.

(Reference scope: the reference has no media surface — this supports
the beyond-reference multimodal family, SURVEY §2 LLM-pipeline ops.)
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_MODES = {0: "L", 2: "RGB", 6: "RGBA"}
_CHANNELS = {"L": 1, "RGB": 3, "RGBA": 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIG


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length:
            raise ValueError("malformed PNG: truncated chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IEND":
            return
    raise ValueError("malformed PNG: no IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> tuple[int, int, str, bytearray]:
    """Decode → ``(width, height, mode, pixels)`` with ``pixels`` the
    unfiltered scanlines concatenated (``height * width * channels``
    bytes, row-major)."""
    if not is_png(payload):
        raise ValueError("malformed PNG: bad signature")
    width = height = None
    mode = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _MODES:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace:
                raise ValueError("unsupported PNG: Adam7 interlace")
            mode = _MODES[color]
        elif ctype == b"IDAT":
            idat += data
    if width is None or mode is None:
        raise ValueError("malformed PNG: no IHDR")
    raw = zlib.decompress(bytes(idat))
    ch = _CHANNELS[mode]
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("malformed PNG: IDAT size mismatch")
    out = bytearray(height * stride)
    prev_off = -stride
    pos = 0
    for y in range(height):
        f = raw[pos]
        line = raw[pos + 1:pos + 1 + stride]
        pos += 1 + stride
        off = y * stride
        if f == 0:
            out[off:off + stride] = line
        elif f == 1:  # Sub
            for i in range(stride):
                a = out[off + i - ch] if i >= ch else 0
                out[off + i] = (line[i] + a) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                b = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + b) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = out[off + i - ch] if i >= ch else 0
                b = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = out[off + i - ch] if i >= ch else 0
                b = out[prev_off + off + i] if y else 0
                c = out[prev_off + off + i - ch] if (y and i >= ch) else 0
                out[off + i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"malformed PNG: filter type {f}")
    return width, height, mode, out


def png_dims(payload: bytes) -> tuple[int, int, str]:
    """(width, height, mode) — the ``decode`` codec signature
    ``multimodal.extract_features`` plugs in. Full decode, not just an
    IHDR peek: corrupt pixel data must fail here, not downstream."""
    w, h, mode, _ = png_decode(payload)
    return w, h, mode


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: bytes, width: int, height: int, mode: str) -> bytes:
    """Minimal conformant writer: filter-0 scanlines, one zlib IDAT."""
    ch = _CHANNELS[mode]
    color = {v: k for k, v in _MODES.items()}[mode]
    stride = width * ch
    if len(pixels) != height * stride:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; expected "
            f"{height * stride} for {width}x{height} {mode}"
        )
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride:(y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic nearest-neighbor resize — the ``resize`` codec
    signature ``multimodal.resize_images`` plugs in."""
    sw, sh, mode, px = png_decode(payload)
    ch = _CHANNELS[mode]
    out = bytearray(width * height * ch)
    for y in range(height):
        sy = (y * sh) // height
        srow = sy * sw * ch
        drow = y * width * ch
        for x in range(width):
            sx = (x * sw) // width
            s = srow + sx * ch
            d = drow + x * ch
            out[d:d + ch] = px[s:s + ch]
    return png_encode(bytes(out), width, height, mode)
