"""Minimal pure-Python PNG probe/decoder (vendored, stdlib-only).

Implements just enough of the public W3C PNG specification (RFC 2083;
filter reconstruction per spec section 6 "Filter Algorithms") to give
codec-less environments a REAL decode path for the common case:
non-interlaced, 8-bit-per-sample grayscale / gray+alpha / RGB / RGBA
images.  Palette, 16-bit and interlaced images are out of scope and
raise ``NotImplementedError`` — the same signal
:func:`..multimodal.decode_image` uses for "install a real codec".

This exists so the multimodal deployment path (r5 VERDICT ask #8) can
be exercised end-to-end in the sandbox: ``decode_image`` falls back to
this decoder for PNG payloads when PIL is absent, and the
``real_image_meta`` mapInPandas stage runs against actually-decoded
dimensions instead of skipping.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_MODES = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


class PngImage:
    """Decoded image: ``size``/``format``/``mode`` mirror the PIL
    surface that :func:`..multimodal.real_image_meta` consumes;
    ``pixels`` holds the reconstructed raw scanlines (row-major,
    ``width * channels`` bytes per row)."""

    format = "PNG"

    def __init__(self, width: int, height: int, mode: str, pixels: bytes):
        self.width = width
        self.height = height
        self.mode = mode
        self.pixels = pixels

    @property
    def size(self) -> tuple[int, int]:
        return (self.width, self.height)


def decode_png(data: bytes) -> PngImage:
    """Decode a non-interlaced 8-bit PNG.  Raises ``ValueError`` for
    malformed/truncated bytes and ``NotImplementedError`` for valid
    PNGs outside the supported subset."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type,
             _comp, _filt, interlace) = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace:
        raise NotImplementedError(
            f"unsupported PNG subset (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace}); "
            "install a real codec (PIL)"
        )
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) < (stride + 1) * height:
        raise ValueError("truncated PNG pixel data")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        f = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter type {f}")
        out += line
        prev = line
    return PngImage(width, height, _MODES[color_type], bytes(out))


def encode_png(width: int, height: int, mode: str, pixels: bytes) -> bytes:
    """Tiny matching encoder (filter 0 on every row) — lets tests and
    fixtures produce real PNG payloads without any codec installed."""
    color_type = {v: k for k, v in _MODES.items()}[mode]
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
