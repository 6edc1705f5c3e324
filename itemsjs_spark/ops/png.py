"""Pure-stdlib PNG codec (zlib inflate + per-scanline unfilter).

Implements the public PNG specification (W3C/ISO 15948: IHDR/IDAT/IEND
chunk layout, filter types 0-4 None/Sub/Up/Average/Paeth) so the
multimodal decode kernels can run on REAL pixels in an environment with
no PIL/libvips — ``zlib`` and ``struct`` are the only dependencies.

Scope: 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced — the
shapes a training pipeline normalizes to anyway. Palette, 16-bit and
Adam7 inputs raise ``UnsupportedPNG`` (a real pipeline routes those to a
full decoder); truncated/corrupt data raises ``ValueError``.

The per-byte unfilter loop is plain Python — fine for the thumbnail-
sized payloads these operators see per row, and the loop sits INSIDE an
Arrow ``mapInPandas`` batch so Spark parallelism still applies across
rows/partitions. A production swap-in is a numpy/SIMD unfilter with the
same contract.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Tuple

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedPNG(ValueError):
    """Valid PNG, but a flavor outside this codec's scope."""


def _iter_chunks(data: bytes) -> Iterator[Tuple[bytes, bytes]]:
    pos = len(PNG_SIGNATURE)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, body
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa = p - a if p >= a else a - p
    pb = p - b if p >= b else b - p
    pc = p - c if p >= c else c - p
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> Tuple[int, int, int, bytes]:
    """PNG bytes -> (width, height, channels, pixels). ``pixels`` is the
    unfiltered raster, row-major, channel-interleaved, 8 bits/sample."""
    if data[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    width = height = channels = -1
    idat = bytearray()
    seen_ihdr = False
    for ctype, body in _iter_chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ValueError("invalid IHDR compression/filter method")
            if depth != 8:
                raise UnsupportedPNG(f"bit depth {depth} (only 8 supported)")
            if color not in _CHANNELS:
                raise UnsupportedPNG(f"color type {color} (palette unsupported)")
            if interlace != 0:
                raise UnsupportedPNG("Adam7 interlace unsupported")
            channels = _CHANNELS[color]
            seen_ihdr = True
        elif ctype == b"IDAT":
            idat += body
    if not seen_ihdr or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size does not match dimensions")
    out = bytearray(stride * height)
    bpp = channels
    prev_start = -1
    for y in range(height):
        fpos = y * (stride + 1)
        ftype = raw[fpos]
        row_start = y * stride
        src = raw[fpos + 1 : fpos + 1 + stride]
        if ftype == 0:  # None
            out[row_start : row_start + stride] = src
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[row_start + x - bpp] if x >= bpp else 0
                out[row_start + x] = (src[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                up = out[prev_start + x] if y else 0
                out[row_start + x] = (src[x] + up) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[row_start + x - bpp] if x >= bpp else 0
                up = out[prev_start + x] if y else 0
                out[row_start + x] = (src[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[row_start + x - bpp] if x >= bpp else 0
                up = out[prev_start + x] if y else 0
                ul = out[prev_start + x - bpp] if (y and x >= bpp) else 0
                out[row_start + x] = (src[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        prev_start = row_start
    return width, height, channels, bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, channels: int, pixels: bytes, level: int = 9
) -> bytes:
    """(width, height, channels, raster) -> PNG bytes, filter type 0 on
    every scanline. Deterministic for fixed inputs and zlib level, so a
    test/oracle can plant exact payloads."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of a decoded raster (the standard
    src_index = floor(dst_index * src / dst) mapping)."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        src_row = sy * width * channels
        dst_row = y * new_w * channels
        for x in range(new_w):
            sx = x * width // new_w
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)
