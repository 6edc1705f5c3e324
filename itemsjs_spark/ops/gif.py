"""Pure-stdlib GIF codec (LZW entropy coding, no image library).

Implements the public GIF89a/GIF87a specification (CompuServe, 1989:
logical screen descriptor, color tables, image descriptor, variable-
code-width LZW with clear/EOI codes, sub-block framing, extension
skipping) so the multimodal image kernels can run on REAL compressed
GIF payloads in an environment with no PIL — ``struct`` is the only
dependency.

Decoder scope: the first image frame of a GIF87a/GIF89a stream, global
or local color table, non-interlaced data (interlaced frames raise
``UnsupportedGIF``); graphic-control/comment/application extensions are
walked and skipped. GIF is LOSSLESS: decode(encode(x)) == x exactly,
which is what lets an external SQL oracle predict decoded pixels
algebraically while still exercising the full variable-width LZW
bitstream round trip.

Encoder scope: one non-interlaced frame over a caller-supplied palette.
It emits genuine LZW (dictionary building, code-width growth, clear on
table overflow) — not the degenerate uncompressed variant — so the
decoder's dictionary reconstruction is actually exercised.

The per-pixel Python loops sit INSIDE an Arrow ``mapInPandas`` batch,
so Spark parallelism applies across rows/partitions. A production
swap-in is Pillow with the same kernel contract.
"""

from __future__ import annotations

import struct
from typing import List, Tuple


class UnsupportedGIF(ValueError):
    """Valid GIF, but a flavor outside this codec's scope."""


# ---------------------------------------------------------------- encoder


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Pixel index stream -> LZW-coded bytes (LSB-first bit packing),
    with the leading clear code and trailing end-of-information code."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in indices:
        trial = prefix + bytes([b])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix], width)
        table[trial] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
        # the decoder adds a table entry after EVERY data code — also
        # after this final one, whose entry the encoder never uses.
        # Mirror the width bookkeeping (without storing the entry) so
        # EOI is emitted at the width the decoder will read it with
        # when the growth boundary lands exactly on the last code.
        # (When this code is the first after a clear the decoder skips
        # the add, but growth can't trigger there for min_code_size>=2.)
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int, height: int, indices: bytes, palette: List[Tuple[int, int, int]]
) -> bytes:
    """(dims, per-pixel palette indices, RGB palette) -> GIF89a bytes.
    Deterministic for fixed inputs; lossless by construction."""
    if len(indices) != width * height:
        raise ValueError("index buffer does not match dimensions")
    if not 2 <= len(palette) <= 256:
        raise ValueError("palette must hold 2..256 colors")
    if indices and max(indices) >= len(palette):
        raise ValueError("pixel index outside the palette")
    # color table size rounds up to the next power of two >= 2
    ct_bits = 1
    while (1 << ct_bits) < len(palette):
        ct_bits += 1
    ct_size = 1 << ct_bits

    out = bytearray()
    out += b"GIF89a"
    # global color table flag set; color resolution 8; size field
    out += struct.pack("<HHBBB", width, height, 0x80 | ((ct_bits - 1) & 7) | 0x70, 0, 0)
    for i in range(ct_size):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    min_code_size = max(2, ct_bits)
    out.append(min_code_size)
    data = _lzw_encode(indices, min_code_size)
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


# ---------------------------------------------------------------- decoder


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """LZW-coded bytes -> pixel index stream (exactly ``n_pixels``)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > n_pixels:
            raise ValueError("LZW produced more pixels than the frame holds")
    if len(out) != n_pixels:
        raise ValueError("LZW produced fewer pixels than the frame holds")
    return bytes(out)


def decode_gif(data: bytes) -> Tuple[int, int, int, bytes]:
    """GIF bytes -> (width, height, channels=3, RGB pixels) of the first
    frame, palette applied."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    _sw, _sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_ct: List[Tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(data):
            raise ValueError("truncated global color table")
        global_ct = [
            (data[pos + 3 * i], data[pos + 3 * i + 1], data[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n

    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if pos + 10 > len(data):
            raise ValueError("truncated image descriptor")
        _x, _y, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        if iflags & 0x40:
            raise UnsupportedGIF("interlaced frames unsupported")
        ct = global_ct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            if pos + 3 * n > len(data):
                raise ValueError("truncated local color table")
            ct = [
                (data[pos + 3 * i], data[pos + 3 * i + 1], data[pos + 3 * i + 2])
                for i in range(n)
            ]
            pos += 3 * n
        if not ct:
            raise ValueError("frame has no color table")
        if pos >= len(data):
            raise ValueError("truncated image data")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError("bad LZW minimum code size")
        lzw = bytearray()
        while pos < len(data) and data[pos]:
            n = data[pos]
            chunk = data[pos + 1 : pos + 1 + n]
            if len(chunk) != n:
                raise ValueError("truncated GIF sub-block")
            lzw += chunk
            pos += 1 + n
        pos += 1
        indices = _lzw_decode(bytes(lzw), min_code_size, w * h)
        out = bytearray(w * h * 3)
        nc = len(ct)
        for i, ix in enumerate(indices):
            if ix >= nc:
                raise ValueError("pixel index outside the color table")
            out[3 * i : 3 * i + 3] = bytes(ct[ix])
        return w, h, 3, bytes(out)
    raise ValueError("GIF contains no image frame")


GRAY_PALETTE = [(i, i, i) for i in range(256)]
