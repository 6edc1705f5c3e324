"""Pure-stdlib baseline JPEG codec (Huffman + 8x8 DCT, no image library).

Implements the public JPEG specification (ITU-T T.81 / ISO 10918-1,
baseline sequential DCT, Huffman entropy coding) so the multimodal
decode kernels can run on REAL compressed images in an environment with
no PIL/libjpeg — ``struct`` and ``math`` are the only dependencies.

Decoder scope: baseline SOF0, 8-bit samples, grayscale or 3-component
YCbCr with sampling factors up to 4 (chroma upsampled by replication),
restart markers (DRI/RSTn), multiple DQT/DHT segments. Progressive
(SOF2), arithmetic coding, 12-bit and hierarchical inputs raise
``UnsupportedJPEG``; truncated/corrupt data raises ``ValueError``.
All entropy tables come from the stream's own DHT segments — nothing
is assumed about the encoder.

Encoder scope: baseline grayscale (the planting side of the multimodal
tests); callers may pass a custom quantization table, exactly like a
real encoder's quality knob. With a DC quant step that divides
8*(v-128) (e.g. the default ``QTABLE_DC8``), a solid 8x8 block of value
``v`` round-trips EXACTLY: its DCT is DC-only, so the decoded block is
flat at round(DC*q/8 + 128) = v — which is what lets an external SQL
oracle predict decoded pixels algebraically while still exercising the
full FDCT -> quantize -> zigzag -> Huffman -> bitstream -> Huffman ->
dequantize -> IDCT pipeline byte-for-byte.

The per-block Python loops are plain Python — fine for the thumbnail-
sized payloads these operators see per row, and they sit INSIDE an
Arrow ``mapInPandas`` batch so Spark parallelism still applies across
rows/partitions. A production swap-in is libjpeg-turbo with the same
contract.
"""

from __future__ import annotations

import math
import struct
from typing import Dict, List, Tuple


class UnsupportedJPEG(ValueError):
    """Valid JPEG, but a flavor outside this codec's scope."""


# zigzag scan order: position k in the scan reads natural index ZIGZAG[k]
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 luminance table (the interchange default), in natural order.
QTABLE_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# "DC-exact" table: DC step 8 makes solid blocks round-trip exactly
# (8*(v-128) is always a multiple of 8); AC steps stay at the Annex K
# values, so textured blocks are quantized like a normal high-quality
# encode.
QTABLE_DC8 = [8] + QTABLE_LUMA[1:]

# Annex K.3 standard Huffman tables (luminance) for the encoder; the
# decoder always reads tables from the stream's DHT segments. Encoded as
# (BITS[1..16], HUFFVAL) exactly as they appear inside a DHT segment,
# so encoder and decoder are self-consistent by construction.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT basis: COS[u][x] = a(u) * cos((2x+1)u*pi/16);
# the JPEG 2-D transform is exactly a row pass then a column pass with
# these factors.
_COS = [
    [
        (math.sqrt(1.0 / 8.0) if u == 0 else math.sqrt(2.0 / 8.0))
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


# ---------------------------------------------------------------- common


def _build_encode_table(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """Canonical Huffman assignment: value -> (code, size)."""
    table: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for size in range(1, 17):
        for _ in range(bits[size - 1]):
            table[vals[k]] = (code, size)
            k += 1
            code += 1
        code <<= 1
    return table


def _build_decode_table(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """Canonical Huffman assignment: (size, code) -> value."""
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    k = 0
    for size in range(1, 17):
        for _ in range(bits[size - 1]):
            table[(size, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _dct8(vec: List[float]) -> List[float]:
    return [sum(_COS[u][x] * vec[x] for x in range(8)) for u in range(8)]


def _idct8(vec: List[float]) -> List[float]:
    return [sum(_COS[u][x] * vec[u] for u in range(8)) for x in range(8)]


def _fdct2d(block: List[float]) -> List[float]:
    rows = [_dct8(block[8 * y : 8 * y + 8]) for y in range(8)]
    out = [0.0] * 64
    for x in range(8):
        col = _dct8([rows[y][x] for y in range(8)])
        for u in range(8):
            out[8 * u + x] = col[u]
    return out


def _idct2d(coef: List[float]) -> List[float]:
    cols = [_idct8([coef[8 * v + x] for v in range(8)]) for x in range(8)]
    out = [0.0] * 64
    for y in range(8):
        row = _idct8([cols[x][y] for x in range(8)])
        for x in range(8):
            out[8 * y + x] = row[x]
    return out


def _magnitude_category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, size: int) -> None:
        if size == 0:
            return
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.n += size
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _encode_block(
    writer: _BitWriter,
    coefs: List[int],
    dc_pred: int,
    dc_tab: Dict[int, Tuple[int, int]],
    ac_tab: Dict[int, Tuple[int, int]],
) -> int:
    """Quantized zigzag coefficients -> entropy-coded bits. Returns the
    block's DC value (the next block's predictor)."""
    diff = coefs[0] - dc_pred
    size = _magnitude_category(diff)
    code, length = dc_tab[size]
    writer.write(code, length)
    if size:
        bits = diff if diff > 0 else diff + (1 << size) - 1
        writer.write(bits, size)
    run = 0
    for k in range(1, 64):
        v = coefs[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zrl, zl = ac_tab[0xF0]
            writer.write(zrl, zl)
            run -= 16
        size = _magnitude_category(v)
        code, length = ac_tab[run * 16 + size]
        writer.write(code, length)
        bits = v if v > 0 else v + (1 << size) - 1
        writer.write(bits, size)
        run = 0
    if run:
        eob, el = ac_tab[0x00]
        writer.write(eob, el)
    return coefs[0]


def encode_jpeg_gray(
    width: int, height: int, pixels: bytes, qtable: List[int] = QTABLE_DC8
) -> bytes:
    """(width, height, 8-bit grayscale raster) -> baseline JFIF bytes.

    Deterministic for fixed inputs and quant table. Edge blocks pad by
    replicating the last row/column (the standard encoder convention).
    """
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    if any(not (1 <= q <= 255) for q in qtable) or len(qtable) != 64:
        raise ValueError("quant table must be 64 entries of 1..255")

    dc_tab = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_tab = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)

    writer = _BitWriter()
    dc_pred = 0
    for by in range(0, max(height, 1), 8):
        for bx in range(0, max(width, 1), 8):
            block = [0.0] * 64
            for y in range(8):
                sy = min(by + y, height - 1)
                row = sy * width
                for x in range(8):
                    sx = min(bx + x, width - 1)
                    block[8 * y + x] = pixels[row + sx] - 128.0
            coefs_nat = _fdct2d(block)
            zz = [0] * 64
            for k in range(64):
                c = coefs_nat[ZIGZAG[k]] / qtable[ZIGZAG[k]]
                zz[k] = int(c + 0.5) if c >= 0 else -int(-c + 0.5)
            dc_pred = _encode_block(writer, zz, dc_pred, dc_tab, ac_tab)
    writer.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    zz_q = bytes(qtable[ZIGZAG[k]] for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q  # DQT id 0
    out += (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01"  # 1 component
        + b"\x01\x11\x00"  # id 1, sampling 1x1, qtable 0
    )
    dht_dc = bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 3 + len(dht_dc)) + b"\x00" + dht_dc
    dht_ac = bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 3 + len(dht_ac)) + b"\x10" + dht_ac
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF00, stops at any other
    marker (the caller handles RSTn via :meth:`restart`)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.at_marker = False

    def _pull_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            self.at_marker = True
            return -1
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
        if nxt == 0x00:
            self.pos += 2
            return 0xFF
        self.at_marker = True  # RSTn / EOI / next segment
        return -1

    def read_bit(self) -> int:
        if self.n == 0:
            b = self._pull_byte()
            if b < 0:
                return 0  # spec: pad past the segment with zero bits
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, size: int) -> int:
        v = 0
        for _ in range(size):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for size in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.get((size, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.n = 0
        self.at_marker = False
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> Tuple[int, int, int, bytes]:
    """JPEG bytes -> (width, height, channels, pixels). ``pixels`` is
    row-major, channel-interleaved, 8 bits/sample; grayscale for
    1-component streams, RGB (JFIF YCbCr conversion) for 3-component."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtables: Dict[int, List[int]] = {}
    dc_tables: Dict[int, Dict[Tuple[int, int], int]] = {}
    ac_tables: Dict[int, Dict[Tuple[int, int], int]] = {}
    width = height = -1
    comps: List[Tuple[int, int, int, int]] = []  # (id, h, v, tq)
    restart_interval = 0

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise UnsupportedJPEG("16-bit quant tables unsupported")
                zz = body[p + 1 : p + 65]
                if len(zz) != 64:
                    raise ValueError("short DQT")
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = zz[k]
                qtables[tq] = nat
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("short DHT")
                tbl = _build_decode_table(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = tbl
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if body[0] != 8:
                raise UnsupportedJPEG("only 8-bit precision supported")
            height, width = struct.unpack(">HH", body[1:5])
            nc = body[5]
            if nc not in (1, 3):
                raise UnsupportedJPEG(f"{nc}-component streams unsupported")
            comps = []
            for i in range(nc):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * i]))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJPEG("non-baseline SOF (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan: List[Tuple[int, int, int, int, int]] = []
            for i in range(ns):
                cs = body[1 + 2 * i]
                td, ta = body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F
                match = [c for c in comps if c[0] == cs]
                if not match:
                    raise ValueError("SOS references unknown component")
                cid, h, v, tq = match[0]
                scan.append((h, v, tq, td, ta))
            if ns != len(comps):
                raise UnsupportedJPEG("multi-scan streams unsupported")
            entropy_start = pos + 2 + seg_len
            return _decode_scan(
                data,
                entropy_start,
                width,
                height,
                scan,
                qtables,
                dc_tables,
                ac_tables,
                restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("missing SOS")


def _decode_scan(
    data: bytes,
    pos: int,
    width: int,
    height: int,
    scan: List[Tuple[int, int, int, int, int]],
    qtables: Dict[int, List[int]],
    dc_tables: Dict[int, Dict[Tuple[int, int], int]],
    ac_tables: Dict[int, Dict[Tuple[int, int], int]],
    restart_interval: int,
) -> Tuple[int, int, int, bytes]:
    hmax = max(h for h, _, _, _, _ in scan)
    vmax = max(v for _, v, _, _, _ in scan)
    if hmax > 4 or vmax > 4:
        raise UnsupportedJPEG("sampling factors above 4 unsupported")
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    planes: List[bytearray] = []
    plane_w: List[int] = []
    for h, v, _, _, _ in scan:
        pw, ph = mcus_x * 8 * h, mcus_y * 8 * v
        planes.append(bytearray(pw * ph))
        plane_w.append(pw)

    reader = _BitReader(data, pos)
    dc_pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                dc_pred = [0] * len(scan)
            for ci, (h, v, tq, td, ta) in enumerate(scan):
                if tq not in qtables or td not in dc_tables or ta not in ac_tables:
                    raise ValueError("scan references missing table")
                q = qtables[tq]
                dct = dc_tables[td]
                act = ac_tables[ta]
                for by in range(v):
                    for bx in range(h):
                        coef = [0.0] * 64
                        size = reader.decode_huffman(dct)
                        diff = _extend(reader.receive(size), size) if size else 0
                        dc_pred[ci] += diff
                        coef[0] = dc_pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huffman(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[ZIGZAG[k]] = _extend(reader.receive(s), s) * q[ZIGZAG[k]]
                            k += 1
                        pix = _idct2d(coef)
                        px0 = (my * v + by) * 8
                        py_w = plane_w[ci]
                        plane = planes[ci]
                        for y in range(8):
                            row = (px0 + y) * py_w + (mx * h + bx) * 8
                            for x in range(8):
                                s_ = int(pix[8 * y + x] + 128.5)
                                plane[row + x] = 0 if s_ < 0 else (255 if s_ > 255 else s_)
            mcu_count += 1

    if len(scan) == 1:
        pw = plane_w[0]
        plane = planes[0]
        out = bytearray(width * height)
        for y in range(height):
            out[y * width : (y + 1) * width] = plane[y * pw : y * pw + width]
        return width, height, 1, bytes(out)

    # 3-component YCbCr: upsample by replication, then JFIF color convert
    out = bytearray(width * height * 3)
    (h0, v0), (h1, v1), (h2, v2) = [(h, v) for h, v, _, _, _ in scan]
    p0, p1, p2 = planes
    w0, w1, w2 = plane_w
    for y in range(height):
        y0 = (y * v0) // vmax
        y1 = (y * v1) // vmax
        y2 = (y * v2) // vmax
        r0, r1, r2 = y0 * w0, y1 * w1, y2 * w2
        drow = y * width * 3
        for x in range(width):
            Y = p0[r0 + (x * h0) // hmax]
            cb = p1[r1 + (x * h1) // hmax] - 128
            cr = p2[r2 + (x * h2) // hmax] - 128
            r = int(Y + 1.402 * cr + 0.5)
            g = int(Y - 0.344136 * cb - 0.714136 * cr + 0.5)
            b = int(Y + 1.772 * cb + 0.5)
            d = drow + 3 * x
            out[d] = 0 if r < 0 else (255 if r > 255 else r)
            out[d + 1] = 0 if g < 0 else (255 if g > 255 else g)
            out[d + 2] = 0 if b < 0 else (255 if b > 255 else b)
    return width, height, 3, bytes(out)
