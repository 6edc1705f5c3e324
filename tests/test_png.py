"""Pure-stdlib PNG codec + real multimodal image kernels: round trips,
every scanline filter type, unsupported-flavor rejection, and Spark-side
decode over planted images with known pixel values."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from itemsjs_spark.ops import multimodal
from itemsjs_spark.ops.png import (
    PNG_SIGNATURE,
    UnsupportedPNG,
    decode_png,
    encode_png,
    resize_nearest,
)


def _ref_filter(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Independent re-statement of the spec's FILTER functions (the
    encoder direction), used to hand-build IDATs that exercise the
    decoder's unfilter paths."""
    out = bytearray()
    for x in range(len(row)):
        left = row[x - bpp] if x >= bpp else 0
        up = prev[x] if prev else 0
        ul = prev[x - bpp] if (prev and x >= bpp) else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) // 2
        else:  # Paeth
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
        out.append((row[x] - pred) & 0xFF)
    return bytes(out)


def _png_with_filters(width, height, channels, pixels, ftypes):
    """Build a PNG whose y-th scanline uses filter ftypes[y]."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    raw = bytearray()
    prev = b""
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw += bytes([ftypes[y]]) + _ref_filter(ftypes[y], row, prev, channels)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)

    def chunk(t, b):
        return (
            struct.pack(">I", len(b))
            + t
            + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_roundtrip_all_channel_counts():
    for ch in (1, 2, 3, 4):
        pix = bytes((i * 7 + ch) % 256 for i in range(6 * 5 * ch))
        data = encode_png(6, 5, ch, pix)
        assert decode_png(data) == (6, 5, ch, pix)


def test_every_filter_type_unfilters_correctly():
    # 5 rows, one per filter type, gradient raster with value wraparound
    pix = bytes((x * 37 + y * 91) % 256 for y in range(5) for x in range(4 * 3))
    data = _png_with_filters(4, 5, 3, pix, [0, 1, 2, 3, 4])
    assert decode_png(data) == (4, 5, 3, pix)
    # same raster, every row Paeth (exercises the y>0, x<bpp corners)
    data = _png_with_filters(4, 5, 3, pix, [4] * 5)
    assert decode_png(data) == (4, 5, 3, pix)


def test_rejects_unsupported_flavors_and_corruption():
    pix = bytes(range(16))
    good = encode_png(4, 4, 1, pix)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    # 16-bit depth
    bad = bytearray(good)
    bad[24] = 16  # IHDR bit-depth byte
    with pytest.raises((UnsupportedPNG, ValueError)):
        decode_png(bytes(bad))
    # palette color type
    bad = bytearray(good)
    bad[25] = 3  # IHDR color-type byte
    with pytest.raises((UnsupportedPNG, ValueError)):
        decode_png(bytes(bad))
    # interlaced
    bad = bytearray(good)
    bad[28] = 1  # IHDR interlace byte
    with pytest.raises((UnsupportedPNG, ValueError)):
        decode_png(bytes(bad))
    # truncated
    with pytest.raises(ValueError):
        decode_png(good[:-8])


def test_resize_nearest_known_mapping():
    # 2x2 gray: [[10, 20], [30, 40]] -> 4x4 duplicates each pixel 2x2
    pix = bytes([10, 20, 30, 40])
    out = resize_nearest(2, 2, 1, pix, 4, 4)
    assert out == bytes(
        [10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40]
    )
    # downscale picks floor-mapped sources
    assert resize_nearest(4, 4, 1, out, 2, 2) == pix


def test_spark_decode_png_features_known_pixels(spark):
    # plant 4x4 grayscale images with known pixel values per doc
    rows = [(i, encode_png(4, 4, 1, bytes((i + j) % 256 for j in range(16))))
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_png_features(df, dims=4).collect()
    }
    assert len(got) == 8
    for i in range(8):
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (4, 4, 1)
        pix = [(i + j) % 256 for j in range(16)]
        want = [round(sum(pix[k * 4 : k * 4 + 4]) / 4.0 / 255.0, 6) for k in range(4)]
        assert list(r["features"]) == want


def test_spark_extract_features_real_kernel_and_nonpng_rejection(spark):
    rows = [(1, encode_png(2, 2, 3, bytes(range(12))))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = multimodal.extract_features(df, dims=3, fake=False).collect()
    assert out[0]["n_bytes"] == len(rows[0][1])
    pix = list(range(12))
    want = [round(sum(pix[k * 4 : k * 4 + 4]) / 4.0 / 255.0, 6) for k in range(3)]
    assert list(out[0]["features"]) == want
    # the real path refuses non-PNG payloads loudly
    bad = spark.createDataFrame([(1, b"not a png")], "doc_id long, payload binary")
    with pytest.raises(Exception, match="PNG|signature"):
        multimodal.extract_features(bad, dims=3, fake=False).collect()


def test_spark_resize_images_real_kernel(spark):
    src = encode_png(2, 2, 1, bytes([10, 20, 30, 40]))
    df = spark.createDataFrame([(7, src)], "doc_id long, payload binary")
    out = multimodal.resize_images(df, 4, 4, fake=False).collect()[0]
    assert out["meta"]["width"] == 4 and out["meta"]["src_bytes"] == len(src)
    w, h, ch, pix = decode_png(bytes(out["resized"]))
    assert (w, h, ch) == (4, 4, 1)
    assert pix == bytes(
        [10, 10, 20, 20, 10, 10, 20, 20, 30, 30, 40, 40, 30, 30, 40, 40]
    )
