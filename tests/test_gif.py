"""Pure-stdlib GIF codec + real multimodal kernel: lossless round
trips (incl. LZW width growth and table-overflow clears), extension
skipping, local color tables, unsupported/corrupt rejection, and
Spark-side decode over planted images with known pixel values."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings, strategies as st

from itemsjs_spark.ops import multimodal
from itemsjs_spark.ops.gif import (
    GRAY_PALETTE,
    UnsupportedGIF,
    decode_gif,
    encode_gif,
)


def _rgb_of(indices, palette):
    out = bytearray()
    for i in indices:
        out += bytes(palette[i])
    return bytes(out)


def test_gif_roundtrip_small_palette():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2])  # 4x3
    assert decode_gif(encode_gif(4, 3, idx, pal)) == (
        4, 3, 3, _rgb_of(idx, pal),
    )


def test_gif_roundtrip_full_gray_palette():
    idx = bytes((7 * i) % 256 for i in range(32 * 32))
    w, h, ch, pix = decode_gif(encode_gif(32, 32, idx, GRAY_PALETTE))
    assert (w, h, ch) == (32, 32, 3)
    assert pix == _rgb_of(idx, GRAY_PALETTE)


def test_gif_lzw_table_overflow_clears_midstream():
    # a long non-repeating-ish stream forces the dictionary past 4096
    # entries, so the encoder must emit a mid-stream clear and the
    # decoder must resynchronize; losslessness proves both sides agree
    idx = bytes((i * 31 + (i * i) % 251) % 256 for i in range(120 * 120))
    assert decode_gif(encode_gif(120, 120, idx, GRAY_PALETTE))[3] == _rgb_of(
        idx, GRAY_PALETTE
    )


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(2, 256),
    st.randoms(use_true_random=False),
)
def test_gif_roundtrip_property(w, h, ncolors, rnd):
    pal = [(i % 256, (3 * i) % 256, (7 * i) % 256) for i in range(ncolors)]
    idx = bytes(rnd.randrange(ncolors) for _ in range(w * h))
    assert decode_gif(encode_gif(w, h, idx, pal)) == (w, h, 3, _rgb_of(idx, pal))


def test_gif_skips_extensions_and_accepts_87a():
    pal = [(1, 2, 3), (4, 5, 6)]
    idx = bytes([0, 1, 1, 0])
    base = encode_gif(2, 2, idx, pal)
    # splice a graphic-control extension before the image descriptor
    at = base.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = base[:at] + gce + base[at:]
    assert decode_gif(spliced) == decode_gif(base)
    assert decode_gif(b"GIF87a" + base[6:]) == decode_gif(base)


def test_gif_local_color_table_overrides_global():
    pal = [(0, 0, 0), (255, 255, 255)]
    base = bytearray(encode_gif(2, 2, bytes([0, 1, 0, 1]), pal))
    at = base.index(b"\x2c")
    # set the local-color-table flag (size field 0 -> 2 entries) and
    # insert an inverted palette after the descriptor
    desc = bytearray(base[at : at + 10])
    desc[9] |= 0x80
    local = bytes((255, 255, 255, 0, 0, 0))
    spliced = bytes(base[:at]) + bytes(desc) + local + bytes(base[at + 10 :])
    w, h, ch, pix = decode_gif(spliced)
    assert pix == _rgb_of(bytes([1, 0, 1, 0]), pal)  # colors swapped


def test_gif_rejects_unsupported_and_corrupt():
    pal = [(0, 0, 0), (9, 9, 9)]
    good = encode_gif(3, 3, bytes([0, 1] * 4 + [0]), pal)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + good[7:])
    # interlace flag
    bad = bytearray(good)
    at = bad.index(b"\x2c")
    bad[at + 9] |= 0x40
    with pytest.raises(UnsupportedGIF):
        decode_gif(bytes(bad))
    # truncated sub-block
    with pytest.raises(ValueError):
        decode_gif(good[:-3])
    # LZW stream shorter than the frame: truncate the coded data by
    # shrinking the frame... simpler: corrupt the min code size
    bad = bytearray(good)
    bad[at + 10] = 1
    with pytest.raises(ValueError):
        decode_gif(bytes(bad))


def test_spark_decode_gif_features_known_pixels(spark):
    # plant 4x4 gray images (identity palette): decoded RGB bytes are
    # each index three times, so chunk-mean k over the RGB raster equals
    # the mean of planted bytes 4k..4k+3
    def img(i):
        vals = bytes((i * 37 + 11 * j) % 256 for j in range(16))
        return encode_gif(4, 4, vals, GRAY_PALETTE), vals

    rows, wants = [], {}
    for i in range(5):
        payload, vals = img(i)
        rows.append((i, payload))
        wants[i] = [
            round(sum(vals[4 * k : 4 * k + 4]) / 4.0 / 255.0, 6) for k in range(4)
        ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_gif_features(df, dims=4).collect()
    }
    assert len(got) == 5
    for i in range(5):
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (4, 4, 3)
        assert list(r["features"]) == wants[i]
