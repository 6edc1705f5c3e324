"""Pure-stdlib baseline JPEG codec + real multimodal kernel: exact
DC-only round trips, bounded-error textured round trips, restart
markers, unsupported-flavor rejection, and Spark-side decode over
planted images with known pixel values."""

from __future__ import annotations

import struct

import pytest

from itemsjs_spark.ops import multimodal
from itemsjs_spark.ops.jpeg import (
    QTABLE_DC8,
    QTABLE_LUMA,
    UnsupportedJPEG,
    decode_jpeg,
    encode_jpeg_gray,
)


def _solid_blocks_raster(vals, blocks_x):
    """Raster of solid 8x8 blocks laid out row-major, blocks_x per row."""
    blocks_y = len(vals) // blocks_x
    w = 8 * blocks_x
    out = bytearray(w * 8 * blocks_y)
    for r in range(blocks_y):
        for c in range(blocks_x):
            v = vals[r * blocks_x + c]
            for y in range(8):
                base = (8 * r + y) * w + 8 * c
                out[base : base + 8] = bytes([v]) * 8
    return w, 8 * blocks_y, bytes(out)


def test_solid_blocks_roundtrip_exactly():
    # DC-only blocks with the DC-exact table reconstruct bit-for-bit,
    # including the 0/255 extremes and large block-to-block DC jumps
    vals = [0, 255, 1, 254, 128, 127, 129, 7, 250, 3, 200, 55, 99, 160, 31, 222]
    w, h, pix = _solid_blocks_raster(vals, 4)
    data = encode_jpeg_gray(w, h, pix, qtable=QTABLE_DC8)
    assert decode_jpeg(data) == (w, h, 1, pix)


def test_textured_roundtrip_bounded_error():
    # a gradient is NOT DC-only: the full Huffman/AC path runs, and the
    # standard luminance table loses at most a few levels per pixel
    w = h = 16
    pix = bytes((7 * x + 11 * y) % 256 for y in range(h) for x in range(w))
    got = decode_jpeg(encode_jpeg_gray(w, h, pix, qtable=QTABLE_DC8))
    assert got[:3] == (w, h, 1)
    out = got[3]
    # wraparound edges (255->0) smear locally under any lossy codec;
    # check determinism + global fidelity, not per-pixel equality
    assert decode_jpeg(encode_jpeg_gray(w, h, pix, qtable=QTABLE_DC8))[3] == out
    mean_err = sum(abs(a - b) for a, b in zip(out, pix)) / len(pix)
    assert mean_err < 12.0  # measures ~4.2
    # a smooth (non-wrapping) ramp stays close everywhere
    ramp = bytes(min(16 * x + 2 * y, 255) for y in range(h) for x in range(w))
    out2 = decode_jpeg(encode_jpeg_gray(w, h, ramp, qtable=QTABLE_LUMA))[3]
    assert max(abs(a - b) for a, b in zip(out2, ramp)) <= 16  # measures 6
    assert sum(abs(a - b) for a, b in zip(out2, ramp)) / len(ramp) < 4.0


def test_non_multiple_of_8_dimensions():
    # 10x6: encoder pads by edge replication, decoder crops back
    w, h = 10, 6
    pix = bytes([60] * (w * h))
    assert decode_jpeg(encode_jpeg_gray(w, h, pix)) == (w, h, 1, pix)


def test_restart_markers_decode():
    """Hand-splice DRI + RSTn between MCUs of a 2-block image; the
    decoder must byte-align, consume the marker, and reset DC preds."""
    vals = [40, 200]
    w, h, pix = _solid_blocks_raster(vals, 2)
    base = encode_jpeg_gray(w, h, pix, qtable=QTABLE_DC8)

    # re-encode by hand with restart_interval=1: encode each block as
    # its own entropy segment (DC pred resets per segment)
    from itemsjs_spark.ops.jpeg import (
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        _BitWriter,
        _build_encode_table,
        _encode_block,
    )

    dc_tab = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_tab = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    segs = []
    for v in vals:
        wtr = _BitWriter()
        zz = [v - 128] + [0] * 63  # DC-exact table: quantized DC = v-128
        _encode_block(wtr, zz, 0, dc_tab, ac_tab)
        wtr.flush()
        segs.append(bytes(wtr.buf))
    entropy = segs[0] + b"\xff\xd0" + segs[1]

    sos_at = base.rindex(b"\xff\xda")
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)
    (sos_len,) = struct.unpack(">H", base[sos_at + 2 : sos_at + 4])
    spliced = (
        base[:sos_at]
        + dri
        + base[sos_at : sos_at + 2 + sos_len]
        + entropy
        + b"\xff\xd9"
    )
    assert decode_jpeg(spliced) == (w, h, 1, pix)


def test_color_420_decode_known_rgb():
    """Hand-build a 32x16 4:2:0 YCbCr stream (2 MCUs) out of solid
    DC-only blocks: exercises multi-component MCU interleaving, the
    replication upsampler, and the JFIF color convert, all with exactly
    predictable RGB output."""
    from itemsjs_spark.ops.jpeg import (
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        QTABLE_DC8,
        ZIGZAG,
        _BitWriter,
        _build_encode_table,
        _encode_block,
    )

    dc_tab = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_tab = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)

    # component -> per-MCU solid block values (Y has 4 blocks per MCU)
    y_val = 120
    cb_vals = [90, 160]  # MCU 0 / MCU 1 -> left / right image half
    cr_val = 200

    writer = _BitWriter()
    preds = [0, 0, 0]
    for mcu in range(2):
        for _ in range(4):  # Y: h=v=2
            preds[0] = _encode_block(
                writer, [y_val - 128] + [0] * 63, preds[0], dc_tab, ac_tab
            )
        preds[1] = _encode_block(
            writer, [cb_vals[mcu] - 128] + [0] * 63, preds[1], dc_tab, ac_tab
        )
        preds[2] = _encode_block(
            writer, [cr_val - 128] + [0] * 63, preds[2], dc_tab, ac_tab
        )
    writer.flush()

    w, h = 32, 16
    out = bytearray()
    out += b"\xff\xd8"
    zz_q = bytes(QTABLE_DC8[ZIGZAG[k]] for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    out += (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03"
        + b"\x01\x22\x00"  # Y: 2x2 sampling
        + b"\x02\x11\x00"  # Cb: 1x1
        + b"\x03\x11\x00"  # Cr: 1x1
    )
    dht_dc = bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 3 + len(dht_dc)) + b"\x00" + dht_dc
    dht_ac = bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 3 + len(dht_ac)) + b"\x10" + dht_ac
    out += (
        b"\xff\xda"
        + struct.pack(">H", 12)
        + b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00"
    )
    out += writer.buf
    out += b"\xff\xd9"

    gw, gh, ch, pix = decode_jpeg(bytes(out))
    assert (gw, gh, ch) == (w, h, 3)

    def jfif_rgb(Y, cb, cr):
        r = int(Y + 1.402 * (cr - 128) + 0.5)
        g = int(Y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)
        b = int(Y + 1.772 * (cb - 128) + 0.5)
        clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
        return clamp(r), clamp(g), clamp(b)

    left = jfif_rgb(y_val, cb_vals[0], cr_val)
    right = jfif_rgb(y_val, cb_vals[1], cr_val)
    for y in range(h):
        for x in range(w):
            want = left if x < 16 else right
            got = tuple(pix[3 * (y * w + x) : 3 * (y * w + x) + 3])
            assert got == want, (x, y, got, want)


def test_rejects_unsupported_flavors_and_corruption():
    good = encode_jpeg_gray(8, 8, bytes([77] * 64))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"JUNK" + good[4:])
    # progressive SOF2
    bad = bytearray(good)
    sof = bad.index(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with pytest.raises(UnsupportedJPEG):
        decode_jpeg(bytes(bad))
    # 12-bit precision
    bad = bytearray(good)
    bad[sof + 4] = 12
    with pytest.raises(UnsupportedJPEG):
        decode_jpeg(bytes(bad))
    # truncated mid-segment
    with pytest.raises(ValueError):
        decode_jpeg(good[: sof + 5])


def test_spark_decode_jpeg_features_known_pixels(spark):
    # plant 16x16 grayscale images of four solid 8x8 blocks per doc;
    # chunk-mean k pools block-row k exactly like the PNG kernel
    def img(i):
        vals = [(i * 41 + 13 * j) % 256 for j in range(4)]
        w, h, pix = _solid_blocks_raster(vals, 2)
        return encode_jpeg_gray(w, h, pix, qtable=QTABLE_DC8), vals

    rows, wants = [], {}
    for i in range(6):
        payload, vals = img(i)
        rows.append((i, payload))
        wants[i] = [
            round(sum(vals[2 * k : 2 * k + 2]) / 2.0 / 255.0, 6) for k in range(2)
        ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_jpeg_features(df, dims=2).collect()
    }
    assert len(got) == 6
    for i in range(6):
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (16, 16, 1)
        assert list(r["features"]) == wants[i]
