"""Hypothesis property tests for the pure-stdlib multimodal codecs:
the invariants the planted-payload oracles rely on, checked over
arbitrary inputs rather than hand-picked vectors."""

from __future__ import annotations

import struct

from hypothesis import given, settings, strategies as st

from itemsjs_spark.ops.jpeg import QTABLE_DC8, decode_jpeg, encode_jpeg_gray
from itemsjs_spark.ops.png import decode_png, encode_png
from itemsjs_spark.ops.wav import (
    WAVE_FORMAT_ALAW,
    WAVE_FORMAT_MULAW,
    decode_wav,
    encode_wav,
    encode_wav_adpcm,
)
from itemsjs_spark.ops.y4m import decode_y4m, encode_y4m


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.sampled_from([1, 2, 3, 4]),
    st.randoms(use_true_random=False),
)
def test_png_roundtrip_lossless(w, h, ch, rnd):
    pix = bytes(rnd.randrange(256) for _ in range(w * h * ch))
    assert decode_png(encode_png(w, h, ch, pix)) == (w, h, ch, pix)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=1, max_size=8), st.integers(1, 4))
def test_jpeg_solid_blocks_roundtrip_exactly(vals, blocks_x):
    # the multimodal_jpeg_decode oracle's foundation: ANY solid 8x8
    # block layout under the DC-exact table reconstructs bit-for-bit
    # through the full Huffman + IDCT path
    while len(vals) % blocks_x:
        vals.append(vals[0])
    blocks_y = len(vals) // blocks_x
    w, h = 8 * blocks_x, 8 * blocks_y
    pix = bytearray(w * h)
    for r in range(blocks_y):
        for c in range(blocks_x):
            v = vals[r * blocks_x + c]
            for y in range(8):
                base = (8 * r + y) * w + 8 * c
                pix[base : base + 8] = bytes([v]) * 8
    pix = bytes(pix)
    assert decode_jpeg(encode_jpeg_gray(w, h, pix, qtable=QTABLE_DC8)) == (
        w, h, 1, pix,
    )


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 16), st.integers(1, 16), st.randoms(use_true_random=False))
def test_jpeg_arbitrary_raster_decodes_with_valid_shape(w, h, rnd):
    # arbitrary (even non-block-aligned) dims: decode returns the exact
    # dimensions and a full raster; decode(encode(x)) is deterministic
    pix = bytes(rnd.randrange(256) for _ in range(w * h))
    out = decode_jpeg(encode_jpeg_gray(w, h, pix))
    assert out[:3] == (w, h, 1) and len(out[3]) == w * h
    assert decode_jpeg(encode_jpeg_gray(w, h, pix)) == out


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 3),
    st.sampled_from([1, 2]),
    st.integers(1, 40),
    st.randoms(use_true_random=False),
)
def test_wav_pcm_roundtrip_lossless(channels, sampwidth, frames, rnd):
    pcm = bytes(rnd.randrange(256) for _ in range(frames * channels * sampwidth))
    assert decode_wav(encode_wav(8000, channels, sampwidth, pcm)) == (
        8000, channels, sampwidth, pcm,
    )


@settings(max_examples=40, deadline=None)
@given(
    st.sampled_from([WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW]),
    st.lists(st.integers(0, 255), min_size=1, max_size=40),
)
def test_wav_g711_expansion_is_odd_symmetric(tag, comp):
    # decode(byte) == -decode(byte ^ 0x80): G.711's sign bit property,
    # over arbitrary companded streams through the container
    rate, ch, sw, pcm = decode_wav(encode_wav(8000, 1, 1, bytes(comp), fmt_tag=tag))
    flipped = bytes(b ^ 0x80 for b in comp)
    _, _, _, pcm2 = decode_wav(encode_wav(8000, 1, 1, flipped, fmt_tag=tag))
    a = struct.unpack(f"<{len(comp)}h", pcm)
    b = struct.unpack(f"<{len(comp)}h", pcm2)
    assert all(x == -y for x, y in zip(a, b))


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 2),
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=30),
)
def test_adpcm_constant_blocks_roundtrip_exactly(channels, frame_vals):
    # the multimodal_adpcm_decode oracle's foundation: any per-frame-
    # constant signal segmented on block boundaries decodes exactly
    # (header predictor exact + zero nibbles hold it). Build one block
    # per value: 9 frames of that value per channel.
    samples = []
    for v in frame_vals:
        samples += [v] * (9 * channels)
    _, ch, sw, pcm = decode_wav(
        encode_wav_adpcm(8000, channels, samples, block_align=8 * channels)
    )
    got = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    assert (ch, sw) == (channels, 2) and got == samples


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 3),
    st.integers(1, 3),
    st.sampled_from(["mono", "420", "411", "422", "444"]),
    st.integers(1, 4),
    st.randoms(use_true_random=False),
)
def test_y4m_roundtrip_lossless(wq, hq, chroma, n_frames, rnd):
    # subsampled chroma needs even (here x4) dims for whole planes
    w, h = 4 * wq, 4 * hq
    num, den = {"mono": (1, 1), "420": (3, 2), "411": (3, 2),
                "422": (2, 1), "444": (3, 1)}[chroma]
    size = w * h * num // den
    frames = [
        bytes(rnd.randrange(256) for _ in range(size)) for _ in range(n_frames)
    ]
    assert decode_y4m(encode_y4m(w, h, frames, chroma)) == (w, h, chroma, frames)
