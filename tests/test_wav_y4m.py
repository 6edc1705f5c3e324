"""Pure-stdlib WAV + YUV4MPEG2 codecs and the real audio/video multimodal
kernels: round trips, chunk-walk robustness, unsupported-flavor
rejection, and Spark-side decode over planted payloads with known sample
values."""

from __future__ import annotations

import struct

import pytest

from itemsjs_spark.ops import multimodal
from itemsjs_spark.ops.wav import (
    UnsupportedWAV,
    decode_wav,
    encode_wav,
    pcm_to_ints,
)
from itemsjs_spark.ops.y4m import (
    UnsupportedY4M,
    decode_y4m,
    encode_y4m,
)


# ---------------------------------------------------------------- WAV --


def test_wav_roundtrip_8_and_16_bit():
    pcm8 = bytes((i * 13) % 256 for i in range(16))
    assert decode_wav(encode_wav(16000, 1, 1, pcm8)) == (16000, 1, 1, pcm8)
    pcm16 = struct.pack("<8h", 0, 1, -1, 32767, -32768, 100, -100, 7)
    assert decode_wav(encode_wav(44100, 2, 2, pcm16)) == (44100, 2, 2, pcm16)


def test_wav_odd_data_is_padded_and_roundtrips():
    pcm = bytes([1, 2, 3])  # odd byte count: RIFF pads the chunk
    data = encode_wav(8000, 1, 1, pcm)
    assert len(data) % 2 == 0
    assert decode_wav(data) == (8000, 1, 1, pcm)


def test_wav_skips_foreign_chunks():
    # a LIST metadata chunk between fmt and data must be walked over
    pcm = bytes(range(8))
    base = encode_wav(22050, 1, 1, pcm)
    fmt_chunk = base[12 : 12 + 8 + 16]
    data_chunk = base[12 + 8 + 16 :]
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = b"WAVE" + fmt_chunk + extra + data_chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert decode_wav(data) == (22050, 1, 1, pcm)


def test_wav_rejects_unsupported_and_corrupt():
    pcm = bytes(range(8))
    good = encode_wav(8000, 1, 1, pcm)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + good[4:])
    # IEEE-float format tag (3)
    bad = bytearray(good)
    bad[20] = 3  # fmt tag low byte
    with pytest.raises(UnsupportedWAV):
        decode_wav(bytes(bad))
    # 24-bit PCM
    bad = bytearray(good)
    bad[34] = 24  # bits-per-sample low byte
    with pytest.raises(UnsupportedWAV):
        decode_wav(bytes(bad))
    # truncated data chunk
    with pytest.raises(ValueError):
        decode_wav(good[:-4])


def test_g711_expansion_reference_points():
    """ITU-T G.711 segment expansion against published table values:
    silence bytes, positive/negative zero, and both extremes."""
    from itemsjs_spark.ops.wav import ALAW_TABLE, ULAW_TABLE

    assert ULAW_TABLE[0xFF] == 0  # mu-law silence
    assert ULAW_TABLE[0x7F] == 0  # negative zero
    assert ULAW_TABLE[0x00] == -32124  # most negative
    assert ULAW_TABLE[0x80] == 32124  # most positive
    assert ALAW_TABLE[0xD5] == 8  # A-law silence (+8)
    assert ALAW_TABLE[0x55] == -8
    assert ALAW_TABLE[0xAA] == 32256  # most positive
    assert ALAW_TABLE[0x2A] == -32256  # most negative
    # expansion is symmetric: flipping the sign bit negates (mu-law)
    for b in range(128):
        assert ULAW_TABLE[b] == -ULAW_TABLE[b | 0x80]


def test_g711_container_decode_expands_to_linear16():
    import struct as _s

    from itemsjs_spark.ops.wav import (
        WAVE_FORMAT_ALAW,
        WAVE_FORMAT_MULAW,
    )

    comp = bytes([0xFF, 0x00, 0x80, 0x7F])
    rate, ch, sw, pcm = decode_wav(
        encode_wav(8000, 1, 1, comp, fmt_tag=WAVE_FORMAT_MULAW)
    )
    assert (rate, ch, sw) == (8000, 1, 2)
    assert list(_s.unpack("<4h", pcm)) == [0, -32124, 32124, 0]
    rate, ch, sw, pcm = decode_wav(
        encode_wav(8000, 2, 1, bytes([0xD5, 0xAA]), fmt_tag=WAVE_FORMAT_ALAW)
    )
    assert (ch, sw) == (2, 2)
    assert list(_s.unpack("<2h", pcm)) == [8, 32256]
    # G.711 must store 8-bit samples
    with pytest.raises(UnsupportedWAV):
        bad = bytearray(encode_wav(8000, 1, 2, bytes(4), fmt_tag=1))
        bad[20] = 7  # rewrite tag to mu-law but leave 16-bit
        decode_wav(bytes(bad))


def test_ima_adpcm_state_machine_vectors():
    """Hand-computed IMA nibble decodes + cross-check against CPython's
    audioop Intel/DVI implementation where available."""
    from itemsjs_spark.ops.wav import _ima_decode_nibbles

    # nibble 0 at index 0 (step 7): diff = 7>>3 = 0, predictor holds,
    # index clamps at 0 — the "silent block" invariant the planted
    # driver payloads rely on
    out: list = []
    pred, idx = _ima_decode_nibbles([0, 0, 0, 0], 42, 0, out)
    assert out == [42, 42, 42, 42] and (pred, idx) == (42, 0)
    # nibble 7 at index 0: diff = 0 + 1 + 3 + 7 = 11, index 0+8=8
    out = []
    pred, idx = _ima_decode_nibbles([7], 0, 0, out)
    assert out == [11] and (pred, idx) == (11, 8)
    # sign bit subtracts; index floor clamps at 0
    out = []
    pred, idx = _ima_decode_nibbles([0x8 | 7], 0, 0, out)
    assert out == [-11] and (pred, idx) == (-11, 8)

    try:
        import audioop  # removed in 3.13; same DVI/IMA state machine
    except ImportError:
        return
    # audioop packs the FIRST sample in the HIGH nibble; feed one byte
    # at a time and compare full state evolution over a pseudo stream
    nibs = [(3 * i + (i * i) % 7) % 16 for i in range(64)]
    out = []
    pred, idx = _ima_decode_nibbles(nibs, 0, 0, out)
    state = None
    ref: list = []
    for i in range(0, 64, 2):
        frag, state = audioop.adpcm2lin(
            bytes([(nibs[i] << 4) | nibs[i + 1]]), 2, state
        )
        ref.extend(struct.unpack("<2h", frag))
    assert out == ref
    assert (pred, idx) == state


def test_ima_adpcm_container_roundtrip():
    from itemsjs_spark.ops.wav import encode_wav_adpcm

    # constant-per-block signal is exact end-to-end (delta 0 -> code 0)
    samples = [v for v in (100, -3000, 42) for _ in range(9)]
    rate, ch, sw, pcm = decode_wav(
        encode_wav_adpcm(8000, 1, samples, block_align=8)
    )
    assert (rate, ch, sw) == (8000, 1, 2)
    assert list(struct.unpack(f"<{len(samples)}h", pcm)) == samples

    # a smooth wave round-trips with small adaptive-quantizer error and
    # the fact chunk truncates the padded final block (31 frames, spb 9)
    import math as _m

    wave = [int(8000 * _m.sin(i / 20.0)) for i in range(31)]
    rate, ch, sw, pcm = decode_wav(
        encode_wav_adpcm(16000, 1, wave, block_align=8)
    )
    got = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    assert len(got) == 31  # fact truncation, not 36
    err = [abs(a - b) for a, b in zip(got, wave)]
    # slope-overload lag while the step adapts from 7, then each block
    # header re-syncs the predictor exactly (err -> 0 at sample 9)
    assert sum(err) / len(err) < 350 and max(err) < 1600  # measures 228/1446
    assert max(err[9:18]) < 300  # adapted by block 2

    # stereo: constant L/R stay exact and interleave correctly
    st = []
    for _ in range(17):
        st += [1234, -77]
    rate, ch, sw, pcm = decode_wav(encode_wav_adpcm(8000, 2, st))
    got = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    assert ch == 2 and len(got) == 34
    assert got[0::2] == [1234] * 17 and got[1::2] == [-77] * 17


def test_ima_adpcm_rejects_bad_shapes():
    from itemsjs_spark.ops.wav import encode_wav_adpcm

    good = encode_wav_adpcm(8000, 1, [0] * 9, block_align=8)
    # 8-bit IMA is not a thing
    bad = bytearray(good)
    bad[34] = 8  # bits-per-sample low byte
    with pytest.raises(UnsupportedWAV):
        decode_wav(bytes(bad))
    # step index out of range in a block header
    bad = bytearray(good)
    data_at = bad.index(b"data") + 8
    bad[data_at + 2] = 89
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))
    # block align not a whole number of nibble words
    bad = bytearray(good)
    bad[32] = 7  # nBlockAlign low byte
    with pytest.raises(ValueError, match="block align"):
        decode_wav(bytes(bad))


def test_pcm_to_ints_signedness():
    assert pcm_to_ints(bytes([0, 128, 255]), 1) == [0, 128, 255]
    assert pcm_to_ints(struct.pack("<3h", -1, 0, 32767), 2) == [-1, 0, 32767]


# ---------------------------------------------------------------- y4m --


def test_y4m_roundtrip_mono_420_444():
    for chroma, npix in (("mono", 4), ("420", 6), ("444", 12)):
        frames = [bytes((f * 50 + i) % 256 for i in range(npix)) for f in range(3)]
        w, h, c, fr = decode_y4m(encode_y4m(2, 2, frames, chroma))
        assert (w, h, c, fr) == (2, 2, chroma, frames)


def test_y4m_roundtrip_422_and_411():
    # 4x2: C422 planes are (w/2 x h) each -> 2*w*h total; C411 planes
    # are (w/4 x h) each -> 3/2*w*h total
    for chroma, npix in (("422", 16), ("411", 12)):
        frames = [bytes((f * 31 + i) % 256 for i in range(npix)) for f in range(2)]
        w, h, c, fr = decode_y4m(encode_y4m(4, 2, frames, chroma))
        assert (w, h, c, fr) == (4, 2, chroma, frames)


def test_y4m_default_chroma_is_420():
    frame = bytes(range(6))  # 2x2 C420 = 6 bytes
    data = b"YUV4MPEG2 W2 H2 F30:1\nFRAME\n" + frame
    assert decode_y4m(data) == (2, 2, "420", [frame])


def test_y4m_rejects_bad_magic_chroma_and_truncation():
    good = encode_y4m(2, 2, [bytes(4)], "mono")
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"NOT A STREAM\n")
    with pytest.raises(UnsupportedY4M):
        decode_y4m(good.replace(b"Cmono", b"C422p10"))
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(good[:-1])
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(good.replace(b"FRAME", b"FRAmE"))


# -------------------------------------------------- Spark-side kernels --


def test_spark_decode_wav_features_known_samples(spark):
    # 16 known 8-bit samples per doc: features are 4-byte chunk means
    rows = [
        (i, encode_wav(16000, 1, 1, bytes((i + j) % 256 for j in range(16))))
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_wav_features(df, dims=4).collect()
    }
    assert len(got) == 6
    for i in range(6):
        r = got[i]
        assert (r["sample_rate"], r["channels"], r["n_samples"]) == (16000, 1, 16)
        s = [(i + j) % 256 for j in range(16)]
        want = [round(sum(s[k * 4 : k * 4 + 4]) / 4.0 / 255.0, 6) for k in range(4)]
        assert list(r["features"]) == want


def test_spark_decode_wav_features_16bit_signed_scale(spark):
    pcm = struct.pack("<4h", -32768, 0, 16384, 32767)
    df = spark.createDataFrame(
        [(1, encode_wav(8000, 1, 2, pcm))], "doc_id long, payload binary"
    )
    r = multimodal.decode_wav_features(df, dims=2).collect()[0]
    assert r["n_samples"] == 4
    assert list(r["features"]) == [
        round((-32768 + 0) / 2.0 / 32768.0, 6),
        round((16384 + 32767) / 2.0 / 32768.0, 6),
    ]


def test_spark_sample_y4m_frames_every_second_frame(spark):
    # 4 frames of 2x2 mono video; planted luma values per frame
    frames = [bytes([f * 10 + k for k in range(4)]) for f in range(4)]
    df = spark.createDataFrame(
        [(5, encode_y4m(2, 2, frames, "mono"))], "doc_id long, payload binary"
    )
    out = multimodal.sample_y4m_frames(df, every_n=2).collect()
    got = {r["frame_idx"]: r for r in out}
    assert sorted(got) == [0, 2]
    for idx in (0, 2):
        r = got[idx]
        assert (r["width"], r["height"]) == (2, 2)
        assert bytes(r["frame"]) == frames[idx]
        assert r["luma_mean"] == round(sum(frames[idx]) / 4.0 / 255.0, 6)


def test_spark_sample_y4m_frames_420_means_luma_plane_only(spark):
    # C420: 6 bytes/frame, luma = first 4; chroma bytes must not leak in
    frame = bytes([100, 100, 100, 100, 255, 255])
    df = spark.createDataFrame(
        [(9, encode_y4m(2, 2, [frame], "420"))], "doc_id long, payload binary"
    )
    r = multimodal.sample_y4m_frames(df, every_n=1).collect()[0]
    assert r["luma_mean"] == round(100 / 255.0, 6)
    assert bytes(r["frame"]) == frame
