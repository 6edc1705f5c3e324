"""Pure-stdlib WAV (RIFF/WAVE) PCM codec.

Implements the public RIFF/WAVE layout (Microsoft/IBM multimedia spec:
``RIFF`` container, ``fmt `` + ``data`` chunks, word-aligned chunk
padding) so the multimodal audio kernels can run on REAL samples in an
environment with no soundfile/ffmpeg — ``struct`` is the only
dependency.

Scope: integer PCM (format tag 1), 8-bit unsigned or 16-bit signed
little-endian, any channel count / sample rate; the G.711 companded
telephony formats (A-law tag 6, mu-law tag 7 — ITU-T G.711 segment
expansion, 8-bit stored -> 16-bit linear); and IMA/DVI ADPCM (tag
0x11 — the standard 4-bit adaptive-predictor codec: per-block
predictor+step-index headers, 4-byte nibble words interleaved per
channel, ``fact``-chunk frame truncation). Float and
extensible-format files raise ``UnsupportedWAV`` (a real pipeline routes
those to a full decoder); truncated/corrupt data raises ``ValueError``.

Sample access is a ``memoryview`` cast / bytes slice — no per-sample
Python loop — and the decode sits INSIDE an Arrow ``mapInPandas`` batch
so Spark parallelism applies across rows/partitions.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Tuple


class UnsupportedWAV(ValueError):
    """Valid RIFF/WAVE, but a flavor outside this codec's scope."""


WAVE_FORMAT_PCM = 1
WAVE_FORMAT_ALAW = 6
WAVE_FORMAT_MULAW = 7


def _ulaw_expand(u: int) -> int:
    """ITU-T G.711 mu-law byte -> 16-bit linear sample."""
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_expand(a: int) -> int:
    """ITU-T G.711 A-law byte -> 16-bit linear sample."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


ULAW_TABLE = [_ulaw_expand(b) for b in range(256)]
ALAW_TABLE = [_alaw_expand(b) for b in range(256)]

WAVE_FORMAT_IMA_ADPCM = 0x11

# IMA/DVI ADPCM quantizer tables (public IMA "Recommended Practices for
# Enhancing Digital Audio Compatibility" values, the same tables every
# DVI/IMA implementation ships)
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibbles(
    nibbles: List[int], pred: int, idx: int, out: List[int]
) -> Tuple[int, int]:
    """Run the IMA state machine over 4-bit codes, appending decoded
    16-bit samples to ``out``; returns the carried (pred, idx)."""
    steps, idxtab = IMA_STEP_TABLE, IMA_INDEX_TABLE
    for n in nibbles:
        step = steps[idx]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        if pred > 32767:
            pred = 32767
        elif pred < -32768:
            pred = -32768
        idx += idxtab[n & 7]
        if idx < 0:
            idx = 0
        elif idx > 88:
            idx = 88
        out.append(pred)
    return pred, idx


def _ima_encode_sample(s: int, pred: int, idx: int) -> Tuple[int, int, int]:
    """One 16-bit sample -> (4-bit code, reconstructed pred, idx). The
    reconstruction uses the exact decoder rules, so encoder and decoder
    predictors stay in lockstep."""
    step = IMA_STEP_TABLE[idx]
    delta = s - pred
    n = 0
    if delta < 0:
        n = 8
        delta = -delta
    if delta >= step:
        n |= 4
        delta -= step
    if delta >= step >> 1:
        n |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        n |= 1
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    pred = pred - diff if n & 8 else pred + diff
    if pred > 32767:
        pred = 32767
    elif pred < -32768:
        pred = -32768
    idx += IMA_INDEX_TABLE[n & 7]
    if idx < 0:
        idx = 0
    elif idx > 88:
        idx = 88
    return n, pred, idx


def _ima_decode(data: bytes, channels: int, block_align: int) -> List[int]:
    """IMA ADPCM data chunk -> interleaved 16-bit samples. Blocks carry
    their own (predictor, step index) headers per channel; nibble words
    are 4 bytes per channel, low nibble first."""
    hdr = 4 * channels
    if block_align <= hdr or (block_align - hdr) % (4 * channels):
        raise ValueError("bad IMA ADPCM block align")
    out: List[int] = []
    pos = 0
    n = len(data)
    while pos < n:
        block = data[pos : pos + block_align]
        pos += block_align
        if len(block) < hdr or (len(block) - hdr) % (4 * channels):
            raise ValueError("truncated IMA ADPCM block")
        preds: List[int] = []
        idxs: List[int] = []
        chans: List[List[int]] = []
        for c in range(channels):
            p, i_, _rsv = struct.unpack_from("<hBB", block, 4 * c)
            if i_ > 88:
                raise ValueError("IMA step index out of range")
            preds.append(p)
            idxs.append(i_)
            chans.append([p])  # the header predictor IS sample 0
        body = block[hdr:]
        for g in range(0, len(body), 4 * channels):
            for c in range(channels):
                word = body[g + 4 * c : g + 4 * c + 4]
                nib: List[int] = []
                for byte in word:
                    nib.append(byte & 0x0F)
                    nib.append(byte >> 4)
                preds[c], idxs[c] = _ima_decode_nibbles(
                    nib, preds[c], idxs[c], chans[c]
                )
        for k in range(len(chans[0])):
            for c in range(channels):
                out.append(chans[c][k])
    return out


def _iter_chunks(data: bytes) -> Iterator[Tuple[bytes, bytes]]:
    # past the 12-byte RIFF header: [4-byte id][4-byte LE size][payload],
    # payloads padded to even offsets (RIFF word alignment)
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        yield cid, body
        pos += 8 + size + (size & 1)


def decode_wav(data: bytes) -> Tuple[int, int, int, bytes]:
    """WAV bytes -> (sample_rate, channels, sampwidth_bytes, pcm).
    ``pcm`` is the raw interleaved sample data exactly as stored (8-bit:
    unsigned; 16-bit: signed LE) — see :func:`pcm_to_ints`. Compressed
    flavors are EXPANDED to 16-bit linear signed LE (sampwidth 2),
    which is what decoding them means: G.711 A-law/mu-law by table,
    IMA ADPCM by running the adaptive-predictor state machine over
    every block (honoring the ``fact`` chunk's true frame count)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    rate = channels = sampwidth = tag = -1
    block_align = 0
    fact_frames = None
    pcm = None
    for cid, body in _iter_chunks(data):
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            tag, channels, rate, _byterate, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == WAVE_FORMAT_PCM:
                if bits not in (8, 16):
                    raise UnsupportedWAV(f"{bits}-bit PCM (only 8/16)")
                sampwidth = bits // 8
            elif tag in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
                if bits != 8:
                    raise UnsupportedWAV(f"{bits}-bit G.711 (only 8)")
                sampwidth = 1
            elif tag == WAVE_FORMAT_IMA_ADPCM:
                if bits != 4:
                    raise UnsupportedWAV(f"{bits}-bit IMA ADPCM (only 4)")
                sampwidth = 2  # decoded width; storage is nibble blocks
            else:
                raise UnsupportedWAV(
                    f"format tag {tag} (PCM/A-law/mu-law/IMA-ADPCM)"
                )
        elif cid == b"fact":
            if len(body) >= 4:
                (fact_frames,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            pcm = body
    if rate < 0 or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if tag == WAVE_FORMAT_IMA_ADPCM:
        samples = _ima_decode(pcm, channels, block_align)
        if fact_frames is not None:
            samples = samples[: fact_frames * channels]
        return rate, channels, 2, struct.pack(f"<{len(samples)}h", *samples)
    if len(pcm) % (sampwidth * channels):
        raise ValueError("data chunk is not a whole number of frames")
    if tag in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
        table = ALAW_TABLE if tag == WAVE_FORMAT_ALAW else ULAW_TABLE
        expanded = struct.pack(f"<{len(pcm)}h", *[table[b] for b in pcm])
        return rate, channels, 2, expanded
    return rate, channels, sampwidth, pcm


def pcm_to_ints(pcm: bytes, sampwidth: int) -> List[int]:
    """Stored sample data -> integer samples (8-bit: 0..255 unsigned per
    the WAV spec; 16-bit: -32768..32767 signed LE)."""
    if sampwidth == 1:
        return list(pcm)
    if sampwidth == 2:
        return list(memoryview(pcm).cast("h"))
    raise UnsupportedWAV(f"sample width {sampwidth}")


def encode_wav(
    rate: int,
    channels: int,
    sampwidth: int,
    pcm: bytes,
    fmt_tag: int = WAVE_FORMAT_PCM,
) -> bytes:
    """(rate, channels, sampwidth, stored-sample bytes) -> WAV bytes.
    Deterministic for fixed inputs, so a test/oracle can plant exact
    payloads. ``fmt_tag`` 6/7 writes a G.711 container (``pcm`` must
    then be the companded 8-bit bytes, sampwidth 1)."""
    if sampwidth not in (1, 2):
        raise ValueError(f"unsupported sample width {sampwidth}")
    if fmt_tag in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW) and sampwidth != 1:
        raise ValueError("G.711 stores 8-bit companded samples")
    if len(pcm) % (sampwidth * channels):
        raise ValueError("pcm is not a whole number of frames")
    fmt = struct.pack(
        "<HHIIHH",
        fmt_tag,
        channels,
        rate,
        rate * channels * sampwidth,
        channels * sampwidth,
        sampwidth * 8,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_adpcm(
    rate: int,
    channels: int,
    samples: List[int],
    block_align: int = 0,
) -> bytes:
    """Interleaved 16-bit samples -> IMA ADPCM WAV bytes.

    A real encoder: each block's header stores the channel's NEXT input
    sample verbatim as the predictor (so block sample 0 is exact) plus
    the carried step index; the remaining frames quantize to 4-bit
    codes with the encoder predictor reconstructed by the decoder's own
    rules. The final partial block pads by repeating the last frame and
    a ``fact`` chunk records the true frame count (the decoder
    truncates to it). Deterministic for fixed inputs."""
    if channels < 1:
        raise ValueError("need at least one channel")
    if len(samples) % channels:
        raise ValueError("samples are not a whole number of frames")
    if not block_align:
        block_align = 256 * channels
    hdr = 4 * channels
    if block_align <= hdr or (block_align - hdr) % (4 * channels):
        raise ValueError("bad IMA ADPCM block align")
    frames = len(samples) // channels
    if frames == 0:
        raise ValueError("need at least one frame")
    spb = (block_align - hdr) // (4 * channels) * 8 + 1  # samples/block/chan

    # pad to whole blocks by repeating the final frame
    n_blocks = (frames + spb - 1) // spb
    last = samples[-channels:]
    padded = list(samples) + list(last) * (n_blocks * spb - frames)

    out_data = bytearray()
    idxs = [0] * channels
    for b in range(n_blocks):
        base = b * spb * channels
        preds = []
        for c in range(channels):
            p = padded[base + c]
            p = -32768 if p < -32768 else (32767 if p > 32767 else p)
            preds.append(p)
            out_data += struct.pack("<hBB", p, idxs[c], 0)
        # nibble words: 8 samples per channel per 4-byte word, round-robin
        for g in range((spb - 1) // 8):
            for c in range(channels):
                word = 0
                for k in range(8):
                    s = padded[base + (1 + g * 8 + k) * channels + c]
                    n, preds[c], idxs[c] = _ima_encode_sample(
                        s, preds[c], idxs[c]
                    )
                    word |= n << (4 * k)  # low nibble first
                out_data += struct.pack("<I", word)

    fmt = struct.pack(
        "<HHIIHHH",
        WAVE_FORMAT_IMA_ADPCM,
        channels,
        rate,
        rate * block_align // spb,  # average bytes/sec (informational)
        block_align,
        4,
        2,  # cbSize
    ) + struct.pack("<H", spb)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, frames)
        + b"data" + struct.pack("<I", len(out_data)) + out_data
        + (b"\x00" if len(out_data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
