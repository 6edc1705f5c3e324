"""Pure-stdlib WAV (RIFF/WAVE) PCM codec.

Implements the public RIFF/WAVE layout (Microsoft/IBM multimedia spec:
``RIFF`` container, ``fmt `` + ``data`` chunks, word-aligned chunk
padding) so the multimodal audio kernels can run on REAL samples in an
environment with no soundfile/ffmpeg — ``struct`` is the only
dependency.

Scope: integer PCM (format tag 1), 8-bit unsigned or 16-bit signed
little-endian, any channel count / sample rate; plus the G.711
companded telephony formats (A-law tag 6, mu-law tag 7 — ITU-T G.711
segment expansion, 8-bit stored -> 16-bit linear). Float, ADPCM and
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
    unsigned; 16-bit: signed LE) — see :func:`pcm_to_ints`. G.711
    companded streams (A-law/mu-law) are EXPANDED to 16-bit linear
    signed LE (sampwidth 2), which is what decoding those formats
    means."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    rate = channels = sampwidth = tag = -1
    pcm = None
    for cid, body in _iter_chunks(data):
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            tag, channels, rate, _byterate, _align, bits = struct.unpack(
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
            else:
                raise UnsupportedWAV(f"format tag {tag} (PCM/A-law/mu-law)")
        elif cid == b"data":
            pcm = body
    if rate < 0 or pcm is None:
        raise ValueError("missing fmt/data chunk")
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
