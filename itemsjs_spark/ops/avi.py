"""Pure-stdlib AVI (RIFF) container walk for MJPEG video.

Closes the generic-video gap next to the y4m path (`ops/y4m.py` covers
uncompressed video): an AVI file whose video stream is Motion-JPEG is
just a RIFF tree whose ``movi`` LIST carries one complete baseline JPEG
per ``00dc`` chunk, so the frame payloads decode through the repo's own
spec-implementing JPEG codec (`ops/jpeg.py`) — no ffmpeg, no external
data.

Layout implemented (Microsoft AVI RIFF form, as published in the
Windows multimedia documentation and the OpenDML AVI spec):

    RIFF('AVI '
      LIST('hdrl'
        avih(<MainAVIHeader, 56 bytes>)
        LIST('strl'
          strh(<AVIStreamHeader 'vids'/'MJPG', 56 bytes>)
          strf(<BITMAPINFOHEADER, 40 bytes, biCompression='MJPG'>)))
      LIST('movi' 00dc(<jpeg>) 00dc(<jpeg>) ...)
      idx1(<AVIOLDINDEX entries>))

Both directions are real: the writer emits the tree with correct sizes,
word alignment and an idx1 index; the reader walks the chunk tree,
cross-checks the stream fourccs and returns the raw JPEG payloads.
Writer/reader are deterministic, so planted frames round-trip exactly
and a DuckDB oracle can predict decoded statistics algebraically.

The reference (`/root/reference`, itemsjs) has no media handling — this
module belongs to the beyond-the-reference training-data-pipeline
surface (SURVEY.md §8).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

__all__ = ["encode_avi_mjpeg", "parse_avi_mjpeg", "BadAVI"]


class BadAVI(ValueError):
    """Raised when the RIFF tree is not a readable MJPEG AVI."""


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """ckid + ckSize + ckData, padded to word alignment (RIFF rule:
    chunks start on even offsets; the pad byte is not counted in
    ckSize)."""
    if len(fourcc) != 4:
        raise ValueError("fourcc must be 4 bytes")
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpeg(
    width: int,
    height: int,
    frames: List[bytes],
    fps: int = 25,
) -> bytes:
    """(dims, list of complete baseline-JPEG frames) -> AVI bytes.

    Every frame must already be a self-contained JPEG bitstream (SOI ..
    EOI); MJPEG-in-AVI stores exactly that per ``00dc`` chunk."""
    if width <= 0 or height <= 0:
        raise ValueError("dimensions must be positive")
    if int(fps) <= 0:
        raise ValueError("fps must be positive")
    if not frames:
        raise ValueError("need at least one frame")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("frame is not a JPEG (bad SOI)")

    max_size = max(len(f) for f in frames)
    us_per_frame = 1_000_000 // int(fps)

    avih = struct.pack(
        "<14I",
        us_per_frame,          # dwMicroSecPerFrame
        max_size * int(fps),   # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags: AVIF_HASINDEX
        len(frames),           # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_size,              # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,            # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi",
            0,                 # dwFlags
            0, 0,              # wPriority, wLanguage
            0,                 # dwInitialFrames
            1,                 # dwScale
            int(fps),          # dwRate (rate/scale = fps)
            0,                 # dwStart
            len(frames),       # dwLength (in frames)
            max_size,          # dwSuggestedBufferSize
            0,                 # dwQuality
            0,                 # dwSampleSize (0: variable-size frames)
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                    # biSize
        width,
        height,
        1,                     # biPlanes
        24,                    # biBitCount
        b"MJPG",               # biCompression
        width * height * 3,    # biSizeImage (decoded)
        0, 0, 0, 0,            # XPels, YPels, ClrUsed, ClrImportant
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    frames_body = b""
    idx_entries = []
    for f in frames:
        # idx1 offsets are from the start of the 'movi' list data
        # (counting its 'movi' fourcc), pointing at the chunk's ckid
        idx_entries.append((4 + len(frames_body), len(f)))
        frames_body += _chunk(b"00dc", f)
    movi = _list(b"movi", frames_body)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
        for off, size in idx_entries
    )

    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each chunk in
    [pos, end), honoring word alignment."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise BadAVI("chunk overruns its parent")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def parse_avi_mjpeg(data: bytes) -> Tuple[int, int, List[bytes]]:
    """AVI bytes -> (width, height, [jpeg_frame_bytes]).

    Walks the RIFF tree: dimensions from ``avih``, stream type/handler
    cross-checked against ``strh`` ('vids'/'MJPG'), frames from the
    ``movi`` list's ``00dc``/``00db`` chunks in stream order (``idx1``
    is permitted but not required — index-less AVIs stay readable)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise BadAVI("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(8 + riff_size, len(data))

    width = height = -1
    saw_vids_mjpg = False
    frames: List[bytes] = []

    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        listtype = data[body : body + 4]
        if listtype == b"hdrl":
            for cc2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                if cc2 == b"avih":
                    if s2 < 40:
                        raise BadAVI("short avih")
                    vals = struct.unpack("<10I", data[b2 : b2 + 40])
                    width, height = vals[8], vals[9]
                elif cc2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    for cc3, b3, s3 in _walk_chunks(data, b2 + 4, b2 + s2):
                        if cc3 == b"strh" and s3 >= 8:
                            if (
                                data[b3 : b3 + 4] == b"vids"
                                and data[b3 + 4 : b3 + 8] == b"MJPG"
                            ):
                                saw_vids_mjpg = True
        elif listtype == b"movi":
            for cc2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                # ..dc = compressed video, ..db = uncompressed; MJPEG
                # writers use dc. Stream 00 only (single-stream files).
                if cc2 in (b"00dc", b"00db"):
                    frames.append(data[b2 : b2 + s2])

    if width <= 0 or height <= 0:
        raise BadAVI("missing avih dimensions")
    if not saw_vids_mjpg:
        raise BadAVI("no vids/MJPG stream header")
    if not frames:
        raise BadAVI("empty movi list")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise BadAVI("00dc payload is not a JPEG")
    return width, height, frames
