"""Pure-stdlib YUV4MPEG2 (.y4m) video parser/writer.

YUV4MPEG2 is the standard UNCOMPRESSED video interchange format of the
ffmpeg/x264/mjpegtools toolchain (public spec: a plain-text stream
header ``YUV4MPEG2 W<w> H<h> F<n>:<d> ... [C<chroma>]\\n`` followed by
``FRAME[params]\\n`` + raw planes per frame). Because it carries no
codec, real frame access needs only byte arithmetic — which makes the
video frame-sampling kernel REAL in an environment with no ffmpeg.
Compressed containers (mp4/h264/vp9) still need a codec and keep their
honest ``NotImplementedError`` plug point.

Scope: ``Cmono`` (1 plane, w*h), ``C420``/``C420jpeg``/``C420mpeg2``
(w*h*3/2), ``C411`` (w*h*3/2), ``C422`` (w*h*2) and ``C444`` (w*h*3).
Other chroma tags raise ``UnsupportedY4M``; truncated/corrupt data
raises ``ValueError``.
"""

from __future__ import annotations

from typing import List, Tuple

MAGIC = b"YUV4MPEG2"

# chroma tag -> frame size in luma-pixel units numerator/denominator
_FRAME_SIZE = {
    "mono": (1, 1),
    "420": (3, 2),
    "420jpeg": (3, 2),
    "420mpeg2": (3, 2),
    "411": (3, 2),
    "422": (2, 1),
    "444": (3, 1),
}


class UnsupportedY4M(ValueError):
    """Valid YUV4MPEG2, but a chroma mode outside this parser's scope."""


def decode_y4m(data: bytes) -> Tuple[int, int, str, List[bytes]]:
    """y4m bytes -> (width, height, chroma, frames). Each frame is the
    raw plane bytes (luma first) of one picture."""
    eol = data.find(b"\n")
    if eol < 0 or not data.startswith(MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = -1
    chroma = "420"  # spec default when no C tag is present
    for param in data[len(MAGIC) + 1 : eol].split(b" "):
        if not param:
            continue
        key, val = chr(param[0]), param[1:].decode("ascii")
        if key == "W":
            width = int(val)
        elif key == "H":
            height = int(val)
        elif key == "C":
            chroma = val
        # F (rate), I (interlace), A (aspect), X (extension) don't
        # affect frame byte layout
    if width <= 0 or height <= 0:
        raise ValueError("missing W/H in stream header")
    if chroma not in _FRAME_SIZE:
        raise UnsupportedY4M(f"chroma C{chroma}")
    num, den = _FRAME_SIZE[chroma]
    frame_bytes = width * height * num // den
    frames: List[bytes] = []
    pos = eol + 1
    n = len(data)
    while pos < n:
        feol = data.find(b"\n", pos)
        if feol < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt FRAME header")
        body = data[feol + 1 : feol + 1 + frame_bytes]
        if len(body) != frame_bytes:
            raise ValueError("truncated frame")
        frames.append(body)
        pos = feol + 1 + frame_bytes
    return width, height, chroma, frames


def encode_y4m(
    width: int, height: int, frames: List[bytes], chroma: str = "mono"
) -> bytes:
    """(dims, raw frames) -> y4m bytes. Deterministic, so a test/oracle
    can plant exact frame contents."""
    if chroma not in _FRAME_SIZE:
        raise UnsupportedY4M(f"chroma C{chroma}")
    num, den = _FRAME_SIZE[chroma]
    frame_bytes = width * height * num // den
    for f in frames:
        if len(f) != frame_bytes:
            raise ValueError("frame size does not match dimensions/chroma")
    head = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C{chroma}\n"
    return head.encode("ascii") + b"".join(b"FRAME\n" + f for f in frames)
