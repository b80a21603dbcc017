"""Length-prefixed frame container for the VIDEO multimodal path.

Real video containers (mp4/mkv) need ffmpeg, which this container image
lacks; what the Ray side of a frame-sampling stage needs from one is
just "a binary payload holding N independently decodable frames". This
8-byte-header format provides exactly that with zero dependencies:

    b"FRM1" | uint32 n_frames | (uint32 len | frame bytes) * n_frames

Frames are whole PNG files (``functions/png.py``), so sampled frames go
through the REAL image decode path. ffmpeg slots in for real containers
by replacing ``iter_frames`` only — the stage contract (payload in,
sampled decoded frames out) is format-agnostic.
"""

from __future__ import annotations

import struct

_MAGIC = b"FRM1"


def pack_frames(frames: list[bytes]) -> bytes:
    out = [_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def unpack_frames(payload: bytes) -> list[bytes]:
    if payload[:4] != _MAGIC:
        raise ValueError("not a FRM1 payload")
    if len(payload) < 8:
        raise ValueError("truncated FRM1 header")
    (n,) = struct.unpack_from("<I", payload, 4)
    pos = 8
    frames = []
    for _ in range(n):
        if pos + 4 > len(payload):
            raise ValueError("truncated frame table")
        (size,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        frame = payload[pos:pos + size]
        if len(frame) != size:
            raise ValueError("truncated frame")
        frames.append(frame)
        pos += size
    return frames
