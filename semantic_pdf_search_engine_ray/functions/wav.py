"""Minimal pure-stdlib WAV (RIFF PCM) codec: real encode/decode for
16-bit mono PCM using only ``struct``.

This gives the multimodal AUDIO path a real decoder in a container
without soundfile/ffmpeg, mirroring what ``functions/png.py`` does for
images: payloads are actual WAV files and decoding actually walks the
RIFF chunk list (skipping unknown chunks, honoring the fmt block) —
not a fixed-offset slice. The reference's analog surface is the same
opaque-blob + native-decoder pattern as its PDF bytes path
(`/root/reference/src/bin/app/types.rs:12`, `bin/app/pdf.rs:8-18`).

Scope is deliberately the training-pipeline subset: PCM (format tag 1),
mono, 16-bit little-endian — the canonical interchange shape feature
extraction normalizes to anyway. Anything else raises ``ValueError`` so
the calling stage can degrade explicitly.
"""

from __future__ import annotations

import struct


def encode_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Encode 16-bit signed mono samples as a PCM WAV file."""
    if not 1 <= sample_rate <= 2**31 - 1:
        raise ValueError("bad sample rate")
    try:
        data = struct.pack(f"<{len(samples)}h", *samples)
    except struct.error as exc:  # keep the module's ValueError contract
        raise ValueError(f"sample outside int16 range: {exc}") from exc
    fmt = struct.pack(
        "<HHIIHH",
        1,                  # PCM
        1,                  # mono
        sample_rate,
        sample_rate * 2,    # byte rate
        2,                  # block align
        16,                 # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Decode a PCM WAV file -> (sample_rate, samples).

    Walks the RIFF chunk list: unknown chunks (LIST/fact/cue ...) are
    skipped via their declared size (word-aligned, per spec), so files
    with metadata chunks between ``fmt `` and ``data`` decode fine.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    bits = None
    channels = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        chunk = payload[pos + 8:pos + 8 + size]
        if len(chunk) != size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, sample_rate, _br, _ba, bits = (
                struct.unpack_from("<HHIIHH", chunk)
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported format tag {audio_fmt}")
        elif tag == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if (channels, bits) != (1, 16):
        raise ValueError(f"unsupported layout: {channels}ch/{bits}bit")
    n = len(data) // 2
    return sample_rate, list(struct.unpack(f"<{n}h", data[:n * 2]))


def audio_features(sample_rate: int, samples: list[int]) -> dict:
    """Integer-exact features of a decoded clip (integer outputs only, so
    a distributed run and a SQL oracle agree bit-for-bit):

    - ``duration_ms``: floor(n * 1000 / rate)
    - ``peak``: max(|s|) (0 for an empty clip)
    - ``energy``: sum of squared samples
    - ``zero_crossings``: count of adjacent sign flips, where "negative"
      is s < 0 (zero counts as non-negative)
    """
    n = len(samples)
    zc = sum(
        1 for i in range(1, n) if (samples[i] < 0) != (samples[i - 1] < 0)
    )
    return {
        "n_samples": n,
        "duration_ms": n * 1000 // sample_rate,
        "peak": max((abs(s) for s in samples), default=0),
        "energy": sum(s * s for s in samples),
        "zero_crossings": zc,
    }
