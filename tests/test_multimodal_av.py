"""Audio/video multimodal kernels: WAV RIFF codec, FRM1 frame
container, integer feature extraction. No Ray needed — the Ray-side
plumbing is exercised by the audio_features / video_frame_sample
entries in tests/test_conformance_oracle.py."""

from __future__ import annotations

import struct

import pytest

from semantic_pdf_search_engine_ray.functions.frames import (
    pack_frames,
    unpack_frames,
)
from semantic_pdf_search_engine_ray.functions.wav import (
    audio_features,
    decode_wav,
    encode_wav,
)


def test_wav_roundtrip_basic():
    samples = [0, 1, -1, 32767, -32768, 123, -456]
    assert decode_wav(encode_wav(44100, samples)) == (44100, samples)


def test_wav_decode_skips_unknown_chunks():
    """Chunk walk, not fixed offsets: a LIST metadata chunk (odd-sized,
    so word-alignment padding is exercised too) between fmt and data
    must be skipped."""
    samples = [5, -5, 9]
    payload = encode_wav(8000, samples)
    # splice an unknown 3-byte chunk (+1 pad byte) after fmt (ends at 36)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = payload[:36] + extra + payload[36:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced) == (8000, samples)


@pytest.mark.parametrize("mutate,msg", [
    (lambda p: b"JUNK" + p[4:], "not a RIFF"),
    (lambda p: p[:-3], "truncated"),
    (lambda p: p[:20] + struct.pack("<H", 3) + p[22:], "format tag"),
    (lambda p: p[:22] + struct.pack("<H", 2) + p[24:], "unsupported layout"),
])
def test_wav_decode_rejects_bad_payloads(mutate, msg):
    payload = encode_wav(8000, [1, 2, 3])
    with pytest.raises(ValueError, match=msg):
        decode_wav(mutate(payload))


def test_audio_features_integer_contract():
    f = audio_features(1000, [3, -4, 0, -2, 5])
    assert f == {
        "n_samples": 5,
        "duration_ms": 5,         # floor(5*1000/1000)
        "peak": 5,
        "energy": 9 + 16 + 0 + 4 + 25,
        # sign flips at 3->-4, -4->0 (0 is non-negative), 0->-2, -2->5
        "zero_crossings": 4,
    }
    assert audio_features(8000, []) == {
        "n_samples": 0, "duration_ms": 0, "peak": 0, "energy": 0,
        "zero_crossings": 0,
    }


def test_frames_roundtrip_and_errors():
    frames = [b"", b"x", b"longer frame payload" * 3]
    packed = pack_frames(frames)
    assert unpack_frames(packed) == frames
    assert unpack_frames(pack_frames([])) == []
    with pytest.raises(ValueError, match="not a FRM1"):
        unpack_frames(b"nope" + packed[4:])
    with pytest.raises(ValueError, match="truncated"):
        unpack_frames(packed[:-1])


def test_frame_sample_stage_skips_unsampled_and_decodes_sampled():
    import pyarrow as pa

    from semantic_pdf_search_engine_ray.functions.png import encode_png
    from semantic_pdf_search_engine_ray.stages.multimodal import (
        VideoFrameSampleStage,
    )

    fills = [10, 20, 30, 40, 50]
    frames = [encode_png(2, 2, bytes([f]) * 12) for f in fills]
    # corrupt an UNSAMPLED frame (idx 1): step=2 must never touch it
    frames[1] = b"\x89PNG garbage"
    batch = pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "payload": pa.array([pack_frames(frames)], type=pa.binary()),
    })
    out = VideoFrameSampleStage(step=2)(batch)
    assert out.column("frame_idx").to_pylist() == [0, 2, 4]
    assert out.column("mean_pixel").to_pylist() == [10, 30, 50]
    assert out.column("n_frames").to_pylist() == [5, 5, 5]
    assert out.column("width").to_pylist() == [2, 2, 2]


def test_short_frm1_and_out_of_range_wav_raise_valueerror():
    """Contract: malformed inputs raise ValueError (never a raw
    struct.error) so callers can degrade uniformly."""
    with pytest.raises(ValueError, match="truncated FRM1 header"):
        unpack_frames(b"FRM1")
    with pytest.raises(ValueError, match="int16 range"):
        encode_wav(8000, [40000])
