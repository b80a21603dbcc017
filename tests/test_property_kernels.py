"""Property-based tests (hypothesis) for the round-2 kernels: UAX#29
segmentation, the semantic splitter, the PNG codec, deterministic
sampling and the pinned rounding rule — invariants that must hold on
ARBITRARY input, not just the fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no surrogates
    max_size=400,
)


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_uax29_segments_partition_the_input(text):
    from semantic_pdf_search_engine_ray.functions.uax29 import (
        sentence_break_indices,
        unicode_sentences,
    )

    segs = unicode_sentences(text)
    assert "".join(segs) == text
    assert all(segs)  # no empty segments
    idx = sentence_break_indices(text)
    assert idx[0] == 0 and idx[-1] == len(text)
    assert idx == sorted(set(idx))  # strictly increasing boundaries


@settings(max_examples=100, deadline=None)
@given(TEXT, st.integers(min_value=1, max_value=80))
def test_semantic_chunks_invariants(text, cap):
    from semantic_pdf_search_engine_ray.functions.splitter import (
        semantic_chunks,
    )

    chunks = semantic_chunks(text, cap)
    joined = "".join(chunks)
    # non-whitespace content is preserved, in order
    drop_ws = "".join(text.split())
    assert "".join(joined.split()) == drop_ws
    for c in chunks:
        assert c == c.strip() and c  # emitted trimmed, never empty
        # a chunk may exceed cap only when it is a single unsplittable
        # char-level overshoot (cap < 1 trimmed char never happens for
        # cap >= 1) — assert the contract directly:
        assert len(c) <= cap or len(c.split()) == 1 and cap < len(c)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([0, 2, 4, 6]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_random(w, h, ctype, seed):
    import numpy as np

    from semantic_pdf_search_engine_ray.functions.png import (
        _CHANNELS,
        decode_png,
        encode_png,
    )

    ch = _CHANNELS[ctype]
    rng = np.random.RandomState(seed % (2**31))
    pix = rng.randint(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    out = decode_png(encode_png(w, h, pix, color_type=ctype))
    assert out == (w, h, ch, pix)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9), max_size=50),
       st.integers(min_value=0, max_value=100))
def test_deterministic_sample_is_pure_per_row(keys, rate):
    from semantic_pdf_search_engine_ray.functions.shingle import md5_hash64

    picked = {k for k in keys if md5_hash64(str(k)) % 100 < rate}
    # permutation/partition invariance: selection depends only on the key
    for perm in (list(reversed(keys)), sorted(keys)):
        assert {k for k in perm
                if md5_hash64(str(k)) % 100 < rate} == picked
    if rate == 0:
        assert not picked
    if rate == 100:
        assert picked == set(keys)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1e9, max_value=1e9,
                 allow_nan=False, allow_infinity=False))
def test_round6_half_away_matches_duckdb_semantics(x):
    from semantic_pdf_search_engine_ray.functions.num import (
        round6_half_away,
    )

    r = round6_half_away(x)
    assert abs(r - x) <= 5.0000001e-7 + abs(x) * 1e-12
    # idempotent and sign-preserving
    assert round6_half_away(r) == r
    assert (r >= 0) == (x >= 0) or r == 0.0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_infinity=False),
                min_size=0, max_size=32))
def test_round6_arr_element_identical_to_scalar(xs):
    import numpy as np

    from semantic_pdf_search_engine_ray.functions.num import (
        round6_half_away,
        round6_half_away_arr,
    )

    arr = round6_half_away_arr(np.array(xs, dtype=np.float64))
    assert arr.tolist() == [round6_half_away(x) for x in xs]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), max_size=64),
    st.integers(min_value=1, max_value=192000),
)
def test_wav_roundtrip_random(samples, rate):
    from semantic_pdf_search_engine_ray.functions.wav import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    got_rate, got = decode_wav(encode_wav(rate, samples))
    assert (got_rate, got) == (rate, samples)
    f = audio_features(got_rate, got)
    assert f["energy"] == sum(s * s for s in samples)
    assert f["peak"] == max((abs(s) for s in samples), default=0)
    assert 0 <= f["zero_crossings"] < max(len(samples), 1)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=64), max_size=16))
def test_frames_roundtrip_random(frames):
    from semantic_pdf_search_engine_ray.functions.frames import (
        pack_frames,
        unpack_frames,
    )

    assert unpack_frames(pack_frames(frames)) == frames
