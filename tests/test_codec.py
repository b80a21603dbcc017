"""Codec roundtrip property tests (hypothesis) — FIXTURES.md invariant 5."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from semantic_pdf_search_engine_ray.functions.codec import (
    decode_doc_ids,
    decode_tfs,
    decode_varints,
    encode_doc_ids,
    encode_tfs,
    encode_varints,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert decode_varints(encode_varints(arr)).tolist() == values


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_doc_id_roundtrip(ids):
    ids = sorted(ids)
    arr = np.array(ids, dtype=np.int64)
    assert decode_doc_ids(encode_doc_ids(arr)).tolist() == ids


@given(st.lists(st.integers(min_value=1, max_value=100000), max_size=300))
@settings(max_examples=100, deadline=None)
def test_tf_roundtrip(tfs):
    arr = np.array(tfs, dtype=np.int64)
    assert decode_tfs(encode_tfs(arr)).tolist() == tfs


def test_doc_ids_must_be_ascending():
    import pytest

    with pytest.raises(ValueError):
        encode_doc_ids(np.array([3, 3, 4], dtype=np.int64))
    with pytest.raises(ValueError):
        encode_doc_ids(np.array([5, 2], dtype=np.int64))


def test_varint_known_bytes():
    assert encode_varints(np.array([0], dtype=np.uint64)) == b"\x00"
    assert encode_varints(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert encode_varints(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert encode_varints(np.array([300], dtype=np.uint64)) == b"\xac\x02"
