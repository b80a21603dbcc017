"""SymSpell deletion-index suggestion paths: exact-recall candidate
generation must leave results identical to the exhaustive banded scan
(the r2 baseline and the DuckDB ``levenshtein`` oracle contract)."""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from semantic_pdf_search_engine_ray.pipelines.spell import (
    SuggestStage,
    bounded_levenshtein,
    deletion_keys,
)


def _rand_vocab(rng: random.Random, n: int) -> list[str]:
    alpha = "abcdef"
    return sorted(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
            for _ in range(n)
        }
    )


def test_deletion_keys_counts():
    assert deletion_keys("ab", 0) == {"ab"}
    assert deletion_keys("ab", 1) == {"ab", "a", "b"}
    # dist 2 on a 2-char term reaches the empty string
    assert deletion_keys("ab", 2) == {"ab", "a", "b", ""}
    # 10-char distinct-letter term: 1 + 10 + C(10,2) keys
    ks = deletion_keys("abcdefghij", 2)
    assert len(ks) == 1 + 10 + 45


@settings(max_examples=300, deadline=None)
@given(
    a=st.text(alphabet="abc", min_size=0, max_size=7),
    b=st.text(alphabet="abc", min_size=0, max_size=7),
)
def test_symspell_exact_recall(a: str, b: str):
    """lev(a,b) <= d  ==>  D_d(a) and D_d(b) intersect (the SymSpell
    soundness property the pruned scan relies on for exact recall)."""
    d = 2
    if bounded_levenshtein(a, b, d) <= d:
        assert deletion_keys(a, d) & deletion_keys(b, d)


def test_suggest_stage_identical_to_brute_scan(ray_session):
    import ray

    rng = random.Random(7)
    vocab = _rand_vocab(rng, 400)
    dfs = [rng.randint(1, 50) for _ in vocab]
    queries = [(i, w) for i, w in enumerate(_rand_vocab(rng, 25))]
    max_dist = 2

    stage = SuggestStage(ray.put(queries), max_dist)
    got = stage(
        pa.table(
            {
                "term": pa.array(vocab, type=pa.string()),
                "df": pa.array(dfs, type=pa.int64()),
            }
        )
    )

    expect = set()
    for qid, miss in queries:
        for t, df in zip(vocab, dfs):
            d = bounded_levenshtein(miss, t, max_dist)
            if d <= max_dist:
                expect.add((qid, t, df, d))
    rows = set(
        zip(
            got.column("query_id").to_pylist(),
            got.column("term").to_pylist(),
            got.column("df").to_pylist(),
            got.column("distance").to_pylist(),
        )
    )
    assert rows == expect


def test_reader_suggest_symspell_matches_exhaustive():
    """IndexReader.suggest's lazily-built deletion index must rank
    identically to the pre-SymSpell exhaustive dictionary scan."""
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    rng = random.Random(11)
    vocab = _rand_vocab(rng, 600)
    df = {t: rng.randint(1, 99) for t in vocab}

    reader = IndexReader.__new__(IndexReader)
    reader.df = df

    def brute(term, max_dist, top_n):
        cands = []
        for t, n in df.items():
            d = bounded_levenshtein(term, t, max_dist)
            if d <= max_dist:
                cands.append((d, -int(n), t))
        cands.sort()
        return [(t, d) for d, _n, t in cands[:top_n]]

    probes = _rand_vocab(rng, 30)
    for q in probes:
        assert reader.suggest(q, 2, 5) == brute(q, 2, 5)
        # max_dist beyond the index's coverage falls back to a full scan
        assert reader.suggest(q, 3, 5) == brute(q, 3, 5)
    # the index was built once and cached on the reader
    assert isinstance(getattr(reader, "_symspell"), dict)
