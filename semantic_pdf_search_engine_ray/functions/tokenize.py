"""Analyzer: text -> terms. The build side and the query side MUST share
this module (the reference pins the same invariant by routing both through
one model singleton, `/root/reference/src/embed.rs:17-42,65-78`).

The analyzer is lowercase + maximal ``[a-z0-9]+`` runs — chosen so DuckDB's
``regexp_extract_all(lower(text), '[a-z0-9]+')`` reproduces it exactly,
which is what lets the SQL oracle validate the whole pipeline.
"""

from __future__ import annotations

import re
from collections import Counter

from semantic_pdf_search_engine_ray.config import TOKEN_PATTERN

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def simple_lower(text: str) -> str:
    """SIMPLE Unicode case mapping (one codepoint -> one codepoint), the
    semantics of Arrow ``utf8_lower`` and DuckDB ``lower()``.

    Python ``str.lower()`` is the FULL mapping ('İ' -> 'i' + combining
    dot), which would make the query-side analyzer disagree with the
    Arrow-vectorized build side (and the SQL oracle) on such characters —
    a split-brain that breaks the shared-analyzer invariant
    (`/root/reference/src/embed.rs:17-42`). Route through Arrow so there
    is exactly one mapping."""
    if text.isascii():  # fast path: identical under every mapping
        return text.lower()
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.utf8_lower(pa.array([text]))[0].as_py()


def tokenize(text: str) -> list[str]:
    """All analyzer tokens of `text`, in order."""
    return _TOKEN_RE.findall(simple_lower(text))


def term_freqs(text: str) -> tuple[Counter, int]:
    """(term -> tf, doc_len). doc_len counts every token (not unique)."""
    toks = tokenize(text)
    return Counter(toks), len(toks)


def query_terms(text: str) -> list[str]:
    """Unique query terms, sorted. BM25 scoring treats the query as a term
    set (duplicate query terms count once); sorting pins the float
    accumulation order so engine, oracle and WAND sum identically."""
    return sorted(set(tokenize(text)))


def as_prefix_query(q: str) -> str | None:
    """``data*`` (one token + trailing star) -> ``data``; anything else
    -> None. The single shared wildcard detector — every query surface
    (CLI query/repl, serve, the batch actor tiers) routes through this
    so the same string means the same query everywhere."""
    q = q.strip()
    if not q.endswith("*"):
        return None
    toks = tokenize(q[:-1])
    return toks[0] if len(toks) == 1 else None
