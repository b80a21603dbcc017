"""Semantic text splitter — the C1 production chunker's algorithm
(`/root/reference/src/chunk.rs:34` ``TextSplitter::new(500)``, the
text-splitter crate v0.29, MIT; algorithm as published in its README):

1. Segment the text at every semantic level, ascending granularity:
   characters < words (UAX#29-style) < sentences (UAX#29, the same rule
   engine the crate uses) < newline runs of 1 < runs of 2 < ... runs of
   max — longer newline runs are stronger paragraph boundaries.
2. At the current offset, pick the HIGHEST level whose first segment
   still fits within the capacity.
3. Greedily merge neighboring segments of that level while the chunk
   stays within capacity (binary search — valid because the trimmed
   length is monotonic in the end offset), emit, advance.

Capacity is counted in characters of the TRIMMED chunk and chunks are
emitted trimmed (the crate's default Characters sizer with trim=true).
Grapheme-cluster level is approximated by code points — identical on the
engine's web-text domain, where a word always fits 500 chars anyway.
"""

from __future__ import annotations

import bisect
import re

from semantic_pdf_search_engine_ray.functions.uax29 import (
    sentence_break_indices,
)

_WORD_RE = re.compile(r"\S+\s*")
_NL_RUN_RE = re.compile(r"(?:\r?\n)+")


def _word_break_indices(text: str) -> list[int]:
    """Boundaries after each word+trailing-whitespace segment (leading
    whitespace attaches to the first word's segment)."""
    breaks = [0]
    pos = 0
    n = len(text)
    while pos < n:
        m = _WORD_RE.search(text, pos)
        if m is None:
            breaks.append(n)
            break
        if m.end() == pos:  # defensive; \S+\s* always advances
            pos += 1
            continue
        breaks.append(m.end())
        pos = m.end()
    if breaks[-1] != n:
        breaks.append(n)
    return breaks


def _newline_break_indices(text: str, min_run: int) -> list[int]:
    """Boundaries after each newline run of >= min_run newlines (the run
    stays attached to the preceding segment, like sentence terminators)."""
    breaks = [0]
    for m in _NL_RUN_RE.finditer(text):
        if m.group().count("\n") >= min_run and m.end() < len(text):
            breaks.append(m.end())
    breaks.append(len(text))
    return breaks


def _level_boundaries(text: str) -> list[list[int]]:
    """Ascending semantic levels: chars, words, sentences, newline runs
    1..max. Each is a sorted list of offsets starting 0, ending len."""
    n = len(text)
    levels: list[list[int]] = [list(range(n + 1))]  # characters
    levels.append(_word_break_indices(text))
    levels.append(sentence_break_indices(text))
    max_run = 0
    for m in _NL_RUN_RE.finditer(text):
        max_run = max(max_run, m.group().count("\n"))
    for run in range(1, max_run + 1):
        levels.append(_newline_break_indices(text, run))
    return levels


def semantic_chunks(text: str, capacity: int = 500) -> list[str]:
    """Split ``text`` into trimmed chunks of at most ``capacity`` chars,
    breaking at the highest semantic level that fits (see module doc).

    O(n): the trimmed length of any candidate span is answered in O(1)
    from precomputed first/last-non-whitespace prefix arrays — the naive
    ``len(text[pos:end].strip())`` per binary-search probe re-copies the
    tail of the document and turns multi-MB docs quadratic."""
    if not text:
        return []
    import numpy as np

    levels = _level_boundaries(text)
    n = len(text)
    ws = np.fromiter((c.isspace() for c in text), dtype=bool, count=n)
    idx = np.arange(n, dtype=np.int64)
    # last non-ws index <= i (or -1)
    prev_nonws = np.maximum.accumulate(np.where(~ws, idx, -1))
    # first non-ws index >= i (or n)
    next_nonws = np.minimum.accumulate(np.where(~ws, idx, n)[::-1])[::-1]

    def trimmed_len(pos: int, end: int) -> int:
        a = next_nonws[pos]
        if a >= end:
            return 0
        return int(prev_nonws[end - 1]) - int(a) + 1

    out: list[str] = []
    pos = 0
    while pos < n:
        if next_nonws[pos] >= n:
            break  # only whitespace left; trim would emit nothing
        # the level to merge at: highest whose FIRST segment from pos fits
        chosen = levels[0]
        for bounds in levels[1:]:
            i = bisect.bisect_right(bounds, pos)
            if i >= len(bounds):
                continue
            if trimmed_len(pos, bounds[i]) <= capacity:
                chosen = bounds
            else:
                break  # higher levels only get bigger
        # greedy merge: furthest boundary keeping the trimmed chunk within
        # capacity (trimmed length is monotonic in end -> binary search)
        i0 = bisect.bisect_right(chosen, pos)
        lo, hi = i0, len(chosen) - 1
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if trimmed_len(pos, chosen[mid]) <= capacity:
                lo = mid
            else:
                hi = mid - 1
        end = chosen[lo]
        if end <= pos:  # capacity smaller than one char after trim
            end = pos + 1
        chunk = text[pos:end].strip()
        if chunk:
            out.append(chunk)
        pos = end
    return out
