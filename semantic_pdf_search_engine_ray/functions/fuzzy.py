"""Fuzzy match re-localization — port of `/root/reference/src/fuzzy.rs` and
the sentence-boundary snap of `/root/reference/src/bin/app/pdf.rs:79-121`.

Pure, deterministic functions called per (query, document) row inside the
highlight map_batches stage — no shuffle, no state. The reference computes
Jaro-Winkler in f32 (`fuzzy.rs:104-166`); we compute in Python float64 and
pin the reference's unit-test contract (tests/test_fuzzy.py ports all 8
cases from fuzzy.rs:183-287) rather than f32 bit patterns.
"""

from __future__ import annotations

import math


def _lower_char(ch: str) -> str:
    """Rust `ch.to_lowercase().next()` — first char of the lowercase mapping."""
    low = ch.lower()
    return low[0] if low else ch


def find_exact(haystack: list[str], needle: list[str]) -> int | None:
    """Naive exact subsequence search — port of fuzzy.rs:99-102."""
    n = len(needle)
    if n == 0 or n > len(haystack):
        return None
    # join once; str.find is the vectorized fast path for the same semantics
    return (lambda pos: pos if pos >= 0 else None)(
        "".join(haystack).find("".join(needle))
    )


def jaro(a: list[str], b: list[str]) -> float:
    """Jaro similarity — port of fuzzy.rs:115-166."""
    a_len, b_len = len(a), len(b)
    if a_len == 0 and b_len == 0:
        return 1.0
    if a_len == 0 or b_len == 0:
        return 0.0

    match_dist = max(max(a_len, b_len) // 2 - 1, 0)
    a_matches = [False] * a_len
    b_matches = [False] * b_len
    matches = 0

    for i in range(a_len):
        start = max(i - match_dist, 0)
        end = min(i + match_dist + 1, b_len)
        for j in range(start, end):
            if b_matches[j] or a[i] != b[j]:
                continue
            a_matches[i] = True
            b_matches[j] = True
            matches += 1
            break

    if matches == 0:
        return 0.0

    transpositions = 0
    k = 0
    for i in range(a_len):
        if not a_matches[i]:
            continue
        while not b_matches[k]:
            k += 1
        if a[i] != b[k]:
            transpositions += 1
        k += 1

    m = float(matches)
    t = float(transpositions // 2)
    return (m / a_len + m / b_len + (m - t) / m) / 3.0


def jaro_winkler(a: list[str], b: list[str]) -> float:
    """Jaro-Winkler (prefix <=4, weight 0.1) — port of fuzzy.rs:104-113."""
    j = jaro(a, b)
    prefix = 0
    for x, y in zip(a[:4], b[:4]):
        if x != y:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


def deduplicate_matches(
    matches: list[tuple[int, int, float]],
) -> list[tuple[int, int, float]]:
    """Overlap suppression: best-score-first greedy keep, then re-sort by
    start — port of fuzzy.rs:168-181."""
    ordered = sorted(matches, key=lambda m: -m[2])
    kept: list[tuple[int, int, float]] = []
    for start, end, score in ordered:
        if any(start < ke and end > ks for ks, ke, _ in kept):
            continue
        kept.append((start, end, score))
    kept.sort(key=lambda m: m[0])
    return kept


def fuzzy_search(
    entries: list[tuple[int, str]],
    needle: str,
    threshold: float,
) -> list[tuple[int, int, float]]:
    """Find fuzzy occurrences of `needle` in the (source_idx, char) haystack.

    Port of fuzzy.rs:1-96: exact-window fast path; anchor scan with prefix
    len clamp(needle/6, 2, 8) seeding candidates at pos-3; sparse fallback
    every needle/4 chars; per candidate, windows of len needle..ceil(1.3x)
    scored by Jaro-Winkler with early exit >0.97; overlapping starts
    skipped; final dedup. Returns (start, end, score) in *haystack* index
    space (map through `entries` for source offsets).
    """
    needle_chars = list(needle)
    needle_len = len(needle_chars)
    if needle_len == 0 or not entries:
        return []

    haystack = [_lower_char(ch) for _, ch in entries]
    haystack_len = len(haystack)
    needle_lower = [_lower_char(ch) for ch in needle_chars]

    pos = find_exact(haystack, needle_lower)
    if pos is not None:
        return [(pos, pos + needle_len, 1.0)]

    window_min = needle_len
    window_max = math.ceil(needle_len * 1.3)

    anchor_len = min(max(needle_len // 6, 2), 8)
    anchor = "".join(needle_lower[:anchor_len])
    hay_str = "".join(haystack)

    candidate_starts: list[int] = []
    find_from = 0
    while True:
        hit = hay_str.find(anchor, find_from)
        if hit < 0:
            break
        candidate_starts.append(max(hit - 3, 0))
        find_from = hit + 1

    if not candidate_starts:
        step = max(needle_len // 4, 1)
        upper = haystack_len - (window_min - 1)
        candidate_starts = list(range(0, max(upper, 0), step))

    candidate_starts = sorted(set(candidate_starts))

    matches: list[tuple[int, int, float]] = []
    last_match_end = 0
    for start in candidate_starts:
        if start < last_match_end or start >= haystack_len:
            continue
        best_score = 0.0
        best_end = 0
        for window_size in range(window_min, window_max + 1):
            end = start + window_size
            if end > haystack_len:
                break
            score = jaro_winkler(needle_lower, haystack[start:end])
            if score >= threshold and score > best_score:
                best_score = score
                best_end = end
                if score > 0.97:
                    break
        if best_score >= threshold:
            matches.append((start, best_end, best_score))
            last_match_end = best_end

    return deduplicate_matches(matches)


def snap_to_sentence_boundaries(
    entries: list[tuple[int, str]], start: int, end: int
) -> tuple[int, int]:
    """Widen [start, end) to sentence bounds — port of app/pdf.rs:79-121.

    Walk back from start to just after the previous sentence ender (then
    skip whitespace / further enders forward); walk end forward to the next
    sentence ender, swallowing trailing quotes / parens.
    """
    chars = [c for _, c in entries]
    length = len(chars)

    def is_sentence_end(c: str) -> bool:
        return c in ".!?"

    def is_ws(c: str) -> bool:
        return c in " \t\r\n"

    if start == 0:
        new_start = 0
    else:
        i = max(start - 1, 0)
        new_start = 0
        while True:
            if is_sentence_end(chars[i]):
                j = i + 1
                while j < length and (is_ws(chars[j]) or is_sentence_end(chars[j])):
                    j += 1
                new_start = j
                break
            if i == 0:
                new_start = 0
                break
            i -= 1

    i = end
    while i < length and not is_sentence_end(chars[i]):
        i += 1
    while i + 1 < length and chars[i + 1] in "\"')":
        i += 1
    new_end = min(i + 1, length)

    return new_start, new_end
