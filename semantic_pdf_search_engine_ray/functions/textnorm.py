"""Deterministic text normalization — the engine's pinned extractor core.

Ports the *semantics* of the reference's canonical cleaner
(`/root/reference/src/chunk.rs:387-456` ``clean_pdf_text_robust``) and its
helpers (`chunk.rs:304-342` ``remove_section_headers``, `chunk.rs:345-380`
``is_likely_header``) to pure Python, plus the index-preserving ligature
expansion of `/root/reference/src/bin/app/pdf.rs:20-31`.

This module is the single source of truth for text bytes: the fixture
generator, the extract stage, and the oracle all call the same functions,
which is what makes the byte-identical-text-per-url invariant testable.

Everything here is pure and deterministic (no locale, no randomness).
"""

from __future__ import annotations

import re

# --- pinned regexes (compiled once at import) --------------------------------

# chunk.rs:396 — TOC leader lines like ". . . 415 . . . 422"
_TOC_LEADER_RE = re.compile(r"^[\s\d]*([.]\s*){5,}[\s\d]*$", re.M)
# chunk.rs:411 — hyphenated line breaks ("rejec-\nted" -> "rejected")
_HYPHEN_LINEBREAK_RE = re.compile(r"-\n", re.M)
# chunk.rs:435 — whitespace runs
_WS_RE = re.compile(r"\s+")
# chunk.rs:452 — repeated punctuation (>=3 of the class collapses to the last)
_PUNCT_RE = re.compile(r"([.,!?;:]){3,}")

# chunk.rs:309-320 — section-header patterns
_SECTION_NUMBER_RE = re.compile(r"^[\s]*(\d+\.)+\d*[\s]*[A-Z]")
_CHAPTER_RE = re.compile(r"^[\s]*(Chapter|Section|Part|Appendix)[\s]+(\d+|[A-Z])")
_SIMPLE_HEADER_RE = re.compile(r"^[\s]*\d+\.[\s]*[A-Z][a-z]+")

_SENTENCE_END = ".!?"

# chunk.rs:439-449 — ligature / invisible-char replacements (ordered)
_LIGATURE_REPLACEMENTS = (
    ("ﬁ", "fi"),
    ("ﬂ", "fl"),
    ("ﬀ", "ff"),
    ("ﬃ", "ffi"),
    ("ﬄ", "ffl"),
    ("œ", "oe"),
    ("æ", "ae"),
    ("﻿", ""),
    ("​", ""),
    (" ", " "),
)

# app/pdf.rs:21-30 — index-preserving char expansion table
_DROP_CHARS = frozenset("­​‌‍﻿⁠")
_EXPAND_CHARS = {
    "ﬀ": "ff",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬅ": "st",
    "ﬆ": "st",
}


def _lines(text: str) -> list[str]:
    """Rust ``str::lines()``: split on '\\n', dropping one trailing '\\r'."""
    out = text.split("\n")
    return [ln[:-1] if ln.endswith("\r") else ln for ln in out]


def _is_control(ch: str) -> bool:
    """Rust ``char::is_control`` == Unicode category Cc."""
    o = ord(ch)
    return o < 0x20 or 0x7F <= o <= 0x9F


# Deletion table equivalent to: drop chars where _is_control(c) and c not
# in "\n\t" — str.translate is a C loop over the same predicate.
_CONTROL_DELETE = {
    o: None
    for o in (*range(0x20), *range(0x7F, 0xA0))
    if chr(o) not in "\n\t"
}


def is_likely_header(line: str) -> bool:
    """Header heuristic — port of chunk.rs:345-380."""
    trimmed = line.strip()
    if len(trimmed.encode("utf-8")) > 100:  # Rust str::len = BYTES
        return False
    starts_with_number = bool(trimmed) and trimmed[0].isnumeric()
    has_colon = ":" in trimmed
    word_count = len(trimmed.split())
    if starts_with_number and word_count <= 6:
        return True
    if (
        all(c.isupper() or c.isspace() or c.isnumeric() for c in trimmed)
        and word_count <= 5
    ):
        return True
    if starts_with_number and has_colon and word_count <= 8:
        return True
    return False


def remove_section_headers(text: str) -> str:
    """Drop section-header-looking lines — port of chunk.rs:304-342."""
    cleaned = []
    for line in _lines(text):
        trimmed = line.strip()
        if not trimmed:
            continue
        is_header = (
            _SECTION_NUMBER_RE.match(trimmed) is not None
            or _CHAPTER_RE.match(trimmed) is not None
            or _SIMPLE_HEADER_RE.match(trimmed) is not None
            or is_likely_header(trimmed)
        )
        if not is_header:
            cleaned.append(line)
    return "\n".join(cleaned)


def clean_text_robust(text: str, remove_headers: bool = False) -> str:
    """The canonical 9-step normalizer — port of chunk.rs:387-456.

    Steps: (1) optional header removal; (2) strip TOC leader lines;
    (3) drop lines <25% letters; (4) join hyphenated line breaks;
    (5) join lines with a space unless the previous text ends a sentence;
    (6) strip control chars except \\n\\t; (7) collapse whitespace runs;
    (8) expand ligatures / strip BOM+ZWSP, NBSP->space; (9) collapse >=3
    repeated punctuation; trim.
    """
    cleaned = text
    if remove_headers:
        cleaned = remove_section_headers(cleaned)

    cleaned = _TOC_LEADER_RE.sub("", cleaned)

    kept = []
    for line in _lines(cleaned):
        letters = sum(map(str.isalpha, line))
        total = len(line)
        if total == 0 or letters * 4 >= total:
            kept.append(line)
    cleaned = "\n".join(kept)

    cleaned = _HYPHEN_LINEBREAK_RE.sub("", cleaned)

    parts: list[str] = []
    for line in _lines(cleaned):
        line = line.strip()
        if not line:
            continue
        if parts and parts[-1][-1] not in _SENTENCE_END:
            parts.append(" ")
        parts.append(line)
    cleaned = "".join(parts)

    cleaned = cleaned.translate(_CONTROL_DELETE)
    cleaned = _WS_RE.sub(" ", cleaned)
    for src, dst in _LIGATURE_REPLACEMENTS:
        cleaned = cleaned.replace(src, dst)
    cleaned = _PUNCT_RE.sub(r"\1", cleaned)
    return cleaned.strip()


def expand_ligatures(idx: int, ch: str) -> list[tuple[int, str]]:
    """Index-preserving ligature expansion — port of app/pdf.rs:20-31.

    Drops invisible chars (soft hyphen, ZWSP/ZWNJ/ZWJ, BOM, word joiner),
    expands ff/fi/fl/ffi/ffl/st ligatures; every output char remembers the
    source index it came from.
    """
    if ch in _DROP_CHARS:
        return []
    expansion = _EXPAND_CHARS.get(ch)
    if expansion is not None:
        return [(idx, c) for c in expansion]
    return [(idx, ch)]


def char_entries(text: str) -> list[tuple[int, str]]:
    """Project text to the (source_idx, char) haystack used by fuzzy search —
    port of handlers/search.rs:141-150 (page text -> char-entry stream)."""
    out: list[tuple[int, str]] = []
    for i, ch in enumerate(text):
        out.extend(expand_ligatures(i, ch))
    return out


def split_into_sentences(text: str) -> list[str]:
    """UAX#29 sentence segmentation — the same spec the reference's
    ``unicode_segmentation::unicode_sentences`` implements
    (chunk.rs:382-384); see functions/uax29.py for the rule engine.
    Handles the cases the r1 regex approximation split wrongly:
    abbreviations ("e.g. x"), decimals ("3.14"), quoted terminators."""
    from semantic_pdf_search_engine_ray.functions.uax29 import (
        unicode_sentences,
    )

    return unicode_sentences(text)
