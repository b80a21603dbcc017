"""Chunker kernels — faithful ports of the reference's chunking stack
(SURVEY.md §2.3): ``smart_chunk_text`` (C5, `/root/reference/src/
chunk.rs:521-560`), ``chunk_per_page`` composition (C4, `chunk.rs:287-302`),
``is_valid_chunk`` (M5, `chunk.rs:64-116`), ``looks_like_code`` (M6,
`chunk.rs:119-126`), ``is_garbage_sentence`` (M8, `chunk.rs:512-518`).

Fidelity notes (deliberate, documented):
- Rust ``str::len`` is BYTE length -> thresholds here use UTF-8 byte
  length, matching the reference exactly on non-ASCII text too.
- ``smart_chunk_text`` reproduces the reference's missing space after an
  overlap carry (chunk.rs:542-551: the carried 2-sentence join gets the
  next sentence appended with no separator) — it is part of the spec.
- The production path C1 uses the text-splitter crate's 500-char
  semantic splitter (chunk.rs:34); ``chunk_document`` implements that
  crate's published break-priority algorithm (functions/splitter.py)
  with the same UAX#29 sentence rules, behind the same stage interface
  (SURVEY.md §2.8 swappable-chunker contract). C5 remains the in-repo
  overlap chunker the reference also ships.
"""

from __future__ import annotations

from semantic_pdf_search_engine_ray.functions.textnorm import (
    clean_text_robust,
    is_likely_header,
    split_into_sentences,
)

CODE_INDICATORS = ["{", "}", "function", "var ", "const ", "let ", "=>", "//"]
SINGLE_WORD_ARTIFACTS = {"foreword", "appendix", "index", "references"}


def looks_like_code(text: str) -> bool:
    """M6 (chunk.rs:119-126): >= 3 distinct code indicators present."""
    return sum(1 for ind in CODE_INDICATORS if ind in text) >= 3


def is_valid_chunk(text: str) -> bool:
    """M5 (chunk.rs:64-116), single-pass semantics preserved."""
    trimmed = text.strip()
    byte_len = len(trimmed.encode("utf-8"))
    if byte_len < 50:
        return False

    words = 0
    alpha = 0
    last_ws = True
    for c in trimmed:
        if c.isalpha():
            alpha += 1
        if c.isspace():
            last_ws = True
        else:
            if last_ws:
                words += 1
            last_ws = False

    if words < 8:
        return False
    if alpha / byte_len < 0.5:
        return False
    if trimmed.lower() in SINGLE_WORD_ARTIFACTS:
        return False
    if trimmed.count("...") + trimmed.count("[...]") > 2:
        return False
    return not looks_like_code(trimmed)


def is_garbage_sentence(s: str) -> bool:
    """M8 (chunk.rs:512-518): TOC-row detector."""
    letters = sum(1 for c in s if c.isalpha())
    digits = sum(1 for c in s if c.isnumeric())
    dots = s.count(".")
    return dots > 10 and letters < 5 and digits > 0


def smart_chunk_text(
    text: str, chunk_size: int = 500, remove_headers: bool = True
) -> list[str]:
    """C5 (chunk.rs:521-560): clean -> sentence split -> skip headers ->
    accumulate sentences to >= chunk_size bytes, flush, carry last 2
    sentences as overlap."""
    cleaned = clean_text_robust(text, remove_headers)
    sentences = split_into_sentences(cleaned)

    chunks: list[str] = []
    current = ""
    buffer: list[str] = []
    for sentence in sentences:
        if is_likely_header(sentence):
            continue
        buffer.append(sentence)
        current += sentence + " "
        if len(current.encode("utf-8")) >= chunk_size:
            chunks.append(current.strip())
            current = " ".join(buffer[-2:])
            buffer.clear()
    if current:
        chunks.append(current.strip())
    return chunks


def chunk_document(text: str, chunk_size: int = 500) -> list[str]:
    """The production chunker C1 (chunk.rs:34-47): the crate's
    ``TextSplitter::new(500)`` break-priority algorithm
    (functions/splitter.py — same published algorithm, same UAX#29
    sentence rules) over the raw extracted text, then the M5
    ``is_valid_chunk`` filter, exactly the reference's chunk pipeline."""
    from semantic_pdf_search_engine_ray.functions.splitter import (
        semantic_chunks,
    )

    return [c for c in semantic_chunks(text, chunk_size)
            if is_valid_chunk(c)]


def chunk_per_page(text: str) -> list[str]:
    """C4 (chunk.rs:287-302): size-2000 chunks, garbage-sentence filter."""
    return [
        c for c in smart_chunk_text(text, 2000, True) if not is_garbage_sentence(c)
    ]
