"""UAX#29 sentence segmentation (Unicode TR29, rules SB1-SB11/SB998).

The reference segments with ``unicode_segmentation::unicode_sentences``
(`/root/reference/src/chunk.rs:382-384`), the Rust implementation of the
same spec — this module implements the rule set directly so C5 chunk
boundaries and sentence snapping agree with the reference on the cases a
regex approximation gets wrong (abbreviations "e.g. x", decimals "3.14",
quoted terminators, CRLF handling).

Sentence_Break character classes are derived from
``unicodedata`` general categories plus the spec's explicit sets (ATerm,
STerm, SContinue, Sep, Close additions). The full Unicode property table
has a longer STerm tail for historic scripts; the derivation is exact
for ASCII/Latin/CJK punctuation — the web-text domain of this engine —
and is pinned by tests either way.
"""

from __future__ import annotations

import unicodedata

# class ids
_OTHER, _CR, _LF, _SEP, _SP, _LOWER, _UPPER, _OLETTER, _NUMERIC = range(9)
_ATERM, _STERM, _CLOSE, _SCONT, _EXTEND, _FORMAT = range(9, 15)

_PARASEP = (_CR, _LF, _SEP)
_SATERM = (_ATERM, _STERM)

_ATERM_SET = frozenset(".․﹒．")
_STERM_SET = frozenset(
    "!?‼‽⁇⁈⁉。﹖﹗！？"
    "｡؝؞؟۔܀܁܂।॥"
    "၊။።፧፨᙮᜵᜶᠃᠉"
    "⸮⸼꓿꘎꘏꛳꛷︒︕︖"
)
_SCONT_SET = frozenset(
    ",-:՝،؍߸᠂᠈–—、"
    "︐︑︓︱︲﹐﹑﹕﹘﹣"
    "，－：､"
)
_SEP_SET = frozenset({"\x85", "\u2028", "\u2029"})
_CLOSE_EXTRA = frozenset("\"'")  # U+0022/U+0027 are SB=Close by table
_EXTEND_EXTRA = frozenset("‌‍")  # ZWNJ/ZWJ


def sb_class(ch: str) -> int:
    """Sentence_Break class of one char (spec-ordered checks)."""
    if ch == "\r":
        return _CR
    if ch == "\n":
        return _LF
    if ch in _SEP_SET:
        return _SEP
    if ch in _ATERM_SET:
        return _ATERM
    if ch in _STERM_SET:
        return _STERM
    if ch in _SCONT_SET:
        return _SCONT
    cat = unicodedata.category(ch)
    if ch in _CLOSE_EXTRA or cat in ("Ps", "Pe", "Pi", "Pf"):
        return _CLOSE
    if ch in _EXTEND_EXTRA or cat in ("Mn", "Mc", "Me"):
        return _EXTEND
    if cat == "Cf":
        return _FORMAT
    if ch.isspace():  # CR/LF/Sep already handled above
        return _SP
    if cat == "Ll" or (ch.islower() and not ch.isupper()):
        return _LOWER
    if cat in ("Lu", "Lt"):
        return _UPPER
    if cat == "Nd" or cat == "Nl" or cat == "No":
        return _NUMERIC
    if ch.isalpha():
        return _OLETTER
    return _OTHER


def sentence_break_indices(text: str) -> list[int]:
    """All boundary offsets, starting 0 and ending len(text) (SB1/SB2)."""
    n = len(text)
    if n == 0:
        return [0]
    cls = [sb_class(c) for c in text]

    def base_at_or_before(j: int) -> int:
        """Skip Extend/Format backwards (SB5: X (Extend|Format)* -> X)."""
        while j >= 0 and cls[j] in (_EXTEND, _FORMAT):
            j -= 1
        return j

    def scan_back(b: int):
        """Match SATerm Close* Sp* ending at b-1 (scanning backwards:
        Sp*, then Close*, then the terminator). Returns
        (terminator_class_or_None, saw_sp)."""
        j = base_at_or_before(b - 1)
        saw_sp = False
        while j >= 0 and cls[j] == _SP:
            saw_sp = True
            j = base_at_or_before(j - 1)
        while j >= 0 and cls[j] == _CLOSE:
            j = base_at_or_before(j - 1)
        term = cls[j] if j >= 0 and cls[j] in _SATERM else None
        return term, saw_sp, j

    breaks = [0]
    for b in range(1, n):
        prev_c, cur_c = cls[b - 1], cls[b]
        if prev_c == _CR and cur_c == _LF:  # SB3
            continue
        if prev_c in _PARASEP:  # SB4
            breaks.append(b)
            continue
        if cur_c in (_EXTEND, _FORMAT):  # SB5
            continue
        pj = base_at_or_before(b - 1)
        pc = cls[pj] if pj >= 0 else None
        if pc == _ATERM and cur_c == _NUMERIC:  # SB6
            continue
        if pc == _ATERM and cur_c == _UPPER:  # SB7
            p2 = base_at_or_before(pj - 1)
            if p2 >= 0 and cls[p2] in (_UPPER, _LOWER):
                continue
        term, saw_sp, _tj = scan_back(b)
        if term == _ATERM:  # SB8: ... x ( not(OLetter|Upper|Lower|
            k = b           #       ParaSep|SATerm) )* Lower
            no_break = False
            while k < n:
                c = cls[k]
                if c == _LOWER:
                    no_break = True
                    break
                if c in (_OLETTER, _UPPER, _CR, _LF, _SEP, _ATERM, _STERM):
                    break
                k += 1
            if no_break:
                continue
        if term is not None and cur_c in (_SCONT, _ATERM, _STERM):  # SB8a
            continue
        if term is not None and not saw_sp and cur_c in (
            _CLOSE, _SP, _CR, _LF, _SEP
        ):  # SB9
            continue
        if term is not None and cur_c in (_SP, _CR, _LF, _SEP):  # SB10
            continue
        if term is not None:  # SB11 (SATerm Close* Sp* [ParaSep via SB4])
            breaks.append(b)
            continue
        # SB998: no break
    breaks.append(n)
    return breaks


def unicode_sentences(text: str) -> list[str]:
    """The segments between UAX#29 sentence boundaries (== the Rust
    crate's ``unicode_sentences`` iterator; trailing spaces/terminators
    stay attached to their sentence)."""
    idx = sentence_break_indices(text)
    return [text[a:b] for a, b in zip(idx, idx[1:])]
