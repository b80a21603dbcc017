"""Normalizer contract tests — pin the 9-step semantics of
clean_text_robust (port of /root/reference/src/chunk.rs:387-456)."""

from __future__ import annotations

from semantic_pdf_search_engine_ray.functions.textnorm import (
    clean_text_robust,
    is_likely_header,
    remove_section_headers,
    split_into_sentences,
)


def test_toc_leader_lines_removed():
    text = "Intro text here.\n. . . . . 415\nMore body text."
    out = clean_text_robust(text)
    assert "415" not in out
    assert "Intro text here." in out


def test_low_letter_lines_dropped():
    text = "Real sentence with words.\n123 456 !!! 789\nAnother real line."
    out = clean_text_robust(text)
    assert "123 456" not in out
    assert "Another real line." in out


def test_hyphenated_linebreak_joined():
    assert clean_text_robust("infor-\nmation age") == "information age"


def test_lines_joined_with_space_unless_sentence_end():
    out = clean_text_robust("first fragment\nsecond fragment")
    assert out == "first fragment second fragment"
    out2 = clean_text_robust("A full stop.\nNext line")
    # previous text ends a sentence -> no forced space, newline collapses later
    assert out2 == "A full stop.Next line"


def test_control_chars_stripped_whitespace_collapsed():
    out = clean_text_robust("a\x00b\x07c   d\t\te")
    assert out == "abc d e"


def test_ligatures_expanded_and_invisibles_stripped():
    out = clean_text_robust("eﬃcient ﬂow ﻿x​y a b")
    assert out == "efficient flow xy a b"


def test_repeated_punctuation_collapsed():
    assert clean_text_robust("what!!!! really....") == "what! really."


def test_section_headers_removed_when_enabled():
    text = "3.1 Introduction\nChapter 2 Basics\nINTRODUCTION\nbody text stays here."
    out = clean_text_robust(text, remove_headers=True)
    assert "Introduction" not in out
    assert "Chapter" not in out
    assert "INTRODUCTION" not in out
    assert "body text stays here." in out


def test_is_likely_header_heuristics():
    assert is_likely_header("3 Short Header")
    assert is_likely_header("INTRODUCTION")
    assert is_likely_header("3.1: Introduction to Machine Learning")
    assert not is_likely_header("This is a normal sentence that happens to be here.")
    assert not is_likely_header("x" * 101)


def test_remove_section_headers_keeps_body():
    out = remove_section_headers("Chapter 1 Intro\nThe actual body sentence is long.")
    assert out == "The actual body sentence is long."


def test_split_into_sentences_basic():
    s = split_into_sentences("One. Two! Three? Four")
    assert [x.strip() for x in s] == ["One.", "Two!", "Three?", "Four"]
    assert "".join(s) == "One. Two! Three? Four"


def test_normalizer_is_idempotent_on_clean_text():
    clean = clean_text_robust("Some plain sentence. Another one follows here.")
    assert clean_text_robust(clean) == clean


def test_uax29_abbreviations_and_decimals():
    """The UAX#29 cases the r1 regex splitter got wrong (VERDICT #6):
    SB8 (lowercase continuation), SB6 (numeric), SB7 (initials),
    SB9/SB10 (quotes and trailing space), SB3/SB4 (CRLF)."""
    assert split_into_sentences("i.e. lowercase continues. Next.") == [
        "i.e. lowercase continues. ", "Next."]
    assert split_into_sentences("Pi is 3.14 here. Done.") == [
        "Pi is 3.14 here. ", "Done."]
    assert split_into_sentences("U.S.A. is large. Yes.") == [
        "U.S.A. is large. ", "Yes."]
    assert split_into_sentences('He said "Stop." Then left.') == [
        'He said "Stop." ', "Then left."]
    assert split_into_sentences("Line one.\r\nLine two.") == [
        "Line one.\r\n", "Line two."]
    # SB7: ATerm directly between letters with Upper after does not split
    assert split_into_sentences("it.He left") == ["it.He left"]
    # STerm always terminates (no abbreviation semantics)
    assert split_into_sentences("Stop!go") == ["Stop!", "go"]
    # SB8 skips digits/space to find the lowercase continuation
    assert split_into_sentences("Version 2. 5 is out") == [
        "Version 2. 5 is out"]


def test_uax29_segments_reconstruct_input():
    texts = [
        "One. Two! Three? Four",
        "Mr. Smith met Dr. Jones. They talked.",
        "tab\tseparated. sentence two.",
        "ends with terminator!",
        "(parens.) After close. ",
    ]
    for t in texts:
        segs = split_into_sentences(t)
        assert "".join(segs) == t
        assert all(segs)
