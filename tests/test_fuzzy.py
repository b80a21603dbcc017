"""Ports of all 8 reference fuzzy tests (/root/reference/src/fuzzy.rs:183-287)
plus invariants of deduplicate_matches and the sentence snap."""

from __future__ import annotations

from semantic_pdf_search_engine_ray.functions.fuzzy import (
    deduplicate_matches,
    fuzzy_search,
    jaro_winkler,
    snap_to_sentence_boundaries,
)
from semantic_pdf_search_engine_ray.functions.textnorm import char_entries


def entries(s: str) -> list[tuple[int, str]]:
    return list(enumerate(s))


# -- fuzzy.rs:199-208
def test_hyphenated_word_matches_clean():
    assert fuzzy_search(entries("infor-\nmation"), "information", 0.75)


# -- fuzzy.rs:211-217
def test_extra_spaces_between_words():
    assert fuzzy_search(entries("the  quick   brown  fox"), "quick brown", 0.75)


# -- fuzzy.rs:220-229
def test_mid_word_hyphen_with_newline():
    assert fuzzy_search(entries("a self-\ncontained system"), "self-contained", 0.75)


# -- fuzzy.rs:232-241
def test_soft_hyphen_invisible():
    assert fuzzy_search(entries("compre­hensive"), "comprehensive", 0.75)


# -- fuzzy.rs:244-253
def test_double_spaced_sentence():
    assert fuzzy_search(
        entries("the  result.  The  value  is  correct"), "result. The value", 0.75
    )


# -- fuzzy.rs:256-265
def test_missing_space_after_extraction():
    assert fuzzy_search(entries("wordswithoutspaces"), "without", 0.99)


# -- fuzzy.rs:268-277
def test_curly_quotes_vs_straight():
    assert fuzzy_search(entries("“quoted text”"), '"quoted text"', 0.75)


# -- fuzzy.rs:280-286
def test_em_dash_vs_hyphen():
    assert fuzzy_search(entries("well—known"), "well-known", 0.75)


def test_exact_match_fast_path_scores_one():
    res = fuzzy_search(entries("abc needle abc"), "needle", 0.75)
    assert res == [(4, 10, 1.0)]


def test_jaro_winkler_identity_and_bounds():
    assert jaro_winkler(list("hello"), list("hello")) == 1.0
    assert jaro_winkler(list("abc"), list("xyz")) == 0.0
    s = jaro_winkler(list("martha"), list("marhta"))
    assert 0.9 < s < 1.0


def test_deduplicate_matches_keeps_best_non_overlapping():
    kept = deduplicate_matches([(0, 10, 0.9), (5, 15, 0.95), (20, 30, 0.8)])
    # best score wins its overlap group; output re-sorted by start
    assert kept == [(5, 15, 0.95), (20, 30, 0.8)]
    for i in range(len(kept) - 1):
        assert kept[i][1] <= kept[i + 1][0]


def test_snap_to_sentence_boundaries():
    text = "First part. Second sentence here. Third one."
    ents = entries(text)
    start = text.index("Second") + 3
    end = start + 4
    s, e = snap_to_sentence_boundaries(ents, start, end)
    assert text[s:e] == "Second sentence here."


def test_snap_handles_start_and_end_of_text():
    text = "no enders at all"
    s, e = snap_to_sentence_boundaries(entries(text), 3, 5)
    assert (s, e) == (0, len(text))


def test_char_entries_expand_ligatures_preserve_index():
    ents = char_entries("eﬃcient")  # "eﬃcient"
    assert "".join(c for _, c in ents) == "efficient"
    # all three expanded chars point at the ligature's source index 1
    assert [i for i, _ in ents[1:4]] == [1, 1, 1]


def test_char_entries_drop_invisibles():
    ents = char_entries("a­b​c")
    assert "".join(c for _, c in ents) == "abc"
    assert [i for i, _ in ents] == [0, 2, 4]
