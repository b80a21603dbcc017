"""Page-geometry highlight rects: grid layout + the reference's
rect-merge semantics (webapp.rs:386-445) on the deterministic
monospace grid, checked against hand-computed cases and an
independent islands-style oracle."""

import random

from semantic_pdf_search_engine_ray.functions.geometry import (
    CHAR_W,
    LINE_COLS,
    LINE_H,
    PAGE_LINES,
    char_cell,
    merge_span_rects,
)


def oracle_rects(text, start, end):
    """Independent formulation: maximal runs of non-whitespace chars
    grouped by (line), islands split on any whitespace. Rect x = first
    col * CHAR_W, width = run length * CHAR_W."""
    start, end = max(start, 0), min(end, len(text))
    runs = []
    cur = None  # (line, col0, count)
    for i in range(start, end):
        line, col = divmod(i, LINE_COLS)
        if text[i] in (" ", "\t", "\r", "\n"):
            if cur:
                runs.append(cur)
                cur = None
            continue
        if cur and cur[0] == line:
            cur = (cur[0], cur[1], cur[2] + 1)
        else:
            if cur:
                runs.append(cur)
            cur = (line, col, 1)
    if cur:
        runs.append(cur)
    return [
        (ln // PAGE_LINES, c0 * CHAR_W, (ln % PAGE_LINES) * LINE_H,
         n * CHAR_W, LINE_H)
        for ln, c0, n in runs
    ]


def test_char_cell_grid():
    assert char_cell(0) == (0, 0)
    assert char_cell(LINE_COLS - 1) == (0, LINE_COLS - 1)
    assert char_cell(LINE_COLS) == (1, 0)
    assert char_cell(3 * LINE_COLS + 7) == (3, 7)


def test_single_word_one_rect():
    text = "hello world"
    rects = merge_span_rects(text, 0, 5)
    assert rects == [(0, 0, 0, 5 * CHAR_W, LINE_H)]


def test_space_breaks_rect():
    text = "hello world"
    rects = merge_span_rects(text, 0, 11)
    # "hello" at cols 0-4, "world" at cols 6-10; the space highlights
    # nothing and breaks the rect (webapp.rs:399-404)
    assert rects == [
        (0, 0, 0, 5 * CHAR_W, LINE_H),
        (0, 6 * CHAR_W, 0, 5 * CHAR_W, LINE_H),
    ]


def test_line_wrap_splits_run():
    # a run of non-whitespace crossing the grid wrap boundary: the
    # line change flushes the current rect (webapp.rs:411-418)
    text = "x" * (LINE_COLS + 5)
    rects = merge_span_rects(text, LINE_COLS - 2, LINE_COLS + 3)
    assert rects == [
        (0, (LINE_COLS - 2) * CHAR_W, 0, 2 * CHAR_W, LINE_H),
        (0, 0, LINE_H, 3 * CHAR_W, LINE_H),
    ]


def test_pagination():
    n = LINE_COLS * PAGE_LINES  # first char of page 1
    text = "y" * (n + 4)
    rects = merge_span_rects(text, n, n + 4)
    assert rects == [(1, 0, 0, 4 * CHAR_W, LINE_H)]
    # last line of page 0
    rects = merge_span_rects(text, n - 3, n - 1)
    assert rects == [(0, (LINE_COLS - 3) * CHAR_W,
                      (PAGE_LINES - 1) * LINE_H, 2 * CHAR_W, LINE_H)]


def test_span_clamped_to_text():
    text = "abc def"
    assert merge_span_rects(text, 4, 100) == [
        (0, 4 * CHAR_W, 0, 3 * CHAR_W, LINE_H)]
    assert merge_span_rects(text, -5, 3) == [
        (0, 0, 0, 3 * CHAR_W, LINE_H)]
    assert merge_span_rects("   ", 0, 3) == []
    assert merge_span_rects("", 0, 3) == []


def test_matches_independent_oracle_random():
    rng = random.Random(42)
    alphabet = "ab \t\nxyz  q"
    for _ in range(200):
        n = rng.randrange(0, 3 * LINE_COLS * PAGE_LINES // 2)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        s = rng.randrange(0, max(n, 1))
        e = s + rng.randrange(0, 120)
        assert merge_span_rects(text, s, e) == oracle_rects(text, s, e)
