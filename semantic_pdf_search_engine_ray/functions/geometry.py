"""Deterministic page geometry for web text: the render-ready rect
analog of the reference's char-bbox highlight path
(`/root/reference/src/bin/app/webapp.rs:386-445` extract_char_bboxes,
`types.rs:44-55` CharBbox/PageHighlight).

The reference asks PDFIUM for per-char pixel bboxes and merges them
into line rects. Web text has no intrinsic geometry, so this module
renders it on a deterministic fixed-width monospace grid (a teletype
layout): char ``i`` sits at line ``i // LINE_COLS``, column
``i % LINE_COLS``; lines paginate every ``PAGE_LINES``. All geometry
is an integer multiple of ``CHAR_W`` / ``LINE_H``, so the SQL oracle
reproduces it exactly (no float rounding).

The rect MERGE semantics are the reference's, ported faithfully from
``extract_char_bboxes`` (webapp.rs:386-445):

- whitespace never highlights, and BREAKS the current rect;
- a char on the same line as the current rect extends it rightward
  (``width = (x + char_w) - cur.x``) and takes the max height;
- a line change flushes the current rect and starts a new one
  (the reference's same-line test is ``|cur.y - y| < 2.0`` pt; on the
  grid, line identity).
"""

from __future__ import annotations

CHAR_W = 6        # cell width  (px)
LINE_H = 10       # cell height (px) == rect height
LINE_COLS = 40    # grid wrap width (chars per line)
PAGE_LINES = 60   # lines per page

# the reference breaks rects on any whitespace char
# (webapp.rs:399 ``is_whitespace``); the grid model pins the exact set
# so the SQL mirror can enumerate it
_WS = (" ", "\t", "\r", "\n")


def char_cell(i: int) -> tuple[int, int]:
    """Grid cell (line, col) of char index ``i``."""
    return divmod(i, LINE_COLS)


def merge_span_rects(
    text: str, start: int, end: int
) -> list[tuple[int, int, int, int, int]]:
    """Merged highlight rects for ``text[start:end]`` on the grid.

    Returns ``(page, x, y, width, height)`` int tuples in span order,
    where ``y`` is the line's offset WITHIN its page (the reference's
    PageHighlight groups rects per page; webapp.rs:370-377).
    """
    start = max(start, 0)
    end = min(end, len(text))
    rects: list[list[int]] = []       # [line, x, width, height]
    cur: list[int] | None = None
    for i in range(start, end):
        ch = text[i]
        line, col = divmod(i, LINE_COLS)
        if ch in _WS:
            if cur is not None:
                rects.append(cur)
                cur = None
            continue
        x = col * CHAR_W
        if cur is not None and cur[0] == line:
            # same line: extend rightward, keep the max height
            cur[2] = (x + CHAR_W) - cur[1]
            cur[3] = max(cur[3], LINE_H)
        else:
            if cur is not None:
                rects.append(cur)
            cur = [line, x, CHAR_W, LINE_H]
    if cur is not None:
        rects.append(cur)
    return [
        (ln // PAGE_LINES, x, (ln % PAGE_LINES) * LINE_H, w, h)
        for ln, x, w, h in rects
    ]
