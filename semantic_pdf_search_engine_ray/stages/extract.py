"""HTML -> text extraction stage (stateless map_batches task).

The web-text analog of the reference's PDF extraction + cleaning chain
(`/root/reference/src/extract.rs:55-82` page extraction and
`/root/reference/src/chunk.rs:387-456` ``clean_pdf_text_robust``): strip
markup, then run the pinned 9-step normalizer. One web page = one
document. The whole function is deterministic — the fixture generator
calls the same code to produce the expected ``text`` column, which is the
byte-identical-text-per-url invariant from BASELINE.json#input_hint.
"""

from __future__ import annotations

import html as html_mod
import re

import pyarrow as pa

from semantic_pdf_search_engine_ray.functions.textnorm import clean_text_robust

# Pinned markup handling (applied before the normalizer):
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.S | re.I)
# closing block-level tags (and <br>) become newlines so the normalizer's
# line-oriented steps see real line structure
_BLOCK_RE = re.compile(
    r"<\s*(?:br\s*/?|/(?:p|div|h[1-6]|li|ul|ol|tr|table|title|header|footer|"
    r"section|article|blockquote|pre))\s*>",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]*>")


def html_to_text(html_bytes: bytes, remove_headers: bool = False) -> str:
    """The pinned extractor: bytes -> normalized document text."""
    raw = html_bytes.decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", raw)
    s = _SCRIPT_RE.sub("", s)
    s = _STYLE_RE.sub("", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = html_mod.unescape(s)
    return clean_text_robust(s, remove_headers=remove_headers)


class ExtractHtml:
    """map_batches callable: pages batch (url, warc_ts, html, lang) ->
    (url, warc_ts, text, lang). Arrow in / Arrow out; the html binary
    column never round-trips through pandas."""

    def __init__(self, remove_headers: bool = False):
        self.remove_headers = remove_headers

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [
            html_to_text(h, self.remove_headers)
            for h in batch.column("html").to_pylist()
        ]
        return pa.table(
            {
                "url": batch.column("url"),
                "warc_ts": batch.column("warc_ts"),
                "text": pa.array(texts, type=pa.string()),
                "lang": batch.column("lang"),
            }
        )
