"""Deterministic Common-Crawl-style ``pages`` fixture generator.

Produces the exact input shape mandated by BASELINE.json#input_hint:
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` where ``text`` is the expected output of the pinned
extractor (`stages/extract.py:html_to_text`) on ``html`` — the
byte-identity oracle column (FIXTURES.md §1).

Properties (FIXTURES.md):
- seeded PRNG per fixed 1000-doc chunk (seed, chunk_idx) — byte-stable
  regeneration AND embarrassingly parallel generation at bench sizes
- Zipf(s~1.1) term frequencies over a ~5,000-word vocabulary (real
  head-term skew for the salting tests)
- log-normal doc lengths ~50-2,000 tokens
- ~1% duplicated urls with a later warc_ts (exercises dedup-by-url)
- extraction hazards injected (ligatures, soft hyphens, TOC leader
  lines, code blobs, curly quotes, em-dashes, hyphenated line breaks)
- url lexicographic order != generation order (doc_id sort non-trivial)
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CHUNK_DOCS = 1000  # pinned: generation is chunked in units of 1000 docs

_SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
    "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su",
    "ta", "te", "ti", "to", "tu", "va", "ve", "vi", "vo", "vu",
    "zan", "zer", "zil", "zon", "mur", "gar", "fen", "hal", "pir", "wex",
]

_HEAD_WORDS = [
    "the", "of", "and", "to", "in", "a", "is", "for", "on", "with",
    "data", "index", "search", "query", "term", "page", "web", "text",
]

_LIGATURE_WORDS = ["eﬃcient", "ﬁlter", "ﬂow", "oﬀset", "baﬄe"]

_BASE_TS_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds


@lru_cache(maxsize=4)
def build_vocab(size: int = 5000, seed: int = 7) -> tuple[str, ...]:
    """Deterministic synthetic vocabulary; head slots are real stopword-ish
    terms so Zipf head skew looks like web text."""
    rng = np.random.default_rng(seed)
    vocab: list[str] = list(_HEAD_WORDS)
    seen = set(vocab)
    while len(vocab) < size:
        n_syll = int(rng.integers(2, 5))
        idx = rng.integers(0, len(_SYLLABLES), size=n_syll)
        w = "".join(_SYLLABLES[i] for i in idx)
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return tuple(vocab)


def zipf_probs(n: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


def _sentence(words: list[str]) -> str:
    return words[0].capitalize() + " " + " ".join(words[1:]) + "."


def generate_pages_chunk(
    chunk_idx: int,
    n_in_chunk: int,
    total_docs: int,
    seed: int = 42,
    vocab_size: int = 5000,
) -> pa.Table:
    """Generate docs [chunk_idx*CHUNK_DOCS, +n_in_chunk) deterministically."""
    from semantic_pdf_search_engine_ray.stages.extract import html_to_text

    rng = np.random.default_rng((seed, chunk_idx))
    vocab = build_vocab(vocab_size)
    probs = zipf_probs(len(vocab))
    base_doc = chunk_idx * CHUNK_DOCS

    n_sites = max(min(100, total_docs // 5), 1)
    site_of_doc = rng.integers(0, n_sites, size=n_in_chunk)
    path_words = rng.integers(0, len(vocab), size=n_in_chunk)

    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []

    lang_draw = rng.random(n_in_chunk)
    doc_lens = np.clip(
        np.exp(rng.normal(5.0, 0.8, size=n_in_chunk)), 30, 2000
    ).astype(np.int64)

    for local in range(n_in_chunk):
        d = base_doc + local
        url = (
            f"https://example{site_of_doc[local]:03d}.test/"
            f"{vocab[path_words[local]]}/{d:06d}"
        )
        n_tokens = int(doc_lens[local])
        words = [vocab[i] for i in rng.choice(len(vocab), size=n_tokens, p=probs)]

        title_words = words[: max(min(6, len(words)), 2)]
        body_parts: list[str] = []
        i = 0
        para: list[str] = []
        while i < len(words):
            slen = int(rng.integers(5, 15))
            sent_words = words[i : i + slen]
            i += slen
            if not sent_words:
                break
            para.append(_sentence(sent_words))
            if len(para) >= int(rng.integers(2, 5)):
                body_parts.append("<p>" + " ".join(para) + "</p>")
                para = []
        if para:
            body_parts.append("<p>" + " ".join(para) + "</p>")

        # hazard injections (deterministic, per-doc dice)
        dice = rng.random(8)
        if dice[0] < 0.15:  # heading
            body_parts.insert(
                int(rng.integers(0, len(body_parts) + 1)),
                f"<h2>Section {int(rng.integers(1, 9))} overview notes</h2>",
            )
        if dice[1] < 0.10:  # ligature words
            body_parts.append(
                "<p>The "
                + " and ".join(rng.choice(_LIGATURE_WORDS, size=2).tolist())
                + " path works well.</p>"
            )
        if dice[2] < 0.08:  # TOC leader line
            body_parts.append(
                "<p>. . . . . . " + str(int(rng.integers(10, 999))) + "</p>"
            )
        if dice[3] < 0.08:  # code-like blob
            body_parts.append("<p>function f() { var x = 1; let y => y; } // code</p>")
        if dice[4] < 0.10:  # hyphenated line break inside a paragraph
            body_parts.append("<p>This covers infor-\nmation retrieval cases.</p>")
        if dice[5] < 0.10:  # curly quotes + em-dash
            body_parts.append("<p>A “well—known” result appears here.</p>")
        if dice[6] < 0.08:  # soft hyphen mid-word
            body_parts.append("<p>A compre­hensive look at results.</p>")
        if dice[7] < 0.08:  # nbsp entities + multi-space
            body_parts.append("<p>Spaced&nbsp;&nbsp;out   text here.</p>")

        html = (
            "<html><head><title>"
            + " ".join(title_words)
            + "</title><style>p{margin:0}</style>"
            + "<script>var tracker = 1;</script></head><body>"
            + "".join(body_parts)
            + "<!-- crawler meta -->"
            + "</body></html>"
        ).encode("utf-8")

        lang = "en" if lang_draw[local] < 0.95 else (
            "de" if lang_draw[local] < 0.975 else "fr"
        )

        urls.append(url)
        tss.append(_BASE_TS_US + d * 1_000_000)
        htmls.append(html)
        texts.append(html_to_text(html))
        langs.append(lang)

    # ~1% duplicated urls (per chunk) with a later warc_ts, identical html
    n_dups = max(n_in_chunk // 100, 1)
    dup_targets = rng.integers(0, n_in_chunk, size=n_dups)
    for t in dup_targets:
        t = int(t)
        urls.append(urls[t])
        tss.append(tss[t] + 86_400_000_000)  # one day later
        htmls.append(htmls[t])
        texts.append(texts[t])
        langs.append(langs[t])

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def _chunk_plan(n_docs: int) -> list[tuple[int, int]]:
    """[(chunk_idx, n_in_chunk), ...] covering n_docs."""
    plan = []
    for chunk_idx in range((n_docs + CHUNK_DOCS - 1) // CHUNK_DOCS):
        n = min(CHUNK_DOCS, n_docs - chunk_idx * CHUNK_DOCS)
        plan.append((chunk_idx, n))
    return plan


def generate_pages_table(
    n_docs: int, seed: int = 42, vocab_size: int = 5000
) -> pa.Table:
    """Single-process generation (tests / small fixtures)."""
    tables = [
        generate_pages_chunk(ci, n, n_docs, seed, vocab_size)
        for ci, n in _chunk_plan(n_docs)
    ]
    return pa.concat_tables(tables)


def generate_pages_parquet(
    path: str, n_docs: int, seed: int = 42, vocab_size: int = 5000
) -> str:
    pq.write_table(generate_pages_table(n_docs, seed, vocab_size), path)
    return path


def generate_pages_parquet_ray(
    out_dir: str, n_docs: int, seed: int = 42, vocab_size: int = 5000
) -> str:
    """Parallel fixture generation for bench sizes: one Ray task per pinned
    1000-doc chunk -> identical bytes to the single-process path, any
    parallelism. Writes a parquet directory."""
    import ray.data as rd

    plan = _chunk_plan(n_docs)

    def gen(batch: pa.Table) -> pa.Table:
        out = [
            generate_pages_chunk(int(ci), int(n), n_docs, seed, vocab_size)
            for ci, n in zip(
                batch.column("chunk_idx").to_pylist(),
                batch.column("n").to_pylist(),
            )
        ]
        return pa.concat_tables(out)

    items = pa.table(
        {
            "chunk_idx": pa.array([c for c, _ in plan], type=pa.int64()),
            "n": pa.array([n for _, n in plan], type=pa.int64()),
        }
    )
    (
        rd.from_arrow(items)
        .repartition(len(plan))
        .map_batches(gen, batch_format="pyarrow", batch_size=1)
        .write_parquet(out_dir)
    )
    return out_dir


def generate_queries_table(
    pages: pa.Table, n_queries: int = 200, seed: int = 43
) -> pa.Table:
    """Reference query set (FIXTURES.md §2): head terms, tail terms, 2-4 term
    conjunctions sampled from document text, hazard phrases, ~5% zero-hit."""
    from semantic_pdf_search_engine_ray.functions.tokenize import tokenize

    rng = np.random.default_rng(seed)
    doc_texts = pages.column("text").to_pylist()
    doc_tokens = [tokenize(t) for t in doc_texts if t]
    doc_tokens = [t for t in doc_tokens if t]

    queries: list[str] = []
    for q in range(n_queries):
        kind = rng.random()
        if kind < 0.05:  # zero-hit: tokens outside the vocabulary
            queries.append(f"qqxx{int(rng.integers(0, 10**6))} zzyy{q}")
        elif kind < 0.20:  # single head term
            queries.append(str(rng.choice(_HEAD_WORDS)))
        elif kind < 0.35:  # single sampled term (often tail)
            toks = doc_tokens[int(rng.integers(0, len(doc_tokens)))]
            queries.append(toks[int(rng.integers(0, len(toks)))])
        elif kind < 0.85:  # 2-4 term conjunction from one doc (co-occurring)
            toks = doc_tokens[int(rng.integers(0, len(doc_tokens)))]
            k = int(rng.integers(2, 5))
            idx = rng.choice(len(toks), size=min(k, len(toks)), replace=False)
            queries.append(" ".join(toks[i] for i in sorted(idx)))
        else:  # phrase slice (exercises fuzzy highlight relocalization)
            toks = doc_tokens[int(rng.integers(0, len(doc_tokens)))]
            start = int(rng.integers(0, max(len(toks) - 5, 1)))
            queries.append(" ".join(toks[start : start + 5]))

    return pa.table(
        {
            "query_id": pa.array(range(n_queries), type=pa.int64()),
            "query": pa.array(queries, type=pa.string()),
        }
    )


def generate_queries_parquet(
    pages_path: str, out_path: str, n_queries: int = 200, seed: int = 43
) -> str:
    pages = pq.read_table(pages_path, columns=["text"])
    pq.write_table(generate_queries_table(pages, n_queries, seed), out_path)
    return out_path
