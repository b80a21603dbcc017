"""Single-process reference implementation (the correctness spec).

A <200-line dict-based inverted index + BM25 scorer using the same
analyzer and the same pinned float expression tree as the engine
(SURVEY.md §5.2). The Ray pipeline must match this rank-identically in
(doc_id, score) at any parallelism — tests/test_build_query.py.

Semantics pinned here (and mirrored by the engine):
- analyzer: lowercase [a-z0-9]+ (functions/tokenize.py)
- dedup: one doc per url, keep max warc_ts
- doc_id: rank of url in ascending sort
- BM25: idf = ln(1 + (N - df + 0.5)/(df + 0.5));
  tfn = tf / (tf + k1*(1 - b + b*(dl/avgdl)));
  score(d) = sum over sorted unique query terms of idf*(k1+1)*tfn
  (accumulated in sorted-term order — the float determinism anchor)
- top-k tie-break: (score DESC, doc_id ASC), k=5 default
  (reference default k: `/root/reference/src/qdrant.rs:88`)
"""

from __future__ import annotations

import math
from collections import Counter

from semantic_pdf_search_engine_ray.config import EngineConfig
from semantic_pdf_search_engine_ray.functions.tokenize import (
    query_terms,
    tokenize,
)


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]], cfg: EngineConfig | None = None):
        """docs: list of (doc_id, text)."""
        self.cfg = cfg or EngineConfig()
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.doc_len: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize(text)
            self.doc_len[doc_id] = len(toks)
            for term, tf in sorted(Counter(toks).items()):
                self.postings.setdefault(term, []).append((doc_id, tf))
        for plist in self.postings.values():
            plist.sort()
        self.n_docs = len(self.doc_len)
        self.total_tokens = sum(self.doc_len.values())
        self.avgdl = self.total_tokens / self.n_docs if self.n_docs else 0.0

    @classmethod
    def from_pages_table(cls, pages, cfg: EngineConfig | None = None):
        """pages: pyarrow Table (url, warc_ts, text, ...). Applies the
        pinned dedup + doc_id-rank semantics."""
        rows = pages.select(["url", "warc_ts", "text"]).to_pylist()
        best: dict[str, tuple] = {}
        for r in rows:
            cur = best.get(r["url"])
            if cur is None or r["warc_ts"] > cur[0]:
                best[r["url"]] = (r["warc_ts"], r["text"])
        docs = [
            (rank, best[url][1]) for rank, url in enumerate(sorted(best))
        ]
        return cls(docs, cfg)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        if df == 0:
            return 0.0
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score_query(self, query: str, k: int | None = None) -> list[tuple[int, float]]:
        """Top-k [(doc_id, score)] with the pinned tie-break."""
        cfg = self.cfg
        k = k if k is not None else cfg.top_k
        scores: dict[int, float] = {}
        for term in query_terms(query):
            plist = self.postings.get(term)
            if not plist:
                continue
            w = self.idf(term) * (cfg.k1 + 1.0)
            for doc_id, tf in plist:
                dl = self.doc_len[doc_id]
                tfn = tf / (
                    tf + cfg.k1 * (1.0 - cfg.b + cfg.b * (dl / self.avgdl))
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + w * tfn
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
