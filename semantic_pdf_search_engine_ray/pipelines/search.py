"""Batch query pipeline: queries Dataset -> ranked results (+ optional
url/text enrichment and fuzzy highlight spans).

The Ray analog of the reference's search handler chain
(`/root/reference/src/bin/app/handlers/search.rs:16-65`): top-k retrieval
(qdrant.rs:70-96 -> our QueryActor), payload projection (search.rs:97-113
-> broadcast join against the docs store), then per-result fuzzy
re-localization + sentence snap + span coalescing
(search.rs:115-184 -> highlight stage, functions/fuzzy.py).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd

from semantic_pdf_search_engine_ray.config import EngineConfig
from semantic_pdf_search_engine_ray.functions.fuzzy import (
    fuzzy_search,
    snap_to_sentence_boundaries,
)
from semantic_pdf_search_engine_ray.functions.textnorm import char_entries
from semantic_pdf_search_engine_ray.stages.query import QueryActor


def run_queries(
    index_dir: str,
    queries_ds: rd.Dataset,
    cfg: EngineConfig | None = None,
    *,
    k: int | None = None,
    method: str = "auto",
    filter_col: str | None = None,
    filter_value: str | None = None,
) -> rd.Dataset:
    """(query_id, query) -> (query_id, rank, doc_id, score).

    ``filter_col``/``filter_value``: optional doc-subset predicate on a
    docs-store column (the reference's filename-filtered search, J2)."""
    cfg = cfg or EngineConfig()
    return queries_ds.map_batches(
        QueryActor,
        fn_constructor_args=(index_dir, k if k is not None else cfg.top_k,
                             method, filter_col, filter_value),
        batch_format="pyarrow",
        batch_size=cfg.query_batch_size,
        concurrency=cfg.query_concurrency,
    )


def enrich_results(
    index_dir: str, results: pa.Table, columns: list[str] | None = None
) -> pa.Table:
    """Attach doc store columns (url, text, ...) to a small results table.

    J3 of SURVEY.md §2.5: the small side is the RESULTS (k x queries
    rows); the docs store is read with a pushed-down doc_id filter so only
    matching row groups leave storage — no shuffle join.
    """
    import pyarrow.dataset as pads

    columns = columns or ["url"]
    want = sorted(set(results.column("doc_id").to_pylist()))
    if not want:
        out = results
        for c in columns:
            out = out.append_column(c, pa.array([], type=pa.string()))
        return out
    docs = pads.dataset(os.path.join(index_dir, "docs")).to_table(
        columns=["doc_id"] + columns,
        filter=pads.field("doc_id").isin(want),
    )
    joined = results.join(docs, keys="doc_id", join_type="left outer")
    return joined.sort_by([("query_id", "ascending"), ("rank", "ascending")])


HIGHLIGHT_THRESHOLD = 0.85  # handlers/search.rs:152


def highlight_spans(
    text: str, query: str, threshold: float = HIGHLIGHT_THRESHOLD
) -> list[tuple[int, int, float, str]]:
    """Per-doc highlight computation — THE one implementation of the
    reference's compute_highlights chain (`handlers/search.rs:115-184`):
    char-entry projection (M10/M11) -> fuzzy_search -> sentence-boundary
    snap -> source-text char spans. Shared by the batch HighlightActor
    and the serve endpoint so the two surfaces can never diverge.
    Returns [(start, end, score, snippet)]."""
    entries = char_entries(text)
    out: list[tuple[int, int, float, str]] = []
    for s, e, score in fuzzy_search(entries, query, threshold):
        s2, e2 = snap_to_sentence_boundaries(entries, s, e)
        # map haystack indices back to source-text offsets
        src_start = entries[s2][0] if s2 < len(entries) else len(text)
        src_end = entries[e2 - 1][0] + 1 if e2 > s2 else src_start
        out.append((src_start, src_end, score, text[src_start:src_end]))
    return out


class HighlightActor:
    """Actor-pool stage: enriched result rows (query_id, query, doc_id,
    text) -> highlight span rows (see highlight_spans)."""

    THRESHOLD = HIGHLIGHT_THRESHOLD

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, starts, ends, scores, snippets = [], [], [], [], [], []
        for qid, qtext, doc_id, text in zip(
            batch.column("query_id").to_pylist(),
            batch.column("query").to_pylist(),
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            for src_start, src_end, score, snip in highlight_spans(
                text, qtext, self.THRESHOLD
            ):
                qids.append(qid)
                docs.append(doc_id)
                starts.append(src_start)
                ends.append(src_end)
                scores.append(score)
                snippets.append(snip)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "start": pa.array(starts, type=pa.int64()),
                "end": pa.array(ends, type=pa.int64()),
                "score": pa.array(scores, type=pa.float64()),
                "snippet": pa.array(snippets, type=pa.string()),
            }
        )


def run_queries_with_highlights(
    index_dir: str,
    queries: pa.Table,
    cfg: EngineConfig | None = None,
    *,
    k: int | None = None,
    doc_columns: list[str] | None = None,
) -> tuple[pa.Table, pa.Table]:
    """Full reference-parity query pipeline -> (results, highlights).

    ``doc_columns`` are the doc-store columns to project into results
    (must include or default to "text", the highlight haystack)."""
    cfg = cfg or EngineConfig()
    doc_columns = list(doc_columns or ["url", "text"])
    if "text" not in doc_columns:
        doc_columns.append("text")
    results = (
        run_queries(index_dir, rd.from_arrow(queries), cfg, k=k)
        .to_arrow_refs()
    )
    import ray

    parts = [t for t in ray.get(results) if t.num_rows > 0]
    results_tbl = (
        pa.concat_tables(parts)
        if parts
        else pa.schema(
            [("query_id", pa.int64()), ("rank", pa.int64()),
             ("doc_id", pa.int64()), ("score", pa.float64())]
        ).empty_table()
    )
    enriched = enrich_results(index_dir, results_tbl, columns=doc_columns)
    with_query = enriched.join(queries, keys="query_id", join_type="inner")
    hl_input = rd.from_arrow(
        with_query.select(["query_id", "query", "doc_id", "text"])
    )
    highlights = hl_input.map_batches(
        HighlightActor,
        batch_format="pyarrow",
        batch_size=cfg.query_batch_size,
        concurrency=cfg.query_concurrency,
    )
    hl_parts = [t for t in ray.get(highlights.to_arrow_refs()) if t.num_rows > 0]
    hl_tbl = (
        pa.concat_tables(hl_parts)
        if hl_parts
        else pa.schema(
            [("query_id", pa.int64()), ("doc_id", pa.int64()),
             ("start", pa.int64()), ("end", pa.int64()),
             ("score", pa.float64()), ("snippet", pa.string())]
        ).empty_table()
    )
    hl_tbl = (
        hl_tbl.sort_by(
            [("query_id", "ascending"), ("doc_id", "ascending"),
             ("start", "ascending")]
        )
        if hl_tbl.num_rows
        else hl_tbl
    )
    return enriched.drop_columns(["text"]), hl_tbl


class FacetActor:
    """Actor-pool stage: query batches -> per-facet match counts.

    The search-tier "facets sidebar": for each query, how many docs in
    the full (disjunctive) match set carry each value of a docs-store
    column. The facet column resolves ONCE per actor from the docs
    store into a dense int8-codes array (same pattern as QueryActor's
    filter mask), so per query the count is one bincount over the
    match mask — no per-facet passes."""

    def __init__(self, index_dir: str, facet_col: str = "lang"):
        import numpy as np
        import pyarrow.parquet as pq

        from semantic_pdf_search_engine_ray.stages.query import IndexReader

        self.reader = IndexReader(index_dir)
        f = pq.read_table(os.path.join(index_dir, "docs"),
                          columns=["doc_id", facet_col])
        vals = f.column(facet_col).to_pylist()
        self.cats = sorted(set(v for v in vals if v is not None))
        code = {v: i for i, v in enumerate(self.cats)}
        self.codes = np.full(len(self.reader.doc_len), -1, dtype=np.int64)
        self.codes[f.column("doc_id").to_numpy()] = [
            code.get(v, -1) for v in vals
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        qids, facets, counts = [], [], []
        for qid, q in zip(batch.column("query_id").to_pylist(),
                          batch.column("query").to_pylist()):
            m = self.reader.matched_docs(q)
            hit = self.codes[m]
            hit = hit[hit >= 0]
            cnt = np.bincount(hit, minlength=len(self.cats))
            for ci in np.flatnonzero(cnt):
                qids.append(qid)
                facets.append(self.cats[ci])
                counts.append(int(cnt[ci]))
        return pa.table(
            {"query_id": pa.array(qids, type=pa.int64()),
             "facet": pa.array(facets, type=pa.string()),
             "n_docs": pa.array(counts, type=pa.int64())}
        )


def facet_counts(
    index_dir: str,
    queries_ds: rd.Dataset,
    facet_col: str = "lang",
    cfg: EngineConfig | None = None,
) -> rd.Dataset:
    """(query_id, query) -> (query_id, facet, n_docs) over the full
    disjunctive match set of each query."""
    cfg = cfg or EngineConfig()
    return queries_ds.map_batches(
        FacetActor,
        fn_constructor_args=(index_dir, facet_col),
        batch_format="pyarrow",
        batch_size=cfg.query_batch_size,
        concurrency=cfg.query_concurrency,
    )


def exact_highlight_rects(
    docs_path: str,
    queries: pa.Table,
    per_query: int = 3,
    ext: int = 40,
) -> pa.Table:
    """Render-ready highlight RECTS for exact query anchors — the
    web-text analog of the reference's search-with-bboxes endpoint
    (`webapp.rs:262-384`: per result, locate the match's char indices
    on the page, extract per-char bboxes, merge into line rects,
    group per page).

    Per query term: the ``per_query`` lowest-doc_id documents
    containing an exact (case-sensitive) occurrence; the highlight
    span is the first occurrence extended by ``ext`` trailing context
    chars (the snippet window), laid out on the deterministic
    monospace grid and merged by the reference's rect-merge rules
    (`functions/geometry.py`).

    Scale shape: pass 1 is one streaming vectorized substring scan
    over the corpus with per-batch top-``per_query`` pruning, so the
    collected candidate table is bounded by blocks x |queries| x
    per_query; pass 2 is a doc_id-pushdown read of the <= |queries| x
    per_query selected docs (the `enrich_results` J3 pattern) — rect
    geometry is computed only on those.

    Output: (query_id, doc_id, rect_idx, page, x, y, width, height),
    all int64.
    """
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from semantic_pdf_search_engine_ray.functions import geometry as geo

    qids = queries.column("query_id").to_pylist()
    terms = queries.column("query").to_pylist()

    def find_candidates(t: pa.Table) -> pa.Table:
        out_q: list[int] = []
        out_d: list[int] = []
        ids = t.column("doc_id")
        for qid, term in zip(qids, terms):
            m = pc.match_substring(t.column("text"), term)
            hit = ids.filter(m).to_numpy(zero_copy_only=False)
            if len(hit) > per_query:
                # smallest per_query doc_ids survive this batch
                hit = np.partition(hit, per_query - 1)[:per_query]
            out_q.extend([qid] * len(hit))
            out_d.extend(int(x) for x in hit)
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "doc_id": pa.array(out_d, type=pa.int64()),
        })

    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    cand = docs.map_batches(
        find_candidates, batch_format="pyarrow"
    ).to_pandas()  # bounded: <= blocks x |queries| x per_query rows

    empty = pa.table({c: pa.array([], type=pa.int64()) for c in (
        "query_id", "doc_id", "rect_idx", "page", "x", "y",
        "width", "height")})
    if not len(cand):
        return empty
    sel = (cand.sort_values(["query_id", "doc_id"])
               .groupby("query_id", sort=True)
               .head(per_query))
    by_doc: dict[int, list[int]] = {}
    for q, d in zip(sel["query_id"], sel["doc_id"]):
        by_doc.setdefault(int(d), []).append(int(q))
    term_of = dict(zip(qids, terms))

    dtab = pads.dataset(docs_path).to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(sorted(by_doc)),
    )
    cols: dict[str, list[int]] = {c: [] for c in (
        "query_id", "doc_id", "rect_idx", "page", "x", "y",
        "width", "height")}
    for doc_id, text in zip(dtab.column("doc_id").to_pylist(),
                            dtab.column("text").to_pylist()):
        for q in sorted(by_doc[doc_id]):
            term = term_of[q]
            pos = text.find(term)
            if pos < 0:
                continue
            rects = geo.merge_span_rects(
                text, pos, pos + len(term) + ext)
            for ridx, (page, x, y, w, h) in enumerate(rects):
                cols["query_id"].append(q)
                cols["doc_id"].append(doc_id)
                cols["rect_idx"].append(ridx)
                cols["page"].append(page)
                cols["x"].append(x)
                cols["y"].append(y)
                cols["width"].append(w)
                cols["height"].append(h)
    if not cols["query_id"]:
        return empty
    out = pa.table({c: pa.array(v, type=pa.int64())
                    for c, v in cols.items()})
    return out.sort_by([("query_id", "ascending"),
                        ("doc_id", "ascending"),
                        ("rect_idx", "ascending")])
