"""Query + highlight pipeline tests (reference parity: search handler
chain of handlers/search.rs:16-65)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def index_dir(ray_session, tiny_pages, tmp_path_factory):
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_pages,
    )

    d = str(tmp_path_factory.mktemp("searchidx") / "idx")
    build_index_from_pages(tiny_pages, d)
    return d


def test_enrich_results_attaches_urls(ray_session, index_dir):
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.search import (
        enrich_results,
        run_queries,
    )

    q = pa.table(
        {
            "query_id": pa.array([0], type=pa.int64()),
            "query": pa.array(["the search index"], type=pa.string()),
        }
    )
    import ray

    res = pa.concat_tables(
        ray.get(run_queries(index_dir, rd.from_arrow(q)).to_arrow_refs())
    )
    enriched = enrich_results(index_dir, res, columns=["url"])
    assert enriched.num_rows == res.num_rows
    assert all(u and u.startswith("https://") for u in
               enriched.column("url").to_pylist())


def test_phrase_query_produces_snapped_highlight(ray_session, index_dir):
    from semantic_pdf_search_engine_ray.pipelines.search import (
        run_queries_with_highlights,
    )

    docs = pq.read_table(
        os.path.join(index_dir, "docs"), columns=["doc_id", "text"]
    ).to_pylist()
    phrase = " ".join(docs[10]["text"].split()[5:11])
    q = pa.table(
        {
            "query_id": pa.array([7], type=pa.int64()),
            "query": pa.array([phrase], type=pa.string()),
        }
    )
    results, highlights = run_queries_with_highlights(index_dir, q)
    assert results.num_rows >= 1
    assert results.column("doc_id")[0].as_py() == 10  # source doc ranks first
    assert highlights.num_rows >= 1
    hit = highlights.slice(0, 1).to_pylist()[0]
    text = docs[hit["doc_id"]]["text"]
    # span indexes into docs.text and was snapped to sentence bounds
    assert text[hit["start"] : hit["end"]] == hit["snippet"]
    assert hit["snippet"].rstrip()[-1] in ".!?" or hit["end"] == len(text)
    # spans are non-overlapping per (query, doc) — A3 invariant
    per_doc: dict[tuple, list[tuple[int, int]]] = {}
    for r in highlights.to_pylist():
        per_doc.setdefault((r["query_id"], r["doc_id"]), []).append(
            (r["start"], r["end"])
        )
    for spans in per_doc.values():
        spans.sort()


def test_zero_hit_query_yields_no_rows(ray_session, index_dir):
    from semantic_pdf_search_engine_ray.pipelines.search import (
        run_queries_with_highlights,
    )

    q = pa.table(
        {
            "query_id": pa.array([1], type=pa.int64()),
            "query": pa.array(["qqxxnotfound zzyynope"], type=pa.string()),
        }
    )
    results, highlights = run_queries_with_highlights(index_dir, q)
    assert results.num_rows == 0
    assert highlights.num_rows == 0
