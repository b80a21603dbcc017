"""Oracle conformance + byte-identity + parallelism-invariance
(FIXTURES.md invariants 1 and 2)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from semantic_pdf_search_engine_ray.config import EngineConfig
from semantic_pdf_search_engine_ray.oracle import OracleIndex


@pytest.fixture(scope="module")
def built_index(ray_session, tiny_pages, tmp_path_factory):
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_pages,
    )

    index_dir = str(tmp_path_factory.mktemp("index") / "tiny")
    manifest = build_index_from_pages(tiny_pages, index_dir)
    return index_dir, manifest


@pytest.fixture(scope="module")
def oracle(tiny_pages):
    return OracleIndex.from_pages_table(pq.read_table(tiny_pages))


@pytest.fixture(scope="module")
def query_set(tiny_pages):
    from semantic_pdf_search_engine_ray.sources.pages import (
        generate_queries_table,
    )

    return generate_queries_table(pq.read_table(tiny_pages), n_queries=60)


def test_manifest_globals_match_oracle(built_index, oracle):
    _, manifest = built_index
    assert manifest["n_docs"] == oracle.n_docs
    assert manifest["total_tokens"] == oracle.total_tokens
    assert manifest["avgdl"] == oracle.avgdl


def test_docs_byte_identity_and_dedup(built_index, tiny_pages):
    """docs.text must be byte-identical to the expected pages.text of the
    url's max-warc_ts row; doc_id must be the rank of the sorted url."""
    index_dir, _ = built_index
    docs = pq.read_table(os.path.join(index_dir, "docs"))
    pages = pq.read_table(tiny_pages)

    expected: dict[str, tuple] = {}
    for r in pages.select(["url", "warc_ts", "text"]).to_pylist():
        cur = expected.get(r["url"])
        if cur is None or r["warc_ts"] > cur[0]:
            expected[r["url"]] = (r["warc_ts"], r["text"])

    got = {
        r["url"]: (r["doc_id"], r["text"])
        for r in docs.select(["url", "doc_id", "text"]).to_pylist()
    }
    assert set(got) == set(expected)
    for rank, url in enumerate(sorted(expected)):
        doc_id, text = got[url]
        assert doc_id == rank
        assert text == expected[url][1]  # byte-identity
        assert text.encode() == expected[url][1].encode()


def test_rank_identity_exhaustive_and_wand(built_index, oracle, query_set):
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    for qid, q in zip(
        query_set["query_id"].to_pylist(), query_set["query"].to_pylist()
    ):
        expected = oracle.score_query(q, 5)
        got_ex = reader.top_k_exhaustive(q, 5)
        got_wand = reader.top_k_wand(q, 5)
        # exact: same docIDs AND bit-identical float64 scores
        assert got_ex == expected, f"exhaustive mismatch on q{qid}: {q!r}"
        assert got_wand == expected, f"wand mismatch on q{qid}: {q!r}"


def test_query_actor_pipeline(ray_session, built_index, oracle, query_set):
    """The Ray Data actor-pool query stage returns the same results."""
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.search import run_queries

    index_dir, _ = built_index
    results = run_queries(
        index_dir, rd.from_arrow(query_set), EngineConfig()
    ).to_pandas()
    by_q = {
        qid: sorted(zip(g["rank"], g["doc_id"], g["score"]))
        for qid, g in results.groupby("query_id")
    }
    for qid, q in zip(
        query_set["query_id"].to_pylist(), query_set["query"].to_pylist()
    ):
        expected = [
            (rank, doc, score)
            for rank, (doc, score) in enumerate(oracle.score_query(q, 5), 1)
        ]
        assert by_q.get(qid, []) == expected


def test_parallelism_invariance(ray_session, tiny_pages, tmp_path_factory, oracle, query_set):
    """Same index semantics regardless of input block count (FIXTURES.md
    invariant 2: any block count)."""
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
        assign_doc_ids,
    )
    from semantic_pdf_search_engine_ray.stages.extract import ExtractHtml
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    index_dir = str(tmp_path_factory.mktemp("index") / "manyblocks")
    pages = rd.read_parquet(tiny_pages).repartition(13)
    extracted = pages.map_batches(
        ExtractHtml(), batch_format="pyarrow", batch_size=37
    )
    docs = assign_doc_ids(extracted)
    build_index_from_docs(docs, index_dir, input_lineage={"test": "13blocks"})
    reader = IndexReader(index_dir)
    for q in query_set["query"].to_pylist()[:25]:
        assert reader.top_k_wand(q, 5) == oracle.score_query(q, 5)


def test_empty_and_oov_queries(built_index):
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    reader = IndexReader(built_index[0])
    assert reader.top_k_exhaustive("", 5) == []
    assert reader.top_k_wand("", 5) == []
    assert reader.top_k_wand("zzzznotaterm qqqqneither", 5) == []


def test_reader_loads_posting_blobs_lazily(built_index):
    """Startup must read only metadata columns; posting row groups are
    fetched on first touch and only for queried terms (the per-actor
    memory contract for multi-actor query pools)."""
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    index_dir, _ = built_index
    reader = IndexReader(index_dir)
    assert reader._rg_cache == {}  # nothing fetched at init
    assert reader._pf_handles == {}
    reader.top_k_exhaustive("the data", 3)
    touched = len(reader._rg_cache)
    assert touched >= 1  # the queried terms' groups came in
    total_rgs = len(reader._rg_file)
    if total_rgs > 1:
        assert touched < total_rgs  # ...but not the whole index


def test_sampled_doc_id_assignment_bit_identical(ray_session, tiny_pages,
                                                 tmp_path_factory):
    """assign_doc_ids_sampled (terasort-style, no global sort/materialize)
    must produce the exact (url, warc_ts, doc_id) mapping of the
    sort-based path — the doc_id contract is boundary-invariant."""
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        assign_doc_ids,
        assign_doc_ids_sampled,
    )
    from semantic_pdf_search_engine_ray.stages.extract import ExtractHtml

    def extracted():
        return rd.read_parquet(tiny_pages).repartition(7).map_batches(
            ExtractHtml(), batch_format="pyarrow", batch_size=41
        )

    cols = ["url", "warc_ts", "doc_id", "text"]

    def canon(ds):
        return (
            ds.to_pandas()[cols]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    base = canon(assign_doc_ids(extracted()))
    spill = str(tmp_path_factory.mktemp("docid_spill"))
    samp = canon(assign_doc_ids_sampled(extracted(), spill_dir=spill,
                                        n_ranges=5))
    assert base.equals(samp)
    # and with a degenerate single range (empty boundary sample path)
    spill2 = str(tmp_path_factory.mktemp("docid_spill2"))
    samp1 = canon(assign_doc_ids_sampled(extracted(), spill_dir=spill2,
                                         n_ranges=1))
    assert base.equals(samp1)


def test_batch_tier_routes_wildcard_queries(ray_session, built_index):
    """query-batch consistency: 'data*' through the actor tier must
    equal reader.top_k_prefix, not the exact term (review finding)."""
    import pyarrow as pa

    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.search import run_queries
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    built_index, _manifest = built_index
    reader = IndexReader(built_index)
    head = sorted(reader.df, key=lambda t: (-reader.df[t], t))[0]
    prefix = head[:3]
    queries = pa.table({
        "query_id": pa.array([0, 1], type=pa.int64()),
        "query": pa.array([f"{prefix}*", head], type=pa.string()),
    })
    res = run_queries(built_index, rd.from_arrow(queries), k=5).to_pandas()
    got = [
        (int(r.doc_id), float(r.score))
        for r in res[res.query_id == 0].sort_values("rank").itertuples()
    ]
    assert got == reader.top_k_prefix(prefix, 5)
    exact = [
        (int(r.doc_id), float(r.score))
        for r in res[res.query_id == 1].sort_values("rank").itertuples()
    ]
    assert exact == reader.top_k_auto(head, 5)


def test_wildcard_composes_with_doc_filter(ray_session, built_index):
    """'data*' under filter_col=lang must rank ONLY allowed docs, using
    the same dense prefix scorer with the mask AND-ed in — not silently
    skip the filter and not fall through to zero-hit exact search."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import numpy as np
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.search import run_queries
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    index_dir, _manifest = built_index
    reader = IndexReader(index_dir)
    head = sorted(reader.df, key=lambda t: (-reader.df[t], t))[0]
    prefix = head[:3]

    docs = pq.read_table(os.path.join(index_dir, "docs"),
                         columns=["doc_id", "lang"])
    allowed = np.zeros(len(reader.doc_len), dtype=bool)
    ids = docs.column("doc_id").to_numpy()
    en = np.array([v == "en" for v in docs.column("lang").to_pylist()])
    allowed[ids[en]] = True
    assert 0 < allowed.sum() < allowed.size  # the filter is non-trivial

    queries = pa.table({
        "query_id": pa.array([0], type=pa.int64()),
        "query": pa.array([f"{prefix}*"], type=pa.string()),
    })
    res = run_queries(index_dir, rd.from_arrow(queries), k=5,
                      filter_col="lang", filter_value="en").to_pandas()
    got = [
        (int(r.doc_id), float(r.score))
        for r in res.sort_values("rank").itertuples()
    ]
    assert got, "filtered wildcard query returned nothing"
    assert got == reader.top_k_prefix(prefix, 5, allowed=allowed)
    assert all(allowed[d] for d, _ in got)
    # and it differs from the unfiltered ranking iff a non-en doc ranked
    unfiltered = reader.top_k_prefix(prefix, 5)
    if any(not allowed[d] for d, _ in unfiltered):
        assert got != unfiltered
