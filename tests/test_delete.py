"""Doc-granular deletion: tombstone mask semantics + purge rebuild."""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tomb_index(ray_session, tmp_path_factory):
    """Copy of the sf0.001 index with every 5th doc tombstoned."""
    from semantic_pdf_search_engine_ray.pipelines import conformance as cf
    from semantic_pdf_search_engine_ray.pipelines.delete import (
        delete_documents,
        load_tombstones,
    )

    base = cf.ensure_index(SF)
    d = str(tmp_path_factory.mktemp("tomb") / "idx")
    shutil.copytree(base, d)
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{d}/docs", columns=["doc_id"]) \
        .column("doc_id").to_pylist()
    dead = [i for i in ids if i % 5 == 0]
    assert delete_documents(d, dead) == len(set(dead))
    assert load_tombstones(d) == sorted(set(dead))
    return base, d, sorted(set(dead))


def test_deleted_docs_never_rank_all_paths(tomb_index):
    """Every scoring path (wand / exhaustive / auto / conjunctive /
    prefix / more_like_this) must exclude tombstoned docs, and surviving
    docs must keep bit-identical scores (stats frozen)."""
    from semantic_pdf_search_engine_ray.pipelines import conformance as cf
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    base, d, dead = tomb_index
    dead_set = set(dead)
    r0 = IndexReader(base)
    r1 = IndexReader(d)
    queries = cf.derive_query_table(base)
    k = 10
    for q in queries.column("query").to_pylist():
        for meth in ("top_k_wand", "top_k_exhaustive", "top_k_auto",
                     "top_k_conjunctive"):
            got = getattr(r1, meth)(q, k)
            assert not (set(d for d, _ in got) & dead_set), (meth, q)
            # survivors score exactly as before the delete
            want = [(doc, s) for doc, s in getattr(r0, meth)(q, 50)
                    if doc not in dead_set][:k]
            want = want[:len(got)] if meth != "top_k_conjunctive" else want
            assert got == want[:k], (meth, q)
    # prefix and more-like-this
    term = queries.column("query").to_pylist()[0]
    pfx = term[:3]
    got = r1.top_k_prefix(pfx, k)
    assert not (set(d for d, _ in got) & dead_set)
    src = next(i for i in range(len(r1.doc_len)) if i not in dead_set)
    import pyarrow.parquet as pq

    txt = pq.read_table(f"{d}/docs", columns=["doc_id", "text"])
    by_id = dict(zip(txt.column("doc_id").to_pylist(),
                     txt.column("text").to_pylist()))
    mlt = r1.more_like_this(src, by_id[src], k)
    assert not (set(d for d, _ in mlt) & dead_set)


def test_purge_rebuild_matches_filtered_fresh_build(
    ray_session, tomb_index, tmp_path
):
    """purge_deleted(out) must be bit-identical to an index built fresh
    from the corpus minus the deleted docs (recomputed stats)."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )
    from semantic_pdf_search_engine_ray.pipelines.delete import (
        purge_deleted,
    )
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    base, d, dead = tomb_index
    purged = str(tmp_path / "purged")
    m1 = purge_deleted(d, purged)

    docs = pq.read_table(f"{base}/docs")
    docs = docs.drop_columns(
        [c for c in ("doc_len",) if c in docs.column_names])
    keep = pa.array([i not in set(dead)
                     for i in docs.column("doc_id").to_pylist()])
    fresh = str(tmp_path / "fresh")
    m2 = build_index_from_docs(
        rd.from_arrow(docs.filter(keep)), fresh,
        input_lineage={"t": "fresh_minus_dead"},
    )
    assert m1["n_docs"] == m2["n_docs"]
    assert m1["avgdl"] == m2["avgdl"]

    rp, rf = IndexReader(purged), IndexReader(fresh)
    assert rp.deleted is None  # purge leaves no tombstones behind
    assert rp.df == rf.df
    assert np.array_equal(rp.doc_len, rf.doc_len)
    for q in list(rf.df)[:8]:
        assert rp.top_k_auto(q, 5) == rf.top_k_auto(q, 5)


def test_cli_delete_then_purge_roundtrip(ray_session, tomb_index, tmp_path):
    """CLI surface: delete tombstones more ids, purge rebuilds without
    any tombstoned doc."""
    import json

    from semantic_pdf_search_engine_ray.cli import main
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    base, d, dead = tomb_index
    import contextlib
    import io

    buf = io.StringIO()
    extra = next(i for i in range(len(IndexReader(base).doc_len))
                 if i % 5 != 0)
    with contextlib.redirect_stdout(buf):
        assert main(["delete", "--index", d, "--ids", str(extra)]) == 0
    rep = json.loads(buf.getvalue())
    assert rep["deleted"] == 1
    assert rep["total_tombstones"] == len(dead) + 1
    r = IndexReader(d)
    assert r.deleted[extra]
