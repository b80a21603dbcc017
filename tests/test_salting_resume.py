"""Skew (salting) recombination + resume idempotence
(FIXTURES.md invariants 3 and 4)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest


def _decoded_postings(index_dir: str) -> dict[str, list[tuple[int, int]]]:
    """term -> full [(doc_id, tf)] list, merged across blocks in doc order."""
    from semantic_pdf_search_engine_ray.functions.codec import (
        decode_doc_ids,
        decode_tfs,
    )

    tbl = pq.read_table(os.path.join(index_dir, "postings"))
    out: dict[str, list[tuple[int, int, int]]] = {}
    for r in tbl.to_pylist():
        ids = decode_doc_ids(r["docs"])
        tfs = decode_tfs(r["tfs"])
        out.setdefault(r["term"], []).extend(
            (int(d), int(t)) for d, t in zip(ids, tfs)
        )
    return {t: sorted(v) for t, v in out.items()}


@pytest.fixture(scope="module")
def docs_ds_factory(ray_session, tiny_pages):
    def make():
        import ray.data as rd

        from semantic_pdf_search_engine_ray.pipelines.build import assign_doc_ids
        from semantic_pdf_search_engine_ray.stages.extract import ExtractHtml

        pages = rd.read_parquet(tiny_pages)
        return assign_doc_ids(
            pages.map_batches(ExtractHtml(), batch_format="pyarrow")
        )

    return make


def test_salted_groupby_equals_sort_mode(
    ray_session, docs_ds_factory, tmp_path_factory
):
    """groupby((term, salt)) with hot-term salting produces the identical
    decoded index as the sort-mode build (invariant 3)."""
    from semantic_pdf_search_engine_ray.config import EngineConfig
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )

    base = tmp_path_factory.mktemp("salt")
    cfg = EngineConfig()
    m1 = build_index_from_docs(
        docs_ds_factory(), str(base / "sort"), cfg,
        input_lineage={"t": "s"}, shuffle_mode="sort",
    )
    m2 = build_index_from_docs(
        docs_ds_factory(), str(base / "grp"), cfg,
        input_lineage={"t": "g"}, shuffle_mode="groupby_salt",
    )
    assert m1["n_docs"] == m2["n_docs"]
    p1 = _decoded_postings(str(base / "sort"))
    p2 = _decoded_postings(str(base / "grp"))
    assert p1.keys() == p2.keys()
    for term in p1:
        assert p1[term] == p2[term], f"postings differ for {term!r}"
    # salting actually engaged: hot terms were detected
    hot = m2["stages"]["postings"]["metrics"]["hot_terms"]
    assert "the" in hot


def test_resume_skips_completed_stages_and_is_idempotent(
    ray_session, docs_ds_factory, tmp_path_factory
):
    """Interrupted build (manifest missing, postings stage half-done)
    resumes to an identical final index (invariant 4)."""
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )
    from semantic_pdf_search_engine_ray.state import manifest as mf

    index_dir = str(tmp_path_factory.mktemp("resume") / "idx")
    lineage = {"input": "resume-test"}
    m1 = build_index_from_docs(
        docs_ds_factory(), index_dir, input_lineage=lineage
    )
    reference = _decoded_postings(index_dir)
    docs_marker = json.load(open(os.path.join(index_dir, "_STAGE_docs.json")))

    # simulate a crash mid-shuffle: postings stage partially written,
    # marker + manifest gone
    os.remove(os.path.join(index_dir, "manifest.json"))
    os.remove(os.path.join(index_dir, "_STAGE_postings.json"))
    post_dir = os.path.join(index_dir, "postings")
    victims = sorted(os.listdir(post_dir))[:1]
    for v in victims:
        os.remove(os.path.join(post_dir, v))
    assert not mf.is_ready(index_dir)

    m2 = build_index_from_docs(
        docs_ds_factory(), index_dir, input_lineage=lineage
    )
    assert mf.is_ready(index_dir)
    # docs stage was NOT rebuilt (same marker mtime/fingerprint)
    docs_marker2 = json.load(open(os.path.join(index_dir, "_STAGE_docs.json")))
    assert docs_marker2 == docs_marker
    # final index identical to the uninterrupted build
    assert _decoded_postings(index_dir) == reference
    assert m2["n_docs"] == m1["n_docs"]


def test_lineage_change_forces_rebuild(ray_session, docs_ds_factory, tmp_path_factory):
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )

    index_dir = str(tmp_path_factory.mktemp("lineage") / "idx")
    build_index_from_docs(docs_ds_factory(), index_dir, input_lineage={"v": 1})
    t1 = os.path.getmtime(os.path.join(index_dir, "_STAGE_docs.json"))
    build_index_from_docs(docs_ds_factory(), index_dir, input_lineage={"v": 2})
    t2 = os.path.getmtime(os.path.join(index_dir, "_STAGE_docs.json"))
    assert t2 > t1  # stage re-ran because the input fingerprint changed
