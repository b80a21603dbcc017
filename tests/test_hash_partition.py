"""Hash-partition shuffle mode: decoded-index identity vs sort mode,
mid-shuffle resume idempotence, and hot-term spread."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from tests.test_salting_resume import _decoded_postings


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


def test_hash_partition_equals_sort_mode(
    ray_session, docs_ds_factory, tmp_path_factory
):
    from semantic_pdf_search_engine_ray.config import EngineConfig
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )

    base = tmp_path_factory.mktemp("hashmode")
    cfg = EngineConfig()
    m1 = build_index_from_docs(
        docs_ds_factory(), str(base / "sort"), cfg,
        input_lineage={"t": "hp"}, shuffle_mode="sort",
    )
    m2 = build_index_from_docs(
        docs_ds_factory(), str(base / "hash"), cfg,
        input_lineage={"t": "hp"}, shuffle_mode="hash_partition",
    )
    assert m1["n_docs"] == m2["n_docs"]
    assert m1["avgdl"] == m2["avgdl"]
    assert _decoded_postings(str(base / "sort")) == _decoded_postings(
        str(base / "hash")
    )


def test_hash_partition_mid_shuffle_resume(
    ray_session, docs_ds_factory, tmp_path_factory
):
    """Crash between phase 1 (partition spill) and phase 2 (encode):
    the re-run must SKIP the committed spill (same parts files, same
    marker) and still produce the complete identical index."""
    from semantic_pdf_search_engine_ray.config import EngineConfig
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )

    base = tmp_path_factory.mktemp("resume_hash")
    idx = str(base / "idx")
    cfg = EngineConfig()
    build_index_from_docs(docs_ds_factory(), idx, cfg,
                          input_lineage={"t": "resume"},
                          shuffle_mode="hash_partition")
    want = _decoded_postings(idx)

    # simulate a crash AFTER the parts spill committed but BEFORE the
    # encode finished: drop the postings stage + everything downstream
    import shutil

    for stage in ("postings", "dictionary"):
        shutil.rmtree(os.path.join(idx, stage), ignore_errors=True)
        marker = os.path.join(idx, f"_STAGE_{stage}.json")
        if os.path.exists(marker):
            os.remove(marker)
    os.remove(os.path.join(idx, "manifest.json"))

    parts_marker = os.path.join(idx, f"_STAGE_postings_parts.json")
    before = json.load(open(parts_marker))
    mtime_before = os.path.getmtime(parts_marker)

    build_index_from_docs(docs_ds_factory(), idx, cfg,
                          input_lineage={"t": "resume"},
                          shuffle_mode="hash_partition")

    after = json.load(open(parts_marker))
    assert before["fingerprint"] == after["fingerprint"]
    assert os.path.getmtime(parts_marker) == mtime_before, (
        "phase-1 spill was re-run; resume should have skipped it"
    )
    assert _decoded_postings(idx) == want


def test_hot_terms_spread_across_partitions(
    ray_session, docs_ds_factory, tmp_path_factory
):
    """A salted hot term's postings must land in >1 partition file (the
    skew defusal the north rule requires) and still decode in doc order."""
    from semantic_pdf_search_engine_ray.config import EngineConfig
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )

    base = tmp_path_factory.mktemp("hot")
    idx = str(base / "idx")
    build_index_from_docs(docs_ds_factory(), idx, EngineConfig(),
                          input_lineage={"t": "hot"},
                          shuffle_mode="hash_partition")
    entry = json.load(open(os.path.join(idx, "_STAGE_postings_parts.json")))
    hot = entry["metrics"]["hot_terms"]
    assert hot, "Zipf fixture must yield hot terms"

    parts_dir = os.path.join(idx, "postings_parts")
    spread = 0
    for term in hot[:5]:
        found = set()
        for d in os.listdir(parts_dir):
            if not d.startswith("part="):
                continue
            t = pq.read_table(os.path.join(parts_dir, d), columns=["term"])
            if term in set(t.column("term").to_pylist()):
                found.add(d)
        spread = max(spread, len(found))
    assert spread > 1, "salting should spread a hot term across partitions"

    # decoded postings of a hot term are doc_id-sorted and complete
    decoded = _decoded_postings(idx)
    ids = [d for d, _ in decoded[hot[0]]]
    assert ids == sorted(ids)
