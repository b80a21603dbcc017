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


def test_partition_level_encode_resume(ray_session, docs_ds_factory,
                                       tmp_path_factory):
    """Crash MID-ENCODE (some part-N.parquet written, some not): the
    re-run must keep the finished partition files untouched (mtime
    unchanged) and encode only the missing ones — resume at partition,
    not stage, granularity."""
    from semantic_pdf_search_engine_ray.config import EngineConfig
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )

    base = tmp_path_factory.mktemp("presume")
    idx = str(base / "idx")
    cfg = EngineConfig()
    build_index_from_docs(docs_ds_factory(), idx, cfg,
                          input_lineage={"t": "presume"})
    want = _decoded_postings(idx)

    import json as _json

    post_dir = os.path.join(idx, "postings")
    files = sorted(f for f in os.listdir(post_dir) if f.startswith("part-"))
    assert len(files) > 4
    # simulate the crash: stage not committed, half the partitions
    # missing, the in-progress marker (same fingerprint) still on disk
    stage_fp = _json.load(
        open(os.path.join(idx, "_STAGE_postings.json"))
    )["fingerprint"]
    with open(os.path.join(idx, "_PARTIAL_postings.json"), "w") as f:
        _json.dump({"fingerprint": stage_fp}, f)
    os.remove(os.path.join(idx, "_STAGE_postings.json"))
    os.remove(os.path.join(idx, "manifest.json"))
    import shutil

    shutil.rmtree(os.path.join(idx, "dictionary"), ignore_errors=True)
    os.remove(os.path.join(idx, "_STAGE_dictionary.json"))
    kept = files[: len(files) // 2]
    removed = files[len(files) // 2:]
    for f in removed:
        os.remove(os.path.join(post_dir, f))
    mtimes = {f: os.path.getmtime(os.path.join(post_dir, f)) for f in kept}

    build_index_from_docs(docs_ds_factory(), idx, cfg,
                          input_lineage={"t": "presume"})
    entry = _json.load(open(os.path.join(idx, "_STAGE_postings.json")))
    met = entry["metrics"]
    assert met["partitions_resumed"] == len(kept), met
    assert met["partitions_encoded"] == len(removed), met
    for f in kept:
        assert os.path.getmtime(os.path.join(post_dir, f)) == mtimes[f], (
            f"finished partition {f} was rewritten"
        )
    assert _decoded_postings(idx) == want


def test_assign_doc_ids_url_run_spanning_many_blocks(ray_session):
    """A url duplicated across MORE whole blocks than one must still get
    exactly one kept row (max warc_ts) and collision-free ranks —
    regression for the block-meta key that once used urls only."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import assign_doc_ids

    base = dt.datetime(2026, 1, 1)
    urls, tss, texts = [], [], []
    for i in range(150):  # one url, 150 copies with distinct ts
        urls.append("https://dup.test/x")
        tss.append(base + dt.timedelta(seconds=i))
        texts.append(f"copy {i}")
    for i in range(50):
        urls.append(f"https://site{i:03d}.test/page")
        tss.append(base)
        texts.append(f"unique {i}")
    tbl = pa.table({
        "url": pa.array(urls),
        "warc_ts": pa.array(tss, type=pa.timestamp("us")),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 200),
    })
    ds = rd.from_arrow(tbl).repartition(10)
    out = assign_doc_ids(ds).to_pandas().sort_values("doc_id")
    assert len(out) == 51
    assert list(out["doc_id"]) == list(range(51))
    kept_dup = out[out["url"] == "https://dup.test/x"]
    assert len(kept_dup) == 1
    assert kept_dup.iloc[0]["text"] == "copy 149"  # max warc_ts wins
    assert list(out["url"]) == sorted(out["url"])  # rank == sorted url


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


def test_empty_and_tokenless_corpus_builds_valid_index(
    ray_session, tmp_path_factory
):
    """A corpus with zero analyzer tokens (or zero rows) must commit a
    READABLE empty index, not crash mid-build (committed == readable)."""
    import pyarrow as pa
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    base = tmp_path_factory.mktemp("empty")
    # token-less: punctuation-only text yields no [a-z0-9] runs
    tokenless = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["!!! ???", "... ---"]),
    }))
    idx = str(base / "tokenless")
    m = build_index_from_docs(tokenless, idx, input_lineage={"t": "tl"})
    assert m["n_docs"] == 2 and m["total_tokens"] == 0
    r = IndexReader(idx)
    assert r.top_k_auto("anything", 5) == []
    assert r.top_k_wand("anything", 5) == []
