"""Doc-range-sharded layout: bit-identical to the monolithic index."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def both_indexes(ray_session, tmp_path_factory):
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )
    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        build_sharded_index,
    )

    base = tmp_path_factory.mktemp("shards")

    def docs():
        return rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])

    mono = str(base / "mono")
    build_index_from_docs(docs(), mono, input_lineage={"t": "mono"})
    root = str(base / "sharded")
    m = build_sharded_index(docs(), root, n_shards=4,
                            input_lineage={"t": "sharded"})
    return mono, root, m


def test_sharded_global_stats_match_mono(both_indexes):
    from semantic_pdf_search_engine_ray.state import manifest as mf

    mono, root, m = both_indexes
    mm = mf.load_manifest(mono)
    assert m["n_docs"] == mm["n_docs"]
    assert m["avgdl"] == mm["avgdl"]
    assert m["total_tokens"] == mm["total_tokens"]


def test_sharded_topk_bit_identical_to_mono(both_indexes):
    from semantic_pdf_search_engine_ray.pipelines.sharding import ShardedReader
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    mono, root, _ = both_indexes
    single = IndexReader(mono)
    sharded = ShardedReader(root)
    queries = sorted(single.df, key=lambda t: (-single.df[t], t))[:8]
    queries += [f"{queries[0]} {queries[3]}", f"{queries[1]} {queries[2]}",
                "zzznotaterm", ""]
    for q in queries:
        a = single.top_k_auto(q, 5)
        b = sharded.top_k(q, 5)
        assert a == b, f"shard merge mismatch on {q!r}: {a} vs {b}"


def test_sharded_wand_rare_term_absent_from_shard(
    ray_session, tmp_path_factory
):
    """A selective term (global df small -> WAND path) present in only
    ONE shard must not crash readers of the other shards — regression
    for the KeyError under the global-df override."""
    import pyarrow as pa
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        ShardedReader,
        build_sharded_index,
    )

    texts = [f"common words filler doc number {i}" for i in range(200)]
    texts[0] = "zzzunique " + texts[0]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(200), type=pa.int64()),
        "text": pa.array(texts),
    })).repartition(4)
    root = str(tmp_path_factory.mktemp("rare") / "root")
    build_sharded_index(docs, root, n_shards=2, input_lineage={"t": "rare"})
    reader = ShardedReader(root)
    hits = reader.top_k("zzzunique", 5)
    assert hits and hits[0][0] == 0


def test_stale_shard_rebuilds_on_lineage_change(ray_session, tmp_path_factory):
    """Changing the input docs at the same root must rebuild shards, not
    silently reuse committed-but-stale shard manifests."""
    import pyarrow as pa
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        ShardedReader,
        build_sharded_index,
    )

    root = str(tmp_path_factory.mktemp("stale") / "root")

    def make(marker: str):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(40), type=pa.int64()),
            "text": pa.array([f"{marker} doc {i}" for i in range(40)]),
        }))

    build_sharded_index(make("alpha"), root, n_shards=2,
                        input_lineage={"v": 1})
    assert ShardedReader(root).top_k("alpha", 1)
    build_sharded_index(make("beta"), root, n_shards=2,
                        input_lineage={"v": 2})
    r = ShardedReader(root)
    assert r.top_k("beta", 1), "new corpus must be queryable"
    assert not r.top_k("alpha", 1), "old corpus must be gone"


def test_shard_count_and_ranges(both_indexes):
    import os

    import pyarrow.parquet as pq

    _, root, m = both_indexes
    assert m["n_shards"] == 4
    seen = set()
    for name in m["shards"]:
        tbl = pq.read_table(os.path.join(root, name, "docs"),
                            columns=["doc_id"])
        ids = set(tbl.column("doc_id").to_pylist())
        assert not (ids & seen), "shards must partition the doc space"
        seen |= ids
    assert len(seen) == m["n_docs"]


def test_engine_facade_roundtrip(ray_session, tmp_path_factory):
    import ray.data as rd

    from semantic_pdf_search_engine_ray.engine import Engine

    idx = str(tmp_path_factory.mktemp("facade") / "idx")
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    eng = Engine.build_from_docs(docs, idx, input_lineage={"t": "facade"})
    assert eng.manifest["n_docs"] > 0
    hits = eng.search("table scan", k=3)
    assert len(hits) == 3
    import pyarrow as pa

    qt = pa.table({"query_id": pa.array([0], type=pa.int64()),
                   "query": pa.array(["table scan"])})
    batch = eng.search_batch(qt, k=3).to_pandas()
    assert list(batch["doc_id"]) == [d for d, _ in hits]
    # open() on the committed dir works; a bogus dir raises
    assert Engine.open(idx).search("table", k=1)
    import pytest as _pt

    with _pt.raises(ValueError):
        Engine.open(str(tmp_path_factory.mktemp("facade") / "nope"))


def test_phrase_index_adjacency(ray_session, tmp_path_factory):
    """Positional index resolves exact adjacency, not bag-of-words."""
    import pyarrow as pa
    import ray.data as rd

    from semantic_pdf_search_engine_ray.stages.positions import (
        PositionsReader,
        build_positions,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "fast cat runs",                 # phrase "fast cat" x1
            "cat fast cat fast cat",         # "fast cat" x2 (not 3!)
            "fast dog and a cat elsewhere",  # words present, not adjacent
        ]),
    }))
    out = str(tmp_path_factory.mktemp("pos") / "pos")
    build_positions(docs, out, input_lineage={"t": "phrase"})
    r = PositionsReader(out)
    assert r.phrase_top_k("fast cat", 5) == [(1, 2), (0, 1)]
    assert r.phrase_top_k("cat fast", 5) == [(1, 2)]
    assert r.phrase_top_k("dog cat", 5) == []
    assert r.phrase_top_k("missingterm cat", 5) == []
    assert r.phrase_top_k("", 5) == []
    # single-token phrase degenerates to term tf ranking
    assert r.phrase_top_k("cat", 5) == [(1, 3), (0, 1), (2, 1)]


def test_incremental_add_documents_matches_pinned_monolithic(
    ray_session, tmp_path_factory
):
    """Upload-analog: base corpus -> sharded root; add_documents ingests
    the rest as a new shard. Scoring must equal a monolithic index over
    the FULL corpus built with the same pinned avgdl (df/N update with
    ingest; length normalization is frozen at root creation)."""
    import pyarrow as pa
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )
    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        ShardedReader,
        add_documents,
        build_sharded_index,
    )
    from semantic_pdf_search_engine_ray.stages.query import IndexReader
    from semantic_pdf_search_engine_ray.state import manifest as mf

    def subset(lo, hi):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            mask = pa.compute.and_(
                pa.compute.greater_equal(ids, lo), pa.compute.less(ids, hi)
            )
            return batch.filter(mask)

        return rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"]).map_batches(
            f, batch_format="pyarrow")

    base = tmp_path_factory.mktemp("incr")
    root = str(base / "root")
    m0 = build_sharded_index(subset(0, 300), root, n_shards=2,
                             input_lineage={"t": "incr-base"})
    pin = m0["avgdl_pinned"]
    m1 = add_documents(root, subset(300, 10_000),
                       input_lineage={"t": "incr-add"})
    assert m1["n_docs"] == 500
    assert m1["avgdl"] == pin and m1["true_avgdl"] != pin

    mono = str(base / "mono")
    build_index_from_docs(subset(0, 10_000), mono,
                          input_lineage={"t": "incr-mono"},
                          avgdl_override=pin)
    single = IndexReader(mono)
    grown = ShardedReader(root)
    queries = sorted(single.df, key=lambda t: (-single.df[t], t))[:6]
    queries.append(f"{queries[0]} {queries[2]}")
    for q in queries:
        assert single.top_k_auto(q, 5) == grown.top_k(q, 5), q


def test_proximity_slop_semantics(ray_session, tmp_path_factory):
    import pyarrow as pa
    import ray.data as rd

    from semantic_pdf_search_engine_ray.stages.positions import (
        PositionsReader,
        build_positions,
    )

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "alpha beta",              # gap 1 (adjacent)
            "alpha x y beta",          # gap 3
            "beta alpha",              # wrong order
        ]),
    }))
    out = str(tmp_path_factory.mktemp("prox") / "pos")
    build_positions(docs, out, input_lineage={"t": "prox"})
    r = PositionsReader(out)
    assert r.proximity_top_k("alpha", "beta", 0, 5) == [(0, 1)]
    assert r.proximity_top_k("alpha", "beta", 2, 5) == [(0, 1), (1, 1)]
    assert r.proximity_top_k("alpha", "missing", 2, 5) == []


def test_shard_owning_actor_tier_matches_mono(both_indexes):
    """The EXECUTED multi-node query shape: owner actor i loads only
    shards i mod P; every query visits every owner; driver k-way merge.
    Must be bit-identical to the monolithic reader at every owner count
    (1 = one node owns all, 3 = uneven split across 4 shards)."""
    import pyarrow as pa

    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        run_sharded_queries_owned,
    )
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    mono, root, _m = both_indexes
    reader = IndexReader(mono)
    qtexts = sorted(reader.df, key=lambda t: (-reader.df[t], t))[:6]
    qtexts.append(f"{qtexts[0]} {qtexts[1]}")
    queries = pa.table({
        "query_id": pa.array(range(len(qtexts)), type=pa.int64()),
        "query": pa.array(qtexts),
    })
    want = {}
    for qid, q in enumerate(qtexts):
        want[qid] = reader.top_k_auto(q, 5)
    for n_owners in (1, 3):
        got = run_sharded_queries_owned(root, queries, k=5,
                                        n_owners=n_owners)
        by_q: dict[int, list] = {}
        for qid, doc, score in zip(got.column("query_id").to_pylist(),
                                   got.column("doc_id").to_pylist(),
                                   got.column("score").to_pylist()):
            by_q.setdefault(qid, []).append((doc, score))
        for qid in want:
            assert by_q.get(qid, []) == want[qid], (n_owners, qid)


def test_compaction_preserves_results_bit_identically(
    ray_session, tmp_path_factory
):
    """LSM-style shard compaction: grow a root via two uploads (4 shards
    total), compact to 2 — query results must stay bit-identical and the
    corpus counts unchanged; merged shard dirs are removed."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        ShardedReader,
        add_documents,
        build_sharded_index,
        compact_shards,
    )
    from semantic_pdf_search_engine_ray.state import manifest as mf

    def subset(lo, hi):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            mask = pa.compute.and_(
                pa.compute.greater_equal(ids, lo), pa.compute.less(ids, hi)
            )
            return batch.filter(mask)

        return rd.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"]).map_batches(
            f, batch_format="pyarrow")

    root = str(tmp_path_factory.mktemp("compact") / "root")
    build_sharded_index(subset(0, 250), root, n_shards=2,
                        input_lineage={"t": "cmp-base"})
    add_documents(root, subset(250, 380), input_lineage={"t": "cmp-a"})
    add_documents(root, subset(380, 10_000), input_lineage={"t": "cmp-b"})
    m0 = mf.load_manifest(root)
    assert m0["n_shards"] == 4

    before = ShardedReader(root)
    queries = sorted(before.readers[0].df,
                     key=lambda t: (-before.readers[0].df[t], t))[:6]
    want = {q: before.top_k(q, 5) for q in queries}

    m1 = compact_shards(root, target_shards=2)
    assert m1["n_shards"] == 2
    assert m1["n_docs"] == m0["n_docs"]
    assert m1["total_tokens"] == m0["total_tokens"]
    assert m1["avgdl"] == m0["avgdl_pinned"]
    # merged dirs are gone; survivors + the new shard remain
    on_disk = {d for d in os.listdir(root) if d.startswith("shard_")}
    assert on_disk == set(m1["shards"])

    after = ShardedReader(root)
    for q in queries:
        assert after.top_k(q, 5) == want[q], q
    # idempotent no-op below target
    assert compact_shards(root, target_shards=2)["n_shards"] == 2


def test_sharded_prefix_bit_identical_to_mono(both_indexes):
    """Wildcard (prefix*) over the sharded tier: expansion uses the
    GLOBAL dictionary on every shard, so results must equal the
    monolithic reader's prefix query exactly."""
    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        ShardedReader,
    )
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    mono, root, _ = both_indexes
    single = IndexReader(mono)
    sharded = ShardedReader(root)
    head = sorted(single.df, key=lambda t: (-single.df[t], t))[:6]
    prefixes = sorted({t[:3] for t in head}) + ["zzz", ""]
    for p in prefixes:
        a = single.top_k_prefix(p, 5)
        b = sharded.top_k_prefix(p, 5)
        assert a == b, f"prefix merge mismatch on {p!r}: {a} vs {b}"
        if p and p not in ("zzz",):
            assert a, f"head-term prefix {p!r} should match docs"
    # the expansion set itself is the contract: global on every shard
    assert (sharded.readers[0].expand_prefix(prefixes[0])
            == single.expand_prefix(prefixes[0]))


def test_persistent_owned_tier_streams_batches(both_indexes):
    """VERDICT r2 next #8: owners stay alive across calls — repeated
    query() calls and query_stream() over batch iterators both produce
    results bit-identical to the one-shot path, with no per-call actor
    startup."""
    import pyarrow as pa

    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        OwnedQueryTier,
        run_sharded_queries_owned,
    )
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    mono, root, _m = both_indexes
    reader = IndexReader(mono)
    qtexts = sorted(reader.df, key=lambda t: (-reader.df[t], t))[:6]
    batches = []
    for off in (0, 3):
        sub = qtexts[off:off + 3]
        batches.append(pa.table({
            "query_id": pa.array(range(off, off + len(sub)),
                                 type=pa.int64()),
            "query": pa.array(sub),
        }))

    with OwnedQueryTier(root, n_owners=3) as tier:
        per_call = [tier.query(b, k=5) for b in batches]  # warm reuse
        streamed = list(tier.query_stream(iter(batches), k=5))
        owner_ids = [id(o) for o in tier.owners]
    assert len(streamed) == len(batches)
    for got_list in (per_call, streamed):
        for b, got in zip(batches, got_list):
            want = run_sharded_queries_owned(root, b, k=5, n_owners=2)
            assert got.sort_by([("query_id", "ascending"),
                                ("rank", "ascending")]).equals(
                want.sort_by([("query_id", "ascending"),
                              ("rank", "ascending")]))
    assert len(owner_ids) == 3


def test_upsert_replaces_url_version(ray_session, tmp_path):
    """URL-keyed upsert: the old doc for a re-uploaded url stops
    ranking immediately (tombstoned in its shard), the new version
    serves, and untouched urls keep their exact scores."""
    import pyarrow as pa

    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        ShardedReader,
        build_sharded_index,
        upsert_documents,
    )

    root = str(tmp_path / "root")
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "url": pa.array(["u://a", "u://b", "u://c", "u://d"]),
        "text": pa.array([
            "oldmarker alpha beta", "stable gamma delta",
            "stable epsilon zeta", "oldmarker eta theta",
        ]),
    }))
    build_sharded_index(docs, root, n_shards=2,
                        input_lineage={"t": "upsert"})
    r0 = ShardedReader(root)
    before_stable = r0.top_k("stable", 5)
    assert {d for d, _ in r0.top_k("oldmarker", 5)} == {0, 3}

    out = upsert_documents(root, rd.from_arrow(pa.table({
        "doc_id": pa.array([10], type=pa.int64()),
        "url": pa.array(["u://a"]),
        "text": pa.array(["newmarker alpha beta"]),
    })), input_lineage={"t": "upsert2"})
    assert out["upsert_tombstoned"] == 1

    r1 = ShardedReader(root)
    hits = {d for d, _ in r1.top_k("oldmarker", 5)}
    assert 0 not in hits and 3 in hits        # only u://a's old doc gone
    assert {d for d, _ in r1.top_k("newmarker", 5)} == {10}
    # untouched urls keep ranking (scores shift with N, which grows
    # with ingest by contract -- df/N update, avgdl stays pinned)
    assert [d for d, _ in r1.top_k("stable", 5)] == \
        [d for d, _ in before_stable]


def test_composed_serving_tier_bit_identical_to_mono(
    ray_session, tmp_path_factory
):
    """The realistic serving configuration — facet-FILTERED,
    TOMBSTONE-masked, static-rank-BLENDED — composed through the
    persistent owner tier is bit-identical (doc_id AND score) to the
    same composition on a monolithic IndexReader.  This is the query
    the 256-node story actually serves, so the whole chain is pinned:
    per-owner mask/prior resolution, tombstone AND, blended tie-break,
    k-way owner merge."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )
    from semantic_pdf_search_engine_ray.pipelines.delete import (
        delete_documents,
    )
    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        OwnedQueryTier,
        build_sharded_index,
    )
    from semantic_pdf_search_engine_ray.stages.query import IndexReader
    from semantic_pdf_search_engine_ray.state import manifest as mf

    base = tmp_path_factory.mktemp("serving")
    n = 400
    rng = np.random.RandomState(7)
    langs = np.array(["en", "de", "fr"])[rng.randint(0, 3, n)]
    words = ["alpha", "beta", "gamma", "delta", "shared", "rare"]
    texts = [
        " ".join(words[rng.randint(0, len(words))] for _ in range(12))
        for _ in range(n)
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs.tolist()),
    })

    mono = str(base / "mono")
    build_index_from_docs(rd.from_arrow(tbl), mono,
                          input_lineage={"t": "serv-mono"})
    root = str(base / "sharded")
    m = build_sharded_index(rd.from_arrow(tbl), root, n_shards=4,
                            input_lineage={"t": "serv-shard"})

    # synthetic deterministic rank store (doc_id, rank_micro)
    rank_dir = str(base / "rank")
    import os
    os.makedirs(rank_dir)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "rank_micro": pa.array([(i * 37) % 5000 + 100 for i in range(n)],
                               type=pa.int64()),
    }), os.path.join(rank_dir, "part-0.parquet"))

    # tombstone the same ids everywhere (per-shard readers load their
    # own dir; out-of-range ids are ignored by the mask)
    dead = [5, 17, 123, 250, 399]
    delete_documents(mono, dead)
    for name in m["shards"]:
        delete_documents(os.path.join(root, name), dead)

    # monolithic reference: same composition, resolved globally
    reader = IndexReader(mono)
    size = len(reader.doc_len)
    allowed = np.zeros(size, dtype=bool)
    allowed[:n] = langs == "en"
    rt = pq.read_table(rank_dir)
    prior = np.zeros(size, dtype=np.float64)
    prior[rt.column("doc_id").to_numpy()] = 0.1 * np.log(
        rt.column("rank_micro").to_numpy().astype(np.float64))

    queries = ["shared", "alpha beta", "rare", "gamma delta shared",
               "zzznotaterm"]
    qtbl = pa.table({
        "query_id": pa.array(range(len(queries)), type=pa.int64()),
        "query": pa.array(queries),
    })

    serving = {"filter_col": "lang", "filter_values": {"en"},
               "rank_dir": rank_dir, "rank_weight": 0.1}
    with OwnedQueryTier(root, n_owners=3, serving=serving) as tier:
        got = tier.query(qtbl, k=5)
        streamed = pa.concat_tables(list(tier.query_stream([qtbl], k=5)))
    assert got.equals(streamed)

    by_q = {}
    for qid, doc, score in zip(got.column("query_id").to_pylist(),
                               got.column("doc_id").to_pylist(),
                               got.column("score").to_pylist()):
        by_q.setdefault(qid, []).append((doc, score))
    for qid, q in enumerate(queries):
        want = reader.top_k_blended(q, 5, prior, allowed=allowed)
        assert by_q.get(qid, []) == want, (
            f"composed serving mismatch on {q!r}")
    # deleted + filtered docs never surface
    surfaced = {d for d, _ in sum(by_q.values(), [])}
    assert not surfaced & set(dead)
    assert all(langs[d] == "en" for d in surfaced)
