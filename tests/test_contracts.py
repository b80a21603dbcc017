"""Contract and error-path tests: the guard rails added in round 2 must
actually refuse what they claim to refuse, and committed artifacts must
be idempotent no-ops on re-entry."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_simhash_rejects_radius_beyond_pigeonhole(ray_session):
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.dedup import simhash_pairs

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([0], type=pa.int64()),
                                   "text": pa.array(["hello world"])}))
    with pytest.raises(ValueError, match="6-choose-3"):
        simhash_pairs(docs, max_hamming=4)


def test_sample_rate_bounds(ray_session):
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                                   "lang": pa.array(["en"])}))
    with pytest.raises(ValueError):
        deterministic_sample(docs, rate_pct=101)
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": -1})


def test_compact_rejects_bad_target(ray_session, tmp_path):
    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        compact_shards,
    )

    with pytest.raises((ValueError, OSError)):
        compact_shards(str(tmp_path / "nope"), target_shards=1)


def test_engine_build_from_docs_guards_stale_resume(ray_session, tmp_path):
    """The ADVICE-r1 medium fix: rebuilding into a committed index_dir
    without lineage must refuse instead of silently resuming stale data;
    overwrite=True rebuilds."""
    import ray.data as rd

    from semantic_pdf_search_engine_ray.engine import Engine

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    idx = str(tmp_path / "idx")
    eng = Engine.build_from_docs(docs, idx, input_lineage={"v": 1})
    assert eng.manifest["n_docs"] > 0
    with pytest.raises(ValueError, match="input_lineage"):
        Engine.build_from_docs(docs, idx)  # committed + no lineage
    # explicit overwrite is allowed and rebuilds from scratch
    eng2 = Engine.build_from_docs(docs, idx, overwrite=True)
    assert eng2.manifest["n_docs"] == eng.manifest["n_docs"]


def test_ivf_build_is_idempotent(ray_session, tmp_path):
    import os

    from semantic_pdf_search_engine_ray.pipelines.similarity import (
        build_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    m1 = build_ivf_index(f"{SF}/embeddings.parquet", idx, n_cells=4)
    stamp = os.path.getmtime(os.path.join(idx, "manifest.json"))
    m2 = build_ivf_index(f"{SF}/embeddings.parquet", idx, n_cells=4)
    assert m2["n_vectors"] == m1["n_vectors"]
    assert os.path.getmtime(os.path.join(idx, "manifest.json")) == stamp


def test_serve_rejects_bad_requests(ray_session, tmp_path_factory):
    """HTTP contract: bad k -> 400, unknown path -> 404, upload against a
    monolithic (non-sharded) index -> 409, unknown ingest id -> 404."""
    import os
    import socket
    import subprocess
    import sys
    import time

    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx = str(tmp_path_factory.mktemp("servectl") / "idx")
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    build_index_from_docs(docs, idx, input_lineage={"t": "servectl"})

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "-m", "semantic_pdf_search_engine_ray.cli",
         "serve", "--index", idx, "--port", str(port)],
        cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    base = f"http://127.0.0.1:{port}"

    def code_of(url, data=None):
        req = urllib.request.Request(
            url, data=json.dumps(data).encode() if data else None,
            headers={"Content-Type": "application/json"} if data else {},
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code

    try:
        for _ in range(100):
            try:
                assert code_of(f"{base}/api/ready") == 200
                break
            except (urllib.error.URLError, ConnectionError):
                time.sleep(0.2)
        else:
            raise AssertionError("serve did not come up")
        assert code_of(f"{base}/api/search?q=data&k=zero") == 400
        assert code_of(f"{base}/api/search?q=data&k=9999") == 400
        assert code_of(f"{base}/nope") == 404
        assert code_of(f"{base}/api/ready?id=deadbeef") == 404
        assert code_of(f"{base}/upload",
                       data={"docs": [{"text": "x"}]}) == 409  # monolithic
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_trigram_substring_index_contract(ray_session, tmp_path):
    """Trigram substring index: exact `pattern in text` semantics,
    case-sensitive, candidates always a superset of verified matches,
    short patterns rejected."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from semantic_pdf_search_engine_ray.pipelines.substring import (
        TrigramReader,
        build_trigram_index,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "the Quick brown fox", "quick brown foxes run",
            "nothing to see here", "QUICK BROWN",
        ]),
    })
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)
    idx = str(tmp_path / "tri")
    build_trigram_index(path, idx, input_lineage={"t": "tri-test"})
    r = TrigramReader(idx)

    assert r.search("quick brown") == [1]        # case-sensitive
    assert r.search("Quick brown") == [0]
    assert r.search("brown fox") == [0, 1]
    assert r.search("zzz") == []
    with _pytest.raises(ValueError):
        r.search("ab")
    # candidates are a superset of true matches
    cand = set(r.candidates("brown fox").tolist())
    assert {0, 1} <= cand
    # rebuild is a no-op (manifest committed)
    build_trigram_index(path, idx, input_lineage={"t": "tri-test"})
    assert TrigramReader(idx).search("brown fox") == [0, 1]


def test_regex_planner_contract(ray_session, tmp_path):
    """Regex-over-trigram planner: alternation ORs, literal runs AND,
    min>=1 repeats keep their first copy in the run, unconstrained
    patterns are refused, verification is exact re.search."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from semantic_pdf_search_engine_ray.pipelines.substring import (
        TrigramReader,
        build_trigram_index,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "hash join fast", "merge join slow", "nested loop join",
            "window scan table", "window table scan",
        ]),
    })
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)
    idx = str(tmp_path / "tri")
    build_trigram_index(path, idx, input_lineage={"t": "rx"})
    r = TrigramReader(idx)

    assert r.regex_search("hash join|merge join") == [0, 1]
    assert r.regex_search("(hash|merge) join") == [0, 1]
    assert r.regex_search("window [a-z]+ scan") == [4]
    assert r.regex_search("joi+n") == [0, 1, 2]
    assert r.regex_search("^hash") == [0]
    assert r.regex_search("windows? scan") == [3]
    assert r.regex_search("hash.*fast") == [0]
    with _pytest.raises(ValueError):
        r.regex_search("[a-z]+")  # no required literal -> refused
    # planner candidates are always a superset of true matches
    cand = set(r.regex_candidates("window [a-z]+ scan").tolist())
    assert {3, 4} <= cand  # both contain 'window' and ' scan'


def test_sharded_trigram_matches_monolithic(ray_session, tmp_path):
    """Sharded trigram layout: union-of-shards answers are identical to
    the monolithic reader for both substring and regex queries."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_pdf_search_engine_ray.pipelines.substring import (
        ShardedTrigramReader,
        TrigramReader,
        build_sharded_trigram_index,
        build_trigram_index,
    )

    docs = pa.table({
        "doc_id": pa.array(list(range(12)), type=pa.int64()),
        "text": pa.array([
            f"doc {i} shared boilerplate phrase alpha{i % 3}"
            for i in range(12)
        ]),
    })
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)
    mono = str(tmp_path / "mono")
    build_trigram_index(path, mono, input_lineage={"t": "m"})
    root = str(tmp_path / "root")
    m = build_sharded_trigram_index(path, root, n_shards=3,
                                    input_lineage={"t": "s"})
    assert m["n_shards"] == 3
    rm = TrigramReader(mono)
    rs = ShardedTrigramReader(root)
    for pat in ("boilerplate phrase", "alpha1", "doc 7", "zzz-none"):
        assert rs.search(pat) == rm.search(pat), pat
    for rx in ("alpha(0|2)", "doc [0-9]+ shared"):
        assert rs.regex_search(rx) == rm.regex_search(rx), rx
    # every doc landed in exactly one shard
    assert sum(len(r.search("boilerplate")) for r in rs.readers) == 12
