"""CLI surface: build-docs -> query / repl / serve round-trip.

Runs the CLI as subprocesses against a tiny committed index (built once
by the session Ray fixture — the subprocess query paths need no Ray)."""

from __future__ import annotations

import json
import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cli_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )

    idx = str(tmp_path_factory.mktemp("cli") / "idx")
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    build_index_from_docs(docs, idx, input_lineage={"t": "cli"})
    return idx


def _run(args: list[str], stdin: str | None = None) -> str:
    p = subprocess.run(
        [sys.executable, "-m", "semantic_pdf_search_engine_ray.cli", *args],
        capture_output=True, text=True, cwd=REPO, input=stdin, timeout=120,
    )
    assert p.returncode == 0, p.stderr
    return p.stdout


def test_cli_query_topk(cli_index):
    out = _run(["query", "--index", cli_index, "--query", "table scan",
                "-k", "3"])
    rows = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert len(rows) == 3
    assert rows[0]["rank"] == 1
    assert rows[0]["score"] >= rows[1]["score"] >= rows[2]["score"]


def test_cli_query_conjunctive_subset(cli_index):
    dis = _run(["query", "--index", cli_index, "--query", "table scan",
                "-k", "100", "--method", "exhaustive"])
    con = _run(["query", "--index", cli_index, "--query", "table scan",
                "-k", "100", "--method", "conjunctive"])
    dis_ids = {json.loads(l)["doc_id"] for l in dis.splitlines()}
    con_ids = {json.loads(l)["doc_id"] for l in con.splitlines()}
    assert con_ids <= dis_ids


def test_cli_repl_loop(cli_index):
    out = _run(["repl", "--index", cli_index, "-k", "2"],
               stdin="search table scan\nquit\n")
    rows = [json.loads(l) for l in out.splitlines() if l.startswith('{"rank"')]
    assert len(rows) == 2


def test_cli_zero_hit_query(cli_index):
    out = _run(["query", "--index", cli_index, "--query",
                "zzzznotaword", "-k", "5"])
    assert not [l for l in out.splitlines() if l.startswith("{")]


@pytest.fixture(scope="module")
def sharded_root(ray_session, tmp_path_factory):
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        build_sharded_index,
    )

    root = str(tmp_path_factory.mktemp("cli") / "sharded")
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    build_sharded_index(docs, root, n_shards=2,
                        input_lineage={"t": "cli-serve"})
    return root


def _http_json(url, data=None, timeout=10):
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(data).encode() if data is not None else None,
        headers={"Content-Type": "application/json"} if data else {},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def test_serve_upload_ready_search_roundtrip(sharded_root):
    """Reference app parity (S7): POST /upload -> async index -> per-id
    /api/ready flips -> /api/search returns the NEW doc with url, snippet
    text and highlight spans (upload.rs:20-76, ready.rs:13-23,
    search.rs:97-184)."""
    import socket
    import time
    import urllib.error

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # serve owns its own local Ray on upload
    proc = subprocess.Popen(
        [sys.executable, "-m", "semantic_pdf_search_engine_ray.cli",
         "serve", "--index", sharded_root, "--port", str(port)],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        for _ in range(100):  # wait for the server socket
            try:
                assert _http_json(f"{base}/api/ready")["ready"] is True
                break
            except (urllib.error.URLError, ConnectionError):
                time.sleep(0.2)
        else:
            raise AssertionError("serve did not come up")

        # enriched search over the existing corpus
        hits = _http_json(f"{base}/api/search?q=table%20scan&k=3")
        assert len(hits) == 3
        assert {"rank", "doc_id", "score", "url", "text", "highlights"} <= set(hits[0])

        # facets sidebar: per-lang counts over the full match set,
        # exact against a direct pass over the corpus
        facets = _http_json(f"{base}/api/facets?q=table%20scan")
        assert facets and all(f["n_docs"] > 0 for f in facets)
        import pyarrow.parquet as pq

        from semantic_pdf_search_engine_ray.functions.tokenize import (
            query_terms,
            tokenize,
        )

        terms = set(query_terms("table scan"))
        tbl = pq.read_table(f"{SF}/documents.parquet",
                            columns=["text", "lang"])
        want: dict[str, int] = {}
        for text, lang in zip(tbl.column("text").to_pylist(),
                              tbl.column("lang").to_pylist()):
            if terms & set(tokenize(text)):
                want[lang] = want.get(lang, 0) + 1
        assert {f["facet"]: f["n_docs"] for f in facets} == want

        marker = "xanthozephyr quasar lattice"
        marker_doc_text = (f"a fresh document about the {marker} "
                           "phenomenon observed in distributed engines")
        up = _http_json(f"{base}/upload", data={
            "docs": [{"url": "upload://t1", "text": marker_doc_text}]
        })
        assert up["doc_ids"], up
        for _ in range(300):  # async index: Ray startup + shard build
            st = _http_json(f"{base}/api/ready?id={up['id']}")
            assert not str(st["status"]).startswith("error"), st
            if st["ready"]:
                break
            time.sleep(1)
        else:
            raise AssertionError("ingest never became ready")

        res = _http_json(f"{base}/api/search?q=xanthozephyr%20quasar&k=3")
        assert res and res[0]["doc_id"] == up["doc_ids"][0]
        assert res[0]["url"] == "upload://t1"
        assert marker.split()[0] in res[0]["text"]

        # stored-document viewer (repl.rs:285-290): GET /api/doc serves
        # the doc-store row the hit points at — full text, not a snippet
        doc = _http_json(f"{base}/api/doc?id={res[0]['doc_id']}")
        assert doc["doc_id"] == up["doc_ids"][0]
        assert doc["url"] == "upload://t1"
        assert doc["text"] == marker_doc_text
        assert doc["n_chars"] == len(marker_doc_text)
        import urllib.error as _ue
        try:
            _http_json(f"{base}/api/doc?id=999999")
            raise AssertionError("expected 404")
        except _ue.HTTPError as e:
            assert e.code == 404
        try:
            _http_json(f"{base}/api/doc?id=notanint")
            raise AssertionError("expected 400")
        except _ue.HTTPError as e:
            assert e.code == 400
        assert res[0]["highlights"] and all(
            h["end"] > h["start"] for h in res[0]["highlights"])

        # render-ready page rects derive from the SAME spans via the
        # shared grid geometry (reference PageHighlight shape)
        from semantic_pdf_search_engine_ray.functions.geometry import (
            merge_span_rects,
        )
        ph = res[0]["page_highlights"]
        assert ph, "expected page_highlights alongside spans"
        got = [(pg["page"], r["x"], r["y"], r["width"], r["height"])
               for pg in ph for r in pg["rects"]]
        # recompute from the served span offsets against the uploaded text
        want = []
        for h in res[0]["highlights"]:
            want.extend(merge_span_rects(
                marker_doc_text, h["start"], h["end"]))
        assert sorted(got) == sorted(want)

        # wildcard search routes through the sharded prefix tier
        wild = _http_json(f"{base}/api/search?q=xanthozeph*&k=3")
        assert wild and wild[0]["doc_id"] == up["doc_ids"][0]

        # did-you-mean: dropped-letter typo resolves to the real term
        sug = _http_json(f"{base}/api/suggest?q=xanthozephr")
        assert sug and sug[0]["term"] == "xanthozephyr"
        assert sug[0]["distance"] == 1 and sug[0]["rank"] == 1
        assert _http_json(f"{base}/api/suggest?q=") == []

        # more-like-this: excludes the source, 404 on unknown doc
        more = _http_json(f"{base}/api/more?doc=0&k=3")
        assert more and all(h["doc_id"] != 0 for h in more)
        import urllib.error as ue
        try:
            _http_json(f"{base}/api/more?doc=999999&k=3")
            raise AssertionError("expected 404")
        except ue.HTTPError as e:
            assert e.code == 404
        try:
            _http_json(f"{base}/api/more?doc=0&k=0")
            raise AssertionError("expected 400")
        except ue.HTTPError as e:
            assert e.code == 400
        # analyzer-shared suggest: case/punct input still tokenizes
        sug2 = _http_json(f"{base}/api/suggest?q=XANTHOZEPHR-test")
        assert sug2 and sug2[0]["term"] == "xanthozephyr"

        # RE-upload the same url: upsert semantics — the old version
        # stops serving, the new one ranks (no double-indexing)
        up2 = _http_json(f"{base}/upload", data={
            "docs": [{"url": "upload://t1",
                      "text": "a replacement document about the "
                              "verdigris comet cascade instead"}]
        })
        for _ in range(300):
            st = _http_json(f"{base}/api/ready?id={up2['id']}")
            assert not str(st["status"]).startswith("error"), st
            if st["ready"]:
                break
            time.sleep(1)
        else:
            raise AssertionError("re-upload never became ready")
        old = _http_json(f"{base}/api/search?q=xanthozephyr%20quasar&k=3")
        assert all(h["doc_id"] != up["doc_ids"][0] for h in old)
        new = _http_json(f"{base}/api/search?q=verdigris%20comet&k=3")
        assert new and new[0]["doc_id"] == up2["doc_ids"][0]
        assert new[0]["url"] == "upload://t1"
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_serve_concurrent_uploads_both_land(sharded_root):
    """Race-fix contract: two uploads fired concurrently must BOTH end
    up searchable (the r2 review found the losing shard was silently
    dropped when both ingests computed the same shard id)."""
    import socket
    import time
    import urllib.error

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "semantic_pdf_search_engine_ray.cli",
         "serve", "--index", sharded_root, "--port", str(port)],
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        for _ in range(100):
            try:
                assert _http_json(f"{base}/api/ready")["ready"] is True
                break
            except (urllib.error.URLError, ConnectionError):
                time.sleep(0.2)
        else:
            if proc.poll() is not None:
                raise AssertionError(
                    f"serve exited rc={proc.returncode}: "
                    f"{proc.stderr.read()[-2000:]}"
                )
            raise AssertionError("serve did not come up")

        markers = ("klaxonberry zintharoo", "quovillex dranthopay")
        ups = [
            _http_json(f"{base}/upload", data={
                "docs": [{"url": f"upload://c{i}",
                          "text": f"concurrent ingest number {i} about "
                                  f"the {m} phenomenon in engines"}]})
            for i, m in enumerate(markers)
        ]
        assert ups[0]["doc_ids"] != ups[1]["doc_ids"]  # disjoint ids
        for up in ups:
            for _ in range(300):
                st = _http_json(f"{base}/api/ready?id={up['id']}")
                assert not str(st["status"]).startswith("error"), st
                if st["ready"]:
                    break
                time.sleep(1)
            else:
                raise AssertionError(f"ingest {up['id']} never ready")
        for up, m in zip(ups, markers):
            res = _http_json(f"{base}/api/search?q={m.split()[0]}&k=3")
            assert res and res[0]["doc_id"] == up["doc_ids"][0], m
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_cli_wildcard_query_and_detection(cli_index):
    """`data*` routes to prefix search and must contain every hit of
    the corresponding exact-term query (the expansion is a superset of
    the exact term)."""
    from semantic_pdf_search_engine_ray.cli import _as_prefix_query

    assert _as_prefix_query("data*") == "data"
    assert _as_prefix_query("  Table* ") == "table"
    assert _as_prefix_query("data") is None
    assert _as_prefix_query("two words*") is None
    assert _as_prefix_query("*") is None

    exact = _run(["query", "--index", cli_index, "--query", "table",
                  "-k", "100"])
    wild = _run(["query", "--index", cli_index, "--query", "tab*",
                 "-k", "1000"])
    exact_ids = {json.loads(l)["doc_id"] for l in exact.splitlines()
                 if l.startswith("{")}
    wild_ids = {json.loads(l)["doc_id"] for l in wild.splitlines()
                if l.startswith("{")}
    assert exact_ids and exact_ids <= wild_ids
