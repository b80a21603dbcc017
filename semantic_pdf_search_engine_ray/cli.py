"""CLI entry points — the batch-job surface of the engine (SURVEY.md
§2.9: the analog of the reference's REPL `file`/`search` commands and its
`ray job submit`-able build form).

    python -m semantic_pdf_search_engine_ray.cli build \
        --input <pages parquet|dir> --output <index_dir> [--mode hash_partition]
    python -m semantic_pdf_search_engine_ray.cli build-docs \
        --input <documents parquet|dir> --output <index_dir>
    python -m semantic_pdf_search_engine_ray.cli query \
        --index <index_dir> --query "terms ..." [-k 5] [--method auto]
    python -m semantic_pdf_search_engine_ray.cli query-batch \
        --index <index_dir> --queries <parquet with query_id,query> \
        --output <parquet dir> [-k 5]

This module OWNS a Ray session (guarded init; the driver/library never
init). Build prints the committed manifest summary; query prints result
rows as JSON lines.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _as_prefix_query(q: str) -> str | None:
    """Shared wildcard detector — see functions/tokenize.as_prefix_query
    (the batch actor tiers route through the same function)."""
    from semantic_pdf_search_engine_ray.functions.tokenize import (
        as_prefix_query,
    )

    return as_prefix_query(q)


def _ensure_ray(num_cpus: int | None):
    import os

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        # under `ray job submit` RAY_ADDRESS points at the cluster — only
        # force a local instance when no cluster is offered
        if not os.environ.get("RAY_ADDRESS"):
            kwargs["address"] = "local"
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _serve(args) -> int:
    """HTTP app surface — full parity with the reference web app:

    GET  /api/search?q=..&k=..  ranked hits WITH payload: url, snippet
                                text and highlight char spans (the
                                web-text analog of the reference's
                                per-hit {page, rects} + repl {page,text},
                                handlers/search.rs:97-184, repl.rs:221-241)
    POST /upload                JSON {"docs": [{"url"?, "text"}, ...]} ->
                                202 {"id", "doc_ids"}; documents are
                                indexed ASYNCHRONOUSLY into a new shard
                                (handlers/upload.rs:20-76: multipart PDF
                                -> async index). Requires a sharded root
                                (build-sharded / sharding.add_documents).
    GET  /api/ready[?id=..]     global index readiness from the durable
                                manifest, or per-ingest readiness that
                                flips when the upload's shard commits
                                (handlers/ready.rs:13-23)
    """
    import queue
    import threading
    import urllib.parse
    import uuid
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pyarrow.dataset as pads

    from semantic_pdf_search_engine_ray.functions.geometry import (
        merge_span_rects,
    )
    from semantic_pdf_search_engine_ray.pipelines.search import (
        highlight_spans,
    )
    from semantic_pdf_search_engine_ray.stages.query import IndexReader
    from semantic_pdf_search_engine_ray.state import manifest as mf

    index_dir = args.index
    default_k = args.k
    m = mf.load_manifest(index_dir)
    sharded = m.get("layout") == "doc_range_sharded"
    if sharded:
        from semantic_pdf_search_engine_ray.pipelines.sharding import (
            ShardedReader,
        )

        reader = ShardedReader(index_dir)
    else:
        reader = IndexReader(index_dir)

    lock = threading.Lock()
    state: dict = {"reader": reader, "max_doc_id": None}
    ingests: dict[str, dict] = {}
    # All ingests run on ONE persistent worker thread (started below):
    # a local `ray.init()`'s GCS is torn down when the thread that
    # created it exits, and the next Ray call then aborts the whole
    # process ("Failed to connect to GCS ... The program will
    # terminate"), so per-upload threads are unsafe. The single
    # consumer also serializes add_documents + reader swap — concurrent
    # appends would both read the same manifest, collide on one shard
    # dir, and the last commit would silently drop the other shard.
    ingest_q: queue.Queue = queue.Queue()

    def docs_dirs() -> list[str]:
        if sharded:
            mm = mf.load_manifest(index_dir)
            return [os.path.join(index_dir, s, "docs") for s in mm["shards"]]
        return [os.path.join(index_dir, "docs")]

    def fetch_docs(ids: list[int]) -> dict[int, dict]:
        """Pushdown isin read of the k hit docs from the docs store(s) —
        the J3 payload projection, never a corpus scan."""
        out: dict[int, dict] = {}
        for d in docs_dirs():
            if not os.path.isdir(d):
                continue
            ds = pads.dataset(d)
            cols = [c for c in ("doc_id", "url", "text")
                    if c in ds.schema.names]
            t = ds.to_table(columns=cols,
                            filter=pads.field("doc_id").isin(ids))
            for row in t.to_pylist():
                out[row["doc_id"]] = row
        return out

    def top_k(q: str, k: int) -> list[tuple[int, float]]:
        with lock:
            r = state["reader"]
        pfx = _as_prefix_query(q)
        if pfx is not None:
            return r.top_k_prefix(pfx, k)
        return r.top_k(q, k) if sharded else r.top_k_auto(q, k)

    facet_cache: dict[str, tuple] = {}

    def facet_sidebar(q: str, col: str) -> list[dict]:
        """Per-facet match counts for a query (the /api/facets sidebar):
        facet column loaded ONCE per serve process from the docs
        store(s), match set unioned across shard readers."""
        import numpy as np

        cached = facet_cache.get(col)
        if cached is None:
            ids_parts, val_parts = [], []
            for d in docs_dirs():
                if not os.path.isdir(d):
                    continue
                ds = pads.dataset(d)
                if col not in ds.schema.names:
                    continue
                t = ds.to_table(columns=["doc_id", col])
                ids_parts.append(t.column("doc_id").to_numpy())
                val_parts.extend(t.column(col).to_pylist())
            if not ids_parts:
                facet_cache[col] = cached = None, None
            else:
                ids = np.concatenate(ids_parts)
                order = np.argsort(ids)
                vals = np.asarray(val_parts, dtype=object)[order]
                facet_cache[col] = cached = ids[order], vals
        f_ids, f_vals = cached
        if f_ids is None:
            return []
        with lock:
            r = state["reader"]
        subs = r.readers if sharded else [r]
        matched_parts = [np.flatnonzero(sr.matched_docs(q)) for sr in subs]
        matched = (np.unique(np.concatenate(matched_parts))
                   if matched_parts else np.empty(0, np.int64))
        pos = np.searchsorted(f_ids, matched)
        ok = (pos < len(f_ids)) & (f_ids[np.minimum(pos, len(f_ids) - 1)]
                                   == matched)
        counts: dict[str, int] = {}
        for v in f_vals[pos[ok]]:
            if v is not None:
                counts[v] = counts.get(v, 0) + 1
        return [{"facet": k, "n_docs": counts[k]}
                for k in sorted(counts)]

    def hit_payload(q: str, hits: list[tuple[int, float]]) -> list[dict]:
        docs = fetch_docs(sorted({d for d, _ in hits}))
        out = []
        for rank, (doc_id, score) in enumerate(hits, start=1):
            row = docs.get(doc_id, {})
            text = row.get("text", "") or ""
            # shared with the batch HighlightActor — one implementation
            spans = [
                {"start": s, "end": e, "score": hscore, "snippet": snip}
                for s, e, hscore, snip in highlight_spans(text, q)
            ]
            # render-ready rects per page (the reference's PageHighlight
            # response, webapp.rs:254-384), on the deterministic
            # monospace grid — same spans, one geometry implementation
            by_page: dict[int, list[dict]] = {}
            for sp in spans:
                for page, x, y, w, h in merge_span_rects(
                    text, sp["start"], sp["end"]
                ):
                    by_page.setdefault(page, []).append(
                        {"x": x, "y": y, "width": w, "height": h})
            out.append({
                "rank": rank, "doc_id": doc_id, "score": score,
                "url": row.get("url"),
                "text": (spans[0]["snippet"] if spans else text[:200]),
                "highlights": spans,
                "page_highlights": [
                    {"page": p, "rects": by_page[p]}
                    for p in sorted(by_page)
                ],
            })
        return out

    def current_max_doc_id() -> int:
        """Max existing doc_id from parquet FOOTER statistics — no data
        pages are read, so this stays O(files) at any corpus size."""
        import pyarrow.parquet as pq

        hi = -1
        for d in docs_dirs():
            if not os.path.isdir(d):
                continue
            for root_dir, _dirs, files in os.walk(d):
                for f in files:
                    if not f.endswith(".parquet"):
                        continue
                    md = pq.ParquetFile(os.path.join(root_dir, f)).metadata
                    col = md.schema.to_arrow_schema().get_field_index(
                        "doc_id")
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(col).statistics
                        if st is not None and st.has_min_max:
                            hi = max(hi, int(st.max))
        return hi

    def ingest_one(ingest_id: str, doc_ids: list[int], rows: list[dict]):
        _ensure_ray(None)  # lazy: first upload pays the Ray startup
        import pyarrow as pa
        import ray.data as rd

        from semantic_pdf_search_engine_ray.pipelines.sharding import (
            ShardedReader,
            upsert_documents,
        )

        tbl = pa.table({
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "url": pa.array([r.get("url") or f"upload://{i}"
                             for r, i in zip(rows, doc_ids)],
                            type=pa.string()),
            "text": pa.array([r["text"] for r in rows],
                             type=pa.string()),
        })
        # upsert, not append: re-uploading a url replaces it (the old
        # version tombstones in its shard) instead of double-indexing —
        # the reference double-indexes re-uploads (qdrant.rs:48)
        upsert_documents(index_dir, rd.from_arrow(tbl),
                         input_lineage={"ingest": ingest_id})
        new_reader = ShardedReader(index_dir)
        with lock:
            state["reader"] = new_reader

    def ingest_loop():  # the one long-lived Ray-owning thread
        while True:
            ingest_id, doc_ids, rows = ingest_q.get()
            try:
                ingest_one(ingest_id, doc_ids, rows)
                ingests[ingest_id]["status"] = "ready"
            except Exception as exc:  # surfaced via /api/ready?id=
                ingests[ingest_id]["status"] = f"error: {exc}"
            finally:
                ingest_q.task_done()

    threading.Thread(target=ingest_loop, daemon=True).start()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, payload, code=200):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urllib.parse.urlparse(self.path)
            qs = urllib.parse.parse_qs(url.query)
            if url.path == "/api/ready":
                ingest_id = (qs.get("id") or [None])[0]
                if ingest_id is None:
                    self._json({"ready": mf.is_ready(index_dir)})
                elif ingest_id in ingests:
                    ing = ingests[ingest_id]
                    self._json({"ready": ing["status"] == "ready",
                                "status": ing["status"],
                                "doc_ids": ing["doc_ids"]})
                else:
                    self._json({"error": "unknown ingest id"}, 404)
            elif url.path == "/api/search":
                q = (qs.get("q") or [""])[0]
                if not q.strip():
                    self._json([])  # empty query -> [] (search.rs:20-22)
                    return
                try:
                    k = int((qs.get("k") or [default_k])[0])
                except ValueError:
                    self._json({"error": "k must be an integer"}, 400)
                    return
                if not 1 <= k <= 1000:
                    self._json({"error": "k out of range [1,1000]"}, 400)
                    return
                self._json(hit_payload(q, top_k(q, k)))
            elif url.path == "/api/suggest":
                # shared analyzer, NOT str.lower(): the dictionary was
                # built with the simple case mapping and [a-z0-9]+
                # tokens; suggestions are for the first query token
                from semantic_pdf_search_engine_ray.functions.tokenize \
                    import tokenize
                toks = tokenize((qs.get("q") or [""])[0])
                if not toks:
                    self._json([])
                    return
                with lock:
                    r = state["reader"]
                self._json([
                    {"rank": i, "term": t, "distance": d}
                    for i, (t, d) in enumerate(r.suggest(toks[0]),
                                               start=1)
                ])
            elif url.path == "/api/facets":
                q = (qs.get("q") or [""])[0]
                col = (qs.get("col") or ["lang"])[0]
                if not q.strip():
                    self._json([])
                    return
                self._json(facet_sidebar(q, col))
            elif url.path == "/api/doc":
                # the stored-document viewer endpoint (repl.rs:285-290:
                # the reference serves the PDF a hit points at; here the
                # doc-store row — url, full text, payload length)
                try:
                    doc = int((qs.get("id") or [""])[0])
                except ValueError:
                    self._json({"error": "id must be an integer"}, 400)
                    return
                row = fetch_docs([doc]).get(doc)
                if row is None:
                    self._json({"error": f"unknown doc_id {doc}"}, 404)
                    return
                text = row.get("text", "") or ""
                self._json({"doc_id": doc, "url": row.get("url"),
                            "text": text, "n_chars": len(text)})
            elif url.path == "/api/more":
                try:
                    doc = int((qs.get("doc") or [""])[0])
                    k = int((qs.get("k") or [default_k])[0])
                except ValueError:
                    self._json({"error": "doc and k must be integers"},
                               400)
                    return
                if not 1 <= k <= 1000:
                    self._json({"error": "k out of range [1,1000]"}, 400)
                    return
                row = fetch_docs([doc]).get(doc)
                if row is None:
                    self._json({"error": f"unknown doc_id {doc}"}, 404)
                    return
                with lock:
                    r = state["reader"]
                hits = r.more_like_this(doc, row.get("text", "") or "", k)
                self._json(hit_payload("", hits))
            else:
                self._json({"error": "not found"}, code=404)

        def do_POST(self):
            url = urllib.parse.urlparse(self.path)
            if url.path != "/upload":
                self._json({"error": "not found"}, code=404)
                return
            if not sharded:
                self._json(
                    {"error": "uploads need a sharded index root "
                              "(build with the build-sharded command)"},
                    409,
                )
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                rows = body["docs"]
                assert isinstance(rows, list) and rows
                assert all(isinstance(r.get("text"), str) for r in rows)
            except Exception:
                self._json({"error": "body must be JSON "
                                     '{"docs": [{"text": ...}, ...]}'}, 400)
                return
            with lock:
                if state["max_doc_id"] is None:
                    state["max_doc_id"] = current_max_doc_id()
                start = state["max_doc_id"] + 1
                state["max_doc_id"] += len(rows)
            doc_ids = list(range(start, start + len(rows)))
            ingest_id = uuid.uuid4().hex
            ingests[ingest_id] = {"status": "indexing", "doc_ids": doc_ids}
            ingest_q.put((ingest_id, doc_ids, rows))
            self._json({"id": ingest_id, "doc_ids": doc_ids}, 202)

    srv = ThreadingHTTPServer(("127.0.0.1", args.port), Handler)
    print(json.dumps({"serving": f"http://127.0.0.1:{args.port}",
                      "n_docs": reader.n_docs,
                      "sharded": sharded}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="semantic_pdf_search_engine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=None)

    b = sub.add_parser("build", parents=[common],
                       help="pages parquet -> committed index")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--mode", default="hash_partition",
                   choices=["hash_partition", "sort", "groupby_salt"])

    bd = sub.add_parser("build-docs", parents=[common],
                        help="documents parquet -> index")
    bd.add_argument("--input", required=True)
    bd.add_argument("--output", required=True)
    bd.add_argument("--mode", default="hash_partition",
                    choices=["hash_partition", "sort", "groupby_salt"])

    bs = sub.add_parser(
        "build-sharded", parents=[common],
        help="documents parquet -> doc-range-sharded index root (the "
             "upload-capable serve target; grows via POST /upload)")
    bs.add_argument("--input", required=True)
    bs.add_argument("--output", required=True)
    bs.add_argument("--shards", type=int, default=4)

    cp = sub.add_parser(
        "compact", parents=[common],
        help="merge the smallest shards of a sharded root until "
             "--target-shards remain (results bit-identical; run after "
             "many uploads have accumulated small shards)")
    cp.add_argument("--index", required=True)
    cp.add_argument("--target-shards", type=int, required=True)

    q = sub.add_parser("query", parents=[common],
                       help="one query -> top-k JSON lines")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=5)
    q.add_argument("--method", default="auto",
                   choices=["auto", "wand", "exhaustive", "conjunctive",
                            "boolean"])

    qb = sub.add_parser("query-batch", parents=[common],
                        help="queries parquet -> results")
    qb.add_argument("--index", required=True)
    qb.add_argument("--queries", required=True)
    qb.add_argument("--output", required=True)
    qb.add_argument("-k", type=int, default=5)

    sv = sub.add_parser(
        "serve",
        help="HTTP search endpoint over a committed index (the analog of "
             "the reference's serve mode, repl.rs:243-283: GET "
             "/api/search?q=...&k=5 -> JSON hits; GET /api/ready -> "
             "readiness from the manifest)",
    )
    sv.add_argument("--index", required=True)
    sv.add_argument("--port", type=int, default=8787)
    sv.add_argument("-k", type=int, default=5)

    dl = sub.add_parser(
        "delete",
        help="tombstone doc ids in a committed index (deleted docs stop "
             "ranking immediately; stats freeze until purge)")
    dl.add_argument("--index", required=True)
    dl.add_argument("--ids", required=True,
                    help="comma-separated doc ids to delete")

    pg = sub.add_parser(
        "purge", parents=[common],
        help="rebuild an index minus its tombstoned docs into --output "
             "(stats recomputed; bit-identical to a fresh filtered build)")
    pg.add_argument("--index", required=True)
    pg.add_argument("--output", required=True)

    rp = sub.add_parser(
        "repl",
        help="interactive search loop over a committed index (the analog "
             "of the reference REPL, repl.rs:56-126)",
    )
    rp.add_argument("--index", required=True)
    rp.add_argument("-k", type=int, default=5)

    args = p.parse_args(argv)

    if args.cmd == "serve":
        return _serve(args)

    if args.cmd == "repl":
        from semantic_pdf_search_engine_ray.stages.query import IndexReader

        reader = IndexReader(args.index)
        print(f"index ready: {reader.n_docs} docs, {len(reader.df)} terms. "
              "commands: search <query> | quit", flush=True)
        for line in sys.stdin:
            line = line.strip()
            if line in ("quit", "exit", ""):
                if line:
                    break
                continue
            query = line[7:] if line.startswith("search ") else line
            pfx = _as_prefix_query(query)
            hits = (reader.top_k_prefix(pfx, args.k) if pfx is not None
                    else reader.top_k_auto(query, args.k))
            for rank, (doc_id, score) in enumerate(hits, start=1):
                print(json.dumps(
                    {"rank": rank, "doc_id": doc_id, "score": score}
                ), flush=True)
        return 0

    if args.cmd == "delete":
        # metadata-only append; no Ray session needed
        from semantic_pdf_search_engine_ray.pipelines.delete import (
            delete_documents,
            load_tombstones,
        )

        n = delete_documents(
            args.index, [int(s) for s in args.ids.split(",") if s]
        )
        print(json.dumps(
            {"deleted": n, "total_tombstones": len(load_tombstones(args.index))}
        ))
        return 0

    if args.cmd == "query":
        # single query needs no Ray session: the reader is local state
        from semantic_pdf_search_engine_ray.stages.query import IndexReader

        reader = IndexReader(args.index)
        pfx = _as_prefix_query(args.query)
        if pfx is not None:
            hits = reader.top_k_prefix(pfx, args.k)
        else:
            hits = {
                "auto": reader.top_k_auto,
                "wand": reader.top_k_wand,
                "exhaustive": reader.top_k_exhaustive,
                "conjunctive": reader.top_k_conjunctive,
                "boolean": reader.top_k_boolean,
            }[args.method](args.query, args.k)
        for rank, (doc_id, score) in enumerate(hits, start=1):
            print(json.dumps({"rank": rank, "doc_id": doc_id, "score": score}))
        return 0

    _ensure_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "build":
            from semantic_pdf_search_engine_ray.pipelines.build import (
                build_index_from_pages,
            )

            manifest = build_index_from_pages(
                args.input, args.output, shuffle_mode=args.mode
            )
            print(json.dumps({k: manifest[k] for k in
                              ("build_id", "n_docs", "avgdl")}))
        elif args.cmd == "build-docs":
            import ray.data as rd

            from semantic_pdf_search_engine_ray.pipelines.build import (
                build_index_from_docs,
                path_content_lineage,
            )

            docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
            manifest = build_index_from_docs(
                docs, args.output,
                input_lineage=path_content_lineage(args.input),
                shuffle_mode=args.mode,
            )
            print(json.dumps({k: manifest[k] for k in
                              ("build_id", "n_docs", "avgdl")}))
        elif args.cmd == "build-sharded":
            import ray.data as rd

            from semantic_pdf_search_engine_ray.pipelines.build import (
                path_content_lineage,
            )
            from semantic_pdf_search_engine_ray.pipelines.sharding import (
                build_sharded_index,
            )

            docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
            manifest = build_sharded_index(
                docs, args.output, n_shards=args.shards,
                input_lineage=path_content_lineage(args.input),
            )
            print(json.dumps({k: manifest[k] for k in
                              ("n_docs", "n_shards", "avgdl")}))
        elif args.cmd == "compact":
            from semantic_pdf_search_engine_ray.pipelines.sharding import (
                compact_shards,
            )

            manifest = compact_shards(args.index, args.target_shards)
            print(json.dumps({k: manifest[k] for k in
                              ("n_shards", "n_docs", "avgdl")}))
        elif args.cmd == "purge":
            from semantic_pdf_search_engine_ray.pipelines.delete import (
                purge_deleted,
            )

            manifest = purge_deleted(args.index, args.output)
            print(json.dumps({k: manifest[k] for k in
                              ("build_id", "n_docs", "avgdl")}))
        elif args.cmd == "query-batch":
            import ray.data as rd

            from semantic_pdf_search_engine_ray.pipelines.search import (
                run_queries,
            )

            queries = rd.read_parquet(args.queries)
            res = run_queries(args.index, queries, k=args.k)
            res.write_parquet(args.output)
            print(json.dumps({"results_dir": args.output}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
