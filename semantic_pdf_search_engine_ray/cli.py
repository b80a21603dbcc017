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
import sys


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

    q = sub.add_parser("query", parents=[common],
                       help="one query -> top-k JSON lines")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=5)
    q.add_argument("--method", default="auto",
                   choices=["auto", "wand", "exhaustive", "conjunctive"])

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

    rp = sub.add_parser(
        "repl",
        help="interactive search loop over a committed index (the analog "
             "of the reference REPL, repl.rs:56-126)",
    )
    rp.add_argument("--index", required=True)
    rp.add_argument("-k", type=int, default=5)

    args = p.parse_args(argv)

    if args.cmd == "serve":
        import urllib.parse
        from http.server import BaseHTTPRequestHandler, HTTPServer

        from semantic_pdf_search_engine_ray.stages.query import IndexReader
        from semantic_pdf_search_engine_ray.state.manifest import is_ready

        reader = IndexReader(args.index)
        default_k = args.k
        index_dir = args.index

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
                    self._json({"ready": is_ready(index_dir)})
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
                    hits = reader.top_k_auto(q, k)
                    self._json([
                        {"rank": r, "doc_id": d, "score": s}
                        for r, (d, s) in enumerate(hits, start=1)
                    ])
                else:
                    self._json({"error": "not found"}, code=404)

        srv = HTTPServer(("127.0.0.1", args.port), Handler)
        print(json.dumps({"serving": f"http://127.0.0.1:{args.port}",
                          "n_docs": reader.n_docs}), flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

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
            for rank, (doc_id, score) in enumerate(
                reader.top_k_auto(query, args.k), start=1
            ):
                print(json.dumps(
                    {"rank": rank, "doc_id": doc_id, "score": score}
                ), flush=True)
        return 0

    if args.cmd == "query":
        # single query needs no Ray session: the reader is local state
        from semantic_pdf_search_engine_ray.stages.query import IndexReader

        reader = IndexReader(args.index)
        hits = {
            "auto": reader.top_k_auto,
            "wand": reader.top_k_wand,
            "exhaustive": reader.top_k_exhaustive,
            "conjunctive": reader.top_k_conjunctive,
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
            )

            docs = rd.read_parquet(args.input, columns=["doc_id", "text"])
            manifest = build_index_from_docs(
                docs, args.output,
                input_lineage={"docs_path": args.input},
                shuffle_mode=args.mode,
            )
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
