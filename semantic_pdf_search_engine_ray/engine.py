"""``Engine`` — the one-object Python API (SURVEY.md §2.9: the library
surface both reference binaries compose by hand via the `lib.rs` module
facade).

    from semantic_pdf_search_engine_ray.engine import Engine

    eng = Engine.build_from_pages("pages_dir/", "/tmp/idx")   # or .open()
    hits = eng.search("distributed systems", k=5)             # [(doc, score)]
    results = eng.search_batch(queries_ds)                    # Dataset
    spans = eng.search_with_highlights(queries_tbl)           # (res, spans)

Build returns only after the manifest commit (the durable analog of the
reference's async-upload "ready" flag, `handlers/ready.rs:13-23`).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

import ray.data as rd

from semantic_pdf_search_engine_ray.config import EngineConfig
from semantic_pdf_search_engine_ray.state import manifest as mf


class Engine:
    def __init__(self, index_dir: str, cfg: EngineConfig | None = None):
        if not mf.is_ready(index_dir):
            raise ValueError(f"index at {index_dir} is not committed/ready")
        self.index_dir = index_dir
        self.cfg = cfg or EngineConfig()
        self._reader = None

    # -- construction -------------------------------------------------------

    @classmethod
    def open(cls, index_dir: str, cfg: EngineConfig | None = None) -> "Engine":
        return cls(index_dir, cfg)

    @classmethod
    def build_from_pages(
        cls,
        pages_path: str | list[str],
        index_dir: str,
        cfg: EngineConfig | None = None,
        **kwargs,
    ) -> "Engine":
        from semantic_pdf_search_engine_ray.pipelines.build import (
            build_index_from_pages,
        )

        build_index_from_pages(pages_path, index_dir, cfg, **kwargs)
        return cls(index_dir, cfg)

    @classmethod
    def build_from_docs(
        cls,
        docs: rd.Dataset,
        index_dir: str,
        cfg: EngineConfig | None = None,
        *,
        input_lineage: dict | None = None,
        overwrite: bool = False,
        **kwargs,
    ) -> "Engine":
        """Build from an arbitrary docs Dataset.

        A Dataset has no stable content identity, so the caller must
        either supply ``input_lineage`` (which keys the resumable stage
        fingerprints — see conformance._sf_cache_key for the pattern:
        source path + size + mtime) or pass ``overwrite=True`` to rebuild
        from scratch. Without one of those, building into an existing
        ``index_dir`` with DIFFERENT data would match every committed
        stage fingerprint and silently resume the stale index.
        """
        from semantic_pdf_search_engine_ray.pipelines.build import (
            build_index_from_docs,
        )
        existing = os.path.join(index_dir, "manifest.json")
        if input_lineage is None and not overwrite and os.path.exists(existing):
            raise ValueError(
                f"{index_dir} already holds a committed index and no "
                "input_lineage was given; pass input_lineage={...} (a "
                "content-aware identity of the docs source) to resume, or "
                "overwrite=True to rebuild from scratch"
            )
        if overwrite and os.path.isdir(index_dir):
            shutil.rmtree(index_dir)
        build_index_from_docs(
            docs, index_dir, cfg, input_lineage=input_lineage or {}, **kwargs
        )
        return cls(index_dir, cfg)

    # -- query --------------------------------------------------------------

    @property
    def reader(self):
        if self._reader is None:
            from semantic_pdf_search_engine_ray.stages.query import IndexReader

            self._reader = IndexReader(self.index_dir)
        return self._reader

    def search(self, query: str, k: int = 5) -> list[tuple[int, float]]:
        """Interactive top-k (local reader, no Ray job)."""
        return self.reader.top_k_auto(query, k)

    def search_batch(
        self, queries: rd.Dataset | pa.Table, k: int = 5, **kwargs
    ) -> rd.Dataset:
        """Batch top-k through the query actor pool."""
        from semantic_pdf_search_engine_ray.pipelines.search import run_queries

        if isinstance(queries, pa.Table):
            queries = rd.from_arrow(queries)
        return run_queries(self.index_dir, queries, self.cfg, k=k, **kwargs)

    def search_with_highlights(
        self, queries: pa.Table, k: int = 5
    ) -> tuple[pa.Table, pa.Table]:
        from semantic_pdf_search_engine_ray.pipelines.search import (
            run_queries_with_highlights,
        )

        return run_queries_with_highlights(
            self.index_dir, queries, self.cfg, k=k, doc_columns=["text"]
        )

    @property
    def manifest(self) -> dict:
        return mf.load_manifest(self.index_dir)
