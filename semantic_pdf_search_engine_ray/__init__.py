"""Ray-Data-native full-text engine.

A brand-new engine with the query / data-processing capabilities of the
reference ``muzammil35/semantic-pdf-search-engine`` (Rust + Qdrant PDF
semantic search), re-expressed per the north rule as a distributed
inverted-index build + BM25 query pipeline over Parquet tables of
Common-Crawl-style web pages, built on ``ray.data.Dataset`` streaming
pipelines (map_batches over zero-copy Arrow, actor pools for stateful
stages, explicit groupby shuffles with head-term salting).

Layout:
    functions/  pure, deterministic kernels (normalizer, fuzzy, codec, ...)
    sources/    input readers + the deterministic pages fixture generator
    stages/     Ray Data stage callables (extract, tokenize, encode, query)
    state/      index manifest: lineage, metrics, atomic commit, resume
    pipelines/  end-to-end composed pipelines (build, search, dedup, ...)
"""

from semantic_pdf_search_engine_ray.config import EngineConfig

__all__ = ["EngineConfig"]
