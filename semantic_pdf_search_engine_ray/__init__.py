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


def _register_pickle_by_value() -> None:
    """Ship this package's code to Ray workers by value.

    The repo is not pip-installed, so worker processes (whose
    interpreter may not have the repo on sys.path) would fail to
    unpickle our stage callables by module reference. Registering the
    package's modules with cloudpickle's by-value mode embeds the code
    in the serialized task instead — works under any driver's ray.init.
    """
    import sys

    try:
        import ray.cloudpickle as _cp
    except Exception:  # pragma: no cover - ray always present here
        return
    # import the whole package so every submodule is registered
    from importlib import import_module

    for sub in (
        "config",
        "functions.textnorm",
        "functions.fuzzy",
        "functions.tokenize",
        "functions.codec",
        "functions.shingle",
        "functions.chunking",
        "sources.pages",
        "stages.extract",
        "stages.postings",
        "stages.encode",
        "stages.query",
        "stages.multimodal",
        "stages.positions",
        "state.manifest",
        "oracle",
        "pipelines.build",
        "pipelines.search",
        "pipelines.dedup",
        "pipelines.similarity",
        "pipelines.textstats",
        "pipelines.windows",
        "pipelines.sharding",
        "pipelines.rerank",
        "engine",
        "pipelines.conformance",
    ):
        try:
            import_module(f"{__name__}.{sub}")
        except ImportError:
            pass
    for name, mod in list(sys.modules.items()):
        if name == __name__ or name.startswith(__name__ + "."):
            if mod is not None:
                try:
                    _cp.register_pickle_by_value(mod)
                except Exception:
                    pass


_register_pickle_by_value()
