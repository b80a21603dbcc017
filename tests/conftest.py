"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_pages(tmp_path_factory):
    """sf-tiny deterministic pages fixture (500 rows) written once per session."""
    from semantic_pdf_search_engine_ray.sources.pages import generate_pages_parquet

    path = str(tmp_path_factory.mktemp("fixtures") / "pages_tiny.parquet")
    generate_pages_parquet(path, n_docs=500, seed=42)
    return path
