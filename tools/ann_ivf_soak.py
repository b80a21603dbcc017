"""IVF ANN scale soak (round-5 evidence for the composed dense path).

The conformance-scale `ann_ivf_topk` / `hybrid_ivf_topk` entries are
value-checked against DuckDB; what they cannot show is the SCALE shape:
that probe cost falls with nprobe because unprobed cells' partition
directories never open, and that a clustered corpus keeps recall high
at small nprobe. This soak synthesizes a clustered embedding corpus
(ground-truth centers + noise — the regime IVF exists for), builds the
cell-partitioned index once, then sweeps nprobe and reports per config:

  - wall time for the probed top-k batch
  - rows_scanned / n_vectors and cells_probed (the pruning evidence,
    from ann_ivf_topk's own scan_stats)
  - recall@k against the full-probe (= exact brute force) result

Usage:  python tools/ann_ivf_soak.py [n_vectors] [n_cells] [dim]
        (default: 500000 64 64)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semantic_pdf_search_engine_ray.config import scratch_root  # noqa: E402


def make_corpus(path: str, n: int, dim: int, n_centers: int) -> None:
    """Deterministic clustered corpus: vectors = center + noise, written
    in 100k-row batches so the soak never holds the corpus in one list."""
    rng = np.random.RandomState(7)
    centers = rng.randn(n_centers, dim).astype(np.float64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    os.makedirs(path, exist_ok=True)
    step = 100_000
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        m = hi - lo
        which = rng.randint(0, n_centers, size=m)
        vecs = centers[which] + 0.25 * rng.randn(m, dim)
        tbl = pa.table({
            "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.astype(np.float32).ravel()), dim),
        })
        pq.write_table(tbl, os.path.join(path, f"part-{lo:09d}.parquet"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    k, n_queries = 10, 100

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    import ray.data as rd  # noqa: F401

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from semantic_pdf_search_engine_ray.pipelines.similarity import (
        ann_ivf_topk,
        build_ivf_index,
    )

    root = scratch_root()
    corpus = os.path.join(root, f"spse_ivfsoak_corpus_{n}_{dim}")
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        shutil.rmtree(corpus, ignore_errors=True)
        make_corpus(corpus, n, dim, n_centers=n_cells)
        open(os.path.join(corpus, "_DONE"), "w").write("ok")

    index_dir = os.path.join(root, f"spse_ivfsoak_idx_{n}_{n_cells}")
    t0 = time.monotonic()
    build_ivf_index(corpus, index_dir, n_cells=n_cells)
    t_build = time.monotonic() - t0

    # two regimes: a NARROW batch (scan pruning is per-query-set — the
    # read covers the union of probed cells, so a wide batch legitimately
    # unions to every cell) and the full batch (throughput + recall).
    narrow = {}
    for nprobe in (1, max(1, n_cells // 16)):
        stats: dict = {}
        t0 = time.monotonic()
        ann_ivf_topk(corpus, k=k, num_queries=4, n_cells=n_cells,
                     nprobe=nprobe, index_dir=index_dir, scan_stats=stats)
        narrow[nprobe] = {
            "sec": round(time.monotonic() - t0, 2),
            "rows_scanned": stats.get("rows_scanned"),
            "scan_frac": round(stats.get("rows_scanned", 0)
                               / max(1, stats.get("n_vectors", 1)), 4),
            "cells_probed": stats.get("cells_probed"),
        }

    results = {}
    exact_sets: dict[int, set] = {}
    for nprobe in sorted({1, 4, max(1, n_cells // 4), n_cells}):
        stats: dict = {}
        t0 = time.monotonic()
        out = ann_ivf_topk(
            corpus, k=k, num_queries=n_queries, n_cells=n_cells,
            nprobe=nprobe, index_dir=index_dir, scan_stats=stats,
        )
        dt = time.monotonic() - t0
        hits: dict[int, set] = {}
        for q, v in zip(out.column("query_vec_id").to_pylist(),
                        out.column("vec_id").to_pylist()):
            hits.setdefault(q, set()).add(v)
        if nprobe == n_cells:
            exact_sets = hits
        results[nprobe] = {
            "sec": round(dt, 2),
            "rows_scanned": stats.get("rows_scanned"),
            "scan_frac": round(
                stats.get("rows_scanned", 0) / max(1, stats.get("n_vectors", 1)),
                4),
            "cells_probed": stats.get("cells_probed"),
            "hits": hits,
        }
    for nprobe, r in results.items():
        num = den = 0
        for q, exact in exact_sets.items():
            num += len(r["hits"].get(q, set()) & exact)
            den += len(exact)
        r[f"recall@{k}"] = round(num / max(1, den), 4)
        del r["hits"]

    print(json.dumps({
        "n_vectors": n, "n_cells": n_cells, "dim": dim,
        "n_queries": n_queries, "k": k,
        "index_build_sec": round(t_build, 2),
        "narrow_batch_4q": narrow,
        "per_nprobe": results,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
