"""High-duplication near-dedup soak (VERDICT r1 fix #1 'done' evidence).

Synthesizes a web-like corpus with >= 30% duplicates (a mix of exact
copies and light near-dup mutations — the regime where 'candidates <<
corpus' does NOT hold), runs the fully-distributed minhash_lsh_pairs at
two corpus sizes and reports:

  - candidate volume vs duplicate count (must scale ~linearly with the
    number of duplicated docs, not corpus^2)
  - driver max-RSS growth (must stay ~flat: the driver never materializes
    candidate texts or shingle sets, only the output pair list)

Usage:  python tools/dedup_soak.py [n_docs ...]   (default: 30000 100000)

Pair-volume mode (VERDICT r2 fix #1 'done' evidence):

    python tools/dedup_soak.py --pairvol [n_groups copies]

Synthesizes a corpus of ``n_groups`` distinct texts x ``copies`` exact
copies each — member-level expansion then yields n_groups * C(copies,2)
pairs, far more bytes than any sane driver budget — and runs the
DATASET path end to end: ``minhash_lsh_pairs_ds(...).write_parquet``
then ``apply_near_dedup`` (distributed anti-join). Reports the pair
volume written to parquet and the driver max-RSS delta, which must stay
flat (pairs and removal ids never touch the driver)."""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = [
    "data", "query", "engine", "stream", "batch", "index", "shard",
    "vector", "table", "column", "merge", "scan", "filter", "group",
    "window", "join", "hash", "sort", "cache", "block", "page", "store",
    "write", "read", "plan", "task", "actor", "node", "cluster", "spill",
]


def make_corpus(path: str, n_docs: int, dup_frac: float = 0.35,
                seed: int = 7) -> int:
    """~(1-dup_frac) unique docs + dup_frac duplicates (70% exact copies,
    30% 2-word mutations of a random earlier unique doc). Returns the
    number of duplicated docs."""
    rng = np.random.RandomState(seed)
    n_unique = int(n_docs * (1.0 - dup_frac))
    texts: list[str] = []
    for _ in range(n_unique):
        k = rng.randint(30, 60)
        texts.append(" ".join(WORDS[i] for i in rng.randint(0, len(WORDS), k)))
    n_dups = n_docs - n_unique
    for _ in range(n_dups):
        src = texts[rng.randint(0, n_unique)]
        if rng.rand() < 0.7:
            texts.append(src)
        else:
            toks = src.split()
            for _ in range(2):
                toks[rng.randint(0, len(toks))] = WORDS[rng.randint(0, len(WORDS))]
            texts.append(" ".join(toks))
    order = rng.permutation(n_docs)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array([texts[i] for i in order]),
    })
    pq.write_table(tbl, path)
    return n_dups


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def make_group_corpus(path: str, n_groups: int, copies: int,
                      seed: int = 11) -> int:
    """``n_groups`` distinct ~45-word texts, each repeated ``copies``
    times (shuffled). Returns total docs."""
    rng = np.random.RandomState(seed)
    texts: list[str] = []
    for _ in range(n_groups):
        k = rng.randint(40, 50)
        texts.append(" ".join(WORDS[i] for i in rng.randint(0, len(WORDS), k)))
    all_texts = [t for t in texts for _ in range(copies)]
    n = len(all_texts)
    order = rng.permutation(n)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([all_texts[i] for i in order]),
    }), path)
    return n


def pairvol_main(args: list[str]) -> None:
    import shutil

    import ray

    from semantic_pdf_search_engine_ray.pipelines.dedup import (
        apply_near_dedup,
        minhash_lsh_pairs_ds,
    )

    n_groups = int(args[0]) if args else 400
    copies = int(args[1]) if len(args) > 1 else 250
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("SIM_CPUS", 16)),
                 include_dashboard=False)
    path = f"/tmp/dedup_pairvol_{n_groups}x{copies}.parquet"
    out_dir = "/tmp/dedup_pairvol_pairs"
    shutil.rmtree(out_dir, ignore_errors=True)
    n_docs = make_group_corpus(path, n_groups, copies)
    expected_pairs = n_groups * copies * (copies - 1) // 2
    rss0 = rss_mb()
    t0 = time.perf_counter()
    minhash_lsh_pairs_ds(path, n=3, threshold=0.5).write_parquet(out_dir)
    t_pairs = time.perf_counter() - t0
    pair_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(out_dir) for f in fs
    )
    n_pairs = pq.read_table(out_dir, columns=["doc_id_a"]).num_rows
    rss1 = rss_mb()
    t0 = time.perf_counter()
    n_kept = apply_near_dedup(path, n=3, threshold=0.5).count()
    t_apply = time.perf_counter() - t0
    rss2 = rss_mb()
    report = {
        "mode": "pairvol",
        "n_docs": n_docs,
        "n_groups": n_groups,
        "copies": copies,
        "n_pairs_written": n_pairs,
        "expected_pairs": expected_pairs,
        "pair_parquet_mb": round(pair_bytes / 1e6, 1),
        "pairs_sec": round(t_pairs, 2),
        "apply_survivors": n_kept,
        "apply_sec": round(t_apply, 2),
        "driver_rss_mb_before": round(rss0, 1),
        "driver_rss_mb_after_pairs": round(rss1, 1),
        "driver_rss_mb_after_apply": round(rss2, 1),
        "driver_rss_delta_mb": round(rss2 - rss0, 1),
        # the claim under test: pair volume >> driver growth
        "rss_flat_vs_pair_volume": bool(
            (rss2 - rss0) * 1e6 < 0.25 * max(pair_bytes, 1)
            or (rss2 - rss0) < 300.0
        ),
    }
    print(json.dumps(report))
    ray.shutdown()


def linesoak_main(args: list[str]) -> None:
    """Cross-doc line dedup at scale (round 3): corpus of ``n_docs``
    docs x 20 lines, where 30% of lines are drawn from a shared pool
    (heavily duplicated across docs) and the rest are unique. Runs
    global_line_dedup at two sizes; wall time must grow ~linearly and
    driver RSS must stay flat (line text never shuffles, removal lists
    stream through joins)."""
    import shutil

    import ray

    from semantic_pdf_search_engine_ray.pipelines.dedup import (
        global_line_dedup,
    )

    sizes = [int(a) for a in args] or [100_000, 300_000]
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("SIM_CPUS", 16)),
                 include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    results = []
    for n in sizes:
        path = f"/tmp/linesoak_{n}.parquet"
        if not os.path.exists(path):
            rng = np.random.RandomState(11)
            pool = [f"shared boilerplate line {i} lorem ipsum dolor"
                    for i in range(500)]
            docs = []
            for d in range(n):
                lines = []
                for j in range(20):
                    if rng.rand() < 0.3:
                        lines.append(pool[rng.randint(len(pool))])
                    else:
                        lines.append(
                            f"unique doc {d} line {j} token "
                            f"{rng.randint(10**9)}")
                docs.append("\n".join(lines))
            pq.write_table(pa.table({
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(docs, type=pa.string()),
            }), path)
        rss0 = rss_mb()
        t0 = time.perf_counter()
        out = global_line_dedup(path, num_partitions=16)
        import pyarrow.compute as pc

        agg = out.map_batches(
            lambda b: pa.table({
                "n_in": pa.array(
                    [pc.sum(b.column("n_lines_in")).as_py() or 0]),
                "n_kept": pa.array(
                    [pc.sum(b.column("n_lines_kept")).as_py() or 0]),
            }),
            batch_format="pyarrow",
        ).to_pandas().sum()
        dt = time.perf_counter() - t0
        results.append({
            "n_docs": n,
            "lines_in": int(agg.n_in),
            "lines_kept": int(agg.n_kept),
            "removed": int(agg.n_in - agg.n_kept),
            "sec": round(dt, 2),
            "lines_per_sec": round(agg.n_in / dt),
            "driver_rss_mb": round(rss_mb(), 1),
            "rss_delta_mb": round(rss_mb() - rss0, 1),
        })
        print(json.dumps(results[-1]), flush=True)
    if len(results) >= 2:
        a, b = results[0], results[-1]
        ratio = (b["sec"] / a["sec"]) / (b["n_docs"] / a["n_docs"])
        print(json.dumps({"time_growth_vs_size_growth": round(ratio, 3),
                          "linear_ok": ratio < 1.5}), flush=True)
    ray.shutdown()


def main() -> None:
    import ray

    from semantic_pdf_search_engine_ray.pipelines.dedup import minhash_lsh_pairs

    if sys.argv[1:2] == ["--pairvol"]:
        pairvol_main(sys.argv[2:])
        return
    if sys.argv[1:2] == ["--lines"]:
        linesoak_main(sys.argv[2:])
        return
    sizes = [int(a) for a in sys.argv[1:]] or [30_000, 100_000]
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("SIM_CPUS", 16)),
                 include_dashboard=False)
    results = []
    for n in sizes:
        path = f"/tmp/dedup_soak_{n}.parquet"
        n_dups = make_corpus(path, n)
        rss0 = rss_mb()
        stats: dict = {}
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(path, n=3, threshold=0.5, stats=stats)
        dt = time.perf_counter() - t0
        results.append({
            "n_docs": n,
            "n_dup_docs": n_dups,
            "sec": round(dt, 2),
            "docs_per_sec": round(n / dt),
            "n_band_cand_rows": stats["n_band_cand_rows"],
            "cand_rows_per_dup_doc": round(
                stats["n_band_cand_rows"] / max(n_dups, 1), 2),
            "n_rep_pairs": stats["n_rep_pairs"],
            "n_pairs_out": pairs.num_rows,
            "driver_rss_mb_before": round(rss0, 1),
            "driver_rss_mb_after": round(rss_mb(), 1),
        })
        print(json.dumps(results[-1]))
    if len(results) >= 2:
        a, b = results[0], results[-1]
        growth = (b["n_band_cand_rows"] / max(a["n_band_cand_rows"], 1))
        dup_growth = b["n_dup_docs"] / max(a["n_dup_docs"], 1)
        print(json.dumps({
            "cand_growth": round(growth, 2),
            "dup_growth": round(dup_growth, 2),
            "linear_in_dups": bool(growth < dup_growth * 1.5),
            "driver_rss_delta_mb": round(
                b["driver_rss_mb_after"] - a["driver_rss_mb_after"], 1),
        }))
    ray.shutdown()


if __name__ == "__main__":
    main()
