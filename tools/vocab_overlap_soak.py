"""Source-vocabulary-overlap soak (VERDICT r4 fix #2 'done' evidence).

The all-pairs ``source_vocab_overlap`` self-joins the distinct
(source, term) table on term: a head term present in all S sources
emits S^2 rows, so shared vocabulary drives the exchange toward
|vocab| x S^2 regardless of how many source pairs are actually similar.
``source_vocab_overlap_thresholded`` bounds candidate generation with
an exact prefix filter (SSJoin/PPJoin); this soak evidences the bound:

  synthesize S sources whose vocabularies share a COMMON head (every
  source contains it — the S^2 trap) plus a private tail, with a small
  number of MIRRORED pairs (near-identical vocabularies, J >= 0.5);
  run the thresholded path and report

    - n_candidate_pairs vs S*(S-1)/2  (must track mirrored pairs,
      not sources^2)
    - output pairs == mirrored pairs  (exact recall + precision)

Usage:  python tools/vocab_overlap_soak.py [n_sources n_mirrored]
        (default: 1000 20)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(path: str, n_sources: int, n_mirrored: int,
                seed: int = 11) -> set[tuple[str, str]]:
    """Each source = a few docs. Vocabulary per source: 40 COMMON head
    words (shared by every source — this is what makes the naive join
    quadratic) + 60 private words. Mirrored pairs (2k, 2k+1) for
    k < n_mirrored share the private tail too (J ~ 1); everyone else
    pairs at J ~ 40/160 = 0.25 < 0.5."""
    rng = np.random.default_rng(seed)
    common = [f"head{i:03d}" for i in range(40)]
    srcs, texts = [], []
    expected: set[tuple[str, str]] = set()
    for s in range(n_sources):
        name = f"src{s:05d}"
        if s % 2 == 1 and (s - 1) // 2 < n_mirrored:
            tail_id = s - 1  # mirror the previous source's tail
            expected.add((f"src{s - 1:05d}", name))
        else:
            tail_id = s
        private = [f"tail{tail_id:05d}x{j:03d}" for j in range(60)]
        vocab = common + private
        for d in range(3):  # a few docs per source, overlapping vocab
            words = list(rng.choice(vocab, size=120, replace=True))
            # make sure every vocab word appears somewhere in the source
            if d == 0:
                words = vocab + words
            srcs.append(name)
            texts.append(" ".join(words))
    pq.write_table(
        pa.table({"source": pa.array(srcs, type=pa.string()),
                  "text": pa.array(texts, type=pa.string())}),
        path,
    )
    return expected


def main() -> None:
    n_sources = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_mirrored = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "16")), include_dashboard=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from semantic_pdf_search_engine_ray.pipelines.textstats import (
        source_vocab_overlap_thresholded,
    )

    tmp = tempfile.mkdtemp(prefix="spse_vocab_soak_")
    path = os.path.join(tmp, "docs.parquet")
    expected = make_corpus(path, n_sources, n_mirrored)

    docs = rd.read_parquet(path)
    stats: dict = {}
    t0 = time.monotonic()
    out = source_vocab_overlap_thresholded(
        docs, threshold=0.5, stats=stats).take_all()
    dt = time.monotonic() - t0

    got = {(r["source_a"], r["source_b"]) for r in out}
    all_pairs = n_sources * (n_sources - 1) // 2
    report = {
        "n_sources": n_sources,
        "n_mirrored_pairs": n_mirrored,
        "all_pairs_S2": all_pairs,
        "n_candidate_pairs": stats.get("n_candidate_pairs"),
        "n_candidate_sources": stats.get("n_candidate_sources"),
        "n_output_pairs": len(got),
        "recall_exact": got == expected,
        "candidate_blowup_vs_mirrored": (
            stats.get("n_candidate_pairs", 0) / max(1, n_mirrored)),
        "candidate_frac_of_S2": (
            stats.get("n_candidate_pairs", 0) / max(1, all_pairs)),
        "sec": round(dt, 2),
    }
    print(json.dumps(report))
    assert report["recall_exact"], (got - expected, expected - got)
    # the bound under test: candidates track similar pairs, not S^2
    assert report["n_candidate_pairs"] <= 10 * n_mirrored + n_sources, \
        report
    ray.shutdown()


if __name__ == "__main__":
    main()
