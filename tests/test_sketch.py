"""Misra-Gries sketch kernel: survival guarantee + merge-superset
property that heavy_hitter_terms' exactness rests on."""

from __future__ import annotations

import random
from collections import Counter

from semantic_pdf_search_engine_ray.pipelines.sketch import _misra_gries


def test_mg_keeps_every_term_above_threshold():
    rng = random.Random(7)
    # zipf-ish stream: term i drawn with weight 1/(i+1)
    vocab = [f"t{i}" for i in range(500)]
    weights = [1.0 / (i + 1) for i in range(500)]
    stream = rng.choices(vocab, weights=weights, k=20000)
    slots = 64
    kept = _misra_gries(iter(stream), slots)
    true = Counter(stream)
    thresh = len(stream) / slots
    for term, c in true.items():
        if c > thresh:
            assert term in kept, (term, c, thresh)
    # counters never overestimate and never underestimate by > N/slots
    for term, est in kept.items():
        assert est <= true[term]
        assert true[term] - est <= thresh


def test_mg_batch_union_covers_global_heavies():
    """Averaging argument: a term above total/slots globally must
    survive in at least one per-batch summary."""
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(300)]
    weights = [1.0 / (i + 1) for i in range(300)]
    batches = [rng.choices(vocab, weights=weights, k=4000)
               for _ in range(8)]
    slots = 64
    union = set()
    for b in batches:
        union.update(_misra_gries(iter(b), slots))
    total = Counter()
    for b in batches:
        total.update(b)
    n = sum(total.values())
    for term, c in total.items():
        if c > n / slots:
            assert term in union, (term, c, n / slots)


def test_heavy_hitters_fallback_on_uniform_distribution(ray_session):
    """Near-uniform corpus with deliberately tiny slots: the survival
    precondition fails and the runtime check must route to the exact
    fallback instead of returning a wrong top-k."""
    import pyarrow as pa

    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.sketch import (
        heavy_hitter_terms,
    )

    # 120 docs, each a distinct word, plus two words with small leads
    texts = [f"w{i:03d}" for i in range(120)]
    texts += ["alpha"] * 3 + ["beta"] * 2
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })).repartition(6)
    out = heavy_hitter_terms(docs, k=2, slots_factor=1)  # slots = 2
    assert out.column("term").to_pylist() == ["alpha", "beta"]
    assert out.column("count").to_pylist() == [3, 2]


def test_hll_estimate_within_error_bound(ray_session):
    """Large-cardinality path (no small-range correction): HLL at
    p=12 has ~1.6% std error; assert within 5% of truth."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from semantic_pdf_search_engine_ray.pipelines.sketch import (
        hll_distinct_users,
    )

    n = 60_000
    events = rd.from_arrow(pa.table({
        "event_type": pa.array(["x"] * n, type=pa.string()),
        # 30k distinct users, each appearing twice
        "user_id": pa.array(
            np.concatenate([np.arange(30_000)] * 2), type=pa.int64()),
    })).repartition(8)
    out = hll_distinct_users(events).to_pandas()
    assert len(out) == 1
    est = float(out["est_r"][0])
    assert est > 2.5 * 4096, "should be out of the small-range regime"
    assert abs(est - 30_000) / 30_000 < 0.05
