"""The composed dense retrieval path (VERDICT r4 next #7): text query
-> hashed-tf-idf dense vector -> IVF probed cosine -> RRF fusion with
BM25.

Two contracts pinned here, independent of the DuckDB oracle (which
test_conformance_oracle.py checks for the same entry):

1. FULL-PROBE EQUIVALENCE — at nprobe = n_cells the IVF-served hybrid
   must equal the sparse bucket-join hybrid bit-for-bit at the same
   candidate depth: same candidates (cos > 0 == shares a non-zero
   bucket for non-negative features), same round-6 values (the dense
   store carries the long form's half-away-rounded entries), same
   ranks.
2. PRUNING EVIDENCE — at nprobe < n_cells the probed read must touch
   strictly fewer rows AND bytes than the full corpus (the unprobed
   cells' partition directories never open), while still returning a
   full fused top-k per query.
"""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def _df(tbl) -> pd.DataFrame:
    return tbl.to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)


def test_hybrid_ivf_full_probe_equals_sparse_hybrid(ray_session):
    from semantic_pdf_search_engine_ray.pipelines import conformance as cf
    from semantic_pdf_search_engine_ray.pipelines import textstats as ts
    from semantic_pdf_search_engine_ray.pipelines.rerank import (
        hybrid_sparse_rrf,
    )

    index_dir = cf.ensure_index(SF)
    queries = cf.derive_query_table(index_dir)

    ivf = _df(cf.q_hybrid_ivf_topk(SF))  # nprobe=None -> all cells
    sparse = _df(hybrid_sparse_rrf(
        index_dir, cf.ensure_hashed_vec_store(SF), queries,
        k=cf.TOP_K, k_cand=cf.K_CAND_HYBRID_IVF, dim=ts.HASHED_TFIDF_DIM,
    ))

    assert len(ivf) == len(sparse) > 0
    pd.testing.assert_frame_equal(ivf, sparse[ivf.columns])


def test_hybrid_ivf_pruned_probe_scans_strict_subset(ray_session):
    """Pruning evidence is per-QUERY-SET: the read covers the UNION of
    probed cells, so a small query batch at nprobe=1 must open strictly
    fewer partition dirs / rows / bytes than the corpus (the full
    39-query conformance batch legitimately unions to all cells)."""
    import pyarrow.compute as pc

    from semantic_pdf_search_engine_ray.pipelines import conformance as cf
    from semantic_pdf_search_engine_ray.pipelines import textstats as ts
    from semantic_pdf_search_engine_ray.pipelines.rerank import (
        hybrid_ivf_rrf,
    )

    index_dir = cf.ensure_index(SF)
    dvec_dir = cf.ensure_dense_vec_store(SF)
    full_q = cf.derive_query_table(index_dir)
    small_q = full_q.filter(pc.less(full_q.column("query_id"), 3))

    pruned_stats: dict = {}
    pruned = _df(hybrid_ivf_rrf(
        index_dir, dvec_dir, small_q, k=cf.TOP_K,
        k_cand=cf.K_CAND_HYBRID_IVF, dim=ts.HASHED_TFIDF_DIM,
        n_cells=cf.HYBRID_IVF_CELLS, nprobe=1, scan_stats=pruned_stats,
    ))

    assert pruned_stats["cells_probed"] < pruned_stats["n_cells"]
    assert pruned_stats["rows_scanned"] < pruned_stats["n_vectors"]
    assert pruned_stats["bytes_scanned"] > 0

    # still a full fused top-k per query (the lexical leg always
    # contributes k_cand candidates, so fusion never starves)
    per_q = pruned.groupby("query_id")["rank"].agg(["min", "max", "count"])
    assert (per_q["min"] == 1).all()
    assert (per_q["count"] == per_q["max"]).all()
    assert set(pruned["query_id"]) == {0, 1, 2}

    # and the full conformance batch at full probe reads the corpus
    full_stats: dict = {}
    cf.q_hybrid_ivf_topk(SF, scan_stats=full_stats)
    assert full_stats["rows_scanned"] == full_stats["n_vectors"]
    assert pruned_stats["rows_scanned"] < full_stats["rows_scanned"]
    assert pruned_stats["bytes_scanned"] < full_stats["bytes_scanned"]
