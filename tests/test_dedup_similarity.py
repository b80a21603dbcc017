"""Dedup family + similarity search: the LSH/banded paths must agree
with their exact baselines (the oracle-checkable contracts)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_minhash_lsh_equals_exact_jaccard(ray_session, docs_ds):
    from semantic_pdf_search_engine_ray.pipelines.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    exact = ngram_jaccard_pairs(docs_ds, n=3, threshold=0.5)
    lsh = minhash_lsh_pairs(f"{SF}/documents.parquet", n=3, threshold=0.5)
    assert exact.num_rows > 0  # fixture plants near-dups
    assert exact.to_pydict() == lsh.to_pydict()


def test_exact_dup_groups_cover_all_docs(ray_session, docs_ds):
    from semantic_pdf_search_engine_ray.pipelines.dedup import exact_dup_groups

    groups = exact_dup_groups(docs_ds).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert groups["n_copies"].sum() == n_docs
    assert groups["keep_id"].is_unique


def test_simhash_pairs_catch_near_dups(ray_session, docs_ds):
    from semantic_pdf_search_engine_ray.pipelines.dedup import (
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    sh = simhash_pairs(docs_ds, max_hamming=3)
    got = set(zip(sh.column("doc_id_a").to_pylist(),
                  sh.column("doc_id_b").to_pylist()))
    assert all(h <= 3 for h in sh.column("hamming").to_pylist())
    # SimHash is approximate: most (not all) very-near dups land within
    # hamming 3 — tf shifts can flip more bits even at J >= 0.98.
    exact = ngram_jaccard_pairs(docs_ds, n=3, threshold=0.98)
    want = set(zip(exact.column("doc_id_a").to_pylist(),
                   exact.column("doc_id_b").to_pylist()))
    assert want, "fixture should contain J>=0.98 pairs"
    assert len(want & got) >= len(want) * 0.7


def test_embedding_dup_pairs_match_numpy(ray_session):
    from semantic_pdf_search_engine_ray.pipelines.dedup import embedding_dup_pairs

    got = embedding_dup_pairs(f"{SF}/embeddings.parquet", threshold=0.4)
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    iu = np.triu_indices(len(ids), 1)
    mask = sims[iu] >= 0.4
    want = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(iu[0][mask], iu[1][mask])
    }
    assert set(zip(got.column("vec_id_a").to_pylist(),
                   got.column("vec_id_b").to_pylist())) == want


def test_ann_ivf_full_probe_equals_brute(ray_session):
    from semantic_pdf_search_engine_ray.pipelines.similarity import (
        ann_brute_topk,
        ann_ivf_topk,
    )

    brute = ann_brute_topk(f"{SF}/embeddings.parquet", k=5, num_queries=8)
    ivf = ann_ivf_topk(
        f"{SF}/embeddings.parquet", k=5, num_queries=8, n_cells=8, nprobe=None
    )
    assert brute.num_rows == 40
    assert brute.to_pydict() == ivf.to_pydict()


def test_ann_brute_matches_numpy_reference(ray_session):
    from semantic_pdf_search_engine_ray.pipelines.similarity import ann_brute_topk

    got = ann_brute_topk(f"{SF}/embeddings.parquet", k=3, num_queries=4)
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    order = np.argsort(ids, kind="stable")
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    for qpos in order[:4]:
        qid = int(ids[qpos])
        sims = mat[qpos] @ mat.T
        cand = [(i, s) for i, s in zip(ids, sims) if i != qid]
        cand.sort(key=lambda x: (-x[1], x[0]))
        mask = [q == qid for q in got.column("query_vec_id").to_pylist()]
        sub = got.filter(pa.array(mask))
        assert sub.column("vec_id").to_pylist() == [int(c[0]) for c in cand[:3]]


def _write_dup_corpus(tmp_path):
    """Crafted corpus: exact-dup group A (2 copies), exact-dup group B
    (3 copies, near-dup of A), and unrelated fillers — exercises the
    in-bucket exact-group collapse and member-level pair expansion."""
    base = ("the quick brown fox jumps over the lazy dog while the "
            "sleepy cat watches from the warm windowsill every morning")
    near = base.replace("warm windowsill", "cold doorstep")
    rows = {
        "doc_id": [10, 11, 20, 21, 22, 30, 31],
        "text": [base, base, near, near, near,
                 "completely unrelated text about distributed query engines",
                 "another unrelated document discussing parquet file layouts"],
    }
    path = str(tmp_path / "dupdocs.parquet")
    pq.write_table(pa.table(rows), path)
    return path


def test_minhash_expansion_covers_exact_dup_groups(ray_session, tmp_path):
    from semantic_pdf_search_engine_ray.pipelines.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    import ray.data as rd

    path = _write_dup_corpus(tmp_path)
    got = minhash_lsh_pairs(path, n=3, threshold=0.5)
    exact = ngram_jaccard_pairs(
        rd.read_parquet(path, columns=["doc_id", "text"]), n=3, threshold=0.5
    )
    assert got.to_pydict() == exact.to_pydict()
    pairs = set(zip(got.column("doc_id_a").to_pylist(),
                    got.column("doc_id_b").to_pylist()))
    # 1 within-A + 3 within-B + 6 cross pairs
    assert pairs == {(10, 11), (20, 21), (20, 22), (21, 22),
                     (10, 20), (10, 21), (10, 22),
                     (11, 20), (11, 21), (11, 22)}
    jac = dict(zip(zip(got.column("doc_id_a").to_pylist(),
                       got.column("doc_id_b").to_pylist()),
                   got.column("jaccard").to_pylist()))
    assert jac[(10, 11)] == 1.0 and jac[(20, 21)] == 1.0
    assert jac[(10, 20)] == jac[(11, 22)] < 1.0


def test_simhash_matches_brute_force_signatures(ray_session, tmp_path):
    from semantic_pdf_search_engine_ray.functions.shingle import (
        hamming64,
        simhash64,
    )
    from semantic_pdf_search_engine_ray.functions.tokenize import tokenize
    from semantic_pdf_search_engine_ray.pipelines.dedup import simhash_pairs
    import ray.data as rd

    path = _write_dup_corpus(tmp_path)
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    got = simhash_pairs(docs, max_hamming=3)
    tbl = pq.read_table(path)
    sigs = {}
    for d, t in zip(tbl.column("doc_id").to_pylist(),
                    tbl.column("text").to_pylist()):
        toks = tokenize(t)
        tf = {}
        for w in toks:
            tf[w] = tf.get(w, 0) + 1
        keys = list(tf)
        sigs[d] = simhash64(keys, np.array([tf[k] for k in keys]))
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = int(hamming64(np.array([sigs[a]], dtype=np.uint64),
                              np.array([sigs[b]], dtype=np.uint64))[0])
            if h <= 3:
                want[(a, b)] = h
    have = dict(zip(zip(got.column("doc_id_a").to_pylist(),
                        got.column("doc_id_b").to_pylist()),
                    got.column("hamming").to_pylist()))
    assert have == want
    assert (10, 11) in have and have[(10, 11)] == 0


def test_ann_ivf_pruned_read_touches_only_probed_cells(ray_session):
    """The cell-partitioned layout must prune at the read: with nprobe=1
    the scan covers only the probed partition dirs, not the corpus."""
    from semantic_pdf_search_engine_ray.pipelines.similarity import ann_ivf_topk

    stats: dict = {}
    out = ann_ivf_topk(
        f"{SF}/embeddings.parquet", k=3, num_queries=4, n_cells=8,
        nprobe=1, scan_stats=stats,
    )
    assert out.num_rows > 0
    assert stats["cells_probed"] < stats["n_cells"]
    assert stats["rows_scanned"] < stats["n_vectors"]
    assert stats["bytes_scanned"] > 0
    # full probe reads everything and stays exact
    full: dict = {}
    ann_ivf_topk(
        f"{SF}/embeddings.parquet", k=3, num_queries=4, n_cells=8,
        nprobe=None, scan_stats=full,
    )
    assert full["rows_scanned"] == full["n_vectors"]


def test_dedup_dataset_forms_match_table_wrappers(ray_session, tmp_path):
    """The _ds forms are the scale contract: same pairs as the table
    wrappers, and the apply paths drop duplicates via a distributed
    anti-join (no driver removal set)."""
    import ray.data as rd
    from semantic_pdf_search_engine_ray.pipelines.dedup import (
        apply_near_dedup,
        minhash_lsh_pairs,
        minhash_lsh_pairs_ds,
    )

    path = _write_dup_corpus(tmp_path)
    tbl = minhash_lsh_pairs(path, n=3, threshold=0.5)
    ds_rows = sorted(
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in minhash_lsh_pairs_ds(path, n=3, threshold=0.5)
        .take_all()
    )
    tbl_rows = sorted(zip(tbl.column("doc_id_a").to_pylist(),
                          tbl.column("doc_id_b").to_pylist(),
                          tbl.column("jaccard").to_pylist()))
    assert ds_rows == tbl_rows

    cleaned = sorted(
        r["doc_id"] for r in apply_near_dedup(path, n=3, threshold=0.5)
        .take_all()
    )
    removed = set(tbl.column("doc_id_b").to_pylist())
    expected = sorted(
        d for d in rd.read_parquet(path).unique("doc_id")
        if d not in removed
    )
    assert cleaned == expected  # survivors = corpus minus pair b-sides


def test_apply_near_dedup_no_duplicates_returns_full_corpus(
    ray_session, tmp_path
):
    """Empty pair list (no near-dups): the anti-join path must not
    crash on the empty removal side and must keep every doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from semantic_pdf_search_engine_ray.pipelines.dedup import (
        apply_near_dedup,
    )

    rows = {
        "doc_id": [1, 2],
        "text": [
            "completely unrelated text about distributed query engines",
            "another unrelated document discussing parquet file layouts",
        ],
    }
    path = str(tmp_path / "nodups.parquet")
    pq.write_table(pa.table(rows), path)
    out = sorted(r["doc_id"] for r in
                 apply_near_dedup(path, n=3, threshold=0.5).take_all())
    assert out == [1, 2]


def test_global_line_dedup_removes_cross_doc_duplicates(
    ray_session, tmp_path
):
    """Cross-doc line dedup on a crafted multi-line corpus with real
    duplicate lines: values must match the SQL oracle, first occurrence
    in (doc_id, idx) order survives, blank lines never participate."""
    import hashlib

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_pdf_search_engine_ray.pipelines import conformance as cf
    from semantic_pdf_search_engine_ray.pipelines.dedup import (
        global_line_dedup,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "alpha one\n\nshared line\nunique a",
            "shared line\nbeta two\n   \nshared line",
            "unique c\nshared line",
            "",
        ]),
    })
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)

    got = (
        global_line_dedup(path, num_partitions=4)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{path}'")
    ref = (
        con.execute(cf.ORACLE_SQL["global_line_dedup"]).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  ref[sorted(ref.columns)])

    # doc 0 keeps everything (all first occurrences); doc 1 loses BOTH
    # copies of "shared line" but keeps the blank-ish line; doc 2
    # loses its copy too
    by_doc = {r.doc_id: r for r in got.itertuples()}
    assert by_doc[0].n_lines_kept == 4
    assert by_doc[1].n_lines_kept == 2
    assert by_doc[1].cleaned_md5 == hashlib.md5(
        "beta two\n   ".encode()).hexdigest()
    assert by_doc[2].n_lines_kept == 1
    assert by_doc[3].n_lines_kept == 1  # the single empty line


def test_kmeans_lloyd_iterates_and_is_stable(ray_session):
    """The fit must actually move: 3-round assignment differs from the
    0-round (pinned-centroid) assignment somewhere, and reruns are
    bit-identical (fixed-point integers leave no room for drift)."""
    from semantic_pdf_search_engine_ray.pipelines.similarity import (
        kmeans_lloyd,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    a = kmeans_lloyd(path, n_iters=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b = kmeans_lloyd(path, n_iters=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (a["cluster"].values == b["cluster"].values).all()
    assert (a["sq_dist"].values == b["sq_dist"].values).all()
    first = kmeans_lloyd(path, n_iters=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (a["cluster"].values != first["cluster"].values).any(), \
        "3 Lloyd rounds changed nothing — update step is dead"
    # mean squared distance must not increase across rounds (Lloyd
    # monotonicity, up to the 1-micro-unit truncation perturbation)
    assert a["sq_dist"].mean() <= first["sq_dist"].mean() * 1.001
