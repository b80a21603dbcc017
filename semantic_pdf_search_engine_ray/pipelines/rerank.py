"""Hybrid re-ranking: BM25 candidates -> pseudo-relevance-feedback
embedding re-rank -> reciprocal-rank fusion.

The capability bridge between the reference's pure vector search
(`/root/reference/src/qdrant.rs:70-96`: every query is an embedding) and
this engine's lexical index: text queries retrieve BM25 candidates, the
top hit's embedding becomes the pseudo query vector (classic PRF), and
the final order fuses lexical and embedding ranks with RRF
(rrf = 1/(K+bm25_rank) + 1/(K+cos_rank), K=60).

Ray shape: candidate retrieval through the query actor pool, candidate
embeddings read with predicate pushdown and broadcast once (candidates
<< corpus), re-rank as a per-query ``groupby(query_id).map_groups`` —
no full-corpus vector scan anywhere.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

import ray
import ray.data as rd

from semantic_pdf_search_engine_ray.config import EngineConfig

RRF_K = 60

RERANK_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int64()),
        ("doc_id", pa.int64()),
        ("rrf", pa.float64()),
    ]
)


def bm25_prf_rerank(
    index_dir: str,
    emb_path: str | list[str],
    queries: pa.Table,
    *,
    k_candidates: int = 20,
    k: int = 5,
    cfg: EngineConfig | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """(query_id, rank, doc_id, rrf) — top-k after PRF+RRF re-ranking.

    Embedding pairing is ``vec_id == doc_id``; candidates without an
    embedding drop out (inner-join semantics, mirrored by the SQL
    oracle). rrf values are exact (two-term sums of unit fractions — no
    rounding needed for cross-engine comparison).
    """
    from semantic_pdf_search_engine_ray.pipelines.search import run_queries

    cfg = cfg or EngineConfig()
    cand_parts = [
        p
        for p in ray.get(
            run_queries(index_dir, rd.from_arrow(queries), cfg,
                        k=k_candidates).to_arrow_refs()
        )
        if p.num_rows
    ]
    if not cand_parts:
        return RERANK_SCHEMA.empty_table()
    cand = pa.concat_tables(cand_parts)

    want = sorted(set(cand.column("doc_id").to_pylist()))
    emb_tbl = pads.dataset(emb_path).to_table(
        columns=[id_col, emb_col], filter=pads.field(id_col).isin(want)
    )
    embs = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(emb_tbl.column(id_col).to_pylist(),
                        emb_tbl.column(emb_col).to_pylist())
    }
    embs_ref = ray.put(embs)

    def rerank_group(group: pa.Table) -> pa.Table:
        ev = ray.get(embs_ref)
        qid = int(group.column("query_id")[0].as_py())
        rows = sorted(
            zip(group.column("rank").to_pylist(),
                group.column("doc_id").to_pylist()),
        )
        rows = [(br, d) for br, d in rows if d in ev]  # inner join
        if not rows:
            return RERANK_SCHEMA.empty_table()
        pvec = ev[rows[0][1]]  # embedding of the bm25 rank-1 doc
        pn = np.linalg.norm(pvec)

        def cos(d: int) -> float:
            v = ev[d]
            dn = np.linalg.norm(v)
            if pn == 0.0 or dn == 0.0:
                return 0.0
            return float(v @ pvec / (dn * pn))

        cosv = {d: cos(d) for _, d in rows}
        by_cos = sorted(rows, key=lambda r: (-cosv[r[1]], r[1]))
        cos_rank = {d: i + 1 for i, (_, d) in enumerate(by_cos)}
        scored = [
            (1.0 / (RRF_K + br) + 1.0 / (RRF_K + cos_rank[d]), d)
            for br, d in rows
        ]
        scored.sort(key=lambda r: (-r[0], r[1]))
        top = scored[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(top), type=pa.int64()),
                "rank": pa.array(range(1, len(top) + 1), type=pa.int64()),
                "doc_id": pa.array([d for _, d in top], type=pa.int64()),
                "rrf": pa.array([s for s, _ in top], type=pa.float64()),
            }
        )

    out_parts = [
        p
        for p in ray.get(
            rd.from_arrow(cand)
            .groupby("query_id")
            .map_groups(rerank_group, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if p.num_rows
    ]
    if not out_parts:
        return RERANK_SCHEMA.empty_table()
    return pa.concat_tables(out_parts).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )


# --------------------------------------------------------------------------
# End-to-end hybrid retrieval: BM25 ∪ sparse-vector cosine -> RRF
# --------------------------------------------------------------------------

HYBRID_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int64()),
        ("doc_id", pa.int64()),
        ("rrf_r", pa.float64()),
    ]
)


def _lex_leg(
    index_dir: str,
    queries: pa.Table,
    cfg: EngineConfig,
    k_cand: int,
    num_partitions: int,
) -> rd.Dataset:
    """BM25 top-k_cand per query through the query actor pool, as a
    (query_id, doc_id, lrank) dataset — the lexical leg both hybrid
    variants fuse against."""
    from semantic_pdf_search_engine_ray.pipelines.search import run_queries

    return (
        run_queries(index_dir, rd.from_arrow(queries), cfg, k=k_cand)
        .map_batches(
            lambda t: pa.table({
                "query_id": t.column("query_id").cast(pa.int64()),
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "lrank": t.column("rank").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
        .materialize()
    )


def _query_bucket_weights(
    index_dir: str, queries: pa.Table, dim: int
) -> pa.Table:
    """Per-query hashed-tf-idf weights as a LONG (query_id, bucket,
    qval) table — L2-normalized, round-6, zero-weight buckets dropped
    (mirrors the oracle's ``WHERE w != 0``). Driver-side: |queries| x
    <= |query terms| rows."""
    import pyarrow.parquet as pq

    from semantic_pdf_search_engine_ray.functions.shingle import md5_hash64
    from semantic_pdf_search_engine_ray.functions.tokenize import tokenize
    from semantic_pdf_search_engine_ray.state import manifest as mf

    n_docs = int(mf.load_manifest(index_dir)["n_docs"])
    d = pq.read_table(os.path.join(index_dir, "dictionary"),
                      columns=["term", "df"])
    df_map = dict(zip(d.column("term").to_pylist(),
                      d.column("df").to_pylist()))
    q_ids: list[int] = []
    q_buckets: list[int] = []
    q_vals: list[float] = []
    for qid, qtext in zip(queries.column("query_id").to_pylist(),
                          queries.column("query").to_pylist()):
        acc: dict[int, float] = {}
        for term in set(tokenize(qtext)):
            dfv = df_map.get(term)
            if not dfv:
                continue
            b = md5_hash64(term) % dim
            acc[b] = acc.get(b, 0.0) + np.log(n_docs / dfv)
        # mirror the oracle's `WHERE w != 0` on the bucket sums: a term
        # with df == n_docs has ln(N/df) == 0 and must not emit a
        # zero-weight bucket row (it would let cos == 0 docs into the
        # vector leg's rank slots the oracle never assigns)
        acc = {b: v for b, v in acc.items() if v != 0.0}
        norm = float(np.sqrt(sum(v * v for v in acc.values())))
        if norm <= 0.0:
            continue
        for b, v in sorted(acc.items()):
            q_ids.append(int(qid))
            q_buckets.append(int(b))
            q_vals.append(round(v / norm, 6))
    return pa.table({
        "query_id": pa.array(q_ids, type=pa.int64()),
        "bucket": pa.array(q_buckets, type=pa.int64()),
        "qval": pa.array(q_vals, type=pa.float64()),
    })


def _fuse_rrf(
    lex: rd.Dataset, vec: rd.Dataset, k: int, num_partitions: int
) -> pa.Table:
    """RRF fusion over the full-outer union of the lexical and vector
    legs; top-k per query, rrf rounded to 6 dp for the SQL mirror."""
    if vec.count() == 0:
        fused = lex.map_batches(
            lambda t: pa.table({
                "query_id": t.column("query_id"),
                "doc_id": t.column("doc_id"),
                "lrank": t.column("lrank"),
                "vrank": pa.nulls(len(t), type=pa.int64()),
            }),
            batch_format="pyarrow",
        )
    else:
        fused = lex.join(
            vec, "full_outer", num_partitions,
            on=("query_id", "doc_id"), right_on=("query_id", "doc_id"),
        )

    def rrf_rows(t: pa.Table) -> pa.Table:
        lr = t.column("lrank").to_pylist()
        vr = t.column("vrank").to_pylist()
        rrf = [
            (0.0 if a is None else 1.0 / (RRF_K + a))
            + (0.0 if b is None else 1.0 / (RRF_K + b))
            for a, b in zip(lr, vr)
        ]
        return pa.table({
            "query_id": t.column("query_id").cast(pa.int64()),
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "rrf": pa.array(rrf, type=pa.float64()),
        })

    def fuse_topk(group: pa.Table) -> pa.Table:
        qid = int(group.column("query_id")[0].as_py())
        rows = sorted(
            zip(group.column("doc_id").to_pylist(),
                group.column("rrf").to_pylist()),
            key=lambda r: (-r[1], r[0]),
        )[:k]
        return pa.table({
            "query_id": pa.array([qid] * len(rows), type=pa.int64()),
            "rank": pa.array(range(1, len(rows) + 1), type=pa.int64()),
            "doc_id": pa.array([d for d, _ in rows], type=pa.int64()),
            "rrf_r": pa.array([round(s, 6) for _, s in rows],
                              type=pa.float64()),
        })

    parts = [
        p for p in ray.get(
            fused.map_batches(rrf_rows, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(fuse_topk, batch_format="pyarrow")
            .to_arrow_refs()
        ) if p.num_rows
    ]
    if not parts:
        return HYBRID_SCHEMA.empty_table()
    return pa.concat_tables(parts).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )


def hybrid_sparse_rrf(
    index_dir: str,
    hashed_vec_path: str,
    queries: pa.Table,
    *,
    k: int = 5,
    k_cand: int = 10,
    dim: int = 64,
    cfg: EngineConfig | None = None,
    num_partitions: int = 8,
) -> pa.Table:
    """Hybrid retrieval over ONE corpus: per text query, the BM25 top
    ``k_cand`` (lexical leg) is fused with the hashed-tf-idf cosine top
    ``k_cand`` (vector leg) by reciprocal-rank fusion over the UNION —
    the engine analog of the reference's semantic search + its README's
    "hybrid search" future improvement (`README.md:151-152`,
    `qdrant.rs:70-96`), with the learned embedder replaced by the
    deterministic public-knowledge featurizer (`textstats.hashed_tfidf`)
    so the whole path is SQL-mirrorable.

    The vector leg is SPARSE retrieval: the query's hashed vector has
    <= |query terms| non-zero buckets, so cosine candidates come from a
    bucket-key hash JOIN against the long-form vector table — the
    inverted-index formulation of vector search (only docs sharing a
    bucket are touched; nothing dense is scanned or broadcast). Both
    legs rank on round(score, 6) with doc_id tiebreak; fusion is
    rrf = 1/(60+r_lex) + 1/(60+r_vec) with a missing leg contributing 0
    (full-outer union). Output: (query_id, rank, doc_id, rrf_r) top-k.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    cfg = cfg or EngineConfig()

    # ---- lexical leg: BM25 top-k_cand through the query actor pool ----
    lex = _lex_leg(index_dir, queries, cfg, k_cand, num_partitions)

    # ---- query hashed vectors (driver-side: |queries| x <=2 buckets) ----
    qtbl = _query_bucket_weights(index_dir, queries, dim)
    q_ref = ray.put(qtbl)

    # ---- vector leg: bucket-join contributions, grouped cosine sum ----
    def contribs(batch: pa.Table) -> pa.Table:
        qt = ray.get(q_ref)
        j = batch.select(["doc_id", "bucket", "value"]).join(
            qt, keys=["bucket"], join_type="inner"
        )
        if j.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "contrib": pa.array([], type=pa.float64()),
            })
        # map-side partial sum (combiner) before the global groupby
        part = j.append_column(
            "contrib",
            pc.multiply(j.column("value"), j.column("qval")),
        ).group_by(["query_id", "doc_id"]).aggregate([("contrib", "sum")])
        return pa.table({
            "query_id": part.column("query_id").cast(pa.int64()),
            "doc_id": part.column("doc_id").cast(pa.int64()),
            "contrib": part.column("contrib_sum").cast(pa.float64()),
        })

    cos = (
        rd.read_parquet(hashed_vec_path)
        .map_batches(contribs, batch_format="pyarrow")
        .groupby(["query_id", "doc_id"])
        .aggregate(Sum("contrib", alias_name="cos"))
    )

    def vec_topk(group: pa.Table) -> pa.Table:
        qid = int(group.column("query_id")[0].as_py())
        rows = sorted(
            zip(group.column("doc_id").to_pylist(),
                group.column("cos").to_pylist()),
            key=lambda r: (-round(r[1], 6), r[0]),
        )[:k_cand]
        return pa.table({
            "query_id": pa.array([qid] * len(rows), type=pa.int64()),
            "doc_id": pa.array([d for d, _ in rows], type=pa.int64()),
            "vrank": pa.array(range(1, len(rows) + 1), type=pa.int64()),
        })

    vec = (
        cos.groupby("query_id")
        .map_groups(vec_topk, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )

    # ---- RRF fusion over the union of the two legs ----
    return _fuse_rrf(lex, vec, k, num_partitions)


def hybrid_ivf_rrf(
    index_dir: str,
    dense_vec_path: str,
    queries: pa.Table,
    *,
    k: int = 5,
    k_cand: int = 10,
    dim: int = 64,
    n_cells: int = 8,
    nprobe: int | None = None,
    cfg: EngineConfig | None = None,
    num_partitions: int = 8,
    scan_stats: dict | None = None,
) -> pa.Table:
    """Hybrid retrieval with the vector leg served by the IVF index —
    the composed dense path (VERDICT r4 next #7): text query ->
    hashed-tf-idf dense vector -> cell-partitioned IVF probed cosine
    top-k_cand -> RRF fusion with the BM25 leg. The scale successor to
    ``hybrid_sparse_rrf``'s bucket join: when hashed vectors densify
    (large corpora fill every bucket), the bucket join degenerates to
    all-pairs, while the IVF leg reads only the ``nprobe`` probed cells'
    partition directories per query batch.

    ``dense_vec_path`` is the (doc_id, embedding list<float64>[dim])
    store written by ``textstats.hashed_tfidf(dense=True, round6=True)``
    — the SAME round-6 values as the long form, so at full probe
    (nprobe=None) the dense dot product equals the sparse bucket-join
    cosine exactly and the whole pipeline is value-checked by the same
    SQL oracle as hybrid_sparse_rrf. cosine <= 0 candidates are dropped
    (non-negative features: cos > 0 == shares a non-zero bucket),
    ranking is round6-half-away with doc_id ASC ties — both legs and
    the fusion match the oracle bit-for-bit. ``scan_stats`` receives the
    IVF pruning evidence (rows/bytes scanned, cells probed)."""
    from semantic_pdf_search_engine_ray.pipelines.similarity import (
        ann_ivf_topk,
    )

    cfg = cfg or EngineConfig()

    # ---- lexical leg ----
    lex = _lex_leg(index_dir, queries, cfg, k_cand, num_partitions)

    # ---- densify the per-query hashed weights (driver-side, tiny) ----
    qtbl = _query_bucket_weights(index_dir, queries, dim)
    qid_arr = qtbl.column("query_id").to_numpy()
    qids = np.unique(qid_arr).astype(np.int64)
    pos = {int(q): i for i, q in enumerate(qids)}
    qmat = np.zeros((len(qids), dim), dtype=np.float64)
    for q, b, v in zip(qid_arr,
                       qtbl.column("bucket").to_numpy(),
                       qtbl.column("qval").to_numpy()):
        qmat[pos[int(q)], int(b)] = v
    if len(qids) == 0:
        return _fuse_rrf(lex, rd.from_arrow(
            pa.table({"query_id": pa.array([], type=pa.int64()),
                      "doc_id": pa.array([], type=pa.int64()),
                      "vrank": pa.array([], type=pa.int64())})
        ), k, num_partitions)

    # ---- vector leg: IVF probed cosine over the dense store ----
    # qvals are already L2-normalized round-6; do NOT re-normalize (the
    # oracle's qvec is exactly these values), so pass the matrix through
    ivf = ann_ivf_topk(
        dense_vec_path, k=k_cand, n_cells=n_cells, nprobe=nprobe,
        id_col="doc_id", emb_col="embedding", centroid_mode="pinned",
        queries=(qids, qmat), exclude_self=False, positive_only=True,
        rank_round6=True, normalize_corpus=False, scan_stats=scan_stats,
    )
    vec = rd.from_arrow(pa.table({
        "query_id": ivf.column("query_vec_id").cast(pa.int64()),
        "doc_id": ivf.column("vec_id").cast(pa.int64()),
        "vrank": ivf.column("rank").cast(pa.int64()),
    })).repartition(num_partitions).materialize()

    return _fuse_rrf(lex, vec, k, num_partitions)
