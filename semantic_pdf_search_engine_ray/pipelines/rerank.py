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
