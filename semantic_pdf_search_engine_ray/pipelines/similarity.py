"""Similarity search over an embedding column (``list<float>``).

The Ray-Data-native analog of the reference's ANN serving layer
(`/root/reference/src/qdrant.rs:70-96` ``run_query``: embed -> Qdrant
top-5 Distance::Dot): queries are broadcast once (ray.put), every batch
of the corpus streams against the query matrix with a float64 blocked
matmul, per-batch top-k partials merge driver-side (k is tiny — the same
merge shape as the BM25 query path, stages/query.py).

    ann_brute_topk    exact cosine top-k (the oracle-checkable baseline)
    kmeans_centroids  deterministic Lloyd iterations on a sample
    ann_ivf_topk      IVF: coarse-quantize corpus into cells, probe the
                      nprobe nearest cells per query. nprobe=n_cells
                      degenerates to exact brute force (tested); smaller
                      nprobe is the recall/throughput knob at scale.

Scale notes: brute force is O(corpus x queries) but embarrassingly
parallel and branch-free — at 100 TB the IVF cell assignment becomes a
partitioning key (one parquet dir per cell) so a query touches only
nprobe/n_cells of the data at the read.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

import ray
import ray.data as rd

TOPK_SCHEMA = pa.schema(
    [
        ("query_vec_id", pa.int64()),
        ("rank", pa.int64()),
        ("vec_id", pa.int64()),
        ("cosine", pa.float64()),
    ]
)


def _normalize(mat: np.ndarray) -> np.ndarray:
    """L2-normalize rows; an all-zero vector stays zero (cosine 0 to
    everything) instead of dividing to NaN and poisoning top-k heaps."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(norms == 0.0, 1.0, norms)


def load_query_matrix(
    emb_path: str | list[str], num_queries: int, id_col: str, emb_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic query set: the ``num_queries`` lowest vec_ids."""
    tbl = pads.dataset(emb_path).to_table(columns=[id_col, emb_col])
    order = np.argsort(tbl.column(id_col).to_numpy(), kind="stable")[:num_queries]
    sub = tbl.take(pa.array(order))
    qids = sub.column(id_col).to_numpy().astype(np.int64)
    qmat = _normalize(np.array(sub.column(emb_col).to_pylist(), dtype=np.float64))
    return qids, qmat


def _merge_topk(parts: list[pa.Table], k: int) -> pa.Table:
    """Merge per-batch partial top-k tables into the global top-k per
    query (ties: cosine DESC, vec_id ASC — pinned like BM25's A1)."""
    heaps: dict[int, list] = {}
    for p in parts:
        for qid, vid, cos in zip(
            p.column("query_vec_id").to_pylist(),
            p.column("vec_id").to_pylist(),
            p.column("cosine").to_pylist(),
        ):
            h = heaps.setdefault(qid, [])
            item = (cos, -vid)
            if len(h) < k:
                heapq.heappush(h, item)
            elif item > h[0]:
                heapq.heapreplace(h, item)
    qs, rs, vs, cs = [], [], [], []
    for qid in sorted(heaps):
        top = sorted(heaps[qid], key=lambda x: (-x[0], -x[1]))
        for rank, (cos, nvid) in enumerate(top, start=1):
            qs.append(qid)
            rs.append(rank)
            vs.append(-nvid)
            cs.append(round(cos, 6))
    return pa.table(
        {
            "query_vec_id": pa.array(qs, type=pa.int64()),
            "rank": pa.array(rs, type=pa.int64()),
            "vec_id": pa.array(vs, type=pa.int64()),
            "cosine": pa.array(cs, type=pa.float64()),
        }
    )


def ann_brute_topk(
    emb_path: str | list[str],
    k: int = 5,
    num_queries: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k of every corpus vector (self excluded) for the
    ``num_queries`` lowest-id query vectors. Cosine rounded to 6 dp."""
    qids, qmat = load_query_matrix(emb_path, num_queries, id_col, emb_col)
    q_ref = ray.put((qids, qmat))

    def partial(batch: pa.Table) -> pa.Table:
        _qids, _qmat = ray.get(q_ref)
        bids = batch.column(id_col).to_numpy().astype(np.int64)
        bmat = _normalize(
            np.array(batch.column(emb_col).to_pylist(), dtype=np.float64)
        )
        sims = _qmat @ bmat.T  # (Q, B)
        qs, vs, cs = [], [], []
        for qi, qid in enumerate(_qids):
            row = sims[qi]
            mask = bids != qid  # exclude self
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            take = idx[np.lexsort((bids[idx], -row[idx]))[: k]]
            for t in take:
                qs.append(int(qid))
                vs.append(int(bids[t]))
                cs.append(float(row[t]))
        return pa.table(
            {
                "query_vec_id": pa.array(qs, type=pa.int64()),
                "vec_id": pa.array(vs, type=pa.int64()),
                "cosine": pa.array(cs, type=pa.float64()),
            }
        )

    out = rd.read_parquet(emb_path, columns=[id_col, emb_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    parts = [p for p in ray.get(out.to_arrow_refs()) if p.num_rows]
    return _merge_topk(parts, k) if parts else TOPK_SCHEMA.empty_table()


def kmeans_centroids(
    mat: np.ndarray, n_cells: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic Lloyd k-means on (already normalized) vectors.
    Plain numpy; sample-sized input (the IVF coarse quantizer is always
    trained on a driver-side sample, even at scale)."""
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ann_ivf_topk(
    emb_path: str | list[str],
    k: int = 5,
    num_queries: int = 10,
    n_cells: int = 8,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """IVF-style ANN: corpus vectors quantized to their nearest centroid
    cell; each query scans only its ``nprobe`` nearest cells.

    nprobe=None (default) probes ALL cells -> exactly equal to
    ann_brute_topk (tests assert this); small nprobe is the approximate
    scale configuration.
    """
    qids, qmat = load_query_matrix(emb_path, num_queries, id_col, emb_col)
    sample = pads.dataset(emb_path).head(4096, columns=[emb_col])
    smat = _normalize(np.array(sample.column(emb_col).to_pylist(), np.float64))
    cents = kmeans_centroids(smat, n_cells)
    nprobe = len(cents) if nprobe is None else min(nprobe, len(cents))
    # per query: the nprobe nearest cells
    probe = np.argsort(-(qmat @ cents.T), kind="stable", axis=1)[:, :nprobe]
    q_ref = ray.put((qids, qmat, cents, probe))

    def partial(batch: pa.Table) -> pa.Table:
        _qids, _qmat, _cents, _probe = ray.get(q_ref)
        bids = batch.column(id_col).to_numpy().astype(np.int64)
        bmat = _normalize(
            np.array(batch.column(emb_col).to_pylist(), dtype=np.float64)
        )
        cell = np.argmax(bmat @ _cents.T, axis=1)
        sims = _qmat @ bmat.T
        qs, vs, cs = [], [], []
        for qi, qid in enumerate(_qids):
            allowed = np.isin(cell, _probe[qi])
            mask = allowed & (bids != qid)
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            row = sims[qi]
            take = idx[np.lexsort((bids[idx], -row[idx]))[: k]]
            for t in take:
                qs.append(int(qid))
                vs.append(int(bids[t]))
                cs.append(float(row[t]))
        return pa.table(
            {
                "query_vec_id": pa.array(qs, type=pa.int64()),
                "vec_id": pa.array(vs, type=pa.int64()),
                "cosine": pa.array(cs, type=pa.float64()),
            }
        )

    out = rd.read_parquet(emb_path, columns=[id_col, emb_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    parts = [p for p in ray.get(out.to_arrow_refs()) if p.num_rows]
    return _merge_topk(parts, k) if parts else TOPK_SCHEMA.empty_table()
