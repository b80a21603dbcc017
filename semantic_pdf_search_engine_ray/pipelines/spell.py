"""Did-you-mean spelling suggestions over the index dictionary.

The dictionary is the DATASET here (web-scale vocabulary is millions of
terms); the misspelled query terms are the tiny broadcast side. Each
vocabulary partition computes banded edit distances to every query term
and emits only candidates within ``max_dist``; the driver merges
|queries| x top_n rows. At larger vocabularies the per-batch scan drops
in for a SymSpell deletion index (same stage contract) — the
brute-banded form is the oracle-checkable baseline, exactly like
``ngram_jaccard_pairs`` is for LSH.

Ranking contract (mirrored by the DuckDB ``levenshtein`` oracle):
distance ASC, df DESC, term ASC, top ``top_n`` per query.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data as rd


def bounded_levenshtein(a: str, b: str, max_dist: int) -> int:
    """Standard unit-cost edit distance, banded: returns ``max_dist+1``
    as soon as the distance provably exceeds ``max_dist`` (Ukkonen's
    band — only cells within ``max_dist`` of the diagonal exist)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > max_dist:
        return max_dist + 1
    if la == 0 or lb == 0:
        return max(la, lb)
    big = max_dist + 1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo = max(1, i - max_dist)
        hi = min(lb, i + max_dist)
        cur = [big] * (lb + 1)
        cur[0] = i if i <= max_dist else big
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if min(cur[lo:hi + 1]) > max_dist:
            return big
        prev = cur
    return prev[lb] if prev[lb] <= max_dist else big


class SuggestStage:
    """(term, df) vocabulary batches -> (query_id, term, df, distance)
    candidate rows within ``max_dist`` of any broadcast query term."""

    def __init__(self, queries_ref, max_dist: int = 2):
        # queries_ref: ray.ObjectRef of list[(query_id, misspelled)]
        self._queries = ray.get(queries_ref)
        self._max_dist = max_dist

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_pylist()
        dfs = batch.column("df").to_pylist()
        out_q, out_t, out_d, out_dist = [], [], [], []
        for qid, miss in self._queries:
            for t, df in zip(terms, dfs):
                d = bounded_levenshtein(miss, t, self._max_dist)
                if d <= self._max_dist:
                    out_q.append(qid)
                    out_t.append(t)
                    out_d.append(df)
                    out_dist.append(d)
        return pa.table(
            {"query_id": pa.array(out_q, type=pa.int64()),
             "term": pa.array(out_t, type=pa.string()),
             "df": pa.array(out_d, type=pa.int64()),
             "distance": pa.array(out_dist, type=pa.int64())}
        )


def spell_suggestions(
    dictionary_path: str,
    queries: list[tuple[int, str]],
    max_dist: int = 2,
    top_n: int = 3,
) -> pa.Table:
    """(query_id, rank, term, distance): the ``top_n`` dictionary terms
    closest to each misspelled query term. See module docstring."""
    qref = ray.put(list(queries))
    cand = rd.read_parquet(
        dictionary_path, columns=["term", "df"]
    ).map_batches(
        SuggestStage(qref, max_dist), batch_format="pyarrow"
    )
    parts = [p for p in ray.get(cand.to_arrow_refs())
             if p.num_rows and "term" in p.schema.names]
    if not parts:
        return pa.table(
            {"query_id": pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int64()),
             "term": pa.array([], type=pa.string()),
             "distance": pa.array([], type=pa.int64())}
        )
    tbl = pa.concat_tables(parts).sort_by(
        [("query_id", "ascending"), ("distance", "ascending"),
         ("df", "descending"), ("term", "ascending")]
    )
    out_q, out_r, out_t, out_dist = [], [], [], []
    last_q, rank = None, 0
    for qid, t, dist in zip(tbl.column("query_id").to_pylist(),
                            tbl.column("term").to_pylist(),
                            tbl.column("distance").to_pylist()):
        rank = rank + 1 if qid == last_q else 1
        last_q = qid
        if rank <= top_n:
            out_q.append(qid)
            out_r.append(rank)
            out_t.append(t)
            out_dist.append(dist)
    return pa.table(
        {"query_id": pa.array(out_q, type=pa.int64()),
         "rank": pa.array(out_r, type=pa.int64()),
         "term": pa.array(out_t, type=pa.string()),
         "distance": pa.array(out_dist, type=pa.int64())}
    )
