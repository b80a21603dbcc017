"""Sketch-based heavy hitters: corpus-wide top-k terms without a
vocabulary-sized shuffle.

The naive plan (token rows -> groupby term -> global top-k) shuffles
one row per TOKEN — at 100 TB that is the biggest exchange in the whole
engine for an answer of k rows. This operator uses the standard
two-phase trick that keeps the answer EXACT:

1. **Sketch (map-side)**: each batch builds a Misra-Gries summary with
   ``slots`` counters. MG guarantees every term with batch frequency
   > batch_tokens/slots survives with a nonzero counter; summing over
   batches, every term with GLOBAL frequency > total_tokens/slots
   appears in at least one batch summary (averaging argument). The
   per-batch output is ``slots`` rows, not one row per token.
2. **Exact recount**: the candidate union (small: slots x batches
   upper bound, in practice ~slots distinct strings) is re-counted
   exactly by a second streaming pass with map-side partial counts
   restricted to candidates, then a tiny groupby. The recount pass
   also tallies the total token count, and the survival precondition
   (k-th candidate count x slots > total tokens) is CHECKED at
   runtime — when a near-uniform distribution violates it, the
   operator falls back to the exact map-side-pre-aggregated groupby
   instead of returning a silently wrong top-k.

This "approximate proposes, exact disposes, verify the precondition"
shape is how sketches should be used in a conformance-gated engine.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from semantic_pdf_search_engine_ray.functions.tokenize import tokenize

# groupby key reserved for the total-token tally: cannot collide with a
# real term, which always matches TOKEN_PATTERN ([a-z0-9]+)
_TOTAL_KEY = "\x00total"


def _misra_gries(tokens, slots: int) -> dict[str, int]:
    counters: dict[str, int] = {}
    for t in tokens:
        if t in counters:
            counters[t] += 1
        elif len(counters) < slots:
            counters[t] = 1
        else:  # canonical MG decrement: all counters -1, drop zeros
            for k in list(counters):
                counters[k] -= 1
                if not counters[k]:
                    del counters[k]
    return counters


def _rank_table(tbl: pa.Table, k: int) -> pa.Table:
    import numpy as np

    tbl = tbl.sort_by([("count", "descending"), ("term", "ascending")])
    top = tbl.slice(0, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, top.num_rows + 1,
                                       dtype=np.int64)),
            "term": top.column("term"),
            "count": top.column("count").cast(pa.int64()),
        }
    )


def _counts_to_table(ds: rd.Dataset) -> pa.Table:
    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.schema(
            [("term", pa.string()), ("count", pa.int64())]
        ).empty_table()
    return pa.concat_tables(parts)


def _exact_topk(docs: rd.Dataset, k: int) -> pa.Table:
    """Fallback: exact top-k via map-side pre-aggregated term counts +
    vocabulary-sized groupby. Correct for ANY distribution; the big
    exchange is why the sketch path is preferred when its precondition
    holds."""
    from collections import Counter

    def partial_counts(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch.column("text").to_pylist():
            c.update(tokenize(text))
        terms = sorted(c)
        return pa.table(
            {"term": pa.array(terms, type=pa.string()),
             "count": pa.array([c[t] for t in terms], type=pa.int64())}
        )

    full = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("count", alias_name="count"))
    )
    return _rank_table(_counts_to_table(full), k)


def heavy_hitter_terms(
    docs: rd.Dataset, k: int = 20, slots_factor: int = 64
) -> pa.Table:
    """Exact global top-k terms as (rank, term, count), tie-break
    (count desc, term asc). See module docstring for the guarantee and
    the runtime-checked fallback."""
    slots = k * slots_factor

    def mg_batch(batch: pa.Table) -> pa.Table:
        import itertools

        # one summary per batch: MG over the batch's whole token stream
        tokens = itertools.chain.from_iterable(
            tokenize(t) for t in batch.column("text").to_pylist()
        )
        counters = _misra_gries(tokens, slots)
        return pa.table({"term": pa.array(sorted(counters),
                                          type=pa.string())})

    cand_parts = ray.get(
        docs.map_batches(mg_batch, batch_format="pyarrow").to_arrow_refs()
    )
    candidates: set[str] = set()
    for p in cand_parts:
        # a fully-empty input dataset yields schema-less empty blocks
        if "term" in p.schema.names:
            candidates.update(p.column("term").to_pylist())
    if not candidates:  # empty / token-less corpus: nothing to recount
        return pa.table(
            {"rank": pa.array([], type=pa.int64()),
             "term": pa.array([], type=pa.string()),
             "count": pa.array([], type=pa.int64())}
        )
    cand_ref = ray.put(frozenset(candidates))

    def recount(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        counts: dict[str, int] = {}
        total = 0
        for text in batch.column("text").to_pylist():
            for t in tokenize(text):
                total += 1
                if t in cands:
                    counts[t] = counts.get(t, 0) + 1
        counts[_TOTAL_KEY] = total  # tallied through the same groupby
        terms = sorted(counts)
        return pa.table(
            {"term": pa.array(terms, type=pa.string()),
             "count": pa.array([counts[t] for t in terms],
                               type=pa.int64())}
        )

    exact = (
        docs.map_batches(recount, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("count", alias_name="count"))
    )
    tbl = _counts_to_table(exact)
    import pyarrow.compute as pc

    is_total = pc.equal(tbl.column("term"), _TOTAL_KEY)
    total_rows = tbl.filter(is_total)
    total = int(total_rows.column("count")[0].as_py()) if total_rows.num_rows else 0
    tbl = tbl.filter(pc.invert(is_total))
    out = _rank_table(tbl, k)

    # Survival precondition, CHECKED at runtime: a non-candidate term
    # has global frequency <= total/slots, so the sketch answer is
    # provably exact when (a) the candidate counts cover every token
    # (candidates == whole vocabulary), or (b) we have k results and
    # the k-th strictly beats the non-candidate frequency bound (no
    # tie is possible either, since kth > total/slots >= any
    # non-candidate). Otherwise fall back to the exact groupby rather
    # than return a silently wrong top-k.
    cand_sum = int(pc.sum(tbl.column("count")).as_py() or 0)
    if cand_sum == total:
        return out
    if out.num_rows == k:
        kth = int(out.column("count")[k - 1].as_py())
        if kth * slots > total:
            return out
    return _exact_topk(docs, k)


