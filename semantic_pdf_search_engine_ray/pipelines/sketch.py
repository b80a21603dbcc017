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
   restricted to candidates, then a tiny groupby. Top-k of the exact
   counts with a pinned tie-break (count desc, term asc) is the
   answer — bit-identical to the SQL oracle whenever the k-th term's
   frequency exceeds total/slots (with ``slots = 32*k`` that needs the
   k-th term above ~0.003% of tokens; English web text's k=20th word
   sits near 0.5%).

This "approximate proposes, exact disposes" shape is how sketches
should be used in a conformance-gated engine: the sketch bounds the
candidate set, the recount removes the approximation from the output.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from semantic_pdf_search_engine_ray.functions.tokenize import tokenize


def _misra_gries(tokens, slots: int) -> dict[str, int]:
    counters: dict[str, int] = {}
    for t in tokens:
        if t in counters:
            counters[t] += 1
        elif len(counters) < slots:
            counters[t] = 1
        else:
            dead = [k for k in counters if counters[k] == 1]
            for k in dead:
                del counters[k]
            if dead:
                for k in counters:
                    counters[k] -= 1
            else:
                for k in list(counters):
                    counters[k] -= 1
    return counters


def heavy_hitter_terms(
    docs: rd.Dataset, k: int = 20, slots_factor: int = 32
) -> pa.Table:
    """Exact global top-k terms as (rank, term, count), tie-break
    (count desc, term asc). See module docstring for the guarantee."""
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
        for text in batch.column("text").to_pylist():
            for t in tokenize(text):
                if t in cands:
                    counts[t] = counts.get(t, 0) + 1
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
    parts = [t for t in ray.get(exact.to_arrow_refs()) if t.num_rows]
    tbl = (pa.concat_tables(parts) if parts
           else pa.schema([("term", pa.string()),
                           ("count", pa.int64())]).empty_table())
    tbl = tbl.sort_by([("count", "descending"), ("term", "ascending")])
    top = tbl.slice(0, k)
    import numpy as np

    return pa.table(
        {
            "rank": pa.array(np.arange(1, top.num_rows + 1,
                                       dtype=np.int64)),
            "term": top.column("term"),
            "count": top.column("count").cast(pa.int64()),
        }
    )
