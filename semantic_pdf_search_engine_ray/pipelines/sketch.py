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




# --------------------------------------------------------------------------
# HyperLogLog distinct counting (the approximate DAU-class scale path)
# --------------------------------------------------------------------------

HLL_P = 12                       # 2^12 = 4096 buckets, ~1.6% std error
HLL_M = 1 << HLL_P
HLL_W = 64 - HLL_P               # rho window width (52 bits)
_TWO53 = float(1 << (HLL_W + 1))  # 2^53 as an exact double


def _hll_rho(remaining: int) -> int:
    """Position (1-based) of the leftmost set bit inside the 52-bit
    window; 53 when the window is all zeros. Mirrored in SQL as
    ``53 - length(bin(remaining))`` (bin() emits no leading zeros)."""
    return (HLL_W + 1) - remaining.bit_length() if remaining else HLL_W + 1


def hll_distinct_users(events: rd.Dataset) -> rd.Dataset:
    """Approximate distinct users per event_type via HyperLogLog
    (Flajolet et al. 2007) — the documented scale path next to the
    exact two-stage groupby (`windows.tumbling_distinct_users`): the
    exchange is ≤ |event_types| x 4096 REGISTER rows instead of one row
    per distinct user, so cardinality of the key space stops mattering.

    Everything up to the final estimate is INTEGER-exact and mirrored
    in SQL (md5-low64 hash, top-12-bit bucket, bit-length rho,
    power-of-two register sum in big-int), so the oracle pairing is a
    true value check, not a tolerance band; the closing float division
    + ln use expressions written identically on both sides.

    Output: (event_type, n_present, est_r) — occupied registers and
    the rounded cardinality estimate."""
    import math

    from semantic_pdf_search_engine_ray.functions.shingle import md5_hash64
    from ray.data.aggregate import Max

    mask = (1 << HLL_W) - 1

    def registers(batch: pa.Table) -> pa.Table:
        # map-side pre-aggregation: one (type, bucket) -> max rho dict
        # per batch, never one row per event
        best: dict[tuple[str, int], int] = {}
        for et, uid in zip(batch.column("event_type").to_pylist(),
                           batch.column("user_id").to_pylist()):
            h = md5_hash64(str(uid))
            key = (et, h >> HLL_W)
            rho = _hll_rho(h & mask)
            if rho > best.get(key, 0):
                best[key] = rho
        return pa.table({
            "event_type": pa.array([k[0] for k in best], type=pa.string()),
            "bucket": pa.array([k[1] for k in best], type=pa.int64()),
            "rho": pa.array(list(best.values()), type=pa.int64()),
        })

    regs = (
        events.map_batches(registers, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Max("rho", alias_name="m_rho"))
    )

    def estimate(group: pa.Table) -> pa.Table:
        rhos = group.column("m_rho").to_pylist()
        n_present = len(rhos)
        # exact big-int register sum, scaled by 2^53 (absent registers
        # contribute 2^-0 each)
        s = sum(1 << (HLL_W + 1 - r) for r in rhos) \
            + (HLL_M - n_present) * (1 << (HLL_W + 1))
        # expression written EXACTLY as in the SQL oracle (same
        # association order -> same IEEE rounding)
        e_raw = 0.7213 / (1 + 1.079 / 4096) * 4096 * 4096 \
            * 9007199254740992.0 / float(s)
        v = HLL_M - n_present
        if e_raw <= 2.5 * HLL_M and v > 0:
            e = 4096 * math.log(4096.0 / v)
        else:
            e = e_raw
        est_r = math.copysign(
            math.floor(abs(e) * 1e6 + 0.5), e) / 1e6
        return pa.table({
            "event_type": [group.column("event_type")[0].as_py()],
            "n_present": pa.array([n_present], type=pa.int64()),
            "est_r": pa.array([est_r], type=pa.float64()),
        })

    return regs.groupby("event_type").map_groups(
        estimate, batch_format="pyarrow"
    )


HLL_ORACLE_SQL = f"""
WITH h AS (
  SELECT event_type,
         CAST(md5_number_lower(user_id::VARCHAR) AS UBIGINT) AS hv
  FROM events
),
br AS (
  SELECT event_type,
         CAST(hv >> {HLL_W} AS BIGINT) AS bucket,
         CASE WHEN (hv & ((1::UBIGINT << {HLL_W}) - 1)) = 0
              THEN {HLL_W + 1}
              ELSE {HLL_W + 1}
                   - length(bin(hv & ((1::UBIGINT << {HLL_W}) - 1)))
         END AS rho
  FROM h
),
mx AS (SELECT event_type, bucket, max(rho) AS m_rho
       FROM br GROUP BY event_type, bucket),
agg AS (
  SELECT event_type,
         count(*)::BIGINT AS n_present,
         sum(CAST(1::UBIGINT << ({HLL_W + 1} - m_rho) AS HUGEINT))
           + CAST({HLL_M} - count(*) AS HUGEINT) * 9007199254740992
           AS s
  FROM mx GROUP BY event_type
)
SELECT event_type, n_present,
       round(CASE WHEN 0.7213 / (1 + 1.079 / 4096) * 4096 * 4096
                       * 9007199254740992.0 / CAST(s AS DOUBLE)
                       <= {int(2.5 * HLL_M)}.0
                   AND {HLL_M} - n_present > 0
              THEN 4096 * ln(4096.0 / ({HLL_M} - n_present))
              ELSE 0.7213 / (1 + 1.079 / 4096) * 4096 * 4096
                   * 9007199254740992.0 / CAST(s AS DOUBLE)
         END, 6) AS est_r
FROM agg
"""
