"""Training sequence packing: map every document to its position in the
GPT-style concatenate-and-chunk token stream.

Semantics: all docs are conceptually concatenated in ``doc_id`` order
and the stream is cut into fixed ``capacity``-token sequences; each doc
reports the token offset where it starts and the first/last sequence
index it lands in. This is the bookkeeping a packed-pretraining writer
needs (which shard files contain which docs), and it is exactly a
GLOBAL PREFIX SUM — the scale-relevant primitive this module
implements distributed:

1. a vectorized count pass projects (doc_id, n_tokens) — 16 bytes/row
   leaves each read task, never the text;
2. one narrow ``sort("doc_id")`` range-partitions the pairs (the only
   exchange, and it moves two int64 columns, not the corpus);
3. a block-metadata pass collects (first_doc_id, last_doc_id,
   block_sum) per block — O(blocks) rows to the driver, which
   prefix-sums them (the same boundary-offset trick
   ``build.assign_doc_ids`` uses for rank assignment);
4. a streaming pass adds offset + within-block cumsum.

Token-less docs are excluded (they occupy no stream positions); the
SQL oracle mirrors with ``WHERE n_tokens > 0``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from semantic_pdf_search_engine_ray.config import TOKEN_PATTERN


def _count_batch(batch: pa.Table) -> pa.Table:
    lower = pc.utf8_lower(batch.column("text"))
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "n_tokens": pc.count_substring_regex(
                lower, TOKEN_PATTERN
            ).cast(pa.int64()),
        }
    )


def _pack_block_meta(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy()
    toks = batch.column("n_tokens").to_numpy()
    return pa.table(
        {
            "first_doc_id": pa.array(
                [int(ids[0]) if len(ids) else -1], type=pa.int64()
            ),
            "last_doc_id": pa.array(
                [int(ids[-1]) if len(ids) else -1], type=pa.int64()
            ),
            "block_sum": pa.array([int(toks.sum())], type=pa.int64()),
            "n_rows": pa.array([len(ids)], type=pa.int64()),
        }
    )


def token_pack(docs: rd.Dataset, capacity: int = 2048) -> rd.Dataset:
    """(doc_id, n_tokens, start_pos, seq_first, seq_last) for every doc
    with at least one token; see module docstring for the plan."""
    counts = docs.map_batches(_count_batch, batch_format="pyarrow")
    sorted_ds = counts.sort("doc_id").materialize()  # narrow: 16 B/row

    meta = sorted_ds.map_batches(
        _pack_block_meta, batch_format="pyarrow", batch_size=None
    ).take_all()
    meta = [m for m in meta if m.get("n_rows", 0) > 0]
    if not meta:  # empty corpus (Ray drops the schema of empty datasets)
        return rd.from_arrow(pa.table(
            {c: pa.array([], type=pa.int64())
             for c in ("doc_id", "n_tokens", "start_pos",
                       "seq_first", "seq_last")}
        ))
    meta.sort(key=lambda m: m["first_doc_id"])  # doc_id unique -> total
    offsets: dict[tuple[int, int], int] = {}
    running = 0
    for m in meta:
        offsets[(m["first_doc_id"], m["last_doc_id"])] = running
        running += m["block_sum"]

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {c: pa.array([], type=pa.int64())
                 for c in ("doc_id", "n_tokens", "start_pos",
                           "seq_first", "seq_last")}
            )
        ids = batch.column("doc_id").to_numpy()
        toks = batch.column("n_tokens").to_numpy()
        offset = offsets[(int(ids[0]), int(ids[-1]))]
        start = offset + np.concatenate(
            ([0], np.cumsum(toks[:-1]))
        ).astype(np.int64)
        keep = toks > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "n_tokens": pa.array(toks[keep], type=pa.int64()),
                "start_pos": pa.array(start[keep], type=pa.int64()),
                "seq_first": pa.array(start[keep] // capacity,
                                      type=pa.int64()),
                "seq_last": pa.array(
                    (start[keep] + toks[keep] - 1) // capacity,
                    type=pa.int64(),
                ),
            }
        )

    return sorted_ds.map_batches(
        assign, batch_format="pyarrow", batch_size=None
    )
