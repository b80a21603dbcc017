"""Posting-block encoding: sorted flat postings -> compressed index rows.

The wide step the reference delegated to Qdrant's upsert
(`/root/reference/src/qdrant.rs:36-68` ``store_embeddings``) is owned
natively here: after the (term, doc_id) exchange, each maximal run of a
term inside a batch becomes delta+varint posting blocks of
``cfg.block_size`` docs with a per-block max of the idf-independent BM25
partial ``tfn = tf / (tf + k1*(1 - b + b*dl/avgdl))`` — so block-max WAND
upper bounds are ``idf*(k1+1)*max_tfn``, computable at query time once the
global df is known (this is what makes salted/partial groups mergeable
without re-encoding).

Blocks are self-contained (first doc_id absolute), so a term's posting
list may be built from several independent runs (block-boundary splits in
sort mode, salt sub-groups in groupby mode) and simply concatenated in
doc_id order at read time — FIXTURES.md invariant 3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from semantic_pdf_search_engine_ray.functions.codec import (
    encode_doc_ids,
    encode_tfs,
)

BLOCKS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("n_docs", pa.int64()),
        ("max_tfn", pa.float64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
    ]
)


def compute_tfn(
    tf: np.ndarray, dl: np.ndarray, k1: float, b: float, avgdl: float
) -> np.ndarray:
    """The pinned BM25 tf-normalization (float64; the oracle and the query
    path must evaluate the exact same expression tree for bit-identity)."""
    return tf / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def encode_run(
    term: str,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    tfns: np.ndarray,
    block_size: int,
) -> list[tuple]:
    """One sorted (doc_id asc) posting run -> block rows."""
    rows = []
    n = len(doc_ids)
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        d = doc_ids[s:e]
        rows.append(
            (
                term,
                int(d[0]),
                int(d[-1]),
                e - s,
                float(tfns[s:e].max()),
                encode_doc_ids(d),
                encode_tfs(tfs[s:e]),
            )
        )
    return rows


class EncodeBlocks:
    """map_batches callable over (term, doc_id, tf, dl) batches sorted by
    (term, doc_id). Emits BLOCKS_SCHEMA rows. Works on *partial* term runs:
    a term crossing a batch boundary yields independent, mergeable blocks."""

    def __init__(self, k1: float, b: float, avgdl: float, block_size: int):
        self.k1 = k1
        self.b = b
        self.avgdl = avgdl
        self.block_size = block_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return BLOCKS_SCHEMA.empty_table()
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        doc_ids = batch.column("doc_id").to_numpy()
        tfs = batch.column("tf").to_numpy()
        dls = batch.column("dl").to_numpy()
        tfns = compute_tfn(tfs, dls, self.k1, self.b, self.avgdl)

        # run boundaries (batch is sorted by term)
        change = np.flatnonzero(
            np.concatenate(([True], terms[1:] != terms[:-1]))
        )
        ends = np.concatenate((change[1:], [len(terms)]))

        out_rows: list[tuple] = []
        for s, e in zip(change, ends):
            out_rows.extend(
                encode_run(
                    terms[s],
                    doc_ids[s:e],
                    tfs[s:e],
                    tfns[s:e],
                    self.block_size,
                )
            )
        cols = list(zip(*out_rows))
        return pa.table(
            {
                "term": pa.array(cols[0], type=pa.string()),
                "first_doc": pa.array(cols[1], type=pa.int64()),
                "last_doc": pa.array(cols[2], type=pa.int64()),
                "n_docs": pa.array(cols[3], type=pa.int64()),
                "max_tfn": pa.array(cols[4], type=pa.float64()),
                "docs": pa.array(cols[5], type=pa.binary()),
                "tfs": pa.array(cols[6], type=pa.binary()),
            }
        )


def make_salter(
    hot_terms: set[str],
    doc_span: int,
    salt_buckets: int,
    doc_min: int = 0,
):
    """Returns a map_batches fn adding a ``salt`` int32 column.

    Salt is doc_id-range based (``salt = (doc_id - doc_min) * S //
    doc_span``) for hot terms, 0 otherwise — contiguous ranges, so
    per-salt sub-lists stay doc_id-sorted and concatenate in salt order
    into the full sorted posting list (SURVEY.md §4 skew row; FIXTURES.md
    invariant 3). ``doc_min`` matters for sharded sub-builds whose global
    doc_ids do not start at 0 (without the offset every row clamps to the
    last bucket and the hot term lands in one partition again).
    """
    hot = hot_terms

    def add_salt(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_numpy(zero_copy_only=False)
        doc_ids = batch.column("doc_id").to_numpy()
        is_hot = np.isin(terms, list(hot)) if hot else np.zeros(len(terms), bool)
        salt = np.where(
            is_hot,
            np.minimum(
                ((doc_ids - doc_min) * salt_buckets) // max(doc_span, 1),
                salt_buckets - 1,
            ),
            0,
        ).astype(np.int32)
        return batch.append_column("salt", pa.array(salt, type=pa.int32()))

    return add_salt


def encode_group_factory(k1: float, b: float, avgdl: float, block_size: int):
    """map_groups fn for the explicit groupby((term, salt)) shuffle mode.
    Each group is one (term, salt) posting sub-list; sort by doc_id happens
    here (groupby does not guarantee intra-group order)."""

    def encode_group(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column("doc_id").to_numpy(), kind="stable")
        g = group.take(pa.array(order))
        enc = EncodeBlocks(k1, b, avgdl, block_size)
        return enc(g.drop_columns(["salt"]) if "salt" in g.column_names else g)

    return encode_group
