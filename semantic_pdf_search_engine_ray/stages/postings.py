"""Tokenize stage: docs -> flat postings (term, doc_id, tf, dl).

Replaces the reference's embedding stage (`/root/reference/src/embed.rs:44-63`
``get_embeddings``: chunk texts -> 384-dim vectors, globally serialized by a
write lock) with the inverted-index feature extraction. Unlike the
reference's singleton+lock, this is a stateless, fully-vectorized
``map_batches`` task: Arrow C++ kernels do lower/strip/split, and an Arrow
hash group_by computes per-(doc,term) tf — no Python loop over rows or
tokens.

``dl`` (doc token count) is carried on every posting row so the encode
stage can compute block-max BM25 partials without a 10^12-row broadcast
of doc lengths (SURVEY.md §7 hard part b).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def flat_token_pairs(
    texts: pa.ChunkedArray | pa.Array,
) -> tuple[pa.Array, pa.Array]:
    """THE analyzer, Arrow-vectorized: text column -> (row_index, term)
    flat pairs. Single shared implementation — tokenization is a pinned
    index-format invariant, so every consumer (postings, doc lengths,
    hot-term sampling) must route through this one kernel."""
    cleaned = pc.replace_substring_regex(
        pc.utf8_lower(texts), "[^a-z0-9]+", " "
    )
    lists = pc.split_pattern(cleaned, " ")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    nonempty = pc.not_equal(flat, "")
    return parents.filter(nonempty), flat.filter(nonempty)


def term_crc32(terms: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Per-row crc32 of a term column, hashed once per UNIQUE term via
    dictionary encoding — the shared base of the engine's one
    term-partitioning key family (postings spill, positions spill)."""
    import zlib

    enc = pc.dictionary_encode(terms).combine_chunks()
    dic = enc.dictionary.to_pylist()
    base = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in dic),
        dtype=np.int64, count=len(dic),
    )
    return base[enc.indices.to_numpy(zero_copy_only=False)]


def group_rows_by_term(
    terms: pa.ChunkedArray | pa.Array, secondary: np.ndarray
) -> dict[str, np.ndarray]:
    """term -> row-index array, rows ordered by ``secondary`` within each
    term. The shared load-time grouping of both index readers (posting
    blocks by first_doc, position rows by doc_id) — one implementation of
    the dictionary-encode + lexsort + split idiom."""
    out: dict[str, np.ndarray] = {}
    if len(terms) == 0:
        return out
    enc = pc.dictionary_encode(terms).combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    vocab = enc.dictionary.to_pylist()
    order = np.lexsort((secondary, codes))
    sorted_codes = codes[order]
    bounds = np.flatnonzero(np.diff(sorted_codes)) + 1
    for grp in np.split(order, bounds):
        out[vocab[codes[grp[0]]]] = grp
    return out


def tokenize_doc_lens(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized doc_len (analyzer token count) for a text column."""
    parents, _flat = flat_token_pairs(texts)
    return np.bincount(
        parents.to_numpy(zero_copy_only=False), minlength=len(texts)
    ).astype(np.int64)


class AddDocLen:
    """map_batches callable: append a ``doc_len`` int64 column (no-op if
    the input already carries one — e.g. sharded builds pre-compute it)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "doc_len" in batch.column_names:
            return batch
        dl = tokenize_doc_lens(batch.column("text"))
        return batch.append_column("doc_len", pa.array(dl, type=pa.int64()))


class TokenizePostings:
    """map_batches callable: (doc_id, text, doc_len) -> postings rows
    (term, doc_id, tf, dl). Entirely Arrow-vectorized."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        parents, flat = flat_token_pairs(texts)

        pairs = pa.table({"i": parents, "term": flat})
        tf_tbl = pairs.group_by(["i", "term"]).aggregate([([], "count_all")])

        idx = tf_tbl.column("i")
        doc_ids = pc.take(batch.column("doc_id"), idx)
        if "doc_len" in batch.column_names:
            dl_all = batch.column("doc_len")
        else:
            # doc_len falls out of the parents we already computed — no
            # second pass over the strings
            dl_all = pa.array(
                np.bincount(
                    parents.to_numpy(zero_copy_only=False),
                    minlength=len(texts),
                ).astype(np.int64),
                type=pa.int64(),
            )
        dls = pc.take(dl_all, idx)

        return pa.table(
            {
                "term": tf_tbl.column("term"),
                "doc_id": doc_ids,
                "tf": pc.cast(tf_tbl.column("count_all"), pa.int64()),
                "dl": pc.cast(dls, pa.int64()),
            }
        )
