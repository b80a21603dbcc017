"""Deduplication pipelines — engine additions the reference lacks
entirely (re-uploading a PDF double-indexes it under a fresh uuid,
`/root/reference/src/qdrant.rs:48`; SURVEY.md §2.6 A5 documents url-dedup
as a deliberate upgrade). These are the training-data-scale operators:

    exact_dup_groups      md5(text) hash-partition -> keep min doc_id
    ngram_jaccard_pairs   exact word-n-gram Jaccard >= t (oracle baseline)
    minhash_lsh_pairs     MinHash band LSH candidates, exact-verified
    simhash_pairs         64-bit SimHash, banded hamming <= r
    embedding_dup_pairs   cosine >= t over an embedding column

Scale notes (the 100 TB story):
- exact: one hash-keyed groupby; uniform by construction.
- ngram_jaccard: the per-shingle pair blowup is quadratic in shingle df —
  it is the *correctness baseline* (SQL-checkable); the scale path is
  minhash_lsh_pairs, whose candidate set is linear in true-duplicate
  density. Band buckets are hash keys -> uniform shuffle.
- verification reads only candidate docs' texts via parquet predicate
  pushdown (candidates << corpus), broadcast once via ray.put.
- embedding brute-force broadcasts the normalized matrix once (ray.put)
  and streams batches against it; the scale path buckets by random
  hyperplane LSH / IVF cells first (see pipelines/similarity.py).
"""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from semantic_pdf_search_engine_ray.functions.shingle import (
    MinHasher,
    band_keys,
    hamming64,
    hash_shingles,
    jaccard,
    simhash64,
    word_shingles,
)
from semantic_pdf_search_engine_ray.functions.tokenize import tokenize

PAIRS_SCHEMA = pa.schema(
    [
        ("doc_id_a", pa.int64()),
        ("doc_id_b", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def _add_text_md5(batch: pa.Table) -> pa.Table:
    digests = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch.column("text").to_pylist()
    ]
    return batch.append_column("text_md5", pa.array(digests, type=pa.string()))


def exact_dup_groups(docs: rd.Dataset) -> rd.Dataset:
    """(text_md5, keep_id, n_copies): hash-partitioned exact dedup; the
    canonical representative is the smallest doc_id of each group."""
    return (
        docs.map_batches(_add_text_md5, batch_format="pyarrow")
        .select_columns(["text_md5", "doc_id"])
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="keep_id"),
                   Count(alias_name="n_copies"))
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (correctness baseline; SQL-checkable)
# --------------------------------------------------------------------------

def _shingle_rows_fn(n: int):
    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        shs: list[str] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for s in word_shingles(tokenize(text), n):
                ids.append(doc_id)
                shs.append(s)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "shingle": pa.array(shs, type=pa.string())}
        )

    return shingle_rows


def _pairs_of_group(group: pa.Table) -> pa.Table:
    ids = sorted(group.column("doc_id").to_pylist())
    a, b = [], []
    for x, y in itertools.combinations(ids, 2):
        a.append(x)
        b.append(y)
    return pa.table(
        {"doc_id_a": pa.array(a, type=pa.int64()),
         "doc_id_b": pa.array(b, type=pa.int64())}
    )


def ngram_jaccard_pairs(
    docs: rd.Dataset, n: int = 3, threshold: float = 0.5
) -> pa.Table:
    """All doc pairs with exact word-``n``-gram Jaccard >= threshold.

    Exact (no approximation): per-shingle pair expansion -> pair
    intersection counts -> Jaccard with per-doc set sizes. Output sorted
    (doc_id_a, doc_id_b); jaccard rounded to 6 dp (matches the SQL
    oracle's round()). Intended as the baseline/oracle for the LSH path.
    """
    shingles = docs.map_batches(
        _shingle_rows_fn(n), batch_format="pyarrow"
    ).materialize()

    sizes_tbl = shingles.groupby("doc_id").aggregate(
        Count(alias_name="set_size")
    ).to_arrow_refs()
    sizes_at = pa.concat_tables(ray.get(sizes_tbl))
    sizes = dict(
        zip(sizes_at.column("doc_id").to_pylist(),
            sizes_at.column("set_size").to_pylist())
    )
    sizes_ref = ray.put(sizes)

    inter = (
        shingles.groupby("shingle")
        .map_groups(_pairs_of_group, batch_format="pyarrow")
        .groupby(["doc_id_a", "doc_id_b"])
        .aggregate(Count(alias_name="inter"))
    )

    def to_jaccard(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch.column("doc_id_a").to_pylist()
        b = batch.column("doc_id_b").to_pylist()
        it = batch.column("inter").to_pylist()
        out_a, out_b, out_j = [], [], []
        for x, y, i in zip(a, b, it):
            j = i / (sz[x] + sz[y] - i)
            if j >= threshold:
                out_a.append(x)
                out_b.append(y)
                out_j.append(round(j, 6))
        return pa.table(
            {"doc_id_a": pa.array(out_a, type=pa.int64()),
             "doc_id_b": pa.array(out_b, type=pa.int64()),
             "jaccard": pa.array(out_j, type=pa.float64())}
        )

    parts = ray.get(
        inter.map_batches(to_jaccard, batch_format="pyarrow").to_arrow_refs()
    )
    parts = [p for p in parts if p.num_rows] or [PAIRS_SCHEMA.empty_table()]
    return pa.concat_tables(parts).sort_by(
        [("doc_id_a", "ascending"), ("doc_id_b", "ascending")]
    )


# --------------------------------------------------------------------------
# MinHash + LSH (the scale path), exact-verified
# --------------------------------------------------------------------------

class MinHashBandStage:
    """Actor-pool stage: (doc_id, text) -> (doc_id, band_key) rows.
    The hasher's permutation table is built once per actor (T1 pattern,
    `embed.rs:17-42` model singleton analog)."""

    def __init__(self, n: int, num_perm: int, bands: int):
        self.n = n
        self.bands = bands
        self.hasher = MinHasher(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        keys: list[int] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            base = hash_shingles(word_shingles(tokenize(text), self.n))
            if base.size == 0:
                continue  # shingle-less doc can never pass verification
            sig = self.hasher.signature(base)
            for key in band_keys(sig, self.bands):
                ids.append(doc_id)
                keys.append(key)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "band_key": pa.array(np.array(keys, dtype=np.uint64))}
        )


def minhash_lsh_pairs(
    docs_path: str | list[str],
    n: int = 3,
    threshold: float = 0.5,
    num_perm: int = 128,
    bands: int = 32,
) -> pa.Table:
    """Near-dup pairs via MinHash band LSH, verified by exact Jaccard.

    Output contract == ngram_jaccard_pairs (pairs with exact J >= t); LSH
    only prunes the candidate space. With 128 perms / 32 bands x 4 rows
    the probability of missing a J=0.9 pair is (1-0.9^4)^32 ~ 5e-15.
    Candidates' texts are re-read with predicate pushdown and broadcast
    once for verification (candidates << corpus).
    """
    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    # instance (task pool), not actor pool: the hasher's permutation table
    # is a 2 KB numpy array — serializing it per task is far cheaper than
    # actor startup
    bands_ds = docs.map_batches(
        MinHashBandStage(n, num_perm, bands), batch_format="pyarrow"
    )
    cand = bands_ds.groupby("band_key").map_groups(
        _pairs_of_group, batch_format="pyarrow"
    )
    cand_parts = [p for p in ray.get(cand.to_arrow_refs()) if p.num_rows]
    if not cand_parts:
        return PAIRS_SCHEMA.empty_table()
    # candidate dedup ACROSS bands happens driver-side: the candidate set
    # is linear in true-duplicate density (that is the point of LSH), so
    # it is tiny relative to the corpus; at 10^12 docs this one Arrow
    # group_by would become a second distributed groupby over the pair
    # stream — same semantics, one more exchange.
    cand_tbl = (
        pa.concat_tables(cand_parts)
        .group_by(["doc_id_a", "doc_id_b"])
        .aggregate([([], "count_all")])
        .rename_columns(["doc_id_a", "doc_id_b", "n_bands"])
    )

    want = sorted(
        set(cand_tbl.column("doc_id_a").to_pylist())
        | set(cand_tbl.column("doc_id_b").to_pylist())
    )
    texts = pads.dataset(docs_path).to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(want)
    )
    sets = {
        d: set(word_shingles(tokenize(t), n))
        for d, t in zip(texts.column("doc_id").to_pylist(),
                        texts.column("text").to_pylist())
    }
    sets_ref = ray.put(sets)

    def verify(batch: pa.Table) -> pa.Table:
        ss = ray.get(sets_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch.column("doc_id_a").to_pylist(),
                        batch.column("doc_id_b").to_pylist()):
            j = jaccard(ss[a], ss[b])
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 6))
        return pa.table(
            {"doc_id_a": pa.array(out_a, type=pa.int64()),
             "doc_id_b": pa.array(out_b, type=pa.int64()),
             "jaccard": pa.array(out_j, type=pa.float64())}
        )

    verified = rd.from_arrow(cand_tbl).map_batches(
        verify, batch_format="pyarrow"
    )
    parts = [p for p in ray.get(verified.to_arrow_refs()) if p.num_rows]
    parts = parts or [PAIRS_SCHEMA.empty_table()]
    return pa.concat_tables(parts).sort_by(
        [("doc_id_a", "ascending"), ("doc_id_b", "ascending")]
    )


def apply_near_dedup(
    docs_path: str | list[str],
    n: int = 3,
    threshold: float = 0.5,
) -> rd.Dataset:
    """The training-data payoff of the dedup family: the CLEANED corpus.

    Removal rule: any doc that is the larger member (doc_id_b) of a
    near-dup pair at exact Jaccard >= t is dropped; the smallest doc of a
    duplicate chain survives. Pairs come from the LSH scale path; the
    removal set (tiny) broadcasts into a streaming filter — the corpus
    itself never shuffles.
    """
    pairs = minhash_lsh_pairs(docs_path, n=n, threshold=threshold)
    remove = set(pairs.column("doc_id_b").to_pylist())
    remove_ref = ray.put(remove)

    def keep(batch: pa.Table) -> pa.Table:
        rm = ray.get(remove_ref)
        mask = [d not in rm for d in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(mask))

    return rd.read_parquet(docs_path, columns=["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# SimHash (banded hamming search)
# --------------------------------------------------------------------------

class SimHashStage:
    """(doc_id, text) -> (doc_id, simhash, chunk0..chunk3) rows.
    16-bit chunks implement the pigeonhole band: hamming(a,b) <= 3 implies
    at least one of 4 chunks is equal."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, sigs = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = tokenize(text)
            if not toks:
                continue
            terms: dict[str, int] = {}
            for t in toks:
                terms[t] = terms.get(t, 0) + 1
            keys = list(terms)
            sig = simhash64(keys, np.array([terms[k] for k in keys]))
            ids.append(doc_id)
            sigs.append(sig)
        sig_arr = np.array(sigs, dtype=np.uint64)
        cols = {"doc_id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(sig_arr)}
        for c in range(4):
            cols[f"chunk{c}"] = pa.array(
                ((sig_arr >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(
                    np.int64
                )
            )
        return pa.table(cols)


def simhash_pairs(docs: rd.Dataset, max_hamming: int = 3) -> pa.Table:
    """Doc pairs with SimHash hamming distance <= max_hamming (default 3,
    requiring the 4-chunk pigeonhole to be exact). Banded: group by each
    16-bit chunk value, pair within buckets, verify exact hamming, dedup."""
    sigs = docs.map_batches(SimHashStage(), batch_format="pyarrow").materialize()
    sig_tbl = pa.concat_tables(ray.get(sigs.to_arrow_refs()))
    sig_map = dict(
        zip(sig_tbl.column("doc_id").to_pylist(),
            sig_tbl.column("simhash").to_pylist())
    )
    sig_ref = ray.put(sig_map)

    def verify(batch: pa.Table) -> pa.Table:
        sm = ray.get(sig_ref)
        a = batch.column("doc_id_a").to_pylist()
        b = batch.column("doc_id_b").to_pylist()
        ha = np.array([sm[x] for x in a], dtype=np.uint64)
        hb = np.array([sm[x] for x in b], dtype=np.uint64)
        d = hamming64(ha, hb)
        keep = d <= max_hamming
        return pa.table(
            {"doc_id_a": pa.array(np.array(a, dtype=np.int64)[keep]),
             "doc_id_b": pa.array(np.array(b, dtype=np.int64)[keep]),
             "hamming": pa.array(d[keep])}
        )

    parts = []
    for c in range(4):
        cand = (
            rd.from_arrow(sig_tbl.select(["doc_id", f"chunk{c}"]))
            .groupby(f"chunk{c}")
            .map_groups(_pairs_of_group, batch_format="pyarrow")
        )
        chk = cand.map_batches(verify, batch_format="pyarrow")
        parts.extend(p for p in ray.get(chk.to_arrow_refs()) if p.num_rows)
    if not parts:
        return pa.schema(
            [("doc_id_a", pa.int64()), ("doc_id_b", pa.int64()),
             ("hamming", pa.int64())]
        ).empty_table()
    allp = pa.concat_tables(parts)
    # dedup pairs found via multiple chunks
    df = allp.to_pandas().drop_duplicates(["doc_id_a", "doc_id_b"])
    return pa.Table.from_pandas(
        df.sort_values(["doc_id_a", "doc_id_b"]), preserve_index=False
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_dup_pairs(
    emb_path: str | list[str],
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """(vec_id_a, vec_id_b, cosine) for all pairs with cosine >= t.

    Brute-force blocked matmul: the L2-normalized matrix is broadcast
    once (ray.put) and every batch streams against it — exact, float64.
    The approximate scale path is IVF cells (similarity.py) applied
    symmetrically; this op is the oracle-checkable baseline.
    """
    full = pads.dataset(emb_path).to_table(columns=[id_col, emb_col])
    ids = full.column(id_col).to_numpy()
    mat = np.array(full.column(emb_col).to_pylist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat_ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        bids = batch.column(id_col).to_numpy()
        bmat = np.array(batch.column(emb_col).to_pylist(), dtype=np.float64)
        bmat /= np.linalg.norm(bmat, axis=1, keepdims=True)
        sims = bmat @ all_mat.T
        rows_a, rows_b, rows_c = [], [], []
        for i, a in enumerate(bids):
            hits = np.flatnonzero((sims[i] >= threshold) & (all_ids > a))
            for h in hits:
                rows_a.append(int(a))
                rows_b.append(int(all_ids[h]))
                rows_c.append(round(float(sims[i, h]), 6))
        return pa.table(
            {"vec_id_a": pa.array(rows_a, type=pa.int64()),
             "vec_id_b": pa.array(rows_b, type=pa.int64()),
             "cosine": pa.array(rows_c, type=pa.float64())}
        )

    out = rd.read_parquet(emb_path, columns=[id_col, emb_col]).map_batches(
        pairs, batch_format="pyarrow"
    )
    parts = [p for p in ray.get(out.to_arrow_refs()) if p.num_rows]
    if not parts:
        return pa.schema(
            [("vec_id_a", pa.int64()), ("vec_id_b", pa.int64()),
             ("cosine", pa.float64())]
        ).empty_table()
    return pa.concat_tables(parts).sort_by(
        [("vec_id_a", "ascending"), ("vec_id_b", "ascending")]
    )
