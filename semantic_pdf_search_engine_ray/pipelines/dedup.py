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
- minhash/simhash are FULLY distributed: exact-duplicate texts collapse
  to one representative INSIDE each band bucket (all copies share every
  band key, so each bucket sees whole exact groups — m identical docs
  never become m^2/2 candidates), candidate dedup is a distributed
  groupby, verification tasks pushdown-read only their own batch's
  docs, and member-level expansion is two hash joins. The driver
  touches NOTHING — not the corpus, not the pair list: the ``_ds``
  forms return pair Datasets (persist with write_parquet), the apply
  forms drop duplicates via a distributed left-anti join on doc_id,
  and the ``pa.Table``-returning names are thin small-scale wrappers
  kept for the SQL-oracle gate.
- simhash uses Manku (WWW'07) 6-choose-3 block-combination tables:
  ~2^32-key buckets, in-bucket signature collapse + local hamming check.
- embedding brute-force broadcasts the normalized matrix once (ray.put)
  and streams batches against it; the scale path buckets by random
  hyperplane LSH / IVF cells first (see pipelines/similarity.py).
"""

from __future__ import annotations

import hashlib
import itertools
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from semantic_pdf_search_engine_ray.pipelines.similarity import (
    _list_col_to_mat,
)
from semantic_pdf_search_engine_ray.functions.num import (
    round6_half_away as _round6,
)
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
    docs: rd.Dataset, n: int = 3, threshold: float = 0.5,
    num_partitions: int = 8,
) -> pa.Table:
    """All doc pairs with exact word-``n``-gram Jaccard >= threshold.

    Exact (no approximation): per-shingle pair expansion -> pair
    intersection counts -> Jaccard via two hash JOINS against the
    per-doc set-size table (round 4: previously a doc_id->size Python
    dict shipped by ray.put — linear driver memory in corpus size; the
    joins keep the oracle runnable at validation scale). The per-shingle
    quadratic pair expansion remains — this is deliberately the exact
    baseline/oracle for the LSH path, not the production path. Output
    sorted (doc_id_a, doc_id_b); jaccard rounded to 6 dp (matches the
    SQL oracle's round()).
    """
    import pyarrow.compute as pc

    shingles = docs.map_batches(
        _shingle_rows_fn(n), batch_format="pyarrow"
    ).materialize()

    sizes = (
        shingles.groupby("doc_id").aggregate(Count(alias_name="set_size"))
        .repartition(num_partitions)  # unify block schemas for the join
        .materialize()
    )
    if sizes.count() == 0:
        return PAIRS_SCHEMA.empty_table()

    inter = (
        shingles.groupby("shingle")
        .map_groups(_pairs_of_group, batch_format="pyarrow")
        .groupby(["doc_id_a", "doc_id_b"])
        .aggregate(Count(alias_name="inter"))
        .repartition(num_partitions)
        .materialize()
    )
    if inter.count() == 0:
        return PAIRS_SCHEMA.empty_table()

    both = inter.join(
        sizes, "inner", num_partitions,
        on=("doc_id_a",), right_on=("doc_id",), right_suffix="_sa",
    ).join(
        sizes, "inner", num_partitions,
        on=("doc_id_b",), right_on=("doc_id",), right_suffix="_sb",
    )

    def to_jaccard(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_id_a").to_numpy()
        b = batch.column("doc_id_b").to_numpy()
        it = batch.column("inter").to_numpy().astype(np.float64)
        sa = batch.column("set_size").to_numpy().astype(np.float64)
        sb = batch.column("set_size_sb").to_numpy().astype(np.float64)
        j = it / (sa + sb - it)
        keep = j >= threshold
        return pa.table(
            {"doc_id_a": pa.array(a[keep], type=pa.int64()),
             "doc_id_b": pa.array(b[keep], type=pa.int64()),
             "jaccard": pa.array(np.round(j[keep], 6), type=pa.float64())}
        )

    parts = ray.get(
        both.map_batches(to_jaccard, batch_format="pyarrow").to_arrow_refs()
    )
    parts = [p for p in parts if p.num_rows] or [PAIRS_SCHEMA.empty_table()]
    return pa.concat_tables(parts).sort_by(
        [("doc_id_a", "ascending"), ("doc_id_b", "ascending")]
    )


# --------------------------------------------------------------------------
# MinHash + LSH (the scale path), exact-verified — fully distributed
# --------------------------------------------------------------------------

_KIND_CAND, _KIND_EXACT, _KIND_MEMBER = 0, 1, 2


def _filter_kind(ds: rd.Dataset, kind: int) -> rd.Dataset:
    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column("kind"), kind)).drop_columns(
            ["kind"]
        )

    return ds.map_batches(pick, batch_format="pyarrow")


def _to_table(ds: rd.Dataset, schema: pa.Schema) -> pa.Table:
    """Small-scale collection helper for the ``pa.Table`` oracle wrappers
    ONLY — the `_ds` pipelines never call it. At web scale, consume the
    Dataset forms (write_parquet / anti-join) instead."""
    parts = [p for p in ray.get(ds.to_arrow_refs()) if p.num_rows]
    if not parts:
        return schema.empty_table()
    return pa.concat_tables(
        [p.select(schema.names).cast(schema) for p in parts]
    )


def _expand_rep_pairs_ds(
    verified: rd.Dataset,
    bucket_out: rd.Dataset,
    value_name: str,
    num_partitions: int,
) -> rd.Dataset:
    """Expand representative-level pairs to member-level pairs — fully
    distributed (Dataset in, Dataset out; nothing touches the driver).

    Exact-duplicate docs were collapsed to one representative before
    candidate pairing; a verified rep pair extends to every member of
    both groups at the SAME value (identical content -> identical
    signature/shingles). The expansion is two hash joins of the verified
    pair Dataset against the (rep, member) rows — a rep with no exact
    group has no member rows, so the left-outer null coalesces back to
    the rep itself — then the exact-duplicate pairs (kind=EXACT, emitted
    once by band-0 buckets) are unioned in. Every stage is linear in the
    verified near-dup count; at a 30-50%-dup 10^12-doc corpus the pair
    list lives in the object store / output parquet, never on the
    driver.

    ``verified`` must be materialized (it is consumed by count + join).
    """
    import pyarrow.compute as pc

    exact = _filter_kind(bucket_out, _KIND_EXACT)
    if verified.count() == 0:
        return exact

    # Empty-block hazard, and why each join input carries a
    # repartition: Ray Data BYPASSES the UDF on zero-row blocks, so
    # schema-less empties from upstream groupby/map_groups partitions
    # flow through map stages untouched, and the join's hash shuffle
    # then reconstructs a partition with no key column ("No match for
    # FieldRef rep"). repartition() coalesces them into schema-ful
    # blocks. The repartitions are LAZY — they ride the single executor
    # job that runs both join shuffles at consumption time; the
    # previous version instead ran repartition().materialize() barriers
    # (two extra executor launches, ~5 s fixed overhead at validation
    # scale) for the same normalization. members alone is materialized:
    # its emptiness decides the plan (and it feeds both joins).
    members = (
        _filter_kind(bucket_out, _KIND_MEMBER)
        .select_columns(["doc_id_a", "doc_id_b"])
        .rename_columns({"doc_id_a": "rep", "doc_id_b": "member"})
        .repartition(num_partitions)
        .materialize()
    )
    if members.count() == 0:
        # no multi-member exact groups anywhere: reps ARE the members
        return verified.union(exact)
    verified = verified.repartition(num_partitions)

    def fold_a(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id_a" not in t.schema.names:
            return pa.table({
                "a_m": pa.array([], type=pa.int64()),
                "doc_id_b": pa.array([], type=pa.int64()),
                value_name: pa.array([], type=pa.float64())})
        a_m = pc.coalesce(t.column("member"), t.column("doc_id_a"))
        return pa.table(
            {"a_m": a_m.cast(pa.int64()),
             "doc_id_b": t.column("doc_id_b").cast(pa.int64()),
             value_name: t.column(value_name)}
        )

    def fold_b(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a_m" not in t.schema.names:
            return pa.table({
                "doc_id_a": pa.array([], type=pa.int64()),
                "doc_id_b": pa.array([], type=pa.int64()),
                value_name: pa.array([], type=pa.float64())})
        b_m = pc.coalesce(t.column("member"), t.column("doc_id_b"))
        lo = pc.min_element_wise(t.column("a_m"), b_m)
        hi = pc.max_element_wise(t.column("a_m"), b_m)
        return pa.table(
            {"doc_id_a": lo.cast(pa.int64()),
             "doc_id_b": hi.cast(pa.int64()),
             value_name: t.column(value_name)}
        )

    half = (
        verified.join(members, "left_outer", num_partitions,
                      on=("doc_id_a",), right_on=("rep",))
        .map_batches(fold_a, batch_format="pyarrow")
        .repartition(num_partitions)  # normalize join-1 empties, lazily
    )
    expanded = half.join(
        members, "left_outer", num_partitions,
        on=("doc_id_b",), right_on=("rep",),
    ).map_batches(fold_b, batch_format="pyarrow")
    return expanded.union(exact)


class MinHashBandStage:
    """(doc_id, text) -> one row per LSH band:
    (band_key, band_no, doc_id, text_md5).

    text_md5 (16 raw digest bytes) rides along so each band bucket can
    collapse exact-duplicate texts LOCALLY: all copies of a text share
    every band key, so a bucket always sees a whole exact group and can
    pair group REPRESENTATIVES only — m identical docs no longer explode
    into m^2/2 candidate pairs per band. The hasher's permutation table
    (2 KB) is built once per instance and ships with the task closure
    (cheaper than actor startup for so little state)."""

    def __init__(self, n: int, num_perm: int, bands: int):
        self.n = n
        self.bands = bands
        self.hasher = MinHasher(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        nos: list[int] = []
        keys: list[int] = []
        md5s: list[bytes] = []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            base = hash_shingles(word_shingles(tokenize(text), self.n))
            if base.size == 0:
                continue  # shingle-less doc can never pass verification
            digest = hashlib.md5(text.encode("utf-8")).digest()
            sig = self.hasher.signature(base)
            for no, key in enumerate(band_keys(sig, self.bands)):
                ids.append(doc_id)
                nos.append(no)
                keys.append(key)
                md5s.append(digest)
        return pa.table(
            {"band_key": pa.array(np.array(keys, dtype=np.uint64)),
             "band_no": pa.array(nos, type=pa.int8()),
             "doc_id": pa.array(ids, type=pa.int64()),
             "text_md5": pa.array(md5s, type=pa.binary())}
        )


def _lsh_bucket(group: pa.Table) -> pa.Table:
    """One LSH band bucket -> kind-tagged rows:

    kind=CAND   candidate pair between exact-group representatives
    kind=EXACT  exact-duplicate pair (J = 1.0 by construction), emitted
                by band-0 buckets only so each pair appears exactly once
    kind=MEMBER (representative, member) rows for groups of size >= 2,
                band-0 buckets only — used for final pair expansion
    """
    ids = group.column("doc_id").to_pylist()
    md5s = group.column("text_md5").to_pylist()
    nos = group.column("band_no").to_pylist()
    by_md5: dict[bytes, int] = {}
    for d, m in zip(ids, md5s):
        if m not in by_md5 or d < by_md5[m]:
            by_md5[m] = d
    reps = sorted(by_md5.values())
    kind: list[int] = []
    a_out: list[int] = []
    b_out: list[int] = []
    j_out: list[float | None] = []
    for x, y in itertools.combinations(reps, 2):
        kind.append(_KIND_CAND)
        a_out.append(x)
        b_out.append(y)
        j_out.append(None)
    # the band_no==0 filter also guards against a (vanishing) band_key
    # collision merging rows from different band positions
    zero_groups: dict[bytes, list[int]] = {}
    for d, m, no in zip(ids, md5s, nos):
        if no == 0:
            zero_groups.setdefault(m, []).append(d)
    for mem in zero_groups.values():
        if len(mem) < 2:
            continue
        mem = sorted(mem)
        for x, y in itertools.combinations(mem, 2):
            kind.append(_KIND_EXACT)
            a_out.append(x)
            b_out.append(y)
            j_out.append(1.0)
        for mdoc in mem:
            kind.append(_KIND_MEMBER)
            a_out.append(mem[0])
            b_out.append(mdoc)
            j_out.append(None)
    return pa.table(
        {"kind": pa.array(kind, type=pa.int8()),
         "doc_id_a": pa.array(a_out, type=pa.int64()),
         "doc_id_b": pa.array(b_out, type=pa.int64()),
         "jaccard": pa.array(j_out, type=pa.float64())}
    )


class VerifyJaccard:
    """Candidate-pair verification WITHOUT driver-side materialization:
    each task re-reads ONLY its batch's candidate docs from the source
    parquet (predicate-pushdown isin read), shingles them locally and
    keeps pairs with exact Jaccard >= t. This is the distributed analog
    of a candidates-to-docs join, expressed as a per-task pushdown read —
    the driver never sees candidate texts or shingle sets."""

    def __init__(self, docs_path: str | list[str], n: int, threshold: float):
        self.docs_path = docs_path
        self.n = n
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch.column("doc_id_a").to_pylist()
        b_ids = batch.column("doc_id_b").to_pylist()
        want = sorted(set(a_ids) | set(b_ids))
        texts = pads.dataset(self.docs_path).to_table(
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(want),
        )
        sets = {
            d: set(word_shingles(tokenize(t), self.n))
            for d, t in zip(texts.column("doc_id").to_pylist(),
                            texts.column("text").to_pylist())
        }
        out_a, out_b, out_j = [], [], []
        for a, b in zip(a_ids, b_ids):
            j = jaccard(sets[a], sets[b])
            if j >= self.threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(_round6(j))
        return pa.table(
            {"doc_id_a": pa.array(out_a, type=pa.int64()),
             "doc_id_b": pa.array(out_b, type=pa.int64()),
             "jaccard": pa.array(out_j, type=pa.float64())}
        )


def minhash_lsh_pairs_ds(
    docs_path: str | list[str],
    n: int = 3,
    threshold: float = 0.5,
    num_perm: int = 128,
    bands: int = 32,
    stats: dict | None = None,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Near-dup pairs via MinHash band LSH, verified by exact Jaccard —
    the Dataset form (the scale path: write_parquet it, anti-join it,
    never collect it).

    Output contract == ngram_jaccard_pairs (pairs with exact J >= t); LSH
    only prunes the candidate space. With 128 perms / 32 bands x 4 rows
    the probability of missing a J=0.9 pair is (1-0.9^4)^32 ~ 5e-15.

    Fully distributed end to end (nothing pair- or corpus-sized ever
    touches the driver):
      band rows -> band_key groupby (exact groups collapse IN-bucket to
      representatives) -> candidate dedup via a distributed groupby ->
      per-task pushdown-read verification -> member-level expansion as
      two hash joins (_expand_rep_pairs_ds).
    On a 30-50%-duplicate web corpus every stage is linear in duplicate
    density; the only corpus-sized exchange is the band-row shuffle
    (~1 KB/doc at 32 bands). The pair list stays a Dataset in the object
    store — persist with ``.write_parquet`` for resumable downstream
    apply steps.
    """
    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    bucket_out = (
        docs.map_batches(
            MinHashBandStage(n, num_perm, bands), batch_format="pyarrow"
        )
        .groupby("band_key")
        .map_groups(_lsh_bucket, batch_format="pyarrow")
        .materialize()
    )
    cand = (
        _filter_kind(bucket_out, _KIND_CAND)
        .select_columns(["doc_id_a", "doc_id_b"])
        .groupby(["doc_id_a", "doc_id_b"])
        .aggregate(Count(alias_name="n_bands"))
    )
    verified = cand.map_batches(
        VerifyJaccard(docs_path, n, threshold), batch_format="pyarrow"
    ).materialize()
    out = _expand_rep_pairs_ds(
        verified, bucket_out, "jaccard", num_partitions
    )
    if stats is not None:
        # instrumentation for scale soaks (tools/dedup_soak.py): candidate
        # volume must grow ~linearly with duplicate count, not corpus^2
        stats["n_band_cand_rows"] = _filter_kind(
            bucket_out, _KIND_CAND
        ).count()
        stats["n_rep_pairs"] = verified.count()
    return out


def minhash_lsh_pairs(
    docs_path: str | list[str],
    n: int = 3,
    threshold: float = 0.5,
    num_perm: int = 128,
    bands: int = 32,
    stats: dict | None = None,
) -> pa.Table:
    """Oracle/small-scale wrapper over :func:`minhash_lsh_pairs_ds`:
    collects the (output-contract-sized) pair Dataset into one sorted
    ``pa.Table`` for SQL-oracle comparison and the pytest contracts. At
    web scale call the ``_ds`` form and persist instead."""
    out = minhash_lsh_pairs_ds(
        docs_path, n=n, threshold=threshold, num_perm=num_perm,
        bands=bands, stats=stats,
    )
    tbl = _to_table(out, PAIRS_SCHEMA).sort_by(
        [("doc_id_a", "ascending"), ("doc_id_b", "ascending")]
    )
    if stats is not None:
        stats["n_pairs_out"] = tbl.num_rows
    return tbl


def apply_near_dedup(
    docs_path: str | list[str],
    n: int = 3,
    threshold: float = 0.5,
    num_partitions: int = 8,
) -> rd.Dataset:
    """The training-data payoff of the dedup family: the CLEANED corpus.

    Removal rule: any doc that is the larger member (doc_id_b) of a
    near-dup pair at exact Jaccard >= t is dropped; the smallest doc of a
    duplicate chain survives. Pairs come from the LSH scale path and the
    removal is a DISTRIBUTED anti-join on doc_id (hash shuffle, linear
    in corpus + pair count) — no removal set is ever collected on the
    driver or broadcast whole, so a 30-50%-dup 10^12-doc corpus (~10^11
    removal ids) streams through the object store partition by
    partition.
    """
    pairs = minhash_lsh_pairs_ds(
        docs_path, n=n, threshold=threshold, num_partitions=num_partitions
    )
    removals = (
        pairs.select_columns(["doc_id_b"])
        .repartition(num_partitions)  # unify block schemas for the join
        .materialize()
    )
    corpus = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    if removals.count() == 0:
        return corpus
    return corpus.join(
        removals, "left_anti", num_partitions,
        on=("doc_id",), right_on=("doc_id_b",),
    )


# --------------------------------------------------------------------------
# SimHash (block-combination tables, permute-and-group; Manku WWW'07)
# --------------------------------------------------------------------------

SIMHASH_PAIRS_SCHEMA = pa.schema(
    [("doc_id_a", pa.int64()), ("doc_id_b", pa.int64()),
     ("hamming", pa.int64())]
)

# 64 bits -> 6 blocks; for hamming <= 3, at most 3 blocks are touched, so
# at least 3 of 6 blocks are IDENTICAL -> some 3-block combination
# matches exactly (pigeonhole, deterministic — no probabilistic recall
# loss). C(6,3) = 20 tables, each keyed on a 30-33 bit concatenation of
# the chosen blocks: the key space is ~2^32 per table (vs 2^16 for naive
# 4-chunk banding), so bucket population stays ~corpus/2^32 and in-bucket
# pairing no longer goes quadratic with corpus growth. This is the Manku
# et al. (WWW'07, "Detecting Near-Duplicates for Web Crawling") table
# design for f=64, k=3.
_SIMHASH_WIDTHS = (11, 11, 11, 11, 10, 10)
_SIMHASH_OFFSETS = tuple(
    sum(_SIMHASH_WIDTHS[:i]) for i in range(len(_SIMHASH_WIDTHS))
)
_SIMHASH_COMBOS = tuple(itertools.combinations(range(6), 3))


class SimHashStage:
    """(doc_id, text) -> 20 rows (bucket_key, doc_id, simhash); the
    signature rides along so buckets verify hamming locally — no global
    signature map is ever assembled or broadcast."""

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
        id_arr = np.array(ids, dtype=np.int64)
        blocks = [
            (sig_arr >> np.uint64(off)) & np.uint64((1 << w) - 1)
            for off, w in zip(_SIMHASH_OFFSETS, _SIMHASH_WIDTHS)
        ]
        key_parts, id_parts, sig_parts = [], [], []
        for ci, (i, j, l) in enumerate(_SIMHASH_COMBOS):
            wj, wl = _SIMHASH_WIDTHS[j], _SIMHASH_WIDTHS[l]
            concat = (
                (blocks[i] << np.uint64(wj + wl))
                | (blocks[j] << np.uint64(wl))
                | blocks[l]
            )
            key_parts.append(np.uint64(ci << 33) | concat)
            id_parts.append(id_arr)
            sig_parts.append(sig_arr)
        if not key_parts:
            return pa.table(
                {"bucket_key": pa.array([], type=pa.uint64()),
                 "doc_id": pa.array([], type=pa.int64()),
                 "simhash": pa.array([], type=pa.uint64())}
            )
        return pa.table(
            {"bucket_key": pa.array(np.concatenate(key_parts)),
             "doc_id": pa.array(np.concatenate(id_parts)),
             "simhash": pa.array(np.concatenate(sig_parts))}
        )


def _simhash_bucket_fn(max_hamming: int):
    def bucket(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        sigs = group.column("simhash").to_pylist()
        combo_idx = int(group.column("bucket_key")[0].as_py()) >> 33
        # collapse identical signatures to their min-doc representative
        # (exact dups and hash-identical docs): m identical sigs pair as
        # ONE rep, never m^2/2 in-bucket pairs
        by_sig: dict[int, int] = {}
        for d, s in zip(ids, sigs):
            if s not in by_sig or d < by_sig[s]:
                by_sig[s] = d
        reps = sorted(by_sig.items(), key=lambda kv: kv[1])
        kind: list[int] = []
        a_out: list[int] = []
        b_out: list[int] = []
        h_out: list[int | None] = []
        if len(reps) > 1:
            rep_sigs = np.array([s for s, _ in reps], dtype=np.uint64)
            rep_ids = [d for _, d in reps]
            iu, ju = np.triu_indices(len(reps), k=1)
            ham = hamming64(rep_sigs[iu], rep_sigs[ju])
            for x, y, d in zip(iu[ham <= max_hamming],
                               ju[ham <= max_hamming],
                               ham[ham <= max_hamming]):
                lo, hi = sorted((rep_ids[x], rep_ids[y]))
                kind.append(_KIND_CAND)
                a_out.append(lo)
                b_out.append(hi)
                h_out.append(int(d))
        if combo_idx == 0:
            sig_groups: dict[int, list[int]] = {}
            for d, s in zip(ids, sigs):
                sig_groups.setdefault(s, []).append(d)
            for mem in sig_groups.values():
                if len(mem) < 2:
                    continue
                mem = sorted(mem)
                for x, y in itertools.combinations(mem, 2):
                    kind.append(_KIND_EXACT)
                    a_out.append(x)
                    b_out.append(y)
                    h_out.append(0)
                for mdoc in mem:
                    kind.append(_KIND_MEMBER)
                    a_out.append(mem[0])
                    b_out.append(mdoc)
                    h_out.append(None)
        return pa.table(
            {"kind": pa.array(kind, type=pa.int8()),
             "doc_id_a": pa.array(a_out, type=pa.int64()),
             "doc_id_b": pa.array(b_out, type=pa.int64()),
             "hamming": pa.array(h_out, type=pa.int64())}
        )

    return bucket


def simhash_pairs_ds(
    docs: rd.Dataset, max_hamming: int = 3, num_partitions: int = 8
) -> rd.Dataset:
    """ALL doc pairs with SimHash hamming distance <= max_hamming (<= 3)
    — the Dataset form (persist / anti-join it; never collect at scale).

    Fully distributed permute-and-group (Manku WWW'07 block-combination
    tables — see _SIMHASH_COMBOS): doc -> 20 (bucket_key, doc_id, sig)
    rows -> bucket groupby with in-bucket signature collapse + local
    hamming verification -> distributed pair dedup (groupby Min) ->
    member expansion as two hash joins (_expand_rep_pairs_ds). Recall is
    exact by pigeonhole for max_hamming <= 3; no driver-side signature
    map, no pandas, no 2^16 bucket ceiling. SQL-oracle-checkable because
    simhash64 uses the DuckDB-recomputable md5-low64 term hash."""
    if max_hamming > 3:
        raise ValueError(
            "the 6-choose-3 block design guarantees exact recall only for "
            "max_hamming <= 3; widen _SIMHASH_COMBOS for larger radii"
        )
    bucket_out = (
        docs.map_batches(SimHashStage(), batch_format="pyarrow")
        .groupby("bucket_key")
        .map_groups(_simhash_bucket_fn(max_hamming), batch_format="pyarrow")
        .materialize()
    )
    rep_pairs = (
        _filter_kind(bucket_out, _KIND_CAND)
        .groupby(["doc_id_a", "doc_id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
        .materialize()
    )
    return _expand_rep_pairs_ds(
        rep_pairs, bucket_out, "hamming", num_partitions
    )


def simhash_pairs(docs: rd.Dataset, max_hamming: int = 3) -> pa.Table:
    """Oracle/small-scale wrapper over :func:`simhash_pairs_ds` (sorted
    ``pa.Table`` for SQL comparison)."""
    return _to_table(
        simhash_pairs_ds(docs, max_hamming=max_hamming),
        SIMHASH_PAIRS_SCHEMA,
    ).sort_by([("doc_id_a", "ascending"), ("doc_id_b", "ascending")])


# --------------------------------------------------------------------------
# near-dup connected components (cluster view of the pair graph)
# --------------------------------------------------------------------------

def dup_components_ds(
    docs_path: str | list[str],
    n: int = 3,
    threshold: float = 0.5,
    num_partitions: int = 8,
    max_iters: int = 32,
) -> rd.Dataset:
    """Connected components over the near-dup pair graph: (doc_id,
    component_id) for every doc incident to at least one pair, where
    component_id = the smallest doc_id reachable through pairs — the
    cluster view a training-data pipeline dedups against (keep one doc
    per component instead of reasoning about pairwise removals).

    Distributed iterative min-label propagation on Ray Datasets: each
    round joins the edge list against the current labels (hash join,
    ``num_partitions``-way) and takes a per-node min — labels only
    decrease, so comparing the label-sum between rounds is an exact
    fixpoint test. Rounds needed = graph diameter (near-dup clusters are
    star-like and shallow in practice). Everything — the pair list
    included — stays a Dataset end to end; no driver-side graph is ever
    built. SQL oracle: recursive CTE reachability.
    """
    from ray.data.aggregate import Min as AggMin, Sum as AggSum

    label_schema = pa.schema(
        [("doc_id", pa.int64()), ("component_id", pa.int64())]
    )
    pairs = minhash_lsh_pairs_ds(
        docs_path, n=n, threshold=threshold, num_partitions=num_partitions
    ).materialize()
    if pairs.count() == 0:
        return rd.from_arrow(label_schema.empty_table())
    fwd = pairs.select_columns(["doc_id_a", "doc_id_b"]).rename_columns(
        {"doc_id_a": "node", "doc_id_b": "nbr"}
    )
    rev = pairs.select_columns(["doc_id_a", "doc_id_b"]).rename_columns(
        {"doc_id_a": "nbr", "doc_id_b": "node"}
    )
    edges = fwd.union(rev).repartition(num_partitions).materialize()
    labels = edges.groupby("node").aggregate(AggMin("nbr")).map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "label": pa.compute.min_element_wise(
                t.column("node"), t.column("min(nbr)")),
        }),
        batch_format="pyarrow",
    ).materialize()
    prev_sum = None
    converged = False
    # max_iters CHANGE-rounds plus one confirming round (the fixpoint
    # test needs an extra no-change iteration to observe equality)
    for _ in range(max_iters + 1):
        # message: every edge forwards its neighbor's current label
        msgs = edges.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("nbr",), right_on=("node",), right_suffix="_r",
        ).select_columns(["node", "label"])
        labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(AggMin("label", alias_name="label"))
            .materialize()
        )
        agg = labels.aggregate(AggSum("label")) or {}
        cur_sum = agg.get("sum(label)")
        if cur_sum == prev_sum:
            converged = True
            break  # labels only decrease; equal sum == fixpoint
        prev_sum = cur_sum
    if not converged:
        # a >max_iters-diameter dup chain would otherwise silently split
        # one component into several — refuse to return wrong labels
        raise RuntimeError(
            f"dup_components did not reach fixpoint in {max_iters} "
            "rounds (pair-graph diameter exceeds max_iters); raise "
            "max_iters"
        )
    return labels.rename_columns({"node": "doc_id", "label": "component_id"})


def dup_components(
    docs_path: str | list[str],
    n: int = 3,
    threshold: float = 0.5,
    num_partitions: int = 8,
    max_iters: int = 32,
) -> pa.Table:
    """Oracle/small-scale wrapper over :func:`dup_components_ds` (sorted
    ``pa.Table`` for SQL comparison)."""
    return _to_table(
        dup_components_ds(docs_path, n=n, threshold=threshold,
                          num_partitions=num_partitions,
                          max_iters=max_iters),
        pa.schema([("doc_id", pa.int64()), ("component_id", pa.int64())]),
    ).sort_by([("doc_id", "ascending")])


def apply_component_dedup(
    docs_path: str | list[str],
    n: int = 3,
    threshold: float = 0.5,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Cluster-level cleaned corpus: ONE survivor per near-dup connected
    component (the component's min doc_id), all unclustered docs kept.

    This is the semantically strongest dedup guarantee — transitive
    chains (A~B~C with A!~C) keep exactly one doc, where the pairwise
    rule of apply_near_dedup can keep A while dropping both B and C.
    Removal is a distributed anti-join against the non-canonical
    component members (labels stay a Dataset; nothing is collected on
    the driver or broadcast whole) — the same scale shape as
    :func:`apply_near_dedup`."""
    import pyarrow.compute as pc

    comps = dup_components_ds(
        docs_path, n=n, threshold=threshold, num_partitions=num_partitions
    )

    def non_canonical(t: pa.Table) -> pa.Table:
        mask = pc.not_equal(t.column("doc_id"), t.column("component_id"))
        return t.filter(mask).select(["doc_id"]).rename_columns(["rm_id"])

    removals = (
        comps.map_batches(non_canonical, batch_format="pyarrow")
        .repartition(num_partitions)  # unify block schemas for the join
        .materialize()
    )
    corpus = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    if removals.count() == 0:
        return corpus
    return corpus.join(
        removals, "left_anti", num_partitions,
        on=("doc_id",), right_on=("rm_id",),
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
    mat = _list_col_to_mat(full.column(emb_col))
    # out-of-place: _list_col_to_mat may return a read-only Arrow view
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    mat_ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        bids = batch.column(id_col).to_numpy()
        bmat = _list_col_to_mat(batch.column(emb_col))
        bmat = bmat / np.linalg.norm(bmat, axis=1, keepdims=True)
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


# --------------------------------------------------------------------------
# train/test decontamination
# --------------------------------------------------------------------------

def contamination_hits(
    docs: rd.Dataset, benchmark_mod: int = 7, n: int = 13
) -> rd.Dataset:
    """Benchmark decontamination (the GPT-3 appendix-C recipe): flag
    every corpus doc that shares at least one word ``n``-gram with the
    benchmark/eval set. Output: (doc_id, n_contaminated) with
    n_contaminated = count of DISTINCT shared n-grams; benchmark docs
    themselves are excluded. Membership ``doc_id % benchmark_mod == 0``
    stands in for the eval-suite table.

    Scale shape: eval suites are tiny next to the corpus (MBs vs TBs),
    so the benchmark n-gram set is collected once and broadcast via
    ``ray.put``; the corpus side is a streaming ``map_batches`` that
    never shuffles. (A corpus-sized right side would use the
    distributed shingle-groupby path instead — see
    ``ngram_jaccard_pairs``.) Production would hash n-grams to 64-bit
    (``shingle.stable_hash64``) to shrink the broadcast; strings are
    kept here so the DuckDB oracle joins on the exact same keys.
    """
    from semantic_pdf_search_engine_ray.functions.shingle import (
        word_ngram_strings,
    )

    def bench_ngrams(batch: pa.Table) -> pa.Table:
        ngs: set[str] = set()
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if d % benchmark_mod == 0:
                ngs.update(word_ngram_strings(t, n))
        return pa.table({"ng": pa.array(sorted(ngs), type=pa.string())})

    parts = ray.get(
        docs.map_batches(bench_ngrams, batch_format="pyarrow")
        .to_arrow_refs()
    )
    bench: set[str] = set()
    for p in parts:
        # a fully-empty input dataset yields schema-less empty blocks
        if "ng" in p.schema.names:
            bench.update(p.column("ng").to_pylist())
    bench_ref = ray.put(frozenset(bench))

    def hits(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        out_ids, out_n = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if d % benchmark_mod == 0:
                continue
            shared = {g for g in word_ngram_strings(t, n) if g in bset}
            if shared:
                out_ids.append(d)
                out_n.append(len(shared))
        return pa.table(
            {"doc_id": pa.array(out_ids, type=pa.int64()),
             "n_contaminated": pa.array(out_n, type=pa.int64())}
        )

    return docs.map_batches(hits, batch_format="pyarrow")


def apply_decontamination(
    docs: rd.Dataset, benchmark_mod: int = 7, n: int = 13
) -> rd.Dataset:
    """The cleaned corpus after benchmark decontamination: every
    non-benchmark doc with zero shared ``n``-grams (the apply
    counterpart of ``contamination_hits``, mirroring
    ``apply_near_dedup``'s shape). The contaminated-id set is tiny by
    construction (it is bounded by benchmark size x near-dup density),
    so it is collected once and broadcast into a streaming filter — the
    corpus never shuffles."""
    hits = contamination_hits(docs, benchmark_mod=benchmark_mod, n=n)
    bad: set[int] = set()
    for p in ray.get(hits.to_arrow_refs()):
        if "doc_id" in p.schema.names:
            bad.update(p.column("doc_id").to_pylist())
    bad_ref = ray.put(frozenset(bad))

    def keep(batch: pa.Table) -> pa.Table:
        b = ray.get(bad_ref)
        mask = [
            (d % benchmark_mod != 0) and (d not in b)
            for d in batch.column("doc_id").to_pylist()
        ]
        return batch.filter(pa.array(mask))

    return docs.map_batches(keep, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Cross-document line dedup (C4 / RefinedWeb "remove any line duplicated
# anywhere in the corpus, keep the first occurrence")
# --------------------------------------------------------------------------

# combined (doc_id, line_idx) order key: idx is 1-based and capped so the
# lexicographic (doc_id, idx) order maps to one int64 comparison
_LINE_IDX_STRIDE = 1 << 20  # max 1,048,575 lines per document


def _is_blank_line(line: str) -> bool:
    """Blank (space/tab/CR only) lines never participate in cross-doc
    dedup — they are layout, not content. Pinned to the SQL mirror
    trim(line, ' ' || chr(9) || chr(13)) = ''."""
    return line.strip(" \t\r") == ""


def _line_occ_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> one row per PARTICIPATING (non-blank) line:
    (line_md5, pos) with pos = doc_id * STRIDE + idx (idx 1-based)."""
    md5s: list[str] = []
    poss: list[int] = []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        lines = text.split("\n")
        if len(lines) >= _LINE_IDX_STRIDE:
            raise ValueError(
                f"doc {doc_id}: {len(lines)} lines exceeds the "
                f"{_LINE_IDX_STRIDE - 1}-line contract")
        base = doc_id * _LINE_IDX_STRIDE
        for idx, line in enumerate(lines, start=1):
            if _is_blank_line(line):
                continue
            md5s.append(hashlib.md5(line.encode("utf-8")).hexdigest())
            poss.append(base + idx)
    return pa.table(
        {"line_md5": pa.array(md5s, type=pa.string()),
         "pos": pa.array(poss, type=pa.int64())}
    )


def global_line_dedup(
    docs_path: str | list[str], num_partitions: int = 8
) -> rd.Dataset:
    """Corpus-wide duplicate-line removal: any non-blank line whose exact
    text appears anywhere else in the corpus is dropped UNLESS this is
    the first occurrence in (doc_id, line_idx) order (C4 §2.2 /
    RefinedWeb line dedup; the cross-document counterpart of the
    intra-doc ``textstats.dedup_lines``).

    Distributed shape — nothing corpus-sized on the driver:
      1. line occurrences (line_md5, pos) — 16 B + hash per line, the
         line TEXT never shuffles;
      2. first occurrence per hash: ONE ``groupby(line_md5).min(pos)``;
      3. removals = occurrences join firsts where pos != min (hash join
         on line_md5);
      4. per-doc removal lists (groupby doc_id, list-collect) joined
         back to the corpus (left outer on doc_id), final map re-splits
         each doc and drops its removed idxs.
    Returns (doc_id, n_lines_in, n_lines_kept, cleaned_md5) where
    cleaned_md5 = md5 of the kept lines re-joined with newlines.
    """
    occ = (
        rd.read_parquet(docs_path, columns=["doc_id", "text"])
        .map_batches(_line_occ_batch, batch_format="pyarrow")
        .materialize()  # consumed by the groupby AND the join probe
    )
    firsts = occ.groupby("line_md5").aggregate(
        Min("pos"), Count(alias_name="cnt")
    )

    def only_dup_hashes(batch: pa.Table) -> pa.Table:
        # hashes occurring once produce no removals — keep only the
        # duplicated ones, so the join's build side is sized by the
        # DUPLICATE line count, not the corpus line count
        import pyarrow.compute as pc

        keep = batch.filter(pc.greater(batch.column("cnt"), 1))
        return keep.drop_columns(["cnt"])

    dup_firsts = (
        firsts.map_batches(only_dup_hashes, batch_format="pyarrow")
        # unify block schemas: downstream joins reject the schema-less
        # empty blocks a filtered groupby can emit
        .repartition(num_partitions)
        .materialize()
    )
    corpus = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    if dup_firsts.count() == 0:
        removal_lists = None
    else:
        joined = occ.join(
            dup_firsts, "inner", num_partitions, on=("line_md5",)
        )

        def to_removal(batch: pa.Table) -> pa.Table:
            pos = batch.column("pos").to_numpy()
            keep = pos != batch.column("min(pos)").to_numpy()
            pos = pos[keep]
            return pa.table(
                {"doc_id": pa.array(pos // _LINE_IDX_STRIDE,
                                    type=pa.int64()),
                 "idx": pa.array(pos % _LINE_IDX_STRIDE,
                                 type=pa.int64())}
            )

        removals = joined.map_batches(to_removal, batch_format="pyarrow")

        def collect(group: pa.Table) -> pa.Table:
            # Arrow hash joins don't carry list payload columns; a
            # comma-joined idx string does the same job
            idxs = sorted(group.column("idx").to_pylist())
            return pa.table(
                {"doc_id": pa.array([group.column("doc_id")[0].as_py()],
                                    type=pa.int64()),
                 "removed": pa.array([",".join(map(str, idxs))],
                                     type=pa.string())}
            )

        removal_lists = (
            removals.groupby("doc_id")
            .map_groups(collect, batch_format="pyarrow")
            .repartition(num_partitions)  # unify block schemas (join)
            .materialize()
        )
    if removal_lists is None or removal_lists.count() == 0:
        # no duplicate lines anywhere: skip the join (an all-empty
        # right side has no schema for the join to bind against)
        with_removed = corpus.map_batches(
            lambda b: b.append_column(
                "removed", pa.nulls(b.num_rows, type=pa.string())),
            batch_format="pyarrow",
        )
    else:
        with_removed = corpus.join(
            removal_lists, "left_outer", num_partitions, on=("doc_id",),
        )

    def finish(batch: pa.Table) -> pa.Table:
        ids, n_in, n_kept, md5s = [], [], [], []
        for doc_id, text, removed in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column("removed").to_pylist(),
        ):
            lines = text.split("\n")
            drop = (set(int(s) for s in removed.split(","))
                    if removed else set())
            kept = [l for i, l in enumerate(lines, start=1)
                    if i not in drop]
            ids.append(doc_id)
            n_in.append(len(lines))
            n_kept.append(len(kept))
            md5s.append(hashlib.md5("\n".join(kept).encode("utf-8"))
                        .hexdigest())
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "n_lines_in": pa.array(n_in, type=pa.int64()),
             "n_lines_kept": pa.array(n_kept, type=pa.int64()),
             "cleaned_md5": pa.array(md5s, type=pa.string())}
        )

    return with_removed.map_batches(finish, batch_format="pyarrow")


def hashed_text_dup_pairs(
    docs_path: str | list[str],
    threshold: float = 0.6,
    dim: int = 64,
) -> pa.Table:
    """Text-level near-dup pairs WITHOUT a model: docs are embedded via
    the hashing-trick tf-idf featurizer (textstats.hashed_tfidf dense
    form), then scored by exact cosine — connects the text family to
    the embedding-dedup family end to end. Brute-force all-pairs is the
    oracle-checkable baseline (same contract as embedding_dup_pairs);
    the scale path is the same vectors through SemDeDup clustering or
    IVF cells."""
    import tempfile

    from semantic_pdf_search_engine_ray.pipelines.textstats import (
        hashed_tfidf,
    )

    import shutil

    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    dense = hashed_tfidf(docs, dim=dim, dense=True)
    from semantic_pdf_search_engine_ray.config import scratch_root
    tmp = tempfile.mkdtemp(prefix="spse_hashvec_", dir=scratch_root())
    try:
        dense.write_parquet(tmp)
        out = embedding_dup_pairs(tmp, threshold=threshold,
                                  id_col="doc_id", emb_col="embedding")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.rename_columns(["doc_id_a", "doc_id_b", "cosine"])


def contamination_hits_bloom(
    docs: rd.Dataset,
    benchmark_mod: int = 7,
    n: int = 13,
    bits_per_elem: int = 12,
    n_hashes: int = 7,
    spill_dir: str | None = None,
) -> rd.Dataset:
    """``contamination_hits`` with the web-scale broadcast shape: the
    benchmark n-gram set ships as a BLOOM FILTER (a numpy bit array,
    ~1.5 bytes/n-gram at 12 bits + 7 hashes => fp ~ 5e-3) instead of the
    full string set, and a doc only touches the EXACT set — loaded once
    per actor from a parquet spill — when the Bloom proposes at least
    one candidate n-gram. Bloom filters have no false negatives, so the
    confirmed output is byte-identical to ``contamination_hits`` (same
    SQL oracle); false positives only cost a bounded amount of exact
    re-checking. At a 10^12-doc corpus the bit array is what makes the
    per-worker broadcast feasible (GBs of strings -> tens of MBs of
    bits); the exact set lives in the object store and is fetched only
    by the tiny contaminated fraction of actors (``spill_dir`` is kept
    for API compatibility and ignored — a filesystem spill would not be
    visible across nodes).

    Double hashing (Kirsch-Mitzenmacher): idx_i = (h1 + i*h2) mod m with
    h1/h2 = the two 64-bit halves of md5 — k independent-enough probes
    from one digest."""
    import hashlib as _hashlib

    from semantic_pdf_search_engine_ray.functions.shingle import (
        word_ngram_strings,
    )

    def bench_ngrams(batch: pa.Table) -> pa.Table:
        ngs: set[str] = set()
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if d % benchmark_mod == 0:
                ngs.update(word_ngram_strings(t, n))
        return pa.table({"ng": pa.array(sorted(ngs), type=pa.string())})

    parts = ray.get(
        docs.map_batches(bench_ngrams, batch_format="pyarrow")
        .to_arrow_refs()
    )
    bench: set[str] = set()
    for p in parts:
        if "ng" in p.schema.names:
            bench.update(p.column("ng").to_pylist())

    # Exact set ships through the OBJECT STORE (one ray.put, fetched
    # lazily per actor) so Bloom-positive tasks on any node can resolve
    # it — a driver-local spill file would only be readable on nodes
    # sharing the driver's filesystem. Only Bloom-positive actors ever
    # call ray.get, so the string payload still moves to the (small)
    # contaminated fraction of workers, not all of them.
    exact_ref = ray.put(
        pa.table({"ng": pa.array(sorted(bench), type=pa.string())})
    )

    m_bits = 1 << max(10, int(np.ceil(np.log2(
        max(1, len(bench)) * bits_per_elem))))
    mask = m_bits - 1
    bloom = np.zeros(m_bits // 8, dtype=np.uint8)

    def _probes(g: str) -> np.ndarray:
        dig = _hashlib.md5(g.encode("utf-8")).digest()
        h1 = int.from_bytes(dig[:8], "little")
        h2 = int.from_bytes(dig[8:], "little") | 1
        return np.array(
            [(h1 + i * h2) & mask for i in range(n_hashes)],
            dtype=np.int64,
        )

    for g in bench:
        idx = _probes(g)
        np.bitwise_or.at(bloom, idx >> 3,
                         np.left_shift(1, idx & 7).astype(np.uint8))
    bloom_ref = ray.put(bloom)

    class BloomConfirm:
        """Actor-pool stage: Bloom gate in the hot loop; the exact
        n-gram set is loaded lazily, once, on the first confirmed
        candidate this actor sees."""

        def __init__(self) -> None:
            self.bloom = ray.get(bloom_ref)
            self.exact: set[str] | None = None

        def _maybe(self, g: str) -> bool:
            idx = _probes(g)
            bits = self.bloom[idx >> 3] >> (idx & 7).astype(np.uint8)
            return bool(np.all(bits & 1))

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_ids, out_n = [], []
            for d, t in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
                if d % benchmark_mod == 0:
                    continue
                cands = {g for g in word_ngram_strings(t, n)
                         if self._maybe(g)}
                if not cands:
                    continue
                if self.exact is None:
                    self.exact = set(
                        ray.get(exact_ref).column("ng").to_pylist()
                    )
                shared = cands & self.exact
                if shared:
                    out_ids.append(d)
                    out_n.append(len(shared))
            return pa.table(
                {"doc_id": pa.array(out_ids, type=pa.int64()),
                 "n_contaminated": pa.array(out_n, type=pa.int64())}
            )

    return docs.map_batches(BloomConfirm, batch_format="pyarrow",
                            concurrency=2)
