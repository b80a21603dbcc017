"""Positional index + phrase queries — the format extension that makes
the engine a complete fulltext system (exact phrase retrieval), kept as
an OPTIONAL side table so the core BM25 index format is untouched.

The reference approximates phrase semantics at query time only (fuzzy
re-localization of the matched chunk text, `fuzzy.rs`); a real inverted
index resolves phrases from per-term position lists. Layout mirrors the
postings path: Arrow-vectorized tokenize-with-positions, term-hash
partitioned parquet spill (same crc32 partitioner — one partitioning key
family across the engine), delta+varint-coded position lists, stage
checkpoint + lineage.

Positions are 1-based token indices (matches the SQL oracle's
``generate_series(1, len(ts))``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from semantic_pdf_search_engine_ray.config import EngineConfig
from semantic_pdf_search_engine_ray.functions.codec import (
    decode_doc_ids as decode_sorted_ints,
    encode_doc_ids as encode_sorted_ints,
)
from semantic_pdf_search_engine_ray.functions.tokenize import tokenize
from semantic_pdf_search_engine_ray.stages.postings import (
    flat_token_pairs,
    group_rows_by_term,
    term_crc32,
)
from semantic_pdf_search_engine_ray.state import manifest as mf

POSITIONS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("positions", pa.binary()),
    ]
)


class TokenizePositions:
    """map_batches: (doc_id, text) -> (term, doc_id, positions binary,
    part). Position lists are per-(doc, term), ascending, delta+varint."""

    def __init__(self, n_partitions: int):
        self.n_partitions = n_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        parents, flat = flat_token_pairs(texts)
        par = parents.to_numpy(zero_copy_only=False)
        # position within the doc = running index per parent (1-based);
        # flat pairs are emitted in document order, so a cumulative
        # counter per doc segment is just arange minus segment starts
        counts = np.bincount(par, minlength=batch.num_rows)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(len(par), dtype=np.int64) - starts[par] + 1

        tbl = pa.table(
            {"i": pa.array(par), "term": flat, "p": pa.array(pos)}
        )
        agg = tbl.group_by(["i", "term"]).aggregate([("p", "list")])
        idx = agg.column("i")
        doc_ids = pc.take(batch.column("doc_id"), idx)
        terms_out = agg.column("term")
        blobs = [
            encode_sorted_ints(np.sort(np.asarray(pl, dtype=np.int64)))
            for pl in agg.column("p_list").to_pylist()
        ]
        parts = term_crc32(terms_out) % self.n_partitions
        return pa.table(
            {
                "term": terms_out,
                "doc_id": doc_ids.cast(pa.int64()),
                "positions": pa.array(blobs, type=pa.binary()),
                "part": pa.array(parts),
            }
        )


def build_positions(
    docs: rd.Dataset, out_dir: str, cfg: EngineConfig | None = None,
    *, input_lineage: dict | None = None,
) -> dict:
    """Positions side-table build: tokenize-with-positions -> term-hash
    partitioned parquet + committed manifest. Resumable like every stage."""
    cfg = cfg or EngineConfig()
    os.makedirs(out_dir, exist_ok=True)
    ck = mf.StageCheckpoint(
        out_dir, "positions",
        {"input": input_lineage or {}, "params": cfg.manifest_params(),
         "stage": "positions"},
    )
    if not ck.is_complete():
        import pyarrow.parquet as pq

        out = ck.fresh_dir()
        docs.map_batches(
            TokenizePositions(cfg.num_partitions),
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
        ).write_parquet(out, partition_cols=["part"])
        # committed == readable: a token-less corpus writes no fragments,
        # so materialize the schema in an explicit empty file
        has_files = any(
            f.endswith(".parquet")
            for _r, _d, fs in os.walk(out) for f in fs
        )
        if not has_files:
            pq.write_table(
                POSITIONS_SCHEMA.empty_table(),
                os.path.join(out, "empty.parquet"),
            )
        ck.commit()
    payload = {"layout": "positions_v1",
               "params": cfg.manifest_params(),
               "stages": {"positions": mf.load_stage_entry(out_dir, "positions")}}
    mf.commit_manifest(out_dir, payload)
    return payload


class PositionsReader:
    """Loads a positions table; answers exact phrase top-k.

    Score = phrase term frequency (number of adjacency occurrences);
    rank (phrase_tf DESC, doc_id ASC) — integer scores, so cross-engine
    comparison is exact with no float tolerance at all."""

    def __init__(self, pos_dir: str):
        import pyarrow.parquet as pq

        mf.load_manifest(pos_dir)  # ready check
        tbl = pq.read_table(
            os.path.join(pos_dir, "positions"),
            columns=["term", "doc_id", "positions"],
        ).combine_chunks()
        doc_ids = tbl.column("doc_id").to_numpy()
        self._blob_col = tbl.column("positions").combine_chunks()
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {
            t: (doc_ids[grp], grp)
            for t, grp in group_rows_by_term(
                tbl.column("term"), doc_ids
            ).items()
        }
        # term -> list of decoded position arrays (row-aligned with the
        # term's doc_ids); immutable index, decode each term once
        self._decoded: dict[str, list[np.ndarray]] = {}

    def _term_positions(self, term: str) -> tuple[np.ndarray, list[np.ndarray]]:
        ids, rows = self.postings[term]
        dec = self._decoded.get(term)
        if dec is None:
            dec = [
                decode_sorted_ints(self._blob_col[int(r)].as_py())
                for r in rows
            ]
            self._decoded[term] = dec
        return ids, dec

    def proximity_top_k(
        self, t1: str, t2: str, slop: int, k: int
    ) -> list[tuple[int, int]]:
        """Sloppy two-term phrase: occurrences are ordered position pairs
        (p1, p2) with 0 < p2 - p1 <= slop + 1 (slop=0 == exact
        adjacency). Score = occurrence count; rank (count DESC, doc_id
        ASC). Integer-exact vs the SQL range-join oracle."""
        if t1 not in self.postings or t2 not in self.postings:
            return []
        ids1, dec1 = self._term_positions(t1)
        ids2, dec2 = self._term_positions(t2)
        common = np.intersect1d(ids1, ids2)
        results: list[tuple[int, int]] = []
        for doc in common.tolist():
            p1 = dec1[int(np.searchsorted(ids1, doc))]
            p2 = dec2[int(np.searchsorted(ids2, doc))]
            # pairs with p1 < p2 <= p1 + slop + 1, counted vectorized
            hi = np.searchsorted(p2, p1 + slop + 1, side="right")
            lo = np.searchsorted(p2, p1, side="right")
            n = int((hi - lo).sum())
            if n > 0:
                results.append((int(doc), n))
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:k]

    def phrase_top_k(self, phrase: str, k: int) -> list[tuple[int, int]]:
        """Top-k (doc_id, phrase_tf) for an exact token-adjacency phrase."""
        toks = tokenize(phrase)
        if not toks:
            return []
        per_term = []
        for t in toks:
            if t not in self.postings:
                return []
            per_term.append(self._term_positions(t))
        common = per_term[0][0]
        for ids, _dec in per_term[1:]:
            common = np.intersect1d(common, ids, assume_unique=False)
        if common.size == 0:
            return []
        results: list[tuple[int, int]] = []
        for doc in common.tolist():
            match = None
            for offset, (ids, dec) in enumerate(per_term):
                pos = dec[int(np.searchsorted(ids, doc))] - offset
                match = pos if match is None else np.intersect1d(match, pos)
                if match.size == 0:
                    break
            if match is not None and match.size > 0:
                results.append((int(doc), int(match.size)))
        results.sort(key=lambda r: (-r[1], r[0]))
        return results[:k]


class PhraseQueryActor:
    """Actor-pool stage: (query_id, query) -> phrase-match result rows."""

    def __init__(self, pos_dir: str, k: int = 5):
        self.reader = PositionsReader(pos_dir)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, tfs = [], [], [], []
        for qid, q in zip(batch.column("query_id").to_pylist(),
                          batch.column("query").to_pylist()):
            for rank, (doc_id, tf) in enumerate(
                self.reader.phrase_top_k(q, self.k), start=1
            ):
                qids.append(qid)
                ranks.append(rank)
                docs.append(doc_id)
                tfs.append(tf)
        return pa.table(
            {"query_id": pa.array(qids, type=pa.int64()),
             "rank": pa.array(ranks, type=pa.int64()),
             "doc_id": pa.array(docs, type=pa.int64()),
             "phrase_tf": pa.array(tfs, type=pa.int64())}
        )
