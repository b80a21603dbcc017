"""Query path: stateful index reader + BM25 top-k (exhaustive and
block-max WAND), exposed as a Ray Data actor-pool stage.

The Ray analog of the reference's query chain
(`/root/reference/src/qdrant.rs:70-96` run_query: embed -> filtered ANN
top-5 -> payload decode) and its process-wide stateful handles
(`embed.rs:17-42` model singleton, `bin/app/pdf.rs:8-18` PDFIUM
OnceLock): each QueryActor loads the dictionary, posting blocks and doc
lengths ONCE in ``__init__`` and serves query batches in ``__call__``.

Determinism: scoring accumulates per doc in sorted-unique-term order with
the exact float expression tree pinned in stages/encode.compute_tfn — so
exhaustive scoring, WAND, and the pure-Python oracle agree bitwise, and
rank-identity holds at any parallelism (tie-break score DESC, doc_id ASC).

Scale notes: the in-RAM posting dict is the single-node layout. The
10^12-doc layout shards this actor by doc_id range (each actor owns the
blocks + doc_len slice of its partition; per-query top-k merged
driver-side, k is tiny) — the structure (self-contained blocks keyed by
(term, first_doc)) is partition-agnostic by construction.
"""

from __future__ import annotations

import heapq
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from semantic_pdf_search_engine_ray.config import EngineConfig
from semantic_pdf_search_engine_ray.functions.codec import (
    decode_doc_ids,
    decode_tfs,
)
from semantic_pdf_search_engine_ray.functions.tokenize import query_terms
from semantic_pdf_search_engine_ray.stages.encode import compute_tfn
from semantic_pdf_search_engine_ray.state import manifest as mf


def _load_tombstone_mask(index_dir: str, size: int) -> np.ndarray | None:
    """Bool mask over the doc-id space from ``<index>/tombstones/*.parquet``
    (written by pipelines.delete.delete_documents); None when the index
    has no deletions — the zero-cost common case."""
    tdir = os.path.join(index_dir, "tombstones")
    if not os.path.isdir(tdir):
        return None
    files = sorted(
        os.path.join(tdir, f) for f in os.listdir(tdir)
        if f.endswith(".parquet")
    )
    if not files:
        return None
    ids = np.concatenate([
        pq.read_table(f, columns=["doc_id"]).column("doc_id").to_numpy()
        for f in files
    ])
    mask = np.zeros(size, dtype=bool)
    mask[ids[(ids >= 0) & (ids < size)]] = True
    return mask


class IndexReader:
    """Loads a committed index directory; answers top-k BM25 queries."""

    def __init__(self, index_dir: str):
        m = mf.load_manifest(index_dir)
        self.index_dir = index_dir
        self.params = m["params"]
        self.k1 = float(self.params["k1"])
        self.b = float(self.params["b"])
        self.n_docs = int(m["n_docs"])
        self.avgdl = float(m["avgdl"])

        # doc lengths, dense by doc_id rank
        dl_tbl = pq.read_table(
            os.path.join(index_dir, "docs"), columns=["doc_id", "doc_len"]
        )
        dl_ids = dl_tbl.column("doc_id").to_numpy()
        size = max(self.n_docs, int(dl_ids.max()) + 1 if len(dl_ids) else 0)
        self.doc_len = np.zeros(size, dtype=np.int64)
        self.doc_len[dl_ids] = dl_tbl.column("doc_len").to_numpy()

        # dictionary: term -> df
        d_tbl = pq.read_table(
            os.path.join(index_dir, "dictionary"), columns=["term", "df"]
        )
        self.df = dict(
            zip(d_tbl.column("term").to_pylist(), d_tbl.column("df").to_numpy())
        )

        # posting blocks: term -> [(first_doc, max_tfn, row_idx)] ordered
        # by first_doc (salted / boundary-split runs merge here).
        #
        # Memory contract: ONLY the metadata columns (term, first_doc,
        # max_tfn) are loaded eagerly — the binary posting blobs stay on
        # disk and are fetched per ROW GROUP on first use
        # (pq.ParquetFile.read_row_group), so per-actor resident size is
        # ~metadata + the row groups the query stream actually touches,
        # not a full copy of the posting payload per actor. (The r1
        # version read_table'd every column into every actor.)
        from semantic_pdf_search_engine_ray.stages.postings import (
            group_rows_by_term,
        )

        pdir = os.path.join(index_dir, "postings")
        self._files: list[str] = sorted(
            os.path.join(root, f)
            for root, _dirs, files in os.walk(pdir)
            for f in files
            if f.endswith(".parquet")
        )
        metas = []
        # global row -> (file idx, row group idx, row offset inside group)
        rg_file: list[int] = []
        rg_index: list[int] = []
        rg_nrows: list[int] = []
        for fi, path in enumerate(self._files):
            pf = pq.ParquetFile(path)
            for rg in range(pf.metadata.num_row_groups):
                rg_file.append(fi)
                rg_index.append(rg)
                rg_nrows.append(pf.metadata.row_group(rg).num_rows)
            metas.append(
                pf.read(columns=["term", "first_doc", "max_tfn"])
            )
            pf.close()
        if metas:
            b_tbl = pa.concat_tables(metas).combine_chunks()
        else:
            b_tbl = pa.schema(
                [("term", pa.string()), ("first_doc", pa.int64()),
                 ("max_tfn", pa.float64())]
            ).empty_table()
        self._rg_file = np.array(rg_file, dtype=np.int64)
        self._rg_index = np.array(rg_index, dtype=np.int64)
        # rows [_rg_starts[g], _rg_starts[g+1]) live in row group g
        self._rg_starts = np.concatenate(
            [[0], np.cumsum(np.array(rg_nrows, dtype=np.int64))]
        )
        self._pf_handles: dict[int, pq.ParquetFile] = {}
        self._rg_cache: dict[int, tuple[pa.Array, pa.Array]] = {}

        first = b_tbl.column("first_doc").to_numpy()
        maxtfn = b_tbl.column("max_tfn").to_numpy()
        # term -> (first_docs, max_tfns, row_indices), each sorted by
        # first_doc — numpy slices, no per-row Python objects
        self.blocks: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {
            t: (first[grp], maxtfn[grp], grp)
            for t, grp in group_rows_by_term(
                b_tbl.column("term"), first
            ).items()
        }

        # decoded-postings cache: the index is immutable, head terms recur
        # across queries — decode each term's list at most once per actor
        self._postings_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._tfn_cache: dict[str, np.ndarray] = {}

        # tombstones (pipelines.delete): deleted docs never RANK, but
        # corpus stats (N, avgdl, df) stay frozen until purge_deleted
        # rebuilds — the Lucene deleted-docs contract, so scores of
        # surviving docs are bit-identical before and after a delete
        self.deleted = _load_tombstone_mask(index_dir, size)

    def _live(self, allowed: np.ndarray | None) -> np.ndarray | None:
        """AND the caller's doc-subset mask with the not-deleted mask."""
        if self.deleted is None:
            return allowed
        live = ~self.deleted
        return live if allowed is None else (allowed & live)

    # number of fetched row groups kept resident; decoded postings are
    # cached per term above, so this only needs to absorb fetch locality
    _RG_CACHE_MAX = 64

    def _block_bufs(self, row: int) -> tuple[bytes, bytes]:
        """Materialize one block's (docs, tfs) blobs, fetching its parquet
        row group from disk on first touch."""
        g = int(np.searchsorted(self._rg_starts, row, side="right")) - 1
        hit = self._rg_cache.get(g)
        if hit is None:
            fi = int(self._rg_file[g])
            pf = self._pf_handles.get(fi)
            if pf is None:
                pf = pq.ParquetFile(self._files[fi])
                self._pf_handles[fi] = pf
            t = pf.read_row_group(
                int(self._rg_index[g]), columns=["docs", "tfs"]
            ).combine_chunks()
            hit = (t.column("docs").chunk(0), t.column("tfs").chunk(0))
            if len(self._rg_cache) >= self._RG_CACHE_MAX:
                self._rg_cache.pop(next(iter(self._rg_cache)))
            self._rg_cache[g] = hit
        off = row - int(self._rg_starts[g])
        return hit[0][off].as_py(), hit[1][off].as_py()

    def _term_tfn(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, tfn) for a term — tfn is a pure function of the
        immutable (tf, doc_len) so it is cached alongside the postings."""
        tfn = self._tfn_cache.get(term)
        ids, tfs = self._term_postings(term)
        if tfn is None:
            tfn = compute_tfn(tfs, self.doc_len[ids], self.k1, self.b, self.avgdl)
            self._tfn_cache[term] = tfn
        return ids, tfn

    # -- scoring ------------------------------------------------------------

    def _weight(self, term: str) -> float:
        df = int(self.df.get(term, 0))
        if df == 0:
            return 0.0
        idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
        return idf * (self.k1 + 1.0)

    def _term_postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Concatenated decoded (doc_ids, tfs) for a term, doc_id-ascending.
        Cached per reader (immutable index)."""
        hit = self._postings_cache.get(term)
        if hit is not None:
            return hit
        blocks = self.blocks.get(term)
        if blocks is None:
            out = (np.empty(0, np.int64), np.empty(0, np.int64))
        else:
            bufs = [self._block_bufs(int(r)) for r in blocks[2]]
            out = (
                np.concatenate([decode_doc_ids(db) for db, _ in bufs]),
                np.concatenate([decode_tfs(tb) for _, tb in bufs]),
            )
        self._postings_cache[term] = out
        return out

    def top_k_exhaustive(
        self, query: str, k: int, allowed: np.ndarray | None = None
    ) -> list[tuple[int, float]]:
        """Dense term-at-a-time scoring (the WAND ground truth).

        ``allowed``: optional bool mask over doc_id (len == doc space) —
        the generalization of the reference's filename filter AND-ed into
        the search (J2, `qdrant.rs:84-93`); docs outside the mask never
        enter the heap."""
        allowed = self._live(allowed)
        scores = np.zeros(len(self.doc_len), dtype=np.float64)
        touched = False
        for term in query_terms(query):
            w = self._weight(term)
            if w == 0.0:
                continue
            ids, tfn = self._term_tfn(term)
            scores[ids] += w * tfn
            touched = True
        if not touched:
            return []
        if allowed is not None:
            scores[~allowed] = 0.0
        return self._topk_from_scores(scores, k)

    def _topk_from_scores(
        self, scores: np.ndarray, k: int
    ) -> list[tuple[int, float]]:
        cand = np.flatnonzero(scores)
        if cand.size == 0:
            return []
        svals = scores[cand]
        if cand.size > max(4096, k):
            # exact top-k preselect: keep every candidate scoring >= the
            # k-th largest value (ties included, so the doc_id tie-break
            # below stays exact), then sort only that set — O(n) select
            # instead of an O(n log n) lexsort over ~corpus-size heads
            kth = np.partition(svals, cand.size - k)[cand.size - k]
            keep = svals >= kth
            cand = cand[keep]
            svals = svals[keep]
        order = np.lexsort((cand, -svals))
        top = cand[order[:k]]
        return [(int(d), float(scores[d])) for d in top]

    def matched_docs(self, query: str) -> np.ndarray:
        """Bool mask of docs containing ANY query term (disjunctive
        match set, tombstones excluded) — the base set facet counting
        and match-count stats run over; no scoring."""
        m = np.zeros(len(self.doc_len), dtype=bool)
        for term in query_terms(query):
            if int(self.df.get(term, 0)) > 0:
                ids, _ = self._term_postings(term)
                m[ids] = True
        if self.deleted is not None:
            m &= ~self.deleted
        return m

    def expand_prefix(self, prefix: str, max_expand: int = 16) -> list[str]:
        """Dictionary terms starting with ``prefix``: two binary searches
        over the sorted term array (built lazily once per reader), then
        ranked df DESC / term ASC and capped at ``max_expand`` — the
        wildcard-expansion bound every production engine imposes. The
        cap and its ordering are part of the scoring contract (mirrored
        term-for-term by the SQL oracle)."""
        arr = getattr(self, "_sorted_terms", None)
        if arr is None:
            arr = np.array(sorted(self.df), dtype=object)
            self._sorted_terms = arr
        lo = int(np.searchsorted(arr, prefix, side="left"))
        hi = int(np.searchsorted(arr, prefix + "￿", side="left"))
        cands = sorted(arr[lo:hi], key=lambda t: (-int(self.df[t]), t))
        return [str(t) for t in cands[:max_expand]]

    def more_like_this(
        self, src_doc_id: int, text: str, k: int, n_terms: int = 8
    ) -> list[tuple[int, float]]:
        """Related-document retrieval: the source doc's top ``n_terms``
        terms by tf x ln(N/df) (ties term ASC) become a disjunctive
        BM25 query; the source itself is excluded. The term-selection
        rule is part of the contract (mirrored by the SQL oracle)."""
        from collections import Counter

        from semantic_pdf_search_engine_ray.functions.tokenize import (
            tokenize,
        )

        counts = Counter(tokenize(text))  # real tf, not the unique set
        ranked = sorted(
            ((tf * math.log(self.n_docs * 1.0 / int(self.df[t])), t)
             for t, tf in counts.items() if int(self.df.get(t, 0)) > 0),
            key=lambda x: (-x[0], x[1]),
        )
        scores = np.zeros(len(self.doc_len), dtype=np.float64)
        touched = False
        for _tfidf, term in ranked[:n_terms]:
            w = self._weight(term)
            if w == 0.0:
                continue
            ids, tfn = self._term_tfn(term)
            scores[ids] += w * tfn
            touched = True
        if not touched:
            return []
        if 0 <= src_doc_id < len(scores):
            scores[src_doc_id] = 0.0  # never recommend the source
        if self.deleted is not None:
            scores[self.deleted] = 0.0
        return self._topk_from_scores(scores, k)

    # deletion distance the lazily-built SymSpell index covers; queries
    # at a larger max_dist fall back to the exhaustive dictionary scan
    _SYMSPELL_DIST = 2

    def _symspell_index(self) -> dict[str, list[str]]:
        """Lazily-built SymSpell deletion index over the dictionary:
        deletion key -> terms whose _SYMSPELL_DIST-deletion neighborhood
        contains it. Built ONCE per reader on first suggest() call; per
        query, candidate generation is O(|D(query)|) hash probes instead
        of an O(|vocab|) banded-DP scan (the r2 serve-path ceiling)."""
        idx = getattr(self, "_symspell", None)
        if idx is None:
            from semantic_pdf_search_engine_ray.pipelines.spell import (
                deletion_keys,
            )

            idx = {}
            for t in self.df:
                for k in deletion_keys(t, self._SYMSPELL_DIST):
                    idx.setdefault(k, []).append(t)
            self._symspell = idx
        return idx

    def suggest(
        self, term: str, max_dist: int = 2, top_n: int = 3
    ) -> list[tuple[str, int]]:
        """Did-you-mean for one term: (term, distance) suggestions from
        the in-memory dictionary, ranked distance ASC / df DESC / term
        ASC — the reader-local counterpart of the distributed
        ``pipelines.spell.spell_suggestions`` (same contract, and the
        same SymSpell candidate pruning: exact recall, so results are
        identical to the exhaustive scan)."""
        from semantic_pdf_search_engine_ray.pipelines.spell import (
            bounded_levenshtein,
            deletion_keys,
        )

        if max_dist <= self._SYMSPELL_DIST:
            idx = self._symspell_index()
            cand_terms: set[str] = set()
            for k in deletion_keys(term, max_dist):
                hit = idx.get(k)
                if hit is not None:
                    cand_terms.update(hit)
        else:  # index covers dist <= _SYMSPELL_DIST only
            cand_terms = set(self.df)
        cands = []
        for t in cand_terms:
            d = bounded_levenshtein(term, t, max_dist)
            if d <= max_dist:
                cands.append((d, -int(self.df[t]), t))
        cands.sort()
        return [(t, d) for d, _ndf, t in cands[:top_n]]

    def top_k_prefix(
        self, prefix: str, k: int, max_expand: int = 16,
        allowed: np.ndarray | None = None,
        prior: np.ndarray | None = None,
    ) -> list[tuple[int, float]]:
        """Wildcard (``prefix*``) BM25: disjunctive dense scoring over
        the expanded term set — a query feature the reference's exact
        term lookup cannot express (engine addition). ``allowed`` is the
        same optional doc-subset mask as ``top_k_exhaustive`` — docs
        outside it never rank, so wildcard and doc-filters compose.
        ``prior`` is the same static-rank blend as ``top_k_blended``
        (added only to docs matching at least one expanded term), so
        wildcard queries compose with the full serving configuration."""
        allowed = self._live(allowed)
        scores = np.zeros(len(self.doc_len), dtype=np.float64)
        touched = False
        for term in self.expand_prefix(prefix, max_expand):
            w = self._weight(term)
            if w == 0.0:
                continue
            ids, tfn = self._term_tfn(term)
            scores[ids] += w * tfn
            touched = True
        if not touched:
            return []
        if allowed is not None:
            scores[~allowed] = 0.0
        if prior is not None:
            matched = scores > 0.0
            scores[matched] += prior[matched]
        return self._topk_from_scores(scores, k)

    def top_k_conjunctive(self, query: str, k: int) -> list[tuple[int, float]]:
        """Posting-list intersection (AND semantics) + BM25 top-k.

        The generalization of the reference's filtered search (J2,
        `qdrant.rs:84-93`: filename filter AND-ed with the vector
        search): only docs containing EVERY query term score. Float
        accumulation stays term-at-a-time in sorted-term order.
        """
        terms = query_terms(query)
        if not terms:
            return []
        postings = []
        for t in terms:
            w = self._weight(t)
            if w == 0.0:
                return []  # a missing term empties the conjunction
            ids, tfs = self._term_postings(t)
            postings.append((w, ids, tfs))
        postings_by_len = sorted(postings, key=lambda p: len(p[1]))
        common = postings_by_len[0][1]
        for _, ids, _ in postings_by_len[1:]:
            common = common[np.isin(common, ids, assume_unique=True)]
            if common.size == 0:
                return []
        if self.deleted is not None:
            common = common[~self.deleted[common]]
            if common.size == 0:
                return []
        scores = np.zeros(common.size, dtype=np.float64)
        for w, ids, tfs in postings:  # sorted-term order (not by length)
            pos = np.searchsorted(ids, common)
            tfn = compute_tfn(
                tfs[pos], self.doc_len[common], self.k1, self.b, self.avgdl
            )
            scores = scores + w * tfn
        order = np.lexsort((common, -scores))[:k]
        return [(int(common[i]), float(scores[i])) for i in order]

    def top_k_boolean(self, query: str, k: int) -> list[tuple[int, float]]:
        """MUST / MUST-NOT boolean search (the Lucene BooleanQuery /
        Google minus-operator shape): whitespace tokens prefixed ``-``
        are negated — any doc containing ANY negated term is excluded
        from ranking; the remaining tokens score as ordinary disjunctive
        BM25. Exclusion composes as a doc mask on the dense scorer, so
        stats (idf, avgdl) stay full-corpus — only ranking is masked
        (same contract as tombstones and doc-subset filters)."""
        raw = query.split()
        neg = " ".join(t[1:] for t in raw if t.startswith("-") and len(t) > 1)
        pos = " ".join(t for t in raw if not t.startswith("-"))
        if not pos:
            return []
        allowed = None
        neg_terms = query_terms(neg)
        if neg_terms:
            excluded = np.zeros(len(self.doc_len), dtype=bool)
            for t in neg_terms:
                if int(self.df.get(t, 0)) > 0:
                    ids, _ = self._term_postings(t)
                    excluded[ids] = True
            allowed = ~excluded
        return self.top_k_exhaustive(pos, k, allowed=allowed)

    def top_k_filtered(
        self, query: str, k: int, allowed: np.ndarray
    ) -> list[tuple[int, float]]:
        """Doc-subset-filtered top-k (dense path; a filter breaks WAND's
        upper-bound pruning, and the dense scorer is already the faster
        plan for the filtered candidate mass)."""
        return self.top_k_exhaustive(query, k, allowed=allowed)

    def top_k_blended(
        self, query: str, k: int, prior: np.ndarray,
        allowed: np.ndarray | None = None,
    ) -> list[tuple[int, float]]:
        """Web-search static-rank blending: final score = BM25 +
        ``prior[doc]`` (e.g. a damped log-PageRank), applied ONLY to
        docs matching at least one query term — the prior re-orders the
        match set, it never admits non-matching docs. ``prior`` is a
        dense float64 array over the doc space (at corpus scale: a
        doc-store column resolved once per actor, like the facet
        column). An optional ``allowed`` doc-subset mask (facet filter)
        ANDs with the tombstone mask — the full serving configuration
        (filtered + tombstoned + prior-blended) composes in one call.
        Tie-break stays (score DESC, doc_id ASC)."""
        allowed = self._live(allowed)
        scores = np.zeros(len(self.doc_len), dtype=np.float64)
        touched = False
        for term in query_terms(query):
            w = self._weight(term)
            if w == 0.0:
                continue
            ids, tfn = self._term_tfn(term)
            scores[ids] += w * tfn
            touched = True
        if not touched:
            return []
        if allowed is not None:
            scores[~allowed] = 0.0
        matched = scores > 0.0
        scores[matched] += prior[matched]
        return self._topk_from_scores(scores, k)

    def top_k_auto(self, query: str, k: int) -> list[tuple[int, float]]:
        """Cost-based choice between WAND and exhaustive scoring.

        WAND's doc-at-a-time pivot loop wins when query terms are
        selective (it skips decoding most blocks); for head-term queries
        whose posting mass covers a large corpus fraction, the vectorized
        dense scorer is faster than any Python-level iteration. Both
        return bit-identical results (tested), so this is purely a
        physical-plan decision — the same call a per-shard query actor
        makes at 10^12-doc scale from its local df stats.
        """
        total_df = sum(int(self.df.get(t, 0)) for t in query_terms(query))
        if total_df * 8 >= self.n_docs:
            return self.top_k_exhaustive(query, k)
        return self.top_k_wand(query, k)

    def top_k_wand(self, query: str, k: int) -> list[tuple[int, float]]:
        """WAND top-k with block-level decode skipping.

        Pivot selection uses *term-level* upper bounds (max over the
        term's block maxes — a current block's max does not bound later
        blocks); the per-block ``max_tfn`` + ``first_doc`` metadata lets
        ``advance_to`` skip whole blocks without decoding them. Exact:
        identical (doc_id, score) top-k as exhaustive scoring (same float
        op order), verified by tests.
        """
        # df > 0 AND locally present: under a sharded layout df is the
        # GLOBAL document frequency, so a term can have df > 0 yet no
        # posting blocks in this shard — it contributes nothing here
        terms = [
            t
            for t in query_terms(query)
            if self._weight(t) > 0.0 and t in self.blocks
        ]
        if not terms:
            return []
        cursors = []  # per term, in sorted-term order
        for t in terms:
            firsts, maxes, rows = self.blocks[t]
            w = self._weight(t)
            cursors.append(
                {
                    "w": w,
                    "ub": w * float(maxes.max()),  # term upper bound
                    "firsts": firsts,
                    "rows": rows,
                    "n": len(rows),
                    "bi": 0,          # current block index
                    "ids": None,      # decoded current block
                    "tfn": None,
                    "pi": 0,          # position within decoded block
                }
            )

        def ensure_decoded(c):
            if c["ids"] is None:
                db, tb = self._block_bufs(int(c["rows"][c["bi"]]))
                ids = decode_doc_ids(db)
                tfs = decode_tfs(tb)
                c["ids"] = ids
                c["tfn"] = compute_tfn(
                    tfs, self.doc_len[ids], self.k1, self.b, self.avgdl
                )
                c["pi"] = 0

        def current_doc(c):
            if c["bi"] >= c["n"]:
                return None
            ensure_decoded(c)
            return int(c["ids"][c["pi"]])

        def advance_to(c, target):
            """Move cursor to first doc >= target, skipping undecoded
            blocks via their (first_doc) metadata."""
            while c["bi"] < c["n"]:
                if c["ids"] is None:
                    while (
                        c["bi"] + 1 < c["n"]
                        and c["firsts"][c["bi"] + 1] <= target
                    ):
                        c["bi"] += 1
                    ensure_decoded(c)
                ids = c["ids"]
                pos = int(np.searchsorted(ids, target, side="left"))
                if pos < len(ids):
                    c["pi"] = pos
                    return
                c["bi"] += 1
                c["ids"] = None

        heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)

        def offer(doc: int, score: float):
            item = (score, -doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)

        while True:
            live = [c for c in cursors if current_doc(c) is not None]
            if not live:
                break
            live.sort(key=lambda c: current_doc(c))
            # pivot: smallest doc whose prefix upper-bound sum can still
            # enter the heap (>= so exact score==threshold ties with a
            # smaller doc_id are not lost)
            theta = heap[0][0] if len(heap) >= k else 0.0
            ub = 0.0
            pivot_idx = None
            for i, c in enumerate(live):
                ub += c["ub"]
                if len(heap) < k or ub >= theta:
                    pivot_idx = i
                    break
            if pivot_idx is None:
                break  # no remaining doc can beat the threshold
            pivot_doc = current_doc(live[pivot_idx])
            if current_doc(live[0]) == pivot_doc:
                # fully evaluate pivot_doc: contributions accumulate in
                # sorted-term (cursor-creation) order for float identity
                score = 0.0
                for c in cursors:
                    if current_doc(c) == pivot_doc:
                        score = score + c["w"] * float(c["tfn"][c["pi"]])
                for c in cursors:
                    if current_doc(c) == pivot_doc:
                        c["pi"] += 1
                        if c["pi"] >= len(c["ids"]):
                            c["bi"] += 1
                            c["ids"] = None
                # tombstoned docs are evaluated (cursors must advance)
                # but never enter the heap; upper bounds stay valid
                if self.deleted is None or not self.deleted[pivot_doc]:
                    offer(pivot_doc, score)
            else:
                # advance the leading cursors up to the pivot
                for c in live[:pivot_idx]:
                    advance_to(c, pivot_doc)

        out = [(-nd, s) for s, nd in heap]
        out.sort(key=lambda x: (-x[1], x[0]))
        return out


class QueryActor:
    """Actor-pool stage: query batches -> result rows.

    Usage::

        results = queries_ds.map_batches(
            QueryActor, fn_constructor_args=(index_dir, k, method),
            batch_format="pyarrow", batch_size=cfg.query_batch_size,
            concurrency=cfg.query_concurrency)
    """

    def __init__(
        self,
        index_dir: str,
        k: int | None = None,
        method: str = "wand",
        filter_col: str | None = None,
        filter_value: str | None = None,
    ):
        self.reader = IndexReader(index_dir)
        self.k = k if k is not None else EngineConfig().top_k
        if filter_col is not None and method == "conjunctive":
            raise ValueError(
                "doc-subset filter + conjunctive scoring are not "
                "composed yet; use method='auto' with the filter"
            )
        if filter_col is not None:
            # doc-subset predicate resolved ONCE per actor from the docs
            # store (J2 filename-filter analog, `qdrant.rs:84-93`)
            f_tbl = pq.read_table(
                os.path.join(index_dir, "docs"),
                columns=["doc_id", filter_col],
            )
            allowed = np.zeros(len(self.reader.doc_len), dtype=bool)
            vals = f_tbl.column(filter_col).to_pylist()
            ids = f_tbl.column("doc_id").to_numpy()
            allowed[ids[[v == filter_value for v in vals]]] = True
            self.score = lambda q, k: self.reader.top_k_filtered(q, k, allowed)
            # wildcard + filter COMPOSE: the dense prefix scorer takes
            # the same doc mask, so `data*` under a filter ranks only
            # the allowed subset instead of bypassing the filter
            self._prefix_fn = lambda p, k: self.reader.top_k_prefix(
                p, k, allowed=allowed
            )
        else:
            self.score = {
                "auto": self.reader.top_k_auto,
                "wand": self.reader.top_k_wand,
                "exhaustive": self.reader.top_k_exhaustive,
                "conjunctive": self.reader.top_k_conjunctive,
                "boolean": self.reader.top_k_boolean,
            }[method]
            self._prefix_fn = self.reader.top_k_prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        return score_query_batch(batch, self.score, self.k,
                                 prefix_fn=self._prefix_fn)


def score_query_batch(
    batch: pa.Table, score_fn, k: int, prefix_fn=None
) -> pa.Table:
    """Shared result-row assembly for every query tier (QueryActor,
    ShardedQueryActor): (query_id, query) rows -> ranked result rows.
    When ``prefix_fn`` is given, single-token ``data*`` queries route
    to it — same wildcard semantics as the CLI/serve surfaces."""
    from semantic_pdf_search_engine_ray.functions.tokenize import (
        as_prefix_query,
    )

    qids: list[int] = []
    ranks: list[int] = []
    docs: list[int] = []
    scores: list[float] = []
    for qid, qtext in zip(
        batch.column("query_id").to_pylist(),
        batch.column("query").to_pylist(),
    ):
        pfx = as_prefix_query(qtext) if prefix_fn is not None else None
        hits = prefix_fn(pfx, k) if pfx is not None else score_fn(qtext, k)
        for rank, (doc_id, score) in enumerate(hits, start=1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(doc_id)
            scores.append(score)
    return pa.table(
        {
            "query_id": pa.array(qids, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
            "doc_id": pa.array(docs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64()),
        }
    )
