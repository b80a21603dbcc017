"""Trigram substring-search index: grep-style `pattern in text` queries
the tokenized BM25 index cannot express (the analyzer folds case and
strips punctuation; substring search must not).

Engine addition beyond the reference (which has only token search +
fuzzy re-localization): the classic trigram design (PostgreSQL pg_trgm,
Google Code Search — Cox, "Regular Expression Matching with a Trigram
Index"). Case-SENSITIVE raw-text semantics, the exact contract of SQL
``contains(text, pattern)`` — mirrored by the conformance oracle.

Build (Ray-Data-first):
  docs -> per-doc DISTINCT char trigrams (map_batches, set per doc)
       -> ONE groupby(trigram) -> sorted delta+varint doc-id blobs
       (functions/codec — the same posting codec as the BM25 index)
       -> parquet + committed manifest.
Query:
  pattern trigrams -> smallest posting first, sorted-array intersect
  -> candidate doc ids (superset) -> VERIFY with a pushdown isin read
  of only the candidate texts (`pattern in text`) — never a corpus
  scan. Patterns shorter than 3 chars are rejected (no trigram can
  prune; a corpus scan in disguise).

Partitioning assumption at 10^12 docs: trigram keys are ~alphabet^3
uniform hash keys for the groupby; posting blobs shard by trigram
exactly like the BM25 term shards (doc-range sub-indexes + owner
merge), and verification stays pushdown-per-candidate.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data as rd

from semantic_pdf_search_engine_ray.functions.codec import (
    decode_doc_ids,
    encode_doc_ids,
)
from semantic_pdf_search_engine_ray.state import manifest as mf

MIN_PATTERN_LEN = 3


def text_trigrams(text: str) -> set[str]:
    """Distinct char trigrams of the RAW text (case-sensitive)."""
    return {text[i:i + 3] for i in range(len(text) - 2)}


def _trigram_rows(batch: pa.Table) -> pa.Table:
    tris: list[str] = []
    ids: list[int] = []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        g = text_trigrams(text)
        tris.extend(g)
        ids.extend([doc_id] * len(g))
    return pa.table({"tri": pa.array(tris, type=pa.string()),
                     "doc_id": pa.array(ids, type=pa.int64())})


def _encode_group(group: pa.Table) -> pa.Table:
    ids = np.sort(group.column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64))
    return pa.table(
        {"tri": pa.array([group.column("tri")[0].as_py()],
                         type=pa.string()),
         "df": pa.array([len(ids)], type=pa.int64()),
         "docs": pa.array([encode_doc_ids(ids)], type=pa.binary())}
    )


def build_trigram_index(
    docs_path: str | list[str], out_dir: str,
    input_lineage: dict | None = None,
) -> dict:
    """documents parquet -> committed trigram index under ``out_dir``
    (postings/ parquet + docs source path pinned in the manifest)."""
    if not mf.is_ready(out_dir):
        os.makedirs(out_dir, exist_ok=True)
        ck = mf.StageCheckpoint(
            out_dir, "trigrams",
            {"input": input_lineage or {}, "fmt": "tri-delta-varint-v1"},
        )
        if not ck.is_complete():
            out = ck.fresh_dir()
            (rd.read_parquet(docs_path, columns=["doc_id", "text"])
             .map_batches(_trigram_rows, batch_format="pyarrow")
             .groupby("tri")
             .map_groups(_encode_group, batch_format="pyarrow")
             .write_parquet(out))
            ck.commit()
        mf.commit_manifest(out_dir, {
            "layout": "trigram_v1",
            "docs_path": (docs_path if isinstance(docs_path, str)
                          else list(docs_path)),
        })
    return mf.load_manifest(out_dir)


class TrigramReader:
    """Loads a committed trigram index; answers substring queries.

    Same memory contract as IndexReader: per-actor state is the
    (trigram -> blob) table; candidate verification pushdown-reads
    only the candidate docs from the source parquet."""

    def __init__(self, index_dir: str):
        m = mf.load_manifest(index_dir)
        self.docs_path = m["docs_path"]
        t = pq.read_table(os.path.join(index_dir, "trigrams"),
                          columns=["tri", "df", "docs"])
        self._df = dict(zip(t.column("tri").to_pylist(),
                            t.column("df").to_pylist()))
        self._blob = dict(zip(t.column("tri").to_pylist(),
                              t.column("docs").to_pylist()))
        self._cache: dict[str, np.ndarray] = {}

    def _postings(self, tri: str) -> np.ndarray:
        hit = self._cache.get(tri)
        if hit is None:
            blob = self._blob.get(tri)
            hit = (decode_doc_ids(blob) if blob is not None
                   else np.empty(0, np.int64))
            self._cache[tri] = hit
        return hit

    def candidates(self, pattern: str) -> np.ndarray:
        """Sorted doc ids containing EVERY trigram of ``pattern`` —
        a superset of the true matches."""
        if len(pattern) < MIN_PATTERN_LEN:
            raise ValueError(
                f"pattern must be >= {MIN_PATTERN_LEN} chars "
                "(shorter patterns cannot prune the corpus)")
        tris = sorted(text_trigrams(pattern),
                      key=lambda t: self._df.get(t, 0))
        common = self._postings(tris[0])
        for t in tris[1:]:
            if common.size == 0:
                break
            common = common[np.isin(common, self._postings(t),
                                    assume_unique=True)]
        return common

    def search(self, pattern: str) -> list[int]:
        """Exact substring match: trigram candidates verified against
        the candidate docs' raw text (pushdown isin read)."""
        cand = self.candidates(pattern)
        if cand.size == 0:
            return []
        t = pads.dataset(self.docs_path).to_table(
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(cand.tolist()),
        )
        return sorted(
            d for d, txt in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist())
            if pattern in txt
        )


class SubstringCountActor:
    """Actor-pool stage: (pattern_id, pattern) -> one row per matching
    doc with its NON-OVERLAPPING occurrence count (grep -c): the
    trigram planner prunes to candidates, `str.count` verifies and
    counts on the pushdown-read raw text (SQL mirror: length-delta of
    replace(), the same left-to-right non-overlapping convention)."""

    def __init__(self, index_dir: str):
        self.reader = TrigramReader(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids: list[int] = []
        docs: list[int] = []
        ns: list[int] = []
        for pid, pat in zip(batch.column("pattern_id").to_pylist(),
                            batch.column("pattern").to_pylist()):
            cand = self.reader.candidates(pat)
            if cand.size == 0:
                continue
            t = pads.dataset(self.reader.docs_path).to_table(
                columns=["doc_id", "text"],
                filter=pads.field("doc_id").isin(cand.tolist()),
            )
            for d, txt in zip(t.column("doc_id").to_pylist(),
                              t.column("text").to_pylist()):
                n = txt.count(pat)
                if n > 0:
                    pids.append(pid)
                    docs.append(d)
                    ns.append(n)
        return pa.table(
            {"pattern_id": pa.array(pids, type=pa.int64()),
             "doc_id": pa.array(docs, type=pa.int64()),
             "n_matches": pa.array(ns, type=pa.int64())}
        )


def substring_match_counts(
    index_dir: str, patterns: pa.Table, concurrency: int = 2,
) -> rd.Dataset:
    """(pattern_id, pattern) -> (pattern_id, doc_id, n_matches)."""
    return rd.from_arrow(patterns).map_batches(
        SubstringCountActor,
        fn_constructor_args=(index_dir,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class SubstringQueryActor:
    """Actor-pool stage: (pattern_id, pattern) batches -> one row per
    (pattern_id, doc_id) match; the reader loads once per actor."""

    def __init__(self, index_dir: str):
        self.reader = TrigramReader(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids: list[int] = []
        docs: list[int] = []
        for pid, pat in zip(batch.column("pattern_id").to_pylist(),
                            batch.column("pattern").to_pylist()):
            for d in self.reader.search(pat):
                pids.append(pid)
                docs.append(d)
        return pa.table(
            {"pattern_id": pa.array(pids, type=pa.int64()),
             "doc_id": pa.array(docs, type=pa.int64())}
        )


def substring_search(
    index_dir: str, patterns: pa.Table, concurrency: int = 2,
) -> rd.Dataset:
    """(pattern_id, pattern) table -> (pattern_id, doc_id) matches."""
    return rd.from_arrow(patterns).map_batches(
        SubstringQueryActor,
        fn_constructor_args=(index_dir,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# --------------------------------------------------------------------------
# Regex search over the trigram index (Cox, "Regular Expression Matching
# with a Trigram Index" — the Google Code Search design, simplified)
# --------------------------------------------------------------------------

def _literal_runs_candidates(reader: "TrigramReader", parsed):
    """Recursive query planner: returns a sorted candidate doc-id array
    for a parsed regex sequence, or None when the node imposes no
    trigram constraint. Required literal runs AND together; BRANCH
    alternatives OR together. Unsupported constructs simply contribute
    no constraint (still sound — verification is exact)."""
    import re._constants as c

    cand = None  # None = unconstrained so far

    def add_and(arr):
        nonlocal cand
        if arr is None:
            return
        cand = arr if cand is None else cand[
            np.isin(cand, arr, assume_unique=True)]

    run: list[str] = []

    def close_run():
        nonlocal run
        lit = "".join(run)
        run = []
        if len(lit) >= MIN_PATTERN_LEN:
            add_and(reader.candidates(lit))

    for op, av in parsed:
        if op is c.LITERAL:
            run.append(chr(av))
        elif op is c.BRANCH:
            close_run()
            union = None
            for branch in av[1]:
                b = _literal_runs_candidates(reader, branch)
                if b is None:
                    union = None  # one unconstrained branch -> no info
                    break
                union = b if union is None else np.union1d(union, b)
            add_and(union)
        elif op is c.SUBPATTERN:
            # av = (group, add_flags, del_flags, subpattern). Scoped flag
            # groups like (?i:abc) set add_flags here WITHOUT touching
            # parsed.state.flags — the top-level guard in
            # regex_candidates never sees them, so refuse here too:
            # indexing 'abc' case-sensitively while re.search verifies
            # case-insensitively silently drops matching docs.
            import re as _re
            bad = av[1] & (_re.IGNORECASE | _re.LOCALE)
            if bad:
                raise ValueError(
                    f"regex uses unsupported scoped inline flags "
                    f"({_re.RegexFlag(bad)!r}); the trigram planner "
                    "indexes literal runs case-sensitively")
            close_run()
            add_and(_literal_runs_candidates(reader, av[3]))
        elif op is c.MAX_REPEAT and av[0] >= 1:
            body = list(av[2])
            if len(body) == 1 and body[0][0] is c.LITERAL:
                # x+ requires at least one x: extend the current run by
                # one copy, then break (repetition severs adjacency
                # with whatever follows)
                run.append(chr(body[0][1]))
                close_run()
            else:
                # at least one occurrence required: analyze body once
                close_run()
                add_and(_literal_runs_candidates(reader, av[2]))
        else:
            # dot, classes, anchors, optional repeats... break the run
            close_run()
    close_run()
    return cand


class _RegexMixin:
    def regex_candidates(self, pattern: str) -> np.ndarray:
        """Sorted doc-id superset for a regex: ANDed trigrams of every
        required literal run, OR across alternation branches. Raises if
        the pattern has no required literal of >= 3 chars anywhere (a
        corpus scan in disguise — same refusal as short substrings)."""
        import re as _re
        import re._parser as sre_parse

        parsed = sre_parse.parse(pattern)
        # Literal-affecting inline flags ((?i)/(?s)/(?x)...) would make the
        # trigram plan prune case-SENSITIVELY while re.search verifies
        # case-insensitively — silent false negatives. Refuse them the same
        # way unplannable patterns are refused rather than degrade quietly.
        bad = parsed.state.flags & (_re.IGNORECASE | _re.LOCALE | _re.VERBOSE)
        if bad:
            raise ValueError(
                f"regex uses unsupported inline flags ({_re.RegexFlag(bad)!r}); "
                "the trigram planner indexes literal runs case-sensitively")
        cand = _literal_runs_candidates(self, parsed)
        if cand is None:
            raise ValueError(
                "regex has no required literal of >= "
                f"{MIN_PATTERN_LEN} chars; refusing the full-corpus scan")
        return cand

    def regex_search(self, pattern: str) -> list[int]:
        """Exact regex match (re.search semantics): trigram-planned
        candidates verified against the candidate docs' raw text."""
        import re as _re

        cand = self.regex_candidates(pattern)
        if cand.size == 0:
            return []
        rx = _re.compile(pattern)
        t = pads.dataset(self.docs_path).to_table(
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(cand.tolist()),
        )
        return sorted(
            d for d, txt in zip(t.column("doc_id").to_pylist(),
                                t.column("text").to_pylist())
            if rx.search(txt)
        )


# graft the mixin (kept separate for readability above)
TrigramReader.regex_candidates = _RegexMixin.regex_candidates
TrigramReader.regex_search = _RegexMixin.regex_search


class RegexQueryActor:
    """Actor-pool stage: (pattern_id, pattern) -> (pattern_id, doc_id)
    regex matches through the trigram planner."""

    def __init__(self, index_dir: str):
        self.reader = TrigramReader(index_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pids: list[int] = []
        docs: list[int] = []
        for pid, pat in zip(batch.column("pattern_id").to_pylist(),
                            batch.column("pattern").to_pylist()):
            for d in self.reader.regex_search(pat):
                pids.append(pid)
                docs.append(d)
        return pa.table(
            {"pattern_id": pa.array(pids, type=pa.int64()),
             "doc_id": pa.array(docs, type=pa.int64())}
        )


def regex_search(
    index_dir: str, patterns: pa.Table, concurrency: int = 2,
) -> rd.Dataset:
    """(pattern_id, pattern) table -> (pattern_id, doc_id) matches."""
    return rd.from_arrow(patterns).map_batches(
        RegexQueryActor,
        fn_constructor_args=(index_dir,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# --------------------------------------------------------------------------
# Sharded trigram layout (the multi-node story for the substring family)
# --------------------------------------------------------------------------

def build_sharded_trigram_index(
    docs_path: str | list[str], root_dir: str, n_shards: int,
    input_lineage: dict | None = None,
) -> dict:
    """Doc-range-sharded trigram index: docs split by doc_id range, one
    independent (resumable) trigram sub-index per range. Substring /
    regex semantics carry NO corpus statistics, so sharded answers are
    exactly the union of per-shard answers — no global dictionary or
    pinned constants to maintain (simpler than the BM25 shards)."""
    import pyarrow.dataset as _pads

    os.makedirs(root_dir, exist_ok=True)
    if not mf.is_ready(root_dir):
        ids = _pads.dataset(docs_path).to_table(columns=["doc_id"]) \
            .column("doc_id").to_numpy()
        lo, hi = (int(ids.min()), int(ids.max())) if len(ids) else (0, 0)
        span = max(hi - lo + 1, 1)
        bounds = [lo + (s * span) // n_shards for s in range(n_shards + 1)]
        shards = []
        for s in range(n_shards):
            sub_docs = os.path.join(root_dir, f"docs_{s:05d}")
            os.makedirs(sub_docs, exist_ok=True)
            t = _pads.dataset(docs_path).to_table(
                columns=["doc_id", "text"],
                filter=(_pads.field("doc_id") >= bounds[s])
                & (_pads.field("doc_id") < bounds[s + 1]),
            )
            pq.write_table(t, os.path.join(sub_docs, "docs.parquet"))
            sdir = os.path.join(root_dir, f"shard_{s:05d}")
            build_trigram_index(
                os.path.join(sub_docs, "docs.parquet"), sdir,
                input_lineage={"root": root_dir, "shard": s,
                               **(input_lineage or {})},
            )
            shards.append(os.path.basename(sdir))
        mf.commit_manifest(root_dir, {
            "layout": "trigram_sharded_v1",
            "n_shards": n_shards,
            "shards": shards,
        })
    return mf.load_manifest(root_dir)


class ShardedTrigramReader:
    """Union-of-shards substring/regex reader: every query visits every
    shard reader (the owner-tier shape); results are disjoint by
    doc-range construction, so the merge is a plain sorted union."""

    def __init__(self, root_dir: str):
        m = mf.load_manifest(root_dir)
        self.readers = [
            TrigramReader(os.path.join(root_dir, s)) for s in m["shards"]
        ]

    def search(self, pattern: str) -> list[int]:
        out: list[int] = []
        for r in self.readers:
            out.extend(r.search(pattern))
        return sorted(out)

    def regex_search(self, pattern: str) -> list[int]:
        out: list[int] = []
        for r in self.readers:
            out.extend(r.regex_search(pattern))
        return sorted(out)
