"""Driver-conformance surface: one runner + (where expressible) one
ANSI-SQL oracle per implemented operator (SURVEY.md §2 inventory plus the
training-data additions).

Each runner takes ``sf_dir`` (a directory of driver-generated parquet
tables — ``documents``, ``embeddings``, ``events``) and returns an Arrow
table / Ray Dataset. The paired SQL strings in ``ORACLE_SQL`` compute the
same result in DuckDB over the same parquet (the driver pre-registers the
tables as views). Column names/types match exactly; float results are
rounded to 6 dp on BOTH sides (fp summation order differs between a
distributed engine and a single-process SQL engine; per-term/-pair
contributions are pinned to identical expression trees so 6 dp is far
beyond the residual error).

The BM25 query set is DERIVED from the data in both engines (top
``N_HEAD_TERMS`` df-ranked terms -> single-term queries + adjacent-pair
queries), so one static SQL string validates the full pipeline at any
scale factor.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from semantic_pdf_search_engine_ray.config import (
    EngineConfig,
    TOKEN_PATTERN,
    scratch_root,
)
from semantic_pdf_search_engine_ray.functions.chunking import chunk_document
from semantic_pdf_search_engine_ray.functions.codec import (
    decode_doc_ids,
    decode_tfs,
)
from semantic_pdf_search_engine_ray.functions.textnorm import clean_text_robust

_SCRATCH = scratch_root()
from semantic_pdf_search_engine_ray.pipelines import dedup as dd
from semantic_pdf_search_engine_ray.pipelines import sketch as sk
from semantic_pdf_search_engine_ray.pipelines import similarity as sim
from semantic_pdf_search_engine_ray.pipelines import textstats as ts
from semantic_pdf_search_engine_ray.pipelines import windows as win
from semantic_pdf_search_engine_ray.pipelines.build import build_index_from_docs
from semantic_pdf_search_engine_ray.pipelines.search import (
    run_queries,
    run_queries_with_highlights,
)
from semantic_pdf_search_engine_ray.stages.multimodal import (
    AudioFeaturesStage,
    ImageDecodeStage,
    ImageStatsStage,
    VideoFrameSampleStage,
    attach_frames_batch,
    attach_payload_batch,
    attach_png_batch,
    attach_wav_batch,
)
from semantic_pdf_search_engine_ray.state import manifest as mf

CFG = EngineConfig()
N_HEAD_TERMS = 16
TOP_K = 5
JACCARD_N = 3
JACCARD_THRESHOLD = 0.5
CHUNK_UID_STRIDE = 1000
EMB_DUP_THRESHOLD = 0.4
ANN_K = 5
ANN_QUERIES = 10
ANN_IVF_CELLS = 8
ANN_IVF_NPROBE = 2
SIMHASH_MAX_HAMMING = 3
UNIGRAM_MIN_COUNT = 2
UNIGRAM_OOV_CF = 1


def documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def embeddings_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def events_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "events.parquet")


def read_docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(documents_path(sf_dir), columns=["doc_id", "text"])


# --------------------------------------------------------------------------
# index build (cached per sf_dir; StageCheckpoint makes re-calls no-ops)
# --------------------------------------------------------------------------

def _sf_cache_key(sf_dir: str) -> str:
    """Content-aware cache key: path + documents.parquet (size, mtime) +
    index format version — changed data or layout at the same path never
    silently reuses a stale cached index."""
    st = os.stat(documents_path(sf_dir))
    blob = (f"{os.path.abspath(sf_dir)}|{st.st_size}|{st.st_mtime_ns}"
            f"|fmt{CFG.INDEX_FORMAT_VERSION}")
    return hashlib.md5(blob.encode()).hexdigest()[:12]


def ensure_index(sf_dir: str) -> str:
    """Build (or resume) the documents-table index for ``sf_dir`` under
    /tmp; repeat calls hit the committed manifest and return instantly.
    The docs store carries ``lang`` so filtered search can resolve
    doc-subset predicates without touching the source table."""
    index_dir = f"{_SCRATCH}/spse_ray_index_{_sf_cache_key(sf_dir)}"
    if not mf.is_ready(index_dir):
        docs = rd.read_parquet(
            documents_path(sf_dir), columns=["doc_id", "text", "lang"]
        )
        build_index_from_docs(
            docs,
            index_dir,
            CFG,
            input_lineage={"sf_dir": os.path.abspath(sf_dir), "table": "documents"},
        )
    return index_dir


def derive_query_table(index_dir: str) -> pa.Table:
    """The deterministic reference query set: top N_HEAD_TERMS terms by
    (df DESC, term ASC) as single-term queries (query_id = rank), plus
    adjacent-rank pairs (query_id = N_HEAD_TERMS + rank). Mirrored in SQL
    by ``_head_cte``."""
    d = pq.read_table(os.path.join(index_dir, "dictionary"),
                      columns=["term", "df"])
    rows = sorted(
        zip(d.column("term").to_pylist(), d.column("df").to_pylist()),
        key=lambda r: (-int(r[1]), r[0]),
    )[:N_HEAD_TERMS]
    head = [t for t, _ in rows]
    qids = list(range(len(head)))
    queries = list(head)
    for i in range(len(head) - 1):
        qids.append(N_HEAD_TERMS + i)
        queries.append(f"{head[i]} {head[i + 1]}")
    return pa.table(
        {"query_id": pa.array(qids, type=pa.int64()),
         "query": pa.array(queries, type=pa.string())}
    )


def pair_query_table(index_dir: str) -> pa.Table:
    """Adjacent-pair conjunctive queries, query_id = rank (0-based)."""
    full = derive_query_table(index_dir)
    mask = [q >= N_HEAD_TERMS for q in full.column("query_id").to_pylist()]
    pairs = full.filter(pa.array(mask))
    return pa.table(
        {"query_id": pa.array(
            [q - N_HEAD_TERMS for q in pairs.column("query_id").to_pylist()],
            type=pa.int64()),
         "query": pairs.column("query")}
    )


def _round_col(tbl: pa.Table, col: str, digits: int = 6) -> pa.Table:
    """Round with DuckDB's exact tie rule: round(x, d) in DuckDB computes
    floor(|x| * 10^d + 0.5) * sign / 10^d (half AWAY from zero), while
    np.round is half-to-even — a value landing exactly on a .5 tie would
    otherwise flag a spurious mismatch vs the SQL oracle."""
    # vectorized functions/num.round6_half_away (generalized to digits)
    v = np.asarray(
        tbl.column(col).to_numpy(zero_copy_only=False), dtype=np.float64
    )
    scale = 10.0 ** digits
    vals = np.copysign(np.floor(np.abs(v) * scale + 0.5), v) / scale
    i = tbl.column_names.index(col)
    return tbl.set_column(i, col, pa.array(vals, type=pa.float64()))


def _collect(ds: rd.Dataset) -> pa.Table:
    """Concatenate a Dataset's blocks, dropping Ray's occasional
    schema-less empty blocks; on an all-empty result return an empty
    table with the REAL schema (some non-degenerate block carries it)."""
    parts = list(ray.get(ds.to_arrow_refs()))
    good = [p for p in parts if p.num_rows]
    if good:
        return pa.concat_tables(good)
    for p in parts:
        if len(p.schema) > 0:
            return p
    return pa.table({})


# --------------------------------------------------------------------------
# runners: full-text core
# --------------------------------------------------------------------------

def q_doc_stats(sf_dir: str) -> rd.Dataset:
    return ts.doc_stats(read_docs(sf_dir))


def q_token_classes(sf_dir: str) -> rd.Dataset:
    return ts.token_class_counts(read_docs(sf_dir))


def q_quality(sf_dir: str) -> rd.Dataset:
    return ts.quality(read_docs(sf_dir))


def q_lang_id(sf_dir: str) -> rd.Dataset:
    return ts.lang_id(read_docs(sf_dir))


def q_fingerprint(sf_dir: str) -> rd.Dataset:
    return ts.fingerprints(read_docs(sf_dir)).select_columns(
        ["doc_id", "content_md5"]
    )


def q_winnow(sf_dir: str) -> rd.Dataset:
    """Winnowing fingerprints (oracle: _SQL_WINNOW recomputes the
    md5-low64 k-gram hashes and the windowed-min selection)."""
    return ts.fingerprints(read_docs(sf_dir)).select_columns(
        ["doc_id", "n_winnow", "min_winnow"]
    )


def q_unigram_logprob(sf_dir: str) -> rd.Dataset:
    return ts.unigram_logprob(read_docs(sf_dir),
                              min_count=UNIGRAM_MIN_COUNT)


def q_bigram_logprob(sf_dir: str) -> rd.Dataset:
    return ts.bigram_logprob(read_docs(sf_dir))


def q_hashed_tfidf(sf_dir: str) -> rd.Dataset:
    return ts.hashed_tfidf(read_docs(sf_dir))


def q_index_stats(sf_dir: str) -> pa.Table:
    """One-row index health report straight off the committed index
    (dictionary + manifest) — every number independently recomputed by
    the SQL oracle from raw text: vocabulary size, total postings
    (distinct (term, doc) pairs), max df, corpus doc/token counts."""
    index_dir = ensure_index(sf_dir)
    d = pq.read_table(os.path.join(index_dir, "dictionary"),
                      columns=["term", "df"])
    m = mf.load_manifest(index_dir)
    df = d.column("df").to_numpy()
    return pa.table({
        "n_terms": pa.array([d.num_rows], type=pa.int64()),
        "total_postings": pa.array([int(df.sum())], type=pa.int64()),
        "max_df": pa.array([int(df.max()) if len(df) else 0],
                           type=pa.int64()),
        "n_docs": pa.array([int(m["n_docs"])], type=pa.int64()),
        "total_tokens": pa.array([int(m["total_tokens"])],
                                 type=pa.int64()),
    })


SUBSTRING_PATTERNS = 5
SUBSTRING_OFF = 10   # Python text[10:18] == SQL substr(text, 11, 8)
SUBSTRING_LEN = 8


def _trigram_index(sf_dir: str) -> str:
    from semantic_pdf_search_engine_ray.pipelines.substring import (
        build_trigram_index,
    )

    out = f"{_SCRATCH}/spse_ray_tri_{_sf_cache_key(sf_dir)}"
    build_trigram_index(documents_path(sf_dir), out,
                        input_lineage={"sf_dir": os.path.abspath(sf_dir)})
    return out


def q_substring_search(sf_dir: str) -> rd.Dataset:
    """Grep-style substring search through the trigram index: patterns
    are 8-char slices of the SUBSTRING_PATTERNS lowest-doc_id texts
    (derived identically in SQL), matches verified on raw text."""
    from semantic_pdf_search_engine_ray.pipelines.substring import (
        substring_search,
    )

    import pyarrow.dataset as pads

    index_dir = _trigram_index(sf_dir)
    src = pads.dataset(documents_path(sf_dir)).to_table(
        columns=["doc_id", "text"]).sort_by("doc_id")
    pats = [
        t[SUBSTRING_OFF:SUBSTRING_OFF + SUBSTRING_LEN]
        for t in src.column("text").to_pylist()[:SUBSTRING_PATTERNS]
    ]
    tbl = pa.table({
        "pattern_id": pa.array(range(len(pats)), type=pa.int64()),
        "pattern": pa.array(pats, type=pa.string()),
    })
    return substring_search(index_dir, tbl)


# pinned regex set (RE2 == Python `re` semantics for these): literal
# alternation, grouped alternation, class-separated literals, plus
REGEX_PATTERNS = ("table (scan|sort)", "hash join|merge join",
                  "window [a-z]+ scan", "joi+n table")


def q_regex_search(sf_dir: str) -> rd.Dataset:
    """Regex search via the trigram planner (Cox/Code-Search design):
    required literal runs AND, alternation branches OR, exact re.search
    verification on candidates."""
    from semantic_pdf_search_engine_ray.pipelines.substring import (
        regex_search,
    )

    index_dir = _trigram_index(sf_dir)
    tbl = pa.table({
        "pattern_id": pa.array(range(len(REGEX_PATTERNS)),
                               type=pa.int64()),
        "pattern": pa.array(list(REGEX_PATTERNS), type=pa.string()),
    })
    return regex_search(index_dir, tbl)


def q_source_kl(sf_dir: str) -> rd.Dataset:
    """Per-source token-distribution KL divergence vs the corpus."""
    docs = rd.read_parquet(documents_path(sf_dir),
                           columns=["source", "text"])
    return ts.source_token_kl(docs)


def q_length_outliers(sf_dir: str) -> rd.Dataset:
    """Per-source length-outlier flag (quantile_disc band clip)."""
    docs = rd.read_parquet(documents_path(sf_dir),
                           columns=["doc_id", "source", "n_chars"])
    return ts.length_outlier_filter(docs)


def q_hashed_text_dup(sf_dir: str) -> pa.Table:
    """Model-free text near-dup: hashed tf-idf dense vectors -> exact
    cosine pairs >= HASHED_DUP_THRESHOLD."""
    return dd.hashed_text_dup_pairs(
        documents_path(sf_dir), threshold=HASHED_DUP_THRESHOLD,
        dim=ts.HASHED_TFIDF_DIM,
    )


SOURCE_CAP = 10


def q_source_cap(sf_dir: str) -> rd.Dataset:
    """Per-source cap sampling: at most SOURCE_CAP docs per source by
    deterministic hash rank (the per-domain mix bound)."""
    from semantic_pdf_search_engine_ray.pipelines.sampling import (
        capped_per_group_sample,
    )

    docs = rd.read_parquet(documents_path(sf_dir),
                           columns=["doc_id", "source"])
    return capped_per_group_sample(docs, cap=SOURCE_CAP)


def q_term_df(sf_dir: str) -> pa.Table:
    index_dir = ensure_index(sf_dir)
    d = pq.read_table(os.path.join(index_dir, "dictionary"),
                      columns=["term", "df"])
    return pa.table(
        {"term": d.column("term"),
         "df": d.column("df").cast(pa.int64())}
    ).sort_by("term")


def _decode_flat(batch: pa.Table) -> pa.Table:
    terms_out: list[str] = []
    ids_out: list[np.ndarray] = []
    tfs_out: list[np.ndarray] = []
    reps: list[int] = []
    for term, docs_blob, tfs_blob in zip(
        batch.column("term").to_pylist(),
        batch.column("docs").to_pylist(),
        batch.column("tfs").to_pylist(),
    ):
        ids = decode_doc_ids(docs_blob)
        terms_out.append(term)
        reps.append(len(ids))
        ids_out.append(ids)
        tfs_out.append(decode_tfs(tfs_blob))
    term_col = pa.array(
        np.repeat(np.array(terms_out, dtype=object), reps), type=pa.string()
    )
    return pa.table(
        {"term": term_col,
         "doc_id": pa.array(np.concatenate(ids_out) if ids_out else [],
                            type=pa.int64()),
         "tf": pa.array(np.concatenate(tfs_out) if tfs_out else [],
                        type=pa.int64())}
    )


def q_term_stats(sf_dir: str) -> rd.Dataset:
    """Decodes every posting block back to flat rows and re-aggregates —
    end-to-end validation of the delta+varint codec against SQL."""
    index_dir = ensure_index(sf_dir)
    return (
        rd.read_parquet(os.path.join(index_dir, "postings"),
                        columns=["term", "docs", "tfs"])
        .map_batches(_decode_flat, batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            Count(alias_name="df"),
            Sum("tf", alias_name="total_tf"),
            Min("doc_id", alias_name="min_doc"),
            Max("doc_id", alias_name="max_doc"),
        )
    )


def q_bm25_topk(sf_dir: str) -> pa.Table:
    index_dir = ensure_index(sf_dir)
    queries = derive_query_table(index_dir)
    res = _collect(run_queries(index_dir, rd.from_arrow(queries), CFG,
                               k=TOP_K, method="auto"))
    res = _round_col(res, "score")
    return res.rename_columns(
        ["query_id", "rank", "doc_id", "score_r"]
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


PREFIX_LEN = 4
PREFIX_EXPAND = 16
SPELL_MAX_DIST = 2
SPELL_TOP_N = 3


def q_spell_suggest(sf_dir: str) -> pa.Table:
    """Did-you-mean: head terms (len >= 4) misspelled by dropping their
    2nd character; suggestions = dictionary terms within edit distance
    2, ranked (distance ASC, df DESC, term ASC) top 3. The vocabulary
    is the Dataset; the misspellings broadcast (pipelines/spell.py)."""
    from semantic_pdf_search_engine_ray.pipelines.spell import (
        spell_suggestions,
    )

    index_dir = ensure_index(sf_dir)
    head = derive_query_table(index_dir).column("query").to_pylist()
    head = [q for q in head if " " not in q]
    queries = [(qid, t[0] + t[2:]) for qid, t in enumerate(head)
               if len(t) >= 4]
    return spell_suggestions(
        os.path.join(index_dir, "dictionary"), queries,
        max_dist=SPELL_MAX_DIST, top_n=SPELL_TOP_N,
    )


def q_bm25_prefix(sf_dir: str) -> pa.Table:
    """Wildcard (prefix*) BM25: prefixes are the first PREFIX_LEN chars
    of the head terms (deduped, query_id by sorted order); each expands
    to <= PREFIX_EXPAND dictionary terms (df DESC, term ASC) and scores
    disjunctively. Mirrored term-for-term by the SQL oracle."""
    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    index_dir = ensure_index(sf_dir)
    reader = IndexReader(index_dir)
    head = derive_query_table(index_dir).column("query").to_pylist()
    head = [q for q in head if " " not in q]  # single-term queries only
    prefixes = sorted({t[:PREFIX_LEN] for t in head})
    qids, ranks, docs, scores = [], [], [], []
    for qid, p in enumerate(prefixes):
        for rank, (doc_id, score) in enumerate(
            reader.top_k_prefix(p, TOP_K, max_expand=PREFIX_EXPAND),
            start=1,
        ):
            qids.append(qid)
            ranks.append(rank)
            docs.append(doc_id)
            scores.append(score)
    res = pa.table(
        {"query_id": pa.array(qids, type=pa.int64()),
         "rank": pa.array(ranks, type=pa.int64()),
         "doc_id": pa.array(docs, type=pa.int64()),
         "score": pa.array(scores, type=pa.float64())}
    )
    res = _round_col(res, "score")
    return res.rename_columns(
        ["query_id", "rank", "doc_id", "score_r"]
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


MLT_SRC_DOCS = 4
MLT_TERMS = 8


def q_more_like_this(sf_dir: str) -> pa.Table:
    """Related-document retrieval for the MLT_SRC_DOCS lowest doc_ids:
    each source's top MLT_TERMS tf-idf terms become a disjunctive BM25
    query, source excluded, top TOP_K."""
    import pyarrow.dataset as pads

    from semantic_pdf_search_engine_ray.stages.query import IndexReader

    index_dir = ensure_index(sf_dir)
    reader = IndexReader(index_dir)
    # the MLT_SRC_DOCS LOWEST ids (the oracle's ORDER BY doc_id LIMIT n
    # — not `doc_id < n`, which diverges on non-0-based corpora)
    all_ids = pads.dataset(documents_path(sf_dir)).to_table(
        columns=["doc_id"]
    ).column("doc_id").to_numpy()
    lows = np.sort(all_ids)[:MLT_SRC_DOCS]
    src = pads.dataset(documents_path(sf_dir)).to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(lows.tolist()),
    ).sort_by("doc_id")
    sids, ranks, docs, scores = [], [], [], []
    for sid, text in zip(src.column("doc_id").to_pylist(),
                         src.column("text").to_pylist()):
        for rank, (doc_id, score) in enumerate(
            reader.more_like_this(sid, text, TOP_K, n_terms=MLT_TERMS),
            start=1,
        ):
            sids.append(sid)
            ranks.append(rank)
            docs.append(doc_id)
            scores.append(score)
    res = pa.table(
        {"src_doc_id": pa.array(sids, type=pa.int64()),
         "rank": pa.array(ranks, type=pa.int64()),
         "doc_id": pa.array(docs, type=pa.int64()),
         "score": pa.array(scores, type=pa.float64())}
    )
    res = _round_col(res, "score")
    return res.rename_columns(
        ["src_doc_id", "rank", "doc_id", "score_r"]
    ).sort_by([("src_doc_id", "ascending"), ("rank", "ascending")])


def q_bm25_conjunctive(sf_dir: str) -> pa.Table:
    index_dir = ensure_index(sf_dir)
    queries = pair_query_table(index_dir)
    res = _collect(run_queries(index_dir, rd.from_arrow(queries), CFG,
                               k=TOP_K, method="conjunctive"))
    res = _round_col(res, "score")
    return res.rename_columns(
        ["query_id", "rank", "doc_id", "score_r"]
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def q_bm25_lang_filtered(sf_dir: str) -> pa.Table:
    """BM25 top-k restricted to lang='en' docs (J2 filename-filter
    analog: the predicate is AND-ed into scoring, not post-filtered —
    ranks 1..k are filled from the allowed subset)."""
    index_dir = ensure_index(sf_dir)
    queries = derive_query_table(index_dir)
    res = _collect(run_queries(index_dir, rd.from_arrow(queries), CFG,
                               k=TOP_K, filter_col="lang",
                               filter_value="en"))
    res = _round_col(res, "score")
    return res.rename_columns(
        ["query_id", "rank", "doc_id", "score_r"]
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


TOMBSTONE_MOD = 7


def _tombstoned_index(sf_dir: str) -> str:
    """Cached copy of the sf index with doc_id % TOMBSTONE_MOD == 0
    tombstoned via pipelines.delete (stats frozen, docs masked)."""
    import shutil

    from semantic_pdf_search_engine_ray.pipelines.delete import (
        delete_documents,
    )

    base = ensure_index(sf_dir)
    tomb_dir = f"{_SCRATCH}/spse_ray_tomb_{_sf_cache_key(sf_dir)}"
    if not (mf.is_ready(tomb_dir)
            and os.path.isdir(os.path.join(tomb_dir, "tombstones"))):
        shutil.rmtree(tomb_dir, ignore_errors=True)
        shutil.copytree(base, tomb_dir)
        ids = pq.read_table(os.path.join(tomb_dir, "docs"),
                            columns=["doc_id"]).column("doc_id").to_pylist()
        delete_documents(tomb_dir,
                         [d for d in ids if d % TOMBSTONE_MOD == 0])
    return tomb_dir


def q_facet_counts(sf_dir: str) -> rd.Dataset:
    """Per-query facet (lang) counts over the full disjunctive match
    set — the facets sidebar of a search tier."""
    from semantic_pdf_search_engine_ray.pipelines.search import (
        facet_counts,
    )

    index_dir = ensure_index(sf_dir)
    queries = derive_query_table(index_dir)
    return facet_counts(index_dir, rd.from_arrow(queries),
                        facet_col="lang", cfg=CFG)


def q_bm25_tombstoned(sf_dir: str) -> pa.Table:
    """BM25 top-k over an index with tombstoned docs (pipelines.delete):
    deleted docs never rank, stats stay frozen until purge — surviving
    docs score exactly as in bm25_topk (the Lucene deleted-docs
    contract, mirrored by the SQL's full-corpus stats + ranking
    exclusion)."""
    tomb_dir = _tombstoned_index(sf_dir)
    queries = derive_query_table(ensure_index(sf_dir))
    res = _collect(run_queries(tomb_dir, rd.from_arrow(queries), CFG,
                               k=TOP_K, method="auto"))
    res = _round_col(res, "score")
    return res.rename_columns(
        ["query_id", "rank", "doc_id", "score_r"]
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def q_bm25_sharded(sf_dir: str) -> pa.Table:
    """BM25 top-k through the doc-range-sharded layout (4 shards) via the
    shard-OWNING actor tier: 2 owner actors each load only their
    ``i % 2`` shard subset, every query visits every owner, the driver
    k-way merges the partials. Same SQL oracle as bm25_topk — the
    multi-node query shape must be value-identical to the monolithic
    engine."""
    from semantic_pdf_search_engine_ray.pipelines.sharding import (
        build_sharded_index,
        run_sharded_queries_owned,
    )

    root = f"{_SCRATCH}/spse_ray_sharded_{_sf_cache_key(sf_dir)}"
    if not mf.is_ready(root):
        build_sharded_index(
            read_docs(sf_dir), root, n_shards=4,
            input_lineage={"sf_dir": os.path.abspath(sf_dir)},
        )
    queries = derive_query_table(ensure_index(sf_dir))
    res = _round_col(
        run_sharded_queries_owned(root, queries, k=TOP_K, n_owners=2),
        "score",
    )
    return res.rename_columns(
        ["query_id", "rank", "doc_id", "score_r"]
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def q_bm25_prf_rerank(sf_dir: str) -> pa.Table:
    """Hybrid: BM25 top-20 candidates -> pseudo-relevance embedding
    re-rank -> RRF fusion top-5 (pipelines/rerank.py)."""
    from semantic_pdf_search_engine_ray.pipelines.rerank import (
        bm25_prf_rerank,
    )

    index_dir = ensure_index(sf_dir)
    queries = derive_query_table(index_dir)
    return bm25_prf_rerank(
        index_dir, embeddings_path(sf_dir), queries,
        k_candidates=20, k=TOP_K, cfg=CFG,
    )


def q_phrase_topk(sf_dir: str) -> pa.Table:
    """Exact phrase retrieval over the positional side-index: the
    adjacent-pair query set as phrases, ranked by phrase term frequency
    (integer scores — bit-exact cross-engine comparison)."""
    from semantic_pdf_search_engine_ray.stages.positions import (
        PhraseQueryActor,
        build_positions,
    )

    pos_dir = f"{_SCRATCH}/spse_ray_pos_{_sf_cache_key(sf_dir)}"
    if not mf.is_ready(pos_dir):
        build_positions(read_docs(sf_dir), pos_dir, CFG,
                        input_lineage={"sf_dir": os.path.abspath(sf_dir)})
    queries = pair_query_table(ensure_index(sf_dir))
    res_ds = rd.from_arrow(queries).map_batches(
        PhraseQueryActor,
        fn_constructor_args=(pos_dir, TOP_K),
        batch_format="pyarrow",
        concurrency=2,
    )
    return _collect(res_ds).sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )


def q_chunks(sf_dir: str) -> rd.Dataset:
    """Production chunker (C1-semantics; rows-only)."""

    def chunk_batch(batch: pa.Table) -> pa.Table:
        ids, cids, contents = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            for ci, c in enumerate(chunk_document(text)):
                ids.append(doc_id)
                cids.append(ci)
                contents.append(c)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "chunk_id": pa.array(cids, type=pa.int64()),
             "content": pa.array(contents, type=pa.string())}
        )

    return read_docs(sf_dir).map_batches(chunk_batch, batch_format="pyarrow")


def q_chunks_reconstruct(sf_dir: str) -> rd.Dataset:
    """Chunker COVERAGE value oracle (r5): the splitter partitions the
    doc into trimmed spans, so the concatenated chunks minus ASCII
    whitespace must reproduce the document minus ASCII whitespace,
    byte-for-byte — md5-checked per doc against SQL. This pins the
    un-SQL-expressible boundary algorithm's no-loss/no-dup property on
    the driver's own data (chunk boundaries themselves are pinned by the
    ported splitter pytests)."""
    import hashlib as _hl

    from semantic_pdf_search_engine_ray.functions.splitter import (
        semantic_chunks,
    )

    # the FULL str.isspace() set, not just ASCII: the splitter trims
    # chunk boundaries with str.strip(), which removes NBSP/\u2028/etc.
    # — stripping only ASCII whitespace here would false-fail the md5
    # on any doc with non-ASCII whitespace at a chunk boundary. The SQL
    # mirror strips the identical codepoint class (parity asserted
    # exhaustively over all codepoints when this oracle was built).
    _ws = re.compile("[" + "".join(
        re.escape(chr(a)) + ("-" + re.escape(chr(b)) if b > a else "")
        for a, b in [(0x9, 0xD), (0x1C, 0x20), (0x85, 0x85),
                     (0xA0, 0xA0), (0x1680, 0x1680), (0x2000, 0x200A),
                     (0x2028, 0x2029), (0x202F, 0x202F),
                     (0x205F, 0x205F), (0x3000, 0x3000)]) + "]+")

    def recon(batch: pa.Table) -> pa.Table:
        ids, md5s = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            joined = _ws.sub("", "".join(semantic_chunks(text, 500)))
            ids.append(doc_id)
            md5s.append(_hl.md5(joined.encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "recon_md5": pa.array(md5s, type=pa.string()),
        })

    return read_docs(sf_dir).map_batches(recon, batch_format="pyarrow")


PROXIMITY_SLOP = 2


def q_proximity_topk(sf_dir: str) -> pa.Table:
    """Sloppy-phrase (proximity) retrieval: the adjacent-pair query set
    with slop=2 — ordered co-occurrence within 3 token positions."""
    from semantic_pdf_search_engine_ray.stages.positions import (
        PositionsReader,
        build_positions,
    )

    pos_dir = f"{_SCRATCH}/spse_ray_pos_{_sf_cache_key(sf_dir)}"
    if not mf.is_ready(pos_dir):
        build_positions(read_docs(sf_dir), pos_dir, CFG,
                        input_lineage={"sf_dir": os.path.abspath(sf_dir)})
    queries = pair_query_table(ensure_index(sf_dir))
    reader = PositionsReader(pos_dir)
    qids, ranks, docs, tfs = [], [], [], []
    for qid, q in zip(queries.column("query_id").to_pylist(),
                      queries.column("query").to_pylist()):
        t1, t2 = q.split()
        for rank, (doc_id, tf) in enumerate(
            reader.proximity_top_k(t1, t2, PROXIMITY_SLOP, TOP_K), start=1
        ):
            qids.append(qid)
            ranks.append(rank)
            docs.append(doc_id)
            tfs.append(tf)
    return pa.table(
        {"query_id": pa.array(qids, type=pa.int64()),
         "rank": pa.array(ranks, type=pa.int64()),
         "doc_id": pa.array(docs, type=pa.int64()),
         "prox_tf": pa.array(tfs, type=pa.int64())}
    )


def q_bm25_chunks(sf_dir: str) -> pa.Table:
    """Chunk-granularity retrieval — the reference's actual unit
    (`chunk.rs:22-61` C1: ~500-char chunks are what gets indexed and
    returned). Documents are chunked, each chunk indexed as its own
    pseudo-doc (chunk_uid = doc_id * 1000 + chunk_id), BM25 top-k over
    chunks, hits mapped back to (parent doc, chunk). Rows-only (the
    chunker is not SQL-expressible); deterministic across runs."""
    def chunk_batch(batch: pa.Table) -> pa.Table:
        uids, texts = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            for ci, c in enumerate(chunk_document(text)):
                if ci >= CHUNK_UID_STRIDE:
                    # uid = doc*stride + chunk must stay collision-free;
                    # a >stride-chunk doc needs a bigger stride (and at
                    # real scale a dense chunk numbering + mapping table
                    # instead of this sparse-uid demo encoding)
                    raise ValueError(
                        f"doc {doc_id} has >= {CHUNK_UID_STRIDE} chunks"
                    )
                uids.append(doc_id * CHUNK_UID_STRIDE + ci)
                texts.append(c)
        return pa.table(
            {"doc_id": pa.array(uids, type=pa.int64()),
             "text": pa.array(texts, type=pa.string())}
        )

    idx = f"{_SCRATCH}/spse_ray_chunkidx_{_sf_cache_key(sf_dir)}"
    if not mf.is_ready(idx):
        build_index_from_docs(
            read_docs(sf_dir).map_batches(chunk_batch, batch_format="pyarrow"),
            idx,
            CFG,
            input_lineage={"sf_dir": os.path.abspath(sf_dir),
                           "granularity": "chunks"},
        )
    queries = derive_query_table(ensure_index(sf_dir))
    res = _collect(run_queries(idx, rd.from_arrow(queries), CFG, k=TOP_K))
    uid = res.column("doc_id").to_numpy()
    res = res.set_column(
        res.column_names.index("doc_id"), "chunk_uid",
        pa.array(uid, type=pa.int64()),
    )
    res = res.append_column(
        "parent_doc_id", pa.array(uid // CHUNK_UID_STRIDE, type=pa.int64())
    )
    res = res.append_column(
        "chunk_id", pa.array(uid % CHUNK_UID_STRIDE, type=pa.int64())
    )
    return _round_col(res, "score").sort_by(
        [("query_id", "ascending"), ("rank", "ascending")]
    )


def q_normalize(sf_dir: str) -> rd.Dataset:
    """Canonical M1 normalizer over the documents table. Oracle-paired
    (round 4): the driver's documents fixture is already-clean web text
    — `clean_text_robust` is verified identity on every row at every
    scale factor — so the SQL mirror pins the md5 + length of the RAW
    text per doc, catching any normalizer change that mangles clean
    input. The transformation behavior itself (ligatures, control
    chars, hyphen joins, etc.) is pytest-enforced byte-level on the
    pages fixture where an expected-text column exists."""

    def norm_batch(batch: pa.Table) -> pa.Table:
        outs = [clean_text_robust(t) for t in batch.column("text").to_pylist()]
        md5s = [hashlib.md5(o.encode("utf-8")).hexdigest() for o in outs]
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "clean_md5": pa.array(md5s, type=pa.string()),
             "clean_chars": pa.array([len(o) for o in outs], type=pa.int64())}
        )

    return read_docs(sf_dir).map_batches(norm_batch, batch_format="pyarrow")


def q_highlights(sf_dir: str) -> pa.Table:
    """Full query+highlight pipeline (fuzzy re-localization + sentence
    snap; rows-only — Jaro-Winkler fuzzy spans are not SQL)."""
    index_dir = ensure_index(sf_dir)
    queries = derive_query_table(index_dir)
    _results, highlights = run_queries_with_highlights(
        index_dir, queries, CFG, k=TOP_K, doc_columns=["text"]
    )
    return highlights


# --------------------------------------------------------------------------
# runners: dedup family / similarity / windows / multimodal
# --------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str) -> rd.Dataset:
    return dd.exact_dup_groups(read_docs(sf_dir))


def q_dedup_ngram_jaccard(sf_dir: str) -> pa.Table:
    return dd.ngram_jaccard_pairs(read_docs(sf_dir), n=JACCARD_N,
                                  threshold=JACCARD_THRESHOLD)


def q_dedup_minhash_lsh(sf_dir: str) -> pa.Table:
    return dd.minhash_lsh_pairs(documents_path(sf_dir), n=JACCARD_N,
                                threshold=JACCARD_THRESHOLD)


def q_dedup_apply(sf_dir: str) -> rd.Dataset:
    """Cleaned corpus after near-dedup (doc_id + chars kept)."""
    out = dd.apply_near_dedup(documents_path(sf_dir), n=JACCARD_N,
                              threshold=JACCARD_THRESHOLD)

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "text_chars": pc.utf8_length(batch.column("text")).cast(
                 pa.int64())}
        )

    return out.map_batches(project, batch_format="pyarrow")


def q_dedup_simhash(sf_dir: str) -> pa.Table:
    return dd.simhash_pairs(read_docs(sf_dir), max_hamming=SIMHASH_MAX_HAMMING)


def q_dedup_embedding(sf_dir: str) -> pa.Table:
    return dd.embedding_dup_pairs(embeddings_path(sf_dir),
                                  threshold=EMB_DUP_THRESHOLD)


def q_ann_brute(sf_dir: str) -> pa.Table:
    return sim.ann_brute_topk(embeddings_path(sf_dir), k=ANN_K,
                              num_queries=ANN_QUERIES)


def q_ann_ivf(sf_dir: str) -> pa.Table:
    """IVF at full probe over the cell-partitioned layout: exercises the
    build (cell assignment + hive-partitioned write) and the per-cell
    scoring path while remaining EXACTLY equal to brute force -> checked
    against the brute-force SQL oracle."""
    return sim.ann_ivf_topk(embeddings_path(sf_dir), k=ANN_K,
                            num_queries=ANN_QUERIES, n_cells=8, nprobe=None)


def q_ann_ivf_pruned(sf_dir: str) -> pa.Table:
    """IVF with nprobe=2 of 8 cells — the approximate scale config, run
    with PINNED centroids (the 8 lowest-id corpus vectors) so DuckDB can
    rebuild the identical quantizer and the pruned result is a full
    value oracle (r5 — was rows-only). The partition-pruned read and
    per-cell scoring are the same code the kmeans path uses."""
    return sim.ann_ivf_topk(embeddings_path(sf_dir), k=ANN_K,
                            num_queries=ANN_QUERIES, n_cells=ANN_IVF_CELLS,
                            nprobe=ANN_IVF_NPROBE, centroid_mode="pinned")


def q_events_window(sf_dir: str) -> pa.Table:
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["ts", "event_type", "value"])
    out = _collect(win.tumbling_agg(events, unit="hour"))
    for c in ("sum_value", "min_value", "max_value"):
        out = _round_col(out, c)
    return out.sort_by([("window_start", "ascending"),
                        ("event_type", "ascending")])


def q_events_sliding(sf_dir: str) -> pa.Table:
    """Sliding windows (1 h size, 30 min step): each event fans out to 2
    windows map-side; one hash aggregate."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["ts", "event_type", "value"])
    out = _collect(win.sliding_agg(events, size_s=3600, step_s=1800))
    out = _round_col(out, "sum_value")
    return out.sort_by([("window_start", "ascending"),
                        ("event_type", "ascending")])


def q_sessionize(sf_dir: str) -> pa.Table:
    """Gap-based sessionization (30 min inactivity): one user_id hash
    shuffle, per-user vectorized split (pipelines/windows.sessionize)."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["user_id", "ts", "value"])
    out = _collect(win.sessionize(events, gap_s=1800))
    return out.sort_by([("user_id", "ascending"),
                        ("session_id", "ascending")])


def q_dup_components(sf_dir: str) -> pa.Table:
    """Near-dup connected components via distributed min-label
    propagation (join + groupby per round until fixpoint)."""
    return dd.dup_components(documents_path(sf_dir), n=JACCARD_N,
                             threshold=JACCARD_THRESHOLD)


def q_dedup_apply_components(sf_dir: str) -> rd.Dataset:
    """Cleaned corpus with ONE survivor per near-dup component."""
    out = dd.apply_component_dedup(documents_path(sf_dir), n=JACCARD_N,
                                   threshold=JACCARD_THRESHOLD)

    def proj(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "text_chars": pc.utf8_length(batch.column("text")).cast(
                 pa.int64())}
        )

    return out.map_batches(proj, batch_format="pyarrow")


def q_regex_features(sf_dir: str) -> rd.Dataset:
    """PII-surface regex counts (emails / urls / long digit runs)."""
    return ts.regex_features(read_docs(sf_dir))


def q_tfidf_top_terms(sf_dir: str) -> rd.Dataset:
    """Per-doc top-3 tf-idf terms (map-side tf, df groupby, term-keyed
    hash join, per-doc top-k)."""
    return ts.tfidf_top_terms(read_docs(sf_dir), k=3)


def q_collocations_pmi(sf_dir: str) -> pa.Table:
    """Top-20 bigram collocations by PMI (min count 5); marginals joined,
    not broadcast."""
    return ts.collocations_pmi(read_docs(sf_dir), min_count=5, k=20)


def q_sample(sf_dir: str) -> rd.Dataset:
    """Deterministic 10% hash sample (partition/parallelism/rerun
    invariant; selection recomputable in SQL via md5_number_lower)."""
    from semantic_pdf_search_engine_ray.pipelines.sampling import (
        deterministic_sample,
    )

    docs = rd.read_parquet(documents_path(sf_dir),
                           columns=["doc_id", "lang"])
    return deterministic_sample(docs, rate_pct=10, key_col="doc_id")


def q_value_histogram(sf_dir: str) -> rd.Dataset:
    """Pinned-bin histogram with explicit map-side partial counts."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["event_type", "value"])
    return win.value_histogram(events, width=5.0)


def q_value_quantiles(sf_dir: str) -> rd.Dataset:
    """Exact per-type p50/p95/p99 (DuckDB quantile_disc convention)."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["event_type", "value"])
    return win.value_quantiles(events)


def q_jsonl_roundtrip(sf_dir: str) -> rd.Dataset:
    """JSONL source path: the documents table is exported once to
    newline-delimited JSON (cached) and read back with rd.read_json —
    proves the non-parquet ingestion surface end-to-end (schema
    inference, int64/utf8 fidelity). Oracle compares (doc_id, n_chars)
    against the parquet view."""
    out = f"{_SCRATCH}/spse_ray_jsonl_{_sf_cache_key(sf_dir)}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        rd.read_parquet(
            documents_path(sf_dir), columns=["doc_id", "text"]
        ).write_json(out)
        with open(marker, "w") as f:
            f.write("ok")
    docs = rd.read_json([
        os.path.join(out, f) for f in sorted(os.listdir(out))
        if f.endswith(".json")
    ])

    def proj(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "n_chars": pc.utf8_length(batch.column("text")).cast(
                 pa.int64())}
        )

    return docs.map_batches(proj, batch_format="pyarrow")


def q_stratified_sample(sf_dir: str) -> rd.Dataset:
    """Per-language deterministic sampling (rebalance: keep 20% en,
    50% de, 100% fr, others dropped)."""
    from semantic_pdf_search_engine_ray.pipelines.sampling import (
        stratified_sample,
    )

    docs = rd.read_parquet(documents_path(sf_dir),
                           columns=["doc_id", "lang"])
    return stratified_sample(
        docs, {"en": 20, "de": 50, "fr": 100}, stratum_col="lang"
    )


def q_csv_roundtrip(sf_dir: str) -> rd.Dataset:
    """CSV source path: documents exported once to CSV (quoted
    newlines/commas) and read back with rd.read_csv — the second
    non-parquet ingestion surface. Oracle compares (doc_id, n_chars)."""
    out = f"{_SCRATCH}/spse_ray_csv_{_sf_cache_key(sf_dir)}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        rd.read_parquet(
            documents_path(sf_dir), columns=["doc_id", "text"]
        ).write_csv(out)
        with open(marker, "w") as f:
            f.write("ok")
    docs = rd.read_csv([
        os.path.join(out, f) for f in sorted(os.listdir(out))
        if f.endswith(".csv")
    ])

    def proj(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "n_chars": pc.utf8_length(batch.column("text")).cast(
                 pa.int64())}
        )

    return docs.map_batches(proj, batch_format="pyarrow")


def q_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped grouped aggregate (integer-exact money sums)."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )
    return rel.pricing_summary(li)


def q_segment_revenue(sf_dir: str) -> rd.Dataset:
    """orders x customer hash join -> per-segment revenue."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])
    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_mktsegment"])
    return rel.segment_revenue(orders, customer)


def q_events_distinct(sf_dir: str) -> rd.Dataset:
    """Tumbling-window exact distinct-user counts (DAU-class)."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["ts", "event_type", "user_id"])
    return win.tumbling_distinct_users(events)


def q_interval_join(sf_dir: str) -> rd.Dataset:
    """INTERVAL join: every purchase x every same-user click within the
    trailing hour (the one-to-many range-join operator)."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    events = rd.read_parquet(events_path(sf_dir),
                             columns=["event_id", "user_id", "ts",
                                      "event_type"])
    return rel.interval_join_clicks(events,
                                    window_s=INTERVAL_JOIN_WINDOW_S)


def q_profile_events(sf_dir: str) -> pa.Table:
    """Column profile of the events table (nulls, exact distinct
    cardinality, min/max per column)."""
    from semantic_pdf_search_engine_ray.pipelines.profile import (
        profile_table,
    )

    ev = rd.read_parquet(events_path(sf_dir),
                         columns=["user_id", "event_type", "value"])
    return profile_table(ev, ["user_id", "event_type", "value"])


def q_orders_no_lineitem(sf_dir: str) -> rd.Dataset:
    """ANTI join: orders with zero lineitem rows (keys only)."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_orderkey"])
    out = rel.orders_without_lineitems(orders, li)
    return out.map_batches(
        lambda b: pa.table(
            {"o_orderkey": b.column("o_orderkey").cast(pa.int64()),
             "o_custkey": b.column("o_custkey").cast(pa.int64())}),
        batch_format="pyarrow",
    )


def q_customers_with_orders(sf_dir: str) -> rd.Dataset:
    """SEMI join: customers having at least one order."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey"])
    out = rel.customers_with_orders(cust, orders)
    return out.map_batches(
        lambda b: pa.table(
            {"c_custkey": b.column("c_custkey").cast(pa.int64()),
             "c_mktsegment": b.column("c_mktsegment")}),
        batch_format="pyarrow",
    )


def q_asof_clicks(sf_dir: str) -> rd.Dataset:
    """AS-OF join: purchases attributed to the latest prior click."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    events = rd.read_parquet(events_path(sf_dir),
                             columns=["event_id", "user_id", "ts",
                                      "event_type"])
    return rel.asof_click_attribution(events)


def _top3_group(group: pa.Table) -> pa.Table:
    order = group.sort_by([("n_chars", "descending"), ("doc_id", "ascending")])
    top = order.slice(0, 3)
    return top.append_column(
        "rank", pa.array(np.arange(1, top.num_rows + 1, dtype=np.int64))
    )


def q_top_docs_per_source(sf_dir: str) -> pa.Table:
    """Per-group top-k (A1 generalized to grouped ranking): the 3 largest
    docs of each source, ties broken by doc_id."""
    ds = rd.read_parquet(documents_path(sf_dir),
                         columns=["doc_id", "source", "n_chars"])
    out = _collect(
        ds.groupby("source").map_groups(_top3_group, batch_format="pyarrow")
    )
    return out.select(["source", "rank", "doc_id", "n_chars"]).sort_by(
        [("source", "ascending"), ("rank", "ascending")]
    )


def q_multimodal_decode(sf_dir: str) -> rd.Dataset:
    return (
        read_docs(sf_dir)
        .map_batches(attach_payload_batch, batch_format="pyarrow")
        .map_batches(
            ImageDecodeStage,
            batch_format="pyarrow",
            batch_size=32,  # large payloads -> small batches (scale rule)
            concurrency=(1, 4),
        )
    )


def q_image_decode(sf_dir: str) -> rd.Dataset:
    """REAL image decode: a deterministic PNG is encoded per doc
    (functions/png.py) and fully decoded back — chunk parse, zlib
    inflate, scanline unfilter, all-sample mean — by the actor-pool
    stage. The oracle recomputes dims/fill from the pinned generation
    rule, so any decode bug hash-mismatches."""
    return (
        read_docs(sf_dir)
        .map_batches(attach_png_batch, batch_format="pyarrow")
        .map_batches(
            ImageStatsStage,
            batch_format="pyarrow",
            batch_size=32,  # large payloads -> small batches (scale rule)
            concurrency=(1, 4),
        )
    )


def q_curation_report(sf_dir: str) -> rd.Dataset:
    """Per-source curation summary: quality_filter verdicts rolled up
    with map-side partials, then a |sources|-keyed groupby."""
    docs = rd.read_parquet(documents_path(sf_dir),
                           columns=["doc_id", "text", "source"])
    return ts.curation_report(docs)


def q_quality_filter(sf_dir: str) -> rd.Dataset:
    """Composed C4/Gopher keep filter: quality + lang evidence +
    repetition thresholds in ONE fused actor-pool pass."""
    return ts.quality_filter_apply(read_docs(sf_dir))


def q_decontaminate_apply(sf_dir: str) -> rd.Dataset:
    """Cleaned corpus after benchmark decontamination (doc_id + chars
    kept): non-benchmark docs with zero shared 13-grams."""
    out = dd.apply_decontamination(read_docs(sf_dir), benchmark_mod=7,
                                   n=13)

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "text_chars": pc.utf8_length(batch.column("text")).cast(
                 pa.int64())}
        )

    return out.map_batches(project, batch_format="pyarrow")


def q_dedup_lines(sf_dir: str) -> rd.Dataset:
    """Intra-doc duplicate-line removal keeping first occurrence (the
    fix-up paired with gopher_repetition's measurement)."""
    return ts.dedup_lines(read_docs(sf_dir))


def q_global_line_dedup(sf_dir: str) -> rd.Dataset:
    """CROSS-doc duplicate-line removal (C4/RefinedWeb), first
    occurrence in (doc_id, line_idx) order survives."""
    return dd.global_line_dedup(documents_path(sf_dir))


def q_cluster_assign(sf_dir: str) -> rd.Dataset:
    """Embedding-space cluster assignment against pinned centroids (the
    8 lowest-vec_id vectors); 6-dp-rounded argmax on both engines."""
    return sim.cluster_assign(embeddings_path(sf_dir), n_clusters=8)


def q_semdedup_pairs(sf_dir: str) -> pa.Table:
    """SemDeDup: near-dup pairs within clusters only (one cluster-key
    shuffle + per-cluster local quadratic)."""
    return sim.semdedup_pairs(embeddings_path(sf_dir), n_clusters=8,
                              threshold=EMB_DUP_THRESHOLD)


def q_token_pack(sf_dir: str) -> rd.Dataset:
    """GPT-style sequence packing positions via distributed prefix sum
    (pipelines/packing.py): doc_id-ordered token cumsum, 2048-token
    sequences."""
    from semantic_pdf_search_engine_ray.pipelines.packing import token_pack

    return token_pack(read_docs(sf_dir), capacity=2048)


def q_heavy_hitters(sf_dir: str) -> pa.Table:
    """Exact global top-20 terms via Misra-Gries sketch + exact recount
    (no vocabulary-sized shuffle; see pipelines/sketch.py)."""
    return sk.heavy_hitter_terms(read_docs(sf_dir), k=20)


def q_gopher_repetition(sf_dir: str) -> rd.Dataset:
    """Gopher/MassiveText repetition signals (integer numerators and
    denominators; map-side only, no shuffle)."""
    return ts.gopher_repetition(read_docs(sf_dir))


def q_pii_redact(sf_dir: str) -> rd.Dataset:
    """PII redaction: [EMAIL]/[NUM] placeholders, vectorized RE2
    replace; compared by md5 of the redacted text."""
    return ts.pii_redact(read_docs(sf_dir))


def q_decontaminate(sf_dir: str) -> rd.Dataset:
    """Train/test decontamination: corpus docs sharing any word 13-gram
    with the benchmark subset (doc_id % 7 == 0 stands in for the eval
    table). Benchmark n-grams broadcast once; corpus side streams."""
    return dd.contamination_hits(read_docs(sf_dir), benchmark_mod=7, n=13)


def q_decontaminate_bloom(sf_dir: str) -> rd.Dataset:
    """Bloom-prefiltered decontamination: identical output contract to
    ``decontaminate`` (no false negatives; Bloom positives are exactly
    confirmed), so it shares that entry's SQL oracle — the pairing IS
    the proof the scale path loses nothing."""
    return dd.contamination_hits_bloom(read_docs(sf_dir),
                                       benchmark_mod=7, n=13)


def q_audio_features(sf_dir: str) -> rd.Dataset:
    """REAL audio decode: a deterministic PCM WAV is encoded per doc
    (functions/wav.py) and fully decoded back — RIFF chunk walk, PCM
    unpack, all-sample integer features — by the actor-pool stage. The
    oracle recomputes every sample from the pinned generation rule, so
    any decode/feature bug hash-mismatches."""
    return (
        read_docs(sf_dir)
        .map_batches(attach_wav_batch, batch_format="pyarrow")
        .map_batches(
            AudioFeaturesStage,
            batch_format="pyarrow",
            batch_size=32,  # large payloads -> small batches (scale rule)
            concurrency=(1, 4),
        )
    )


def q_video_frames(sf_dir: str) -> rd.Dataset:
    """Video frame sampling: a deterministic FRM1 container of real PNG
    frames per doc; the stage samples every 2nd frame (skipping the
    bytes of unsampled frames via the length prefixes) and REALLY
    decodes each sampled frame. One output row per sampled frame."""
    return (
        read_docs(sf_dir)
        .map_batches(attach_frames_batch, batch_format="pyarrow")
        .map_batches(
            VideoFrameSampleStage,
            batch_format="pyarrow",
            batch_size=16,  # multi-frame payloads -> smaller batches
            concurrency=(1, 4),
        )
    )


# --------------------------------------------------------------------------
# SQL oracles
# --------------------------------------------------------------------------

_TOKS_CTE = f"""
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::BIGINT AS doc_len FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT coalesce(sum(doc_len), 0) FROM dl) * 1.0
           / (SELECT count(*) FROM documents) AS avgdl
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
head AS (
  SELECT term, r FROM (
    SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS r FROM df
  ) WHERE r < {N_HEAD_TERMS}
)
"""

_BM25_CONTRIB = (
    f"(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) * (1.0 + {CFG.k1})) * "
    f"(tf.tf / (tf.tf + {CFG.k1} * (1.0 - {CFG.b} + {CFG.b} * (dl.doc_len / s.avgdl))))"
)

_SQL_BM25_TOPK = f"""
WITH {_TOKS_CTE},
qterms AS (
  SELECT r::BIGINT AS query_id, term FROM head
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, a.term FROM head a WHERE a.r < {N_HEAD_TERMS - 1}
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, b.term
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
scores AS (
  SELECT qt.query_id, tf.doc_id, sum({_BM25_CONTRIB}) AS score
  FROM qterms qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
)
SELECT query_id, rank, doc_id, score_r FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
         round(score, 6) AS score_r
  FROM scores
) WHERE rank <= {TOP_K}
"""

# Facet counts: per query, the size of the DISJUNCTIVE match set
# (docs containing any query term) grouped by the docs-store facet
# column — the search-tier facets sidebar.
_SQL_FACETS = f"""
WITH {_TOKS_CTE},
qterms AS (
  SELECT r::BIGINT AS query_id, term FROM head
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, a.term FROM head a WHERE a.r < {N_HEAD_TERMS - 1}
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, b.term
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
matched AS (
  SELECT DISTINCT qt.query_id, tf.doc_id
  FROM qterms qt JOIN tf ON tf.term = qt.term
)
SELECT m.query_id, d.lang AS facet, count(*)::BIGINT AS n_docs
FROM matched m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY m.query_id, d.lang
"""

# Tombstoned search: stats (N, avgdl, df) over the FULL corpus, the
# deleted subset excluded only at ranking — scores of survivors are
# identical to _SQL_BM25_TOPK's.
_SQL_BM25_TOMBSTONED = f"""
WITH {_TOKS_CTE},
qterms AS (
  SELECT r::BIGINT AS query_id, term FROM head
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, a.term FROM head a WHERE a.r < {N_HEAD_TERMS - 1}
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, b.term
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
scores AS (
  SELECT qt.query_id, tf.doc_id, sum({_BM25_CONTRIB}) AS score
  FROM qterms qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
)
SELECT query_id, rank, doc_id, score_r FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
         round(score, 6) AS score_r
  FROM scores
  WHERE doc_id % {TOMBSTONE_MOD} != 0
) WHERE rank <= {TOP_K}
"""

_SQL_BM25_CONJ = f"""
WITH {_TOKS_CTE},
qterms AS (
  SELECT a.r::BIGINT AS query_id, a.term FROM head a WHERE a.r < {N_HEAD_TERMS - 1}
  UNION ALL
  SELECT a.r::BIGINT, b.term
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
scores AS (
  SELECT qt.query_id, tf.doc_id, sum({_BM25_CONTRIB}) AS score
  FROM qterms qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
  HAVING count(*) = 2
)
SELECT query_id, rank, doc_id, score_r FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
         round(score, 6) AS score_r
  FROM scores
) WHERE rank <= {TOP_K}
"""

_SQL_BM25_LANG = f"""
WITH {_TOKS_CTE},
qterms AS (
  SELECT r::BIGINT AS query_id, term FROM head
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, a.term FROM head a WHERE a.r < {N_HEAD_TERMS - 1}
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, b.term
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
scores AS (
  SELECT qt.query_id, tf.doc_id, sum({_BM25_CONTRIB}) AS score
  FROM qterms qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN documents dd ON dd.doc_id = tf.doc_id AND dd.lang = 'en'
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
)
SELECT query_id, rank, doc_id, score_r FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
         round(score, 6) AS score_r
  FROM scores
) WHERE rank <= {TOP_K}
"""

_SQL_BM25_PRF = f"""
WITH {_TOKS_CTE},
qterms AS (
  SELECT r::BIGINT AS query_id, term FROM head
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, a.term FROM head a WHERE a.r < {N_HEAD_TERMS - 1}
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, b.term
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
scores AS (
  SELECT qt.query_id, tf.doc_id, sum({_BM25_CONTRIB}) AS score
  FROM qterms qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
cands AS (
  SELECT query_id, doc_id, bm25_rank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS bm25_rank
    FROM scores
  ) WHERE bm25_rank <= 20
),
with_emb AS (
  SELECT c.query_id, c.doc_id, c.bm25_rank, e.embedding
  FROM cands c JOIN embeddings e ON e.vec_id = c.doc_id
),
pseudo AS (
  SELECT w.query_id, w.embedding AS pvec
  FROM with_emb w
  WHERE w.bm25_rank = (
    SELECT min(w2.bm25_rank) FROM with_emb w2 WHERE w2.query_id = w.query_id
  )
),
cosr AS (
  SELECT w.query_id, w.doc_id, w.bm25_rank,
         row_number() OVER (
           PARTITION BY w.query_id
           ORDER BY list_cosine_similarity(w.embedding::DOUBLE[],
                                           p.pvec::DOUBLE[]) DESC,
                    w.doc_id ASC
         ) AS cos_rank
  FROM with_emb w JOIN pseudo p ON p.query_id = w.query_id
)
SELECT query_id, rank, doc_id, rrf FROM (
  SELECT query_id, doc_id,
         1.0 / (60 + bm25_rank) + 1.0 / (60 + cos_rank) AS rrf,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY (1.0 / (60 + bm25_rank) + 1.0 / (60 + cos_rank)) DESC,
                    doc_id ASC
         )::BIGINT AS rank
  FROM cosr
) WHERE rank <= {TOP_K}
"""

_SQL_PHRASE_TOPK = f"""
WITH {_TOKS_CTE},
pos AS (
  SELECT doc_id, u.term AS term, u.p AS p FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ts)),
                  i -> {{'term': ts[i], 'p': i}})) AS u
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
          FROM documents)
  )
),
qp AS (
  SELECT a.r::BIGINT AS query_id, a.term AS t1, b.term AS t2
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
hits AS (
  SELECT qp.query_id, p1.doc_id, count(*)::BIGINT AS phrase_tf
  FROM qp
  JOIN pos p1 ON p1.term = qp.t1
  JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.p = p1.p + 1
             AND p2.term = qp.t2
  GROUP BY qp.query_id, p1.doc_id
)
SELECT query_id, rank, doc_id, phrase_tf FROM (
  SELECT query_id, doc_id, phrase_tf,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY phrase_tf DESC, doc_id ASC)::BIGINT AS rank
  FROM hits
) WHERE rank <= {TOP_K}
"""

_SQL_PROXIMITY_TOPK = f"""
WITH {_TOKS_CTE},
pos AS (
  SELECT doc_id, u.term AS term, u.p AS p FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ts)),
                  i -> {{'term': ts[i], 'p': i}})) AS u
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
          FROM documents)
  )
),
qp AS (
  SELECT a.r::BIGINT AS query_id, a.term AS t1, b.term AS t2
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
hits AS (
  SELECT qp.query_id, p1.doc_id, count(*)::BIGINT AS prox_tf
  FROM qp
  JOIN pos p1 ON p1.term = qp.t1
  JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.term = qp.t2
            AND p2.p > p1.p AND p2.p <= p1.p + {PROXIMITY_SLOP + 1}
  GROUP BY qp.query_id, p1.doc_id
)
SELECT query_id, rank, doc_id, prox_tf FROM (
  SELECT query_id, doc_id, prox_tf,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY prox_tf DESC, doc_id ASC)::BIGINT AS rank
  FROM hits
) WHERE rank <= {TOP_K}
"""

_SQL_TERM_DF = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
)
SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term
"""

_SQL_TERM_STATS = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term)
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS total_tf,
       min(doc_id)::BIGINT AS min_doc, max(doc_id)::BIGINT AS max_doc
FROM tf GROUP BY term
"""

_SQL_DOC_STATS = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))::BIGINT AS doc_len,
       length(text)::BIGINT AS text_chars,
       len(regexp_extract_all(lower(text), '{ts.ALNUM_CHAR_PATTERN}'))::BIGINT AS alnum_chars
FROM documents
"""

_SQL_TOKEN_CLASSES = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{ts.WORD_RUN_PATTERN}'))::BIGINT AS n_words,
       len(regexp_extract_all(text, '{ts.NUMBER_RUN_PATTERN}'))::BIGINT AS n_numbers,
       len(regexp_extract_all(text, '{ts.PUNCT_CHAR_PATTERN}'))::BIGINT AS n_punct
FROM documents
"""

_TRIM_CHARS = "' ' || chr(9) || chr(10) || chr(13)"

_SQL_QUALITY = f"""
SELECT doc_id,
       length(trim(text, {_TRIM_CHARS}))::BIGINT AS n_chars_trim,
       len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))::BIGINT AS n_tokens,
       len(regexp_extract_all(text, '{ts.ALPHA_CHAR_PATTERN}'))::BIGINT AS alpha_chars,
       CASE WHEN length(text) > 0
            THEN len(regexp_extract_all(text, '{ts.ALPHA_CHAR_PATTERN}')) * 1.0 / length(text)
            ELSE 0.0 END AS alpha_ratio,
       (length(trim(text, {_TRIM_CHARS})) >= {ts.QUALITY_MIN_CHARS}
        AND len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) >= {ts.QUALITY_MIN_WORDS}
        AND CASE WHEN length(text) > 0
            THEN len(regexp_extract_all(text, '{ts.ALPHA_CHAR_PATTERN}')) * 1.0 / length(text)
            ELSE 0.0 END >= {ts.QUALITY_MIN_ALPHA_RATIO}) AS is_quality
FROM documents
"""


def _in_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


_SQL_LANG_ID = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts FROM documents
),
hits AS (
  SELECT doc_id,
    len(list_filter(ts, x -> x IN ({_in_list(ts.STOPWORDS['en'])})))::BIGINT AS en_hits,
    len(list_filter(ts, x -> x IN ({_in_list(ts.STOPWORDS['de'])})))::BIGINT AS de_hits,
    len(list_filter(ts, x -> x IN ({_in_list(ts.STOPWORDS['fr'])})))::BIGINT AS fr_hits,
    len(list_filter(ts, x -> x IN ({_in_list(ts.STOPWORDS['es'])})))::BIGINT AS es_hits
  FROM toks
)
SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
  CASE WHEN en_hits = 0 AND de_hits = 0 AND fr_hits = 0 AND es_hits = 0 THEN 'und'
       WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
       WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
       WHEN fr_hits >= es_hits THEN 'fr'
       ELSE 'es' END AS pred_lang
FROM hits
"""

_SQL_LANG_CONFUSION = f"""
SELECT d.lang, p.pred_lang, count(*)::BIGINT AS n_docs
FROM documents d JOIN ({_SQL_LANG_ID}) p ON p.doc_id = d.doc_id
GROUP BY d.lang, p.pred_lang
"""

_SQL_FINGERPRINT = f"""
SELECT doc_id,
       md5(regexp_replace(lower(trim(text, {_TRIM_CHARS})),
                          '[ \\t\\n\\r]+', ' ', 'g')) AS content_md5
FROM documents
"""

# Winnowing (Schleimer'03) recomputed in SQL: per-position k-gram
# hashes via md5_number_lower (== shingle.md5_hash64), per-window min
# via min() OVER (ROWS k-1 PRECEDING); the set of window-minimum VALUES
# equals the set of winnow-selected fingerprints (position dedup only
# collapses runs, value dedup is applied in both).  Docs with 1..3
# k-grams take the single-min branch, <1 k-gram the empty branch —
# mirrors winnow_fingerprints exactly (k=8, window=4).
_SQL_WINNOW = f"""
WITH canon AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text, {_TRIM_CHARS})),
                        '[ \\t\\n\\r]+', ' ', 'g') AS c
  FROM documents
),
ph AS (
  SELECT doc_id,
         unnest(generate_series(1, length(c) - 7)) AS i,
         unnest(list_transform(generate_series(1, length(c) - 7),
                               j -> md5_number_lower(substr(c, j, 8)))) AS h
  FROM canon WHERE length(c) >= 8
),
ng AS (SELECT doc_id, count(*) AS n FROM ph GROUP BY doc_id),
win AS (
  SELECT doc_id, i,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
  FROM ph
),
agg AS (
  SELECT w.doc_id, count(DISTINCT w.wmin)::BIGINT AS n_winnow,
         min(w.wmin) AS minv
  FROM win w JOIN ng ON ng.doc_id = w.doc_id AND ng.n >= 4
  WHERE w.i >= 4
  GROUP BY w.doc_id
),
small AS (
  SELECT p.doc_id, 1::BIGINT AS n_winnow, min(p.h) AS minv
  FROM ph p JOIN ng ON ng.doc_id = p.doc_id AND ng.n <= 3
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       coalesce(a.n_winnow, s.n_winnow, 0)::BIGINT AS n_winnow,
       CASE WHEN a.doc_id IS NOT NULL THEN lower(lpad(hex(a.minv), 16, '0'))
            WHEN s.doc_id IS NOT NULL THEN lower(lpad(hex(s.minv), 16, '0'))
            ELSE '' END AS min_winnow
FROM documents d
LEFT JOIN agg a ON a.doc_id = d.doc_id
LEFT JOIN small s ON s.doc_id = d.doc_id
"""

_SQL_UNIGRAM_LL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
cf AS (SELECT term, count(*)::BIGINT AS cf FROM toks GROUP BY term
       HAVING count(*) >= {UNIGRAM_MIN_COUNT}),
tot AS (SELECT count(*) AS total FROM toks),
per AS (
  SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
         sum(ln(coalesce(cf.cf, {UNIGRAM_OOV_CF}) * 1.0 / tot.total)) AS ll
  FROM toks t LEFT JOIN cf ON cf.term = t.term CROSS JOIN tot
  GROUP BY t.doc_id
)
SELECT d.doc_id, coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
       round(coalesce(p.ll, 0.0), 6) AS loglik
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
"""

# Interpolated (Jelinek-Mercer) bigram LM: lam * c(v,w)/c(v.) +
# (1-lam) * p_uni(w); bigram counts pruned at min_count (a pruned
# bigram contributes 0 to the first term), context totals exact over
# unpruned transitions, unigram side identical to _SQL_UNIGRAM_LL.
_SQL_BIGRAM_LL = f"""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(ts) AS w,
         unnest(generate_series(1, len(ts))) AS i
  FROM tk
),
bg AS (
  SELECT a.doc_id, a.i, a.w AS v, b.w AS w
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.i = a.i + 1
),
bgc AS (SELECT v, w, count(*)::BIGINT AS c FROM bg GROUP BY v, w
        HAVING count(*) >= {ts.BIGRAM_MIN_COUNT}),
ctx AS (SELECT v, count(*)::BIGINT AS cv FROM bg GROUP BY v),
cf AS (SELECT w AS term, count(*)::BIGINT AS cf FROM pos GROUP BY w
       HAVING count(*) >= {ts.BIGRAM_MIN_COUNT}),
tot AS (SELECT count(*) AS total FROM pos),
per AS (
  SELECT g.doc_id, count(*)::BIGINT AS n_bigrams,
         sum(ln({ts.BIGRAM_LAMBDA} * coalesce(bgc.c, 0) * 1.0 / ctx.cv
                + {1.0 - ts.BIGRAM_LAMBDA} *
                  coalesce(cf.cf, {UNIGRAM_OOV_CF}) * 1.0 / tot.total))
           AS ll
  FROM bg g
  LEFT JOIN bgc ON bgc.v = g.v AND bgc.w = g.w
  JOIN ctx ON ctx.v = g.v
  LEFT JOIN cf ON cf.term = g.w
  CROSS JOIN tot
  GROUP BY g.doc_id
)
SELECT d.doc_id, coalesce(p.n_bigrams, 0)::BIGINT AS n_bigrams,
       round(coalesce(p.ll, 0.0), 6) AS loglik
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
"""

_SQL_SESSIONIZE = """
WITH ev AS (
  SELECT user_id,
         (epoch_us(ts) - ((epoch_us(ts) % 1000000) + 1000000) % 1000000)
           // 1000000 AS e,
         value
  FROM events
),
lagged AS (
  SELECT user_id, e, value,
         CASE WHEN e - lag(e) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY e)
),
sess AS (
  SELECT user_id, e, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY e
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM lagged
)
SELECT user_id, session_id::BIGINT AS session_id,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value,
       min(e)::BIGINT AS t_start, max(e)::BIGINT AS t_end
FROM sess GROUP BY user_id, session_id
"""

# components of the near-dup pair graph: label = min reachable doc_id
# (recursive reachability; the engine side is iterative distributed
# min-label propagation — same fixpoint)
_SQL_DUP_COMPONENTS = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - {JACCARD_N - 1}),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
  FROM toks
),
sizes AS (SELECT doc_id, count(*) c FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
prs AS (
  SELECT ia, ib FROM inter
  JOIN sizes sa ON sa.doc_id = ia
  JOIN sizes sb ON sb.doc_id = ib
  WHERE inter * 1.0 / (sa.c + sb.c - inter) >= {JACCARD_THRESHOLD}
),
edges AS (SELECT ia AS u, ib AS v FROM prs
          UNION ALL SELECT ib, ia FROM prs),
reach(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.node = e.v
)
SELECT node::BIGINT AS doc_id, min(lab)::BIGINT AS component_id
FROM reach GROUP BY node
"""

# cluster-level dedup: drop every component member except the min
# (reuses the recursive component CTE; the final SELECT is swapped for a
# NOT IN filter over non-canonical members)
_SQL_DEDUP_APPLY_COMPONENTS = _SQL_DUP_COMPONENTS.replace(
    "SELECT node::BIGINT AS doc_id, min(lab)::BIGINT AS component_id\n"
    "FROM reach GROUP BY node",
    """SELECT d.doc_id, length(d.text)::BIGINT AS text_chars
FROM documents d
WHERE d.doc_id NOT IN (
  SELECT node FROM reach GROUP BY node HAVING node <> min(lab)
)""",
)

_SQL_REGEX_FEATURES = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{ts.EMAIL_PATTERN}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{ts.URL_PATTERN}'))::BIGINT AS n_urls,
       len(regexp_extract_all(text, '{ts.LONG_DIGIT_RUN_PATTERN}'))::BIGINT
         AS n_long_digit_runs,
       (len(regexp_extract_all(text, '{ts.EMAIL_PATTERN}')) > 0
        OR len(regexp_extract_all(text, '{ts.LONG_DIGIT_RUN_PATTERN}')) > 0)
         AS has_pii
FROM documents
"""

_SQL_TFIDF_TOP = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * ln(n.n_docs * 1.0 / df.df) AS tfidf_raw
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, df, tfidf_raw,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf_raw DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank::BIGINT AS rank, term, tf, df,
       round(tfidf_raw, 6) AS tfidf
FROM ranked WHERE rank <= 3
"""

_SQL_SOURCE_CAP = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5_number_lower(doc_id::VARCHAR),
                                     doc_id) AS r
  FROM documents
) WHERE r <= {cap}
""".format(cap=SOURCE_CAP)

# Hashing-trick tf-idf featurizer: bucket = md5-low64(term) % dim,
# value = L2-normalized sum of tf * ln(N/df) per bucket; zero buckets
# omitted (weights are >= 0, so a zero sum is exactly 0.0 both sides).
_SQL_HASHED_TFIDF = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
b AS (
  SELECT tf.doc_id,
         (md5_number_lower(tf.term) % {ts.HASHED_TFIDF_DIM})::BIGINT AS bucket,
         sum(tf.tf * ln(n.n_docs * 1.0 / df.df)) AS w
  FROM tf JOIN df USING (term) CROSS JOIN n
  GROUP BY tf.doc_id, bucket
),
nz AS (SELECT doc_id, bucket, w FROM b WHERE w != 0)
SELECT doc_id, bucket,
       round(w / sqrt(sum(w * w) OVER (PARTITION BY doc_id)), 6) AS value
FROM nz
"""

_SQL_INDEX_STATS = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term)
SELECT (SELECT count(*) FROM df)::BIGINT AS n_terms,
       (SELECT sum(df) FROM df)::BIGINT AS total_postings,
       (SELECT max(df) FROM df)::BIGINT AS max_df,
       (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT count(*) FROM toks)::BIGINT AS total_tokens
"""

_SQL_SUBSTRING = f"""
WITH pats AS (
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS pattern_id,
         substr(text, {SUBSTRING_OFF + 1}, {SUBSTRING_LEN}) AS pat
  FROM (SELECT doc_id, text FROM documents
        ORDER BY doc_id LIMIT {SUBSTRING_PATTERNS})
)
SELECT p.pattern_id, d.doc_id
FROM pats p JOIN documents d ON contains(d.text, p.pat)
"""

_SQL_SUBSTRING_COUNTS = f"""
WITH pats AS (
  SELECT row_number() OVER (ORDER BY doc_id) - 1 AS pattern_id,
         substr(text, {SUBSTRING_OFF + 1}, {SUBSTRING_LEN}) AS pat
  FROM (SELECT doc_id, text FROM documents
        ORDER BY doc_id LIMIT {SUBSTRING_PATTERNS})
)
SELECT p.pattern_id, d.doc_id,
       ((length(d.text) - length(replace(d.text, p.pat, '')))
        // length(p.pat))::BIGINT AS n_matches
FROM pats p JOIN documents d ON contains(d.text, p.pat)
"""

_SQL_PROPS_STATS = """
WITH e AS (
  SELECT event_type,
         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(k)::BIGINT AS sum_k, min(k)::BIGINT AS min_k,
       max(k)::BIGINT AS max_k,
       count(DISTINCT k)::BIGINT AS n_distinct_k
FROM e GROUP BY event_type
"""

_SQL_WEEKDAY_PROFILE = """
SELECT event_type, (isodow(ts) - 1)::BIGINT AS weekday,
       count(*)::BIGINT AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS value_c
FROM events GROUP BY event_type, weekday
"""

_SQL_SOURCE_DUP_RATE = """
WITH fp AS (
  SELECT source,
         md5(regexp_replace(lower(trim(text, ' ' || chr(9) || chr(10)
                                              || chr(13))),
                            '[ \t\n\r]+', ' ', 'g')) AS h
  FROM documents
),
cp AS (SELECT h, count(*)::BIGINT AS n_copies FROM fp GROUP BY h)
SELECT fp.source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN cp.n_copies > 1 THEN 1 ELSE 0 END)::BIGINT
         AS n_dup_docs,
       round(sum(CASE WHEN cp.n_copies > 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS dup_rate_r
FROM fp JOIN cp ON cp.h = fp.h
GROUP BY fp.source
"""

_SQL_CUSTOMER_DECILES = """
WITH tot AS (
  SELECT c_custkey AS k,
         coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)),
                  0)::BIGINT AS total_c
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey
),
d AS (SELECT total_c,
             ntile(10) OVER (ORDER BY total_c, k)::BIGINT AS decile
      FROM tot)
SELECT decile, count(*)::BIGINT AS n_customers,
       sum(total_c)::BIGINT AS sum_c
FROM d GROUP BY decile
"""

_SQL_SKIPGRAM_PMI = f"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts FROM documents
),
uni AS (SELECT unnest(ts) AS term FROM toks),
ucnt AS (SELECT term, count(*)::BIGINT AS c FROM uni GROUP BY term),
ut AS (SELECT count(*)::BIGINT AS t FROM uni),
big AS (
  SELECT unnest(list_transform(generate_series(1, len(ts) - d.d),
                i -> ts[i] || ' ' || ts[i + d.d])) AS bigram
  FROM toks CROSS JOIN (SELECT unnest([1, 2, 3]) AS d) d
  WHERE len(ts) > d.d
),
bcnt AS (SELECT bigram, count(*)::BIGINT AS c_xy FROM big GROUP BY bigram
         HAVING count(*) >= 5),
bt AS (SELECT count(*)::BIGINT AS t FROM big),
scored AS (
  SELECT b.bigram, b.c_xy,
         ln((b.c_xy * 1.0 * ut.t * ut.t) / (bt.t * u1.c * u2.c)) AS pmi_raw
  FROM bcnt b
  JOIN ucnt u1 ON u1.term = string_split(b.bigram, ' ')[1]
  JOIN ucnt u2 ON u2.term = string_split(b.bigram, ' ')[2]
  CROSS JOIN ut CROSS JOIN bt
)
SELECT bigram, c_xy, round(pmi_raw, 6) AS pmi,
       row_number() OVER (ORDER BY pmi_raw DESC, bigram ASC)::BIGINT AS rank
FROM scored
ORDER BY pmi_raw DESC, bigram ASC
LIMIT 20
"""

_SQL_ORDERS_PER_CUSTOMER = """
WITH pc AS (
  SELECT o_custkey, count(*)::BIGINT AS k FROM orders GROUP BY o_custkey
),
hist AS (SELECT k, count(*)::BIGINT AS n_customers FROM pc GROUP BY k),
zero AS (
  SELECT 0::BIGINT AS k, count(*)::BIGINT AS n_customers
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey)
)
SELECT * FROM hist UNION ALL SELECT * FROM zero
"""

_SQL_VOCAB_GROWTH = f"""
WITH n AS (SELECT count(*)::BIGINT AS nd FROM documents),
fs AS (
  SELECT term, min(doc_id) AS first_doc FROM (
    SELECT DISTINCT doc_id,
           unnest(regexp_extract_all(lower(text),
                                     '{TOKEN_PATTERN}')) AS term
    FROM documents
  ) GROUP BY term
),
bk AS (
  SELECT least((first_doc * 10) // n.nd, 9)::BIGINT AS bucket
  FROM fs, n
),
pb AS (SELECT bucket, count(*)::BIGINT AS n_new FROM bk GROUP BY bucket),
g AS (SELECT unnest(generate_series(0, 9))::BIGINT AS bucket)
SELECT g.bucket + 1 AS decile,
       coalesce(pb.n_new, 0)::BIGINT AS n_new_terms,
       sum(coalesce(pb.n_new, 0))
         OVER (ORDER BY g.bucket)::BIGINT AS vocab_size
FROM g LEFT JOIN pb ON pb.bucket = g.bucket
"""

_SQL_TOKEN_ENTROPY = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text),
                                           '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS c
       FROM toks GROUP BY doc_id, term),
agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n, sum(c * ln(c)) AS s
  FROM tf GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n, 0)::BIGINT AS n_tokens,
       CASE WHEN a.n IS NULL THEN 0.0
            ELSE round(ln(a.n) - a.s / a.n, 6) END AS entropy_r
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""

_SQL_LATE_ORDER_PRIORITIES = """
SELECT o_orderpriority, count(*)::BIGINT AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""

_SQL_ANOMALOUS_DAYS = """
WITH d AS (
  SELECT epoch(date_trunc('day', ts))::BIGINT AS day,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1
),
st AS (
  SELECT count(*)::BIGINT AS m, sum(n_events)::BIGINT AS s1,
         sum(n_events * n_events)::BIGINT AS s2
  FROM d
)
SELECT day, n_events,
       round((n_events - s1 * 1.0 / m)
             / sqrt(s2 * 1.0 / m - (s1 * 1.0 / m) * (s1 * 1.0 / m)),
             6) AS z_r
FROM d CROSS JOIN st
WHERE abs((n_events - s1 * 1.0 / m)
          / sqrt(s2 * 1.0 / m - (s1 * 1.0 / m) * (s1 * 1.0 / m))) > 2.0
"""

_SQL_TRIMMED_MEAN = """
WITH c AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x_c
  FROM events
),
b AS (
  SELECT event_type,
         quantile_disc(x_c, 0.05) AS lo,
         quantile_disc(x_c, 0.95) AS hi
  FROM c GROUP BY event_type
)
SELECT c.event_type,
       count(*)::BIGINT AS n_in_band,
       round(sum(c.x_c) * 1.0 / count(*) / 100.0, 6) AS trimmed_mean_r
FROM c JOIN b ON b.event_type = c.event_type
WHERE c.x_c >= b.lo AND c.x_c <= b.hi
GROUP BY c.event_type
"""

_SQL_NGRAM_NOVELTY = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - 2),
               i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])) AS g
  FROM toks WHERE len(ts) >= 3
),
df AS (SELECT g, count(*)::BIGINT AS df FROM sh GROUP BY g)
SELECT s.doc_id,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
       round(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS novelty_r
FROM sh s JOIN df d ON d.g = s.g
GROUP BY s.doc_id
"""

_SQL_VOCAB_OVERLAP = f"""
WITH st AS (
  SELECT DISTINCT source,
         unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
sizes AS (SELECT source, count(*)::BIGINT AS n FROM st GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*)::BIGINT AS n_common
  FROM st a JOIN st b ON b.term = a.term AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b, i.n_common,
       round(i.n_common * 1.0 / (sa.n + sb.n - i.n_common), 6)
         AS jaccard_r
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
"""

# thresholded (prefix-filter scale path) mirror: identical expression,
# plus the exact-value WHERE the Ray side applies before rounding
_SQL_VOCAB_OVERLAP_T = f"""
WITH st AS (
  SELECT DISTINCT source,
         unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
sizes AS (SELECT source, count(*)::BIGINT AS n FROM st GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*)::BIGINT AS n_common
  FROM st a JOIN st b ON b.term = a.term AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b, i.n_common,
       round(i.n_common * 1.0 / (sa.n + sb.n - i.n_common), 6)
         AS jaccard_r
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
WHERE i.n_common * 1.0 / (sa.n + sb.n - i.n_common) >= 0.5
"""

_SQL_REGEX_SEARCH = """
WITH pats(pattern_id, pat) AS (VALUES
  (0, 'table (scan|sort)'),
  (1, 'hash join|merge join'),
  (2, 'window [a-z]+ scan'),
  (3, 'joi+n table')
)
SELECT p.pattern_id::BIGINT AS pattern_id, d.doc_id
FROM pats p JOIN documents d ON regexp_matches(d.text, p.pat)
"""

_SQL_SOURCE_KL = f"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
st AS (SELECT source, term, count(*)::BIGINT AS c FROM toks GROUP BY source, term),
ct AS (SELECT term, sum(c)::BIGINT AS ct FROM st GROUP BY term),
cs AS (SELECT source, sum(c)::BIGINT AS cs FROM st GROUP BY source),
tot AS (SELECT sum(c) AS total FROM st)
SELECT st.source, cs.cs AS n_tokens,
       round(sum((st.c * 1.0 / cs.cs)
                 * ln((st.c * 1.0 / cs.cs) / (ct.ct * 1.0 / tot.total))),
             6) AS kl
FROM st JOIN ct USING (term) JOIN cs USING (source) CROSS JOIN tot
GROUP BY st.source, cs.cs
"""

_SQL_LENGTH_OUTLIERS = f"""
WITH b AS (
  SELECT source,
         quantile_disc(n_chars, {ts.LENGTH_OUTLIER_LO_Q}) AS lo,
         quantile_disc(n_chars, {ts.LENGTH_OUTLIER_HI_Q}) AS hi
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars,
       (d.n_chars >= b.lo AND d.n_chars <= b.hi) AS keep
FROM documents d JOIN b USING (source)
"""

HASHED_DUP_THRESHOLD = 0.95

# Text near-dup via the hashed featurizer: cosine over L2-normalized
# hashed tf-idf vectors = sum of products on shared buckets
# (UNROUNDED values — rounding happens once, on the output cosine).
_SQL_HASHED_TEXT_DUP = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
b AS (
  SELECT tf.doc_id,
         (md5_number_lower(tf.term) % {ts.HASHED_TFIDF_DIM})::BIGINT AS bucket,
         sum(tf.tf * ln(n.n_docs * 1.0 / df.df)) AS w
  FROM tf JOIN df USING (term) CROSS JOIN n
  GROUP BY tf.doc_id, bucket
),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nm FROM b GROUP BY doc_id),
v AS (
  SELECT b.doc_id, b.bucket, b.w / nrm.nm AS val
  FROM b JOIN nrm USING (doc_id) WHERE nrm.nm > 0
),
p AS (
  SELECT a.doc_id AS ida, c.doc_id AS idb, sum(a.val * c.val) AS cos
  FROM v a JOIN v c ON c.bucket = a.bucket AND c.doc_id > a.doc_id
  GROUP BY a.doc_id, c.doc_id
)
SELECT ida AS doc_id_a, idb AS doc_id_b, round(cos, 6) AS cosine
FROM p WHERE cos >= {HASHED_DUP_THRESHOLD}
"""

_SQL_COLLOCATIONS = f"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts FROM documents
),
uni AS (SELECT unnest(ts) AS term FROM toks),
ucnt AS (SELECT term, count(*)::BIGINT AS c FROM uni GROUP BY term),
ut AS (SELECT count(*)::BIGINT AS t FROM uni),
big AS (
  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                i -> ts[i] || ' ' || ts[i+1])) AS bigram
  FROM toks
),
bcnt AS (SELECT bigram, count(*)::BIGINT AS c_xy FROM big GROUP BY bigram
         HAVING count(*) >= 5),
bt AS (SELECT count(*)::BIGINT AS t FROM big),
scored AS (
  SELECT b.bigram, b.c_xy,
         ln((b.c_xy * 1.0 * ut.t * ut.t) / (bt.t * u1.c * u2.c)) AS pmi_raw
  FROM bcnt b
  JOIN ucnt u1 ON u1.term = string_split(b.bigram, ' ')[1]
  JOIN ucnt u2 ON u2.term = string_split(b.bigram, ' ')[2]
  CROSS JOIN ut CROSS JOIN bt
)
SELECT bigram, c_xy, round(pmi_raw, 6) AS pmi,
       row_number() OVER (ORDER BY pmi_raw DESC, bigram ASC)::BIGINT AS rank
FROM scored
ORDER BY pmi_raw DESC, bigram ASC
LIMIT 20
"""

_SQL_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE md5_number_lower(doc_id::VARCHAR) % 100 < 10
"""

_SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE md5_number_lower(doc_id::VARCHAR) % 100 <
      CASE lang WHEN 'en' THEN 20 WHEN 'de' THEN 50
                WHEN 'fr' THEN 100 ELSE 0 END
"""

_SQL_VALUE_HISTOGRAM = """
SELECT event_type, floor(value / 5.0)::BIGINT AS bin,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type, 2
"""

_SQL_VALUE_QUANTILES = """
SELECT event_type, 0.5::DOUBLE AS q, quantile_disc(value, 0.5) AS value
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.95::DOUBLE, quantile_disc(value, 0.95)
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.99::DOUBLE, quantile_disc(value, 0.99)
FROM events GROUP BY event_type
"""

_SQL_JSONL_ROUNDTRIP = """
SELECT doc_id, length(text)::BIGINT AS n_chars FROM documents
"""

# Money sums are integer-exact on both engines: scale-and-round
# (floor(x*scale + 0.5), positive domain) BEFORE summing, so the
# distributed summation order can never flip a digit (see
# pipelines/relational.py).
_SQL_PRICING_SUMMARY = """
WITH f AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS base_c,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5)
              AS BIGINT) AS disc_c,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                    * 1000000 + 0.5) AS BIGINT) AS charge_c
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
)
SELECT l_returnflag, l_linestatus,
       sum(qty)::BIGINT AS sum_qty,
       sum(base_c)::BIGINT AS sum_base_c,
       sum(disc_c)::BIGINT AS sum_disc_c,
       sum(charge_c)::BIGINT AS sum_charge_c,
       count(*)::BIGINT AS n_items,
       sum(qty) * 1.0 / count(*) AS avg_qty,
       sum(base_c) * 1.0 / count(*) AS avg_price_c
FROM f GROUP BY l_returnflag, l_linestatus
"""

_SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT
         AS revenue_c,
       count(*)::BIGINT AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

_SQL_PROFILE_EVENTS = """
SELECT 'user_id' AS "column", count(*)::BIGINT AS n_rows,
       (count(*) - count(user_id))::BIGINT AS n_nulls,
       count(DISTINCT user_id)::BIGINT AS n_distinct,
       round(min(user_id) * 1.0, 6) AS min_num,
       round(max(user_id) * 1.0, 6) AS max_num,
       NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
FROM events
UNION ALL
SELECT 'event_type', count(*)::BIGINT,
       (count(*) - count(event_type))::BIGINT,
       count(DISTINCT event_type)::BIGINT,
       NULL::DOUBLE, NULL::DOUBLE,
       min(event_type), max(event_type)
FROM events
UNION ALL
SELECT 'value', count(*)::BIGINT,
       (count(*) - count(value))::BIGINT,
       count(DISTINCT value)::BIGINT,
       round(min(value), 6), round(max(value), 6),
       NULL::VARCHAR, NULL::VARCHAR
FROM events
"""

_SQL_ORDERS_NO_LINEITEM = """
SELECT o_orderkey, o_custkey FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey)
"""

_SQL_CUSTOMERS_WITH_ORDERS = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

INTERVAL_JOIN_WINDOW_S = 86400

_SQL_INTERVAL_JOIN = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type,
         (epoch_us(ts) - ((epoch_us(ts) % 1000000) + 1000000) % 1000000)
           // 1000000 AS e
  FROM events
),
p AS (SELECT event_id, user_id, e FROM ev WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, e FROM ev WHERE event_type = 'click')
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
       (p.e - c.e)::BIGINT AS lag_s
FROM p JOIN c ON c.user_id = p.user_id
              AND c.e >= p.e - {INTERVAL_JOIN_WINDOW_S}
              AND c.e <= p.e
"""

_SQL_ASOF_CLICKS = """
WITH ev AS (
  SELECT event_id, user_id, event_type,
         (epoch_us(ts) - ((epoch_us(ts) % 1000000) + 1000000) % 1000000)
           // 1000000 AS e
  FROM events
),
p AS (SELECT event_id, user_id, e FROM ev WHERE event_type = 'purchase'),
c AS (SELECT user_id, e FROM ev WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.e::BIGINT AS purchase_e,
       c.e::BIGINT AS click_e, (p.e - c.e)::BIGINT AS gap_s
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.e >= c.e
"""

_SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_md5, min(doc_id)::BIGINT AS keep_id,
       count(*)::BIGINT AS n_copies
FROM documents GROUP BY text
"""

_SQL_NGRAM_JACCARD = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - {JACCARD_N - 1}),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
  FROM toks
),
sizes AS (SELECT doc_id, count(*) c FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT ia AS doc_id_a, ib AS doc_id_b,
       round(inter * 1.0 / (sa.c + sb.c - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = ia
JOIN sizes sb ON sb.doc_id = ib
WHERE inter * 1.0 / (sa.c + sb.c - inter) >= {JACCARD_THRESHOLD}
"""

_SQL_DEDUP_APPLY = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(ts) - {JACCARD_N - 1}),
                i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
  FROM toks
),
sizes AS (SELECT doc_id, count(*) c FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
removed AS (
  SELECT DISTINCT ib FROM inter
  JOIN sizes sa ON sa.doc_id = ia
  JOIN sizes sb ON sb.doc_id = ib
  WHERE inter * 1.0 / (sa.c + sb.c - inter) >= {JACCARD_THRESHOLD}
)
SELECT d.doc_id, length(d.text)::BIGINT AS text_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT ib FROM removed)
"""

# Full SimHash recomputation in SQL: per-term 64-bit hash via
# md5_number_lower (== shingle.md5_hash64, verified bit-identical),
# tf-weighted bit votes, signature assembly, exact hamming via
# bit_count(xor(..)) over an O(n^2) inequality join (fine at oracle
# scale; the engine side is the distributed Manku table search).
_SQL_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS cnt FROM toks GROUP BY doc_id, term),
th AS (SELECT doc_id, cnt, md5_number_lower(term) AS h FROM tf),
bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN cnt ELSE -cnt END) AS w
  FROM th, (SELECT unnest(generate_series(0, 63)) AS bit) b
  GROUP BY doc_id, b.bit
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN w > 0 THEN (1::UBIGINT << bit)::HUGEINT ELSE 0 END)::UBIGINT AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""

_SQL_EMB_DUP = f"""
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {EMB_DUP_THRESHOLD}
"""

_SQL_ANN_BRUTE = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {ANN_QUERIES}),
sims AS (
  SELECT q.vec_id AS query_vec_id, e.vec_id,
         list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.vec_id
)
SELECT query_vec_id, rank, vec_id, cosine FROM (
  SELECT query_vec_id, vec_id,
         row_number() OVER (PARTITION BY query_vec_id ORDER BY cos DESC, vec_id ASC)::BIGINT AS rank,
         round(cos, 6) AS cosine
  FROM sims
) WHERE rank <= {ANN_K}
"""

# pruned IVF with PINNED centroids: DuckDB rebuilds the exact quantizer
# (the 8 lowest-id vectors), assigns every vector to its argmax-cosine
# cell (ties -> lower cell_id, matching np.argmax-first-max), probes the
# 2 nearest cells per query, scores only those cells' members.
_SQL_ANN_IVF_PRUNED = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id ASC) - 1 AS cell_id, embedding
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id ASC LIMIT {ANN_IVF_CELLS})
),
assign AS (
  SELECT vec_id, embedding, cell_id FROM (
    SELECT e.vec_id, e.embedding, c.cell_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(
               e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
             c.cell_id ASC) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
q AS (SELECT vec_id, embedding FROM embeddings
      ORDER BY vec_id LIMIT {ANN_QUERIES}),
probe AS (
  SELECT query_vec_id, cell_id FROM (
    SELECT q.vec_id AS query_vec_id, c.cell_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(
               q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
             c.cell_id ASC) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn <= {ANN_IVF_NPROBE}
),
sims AS (
  SELECT q.vec_id AS query_vec_id, a.vec_id,
         list_cosine_similarity(
           q.embedding::DOUBLE[], a.embedding::DOUBLE[]) AS cos
  FROM q
  JOIN probe p ON p.query_vec_id = q.vec_id
  JOIN assign a ON a.cell_id = p.cell_id
  WHERE a.vec_id <> q.vec_id
)
SELECT query_vec_id, rank, vec_id, cosine FROM (
  SELECT query_vec_id, vec_id,
         row_number() OVER (PARTITION BY query_vec_id
                            ORDER BY cos DESC, vec_id ASC)::BIGINT AS rank,
         round(cos, 6) AS cosine
  FROM sims
) WHERE rank <= {ANN_K}
"""

_SQL_MORE_LIKE_THIS = f"""
WITH {_TOKS_CTE},
src AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {MLT_SRC_DOCS}),
st AS (
  SELECT doc_id AS src_doc_id, term FROM (
    SELECT tf.doc_id, tf.term,
           row_number() OVER (PARTITION BY tf.doc_id
             ORDER BY tf.tf * ln(s.n_docs * 1.0 / df.df) DESC,
                      tf.term ASC) AS rn
    FROM tf JOIN df USING (term) CROSS JOIN stats s
    WHERE tf.doc_id IN (SELECT doc_id FROM src)
  ) WHERE rn <= {MLT_TERMS}
),
scores AS (
  SELECT st.src_doc_id, tf.doc_id, sum({_BM25_CONTRIB}) AS score
  FROM st
  JOIN tf ON tf.term = st.term
  JOIN df ON df.term = st.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE tf.doc_id <> st.src_doc_id
  GROUP BY st.src_doc_id, tf.doc_id
)
SELECT src_doc_id, rank, doc_id, score_r FROM (
  SELECT src_doc_id, doc_id,
         row_number() OVER (PARTITION BY src_doc_id
                            ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
         round(score, 6) AS score_r
  FROM scores
) WHERE rank <= {TOP_K}
"""

_SQL_SPELL_SUGGEST = f"""
WITH {_TOKS_CTE},
miss AS (
  SELECT r::BIGINT AS query_id,
         substr(term, 1, 1) || substr(term, 3) AS miss
  FROM head WHERE length(term) >= 4
),
cand AS (
  SELECT m.query_id, d.term, d.df,
         levenshtein(m.miss, d.term)::BIGINT AS distance
  FROM miss m CROSS JOIN df d
  WHERE levenshtein(m.miss, d.term) <= {SPELL_MAX_DIST}
),
ranked AS (
  SELECT query_id, term, distance,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY distance ASC, df DESC, term ASC)
           AS rank
  FROM cand
)
SELECT query_id, rank::BIGINT AS rank, term, distance
FROM ranked WHERE rank <= {SPELL_TOP_N}
"""

_SQL_BM25_PREFIX = f"""
WITH {_TOKS_CTE},
pfx AS (
  SELECT prefix, row_number() OVER (ORDER BY prefix) - 1 AS query_id
  FROM (SELECT DISTINCT substr(term, 1, {PREFIX_LEN}) AS prefix FROM head)
),
exp AS (
  SELECT query_id, term FROM (
    SELECT p.query_id, d.term,
           row_number() OVER (PARTITION BY p.query_id
                              ORDER BY d.df DESC, d.term ASC) AS rn
    FROM pfx p JOIN df d ON d.term LIKE p.prefix || '%'
  ) WHERE rn <= {PREFIX_EXPAND}
),
scores AS (
  SELECT e.query_id, tf.doc_id, sum({_BM25_CONTRIB}) AS score
  FROM exp e
  JOIN tf ON tf.term = e.term
  JOIN df ON df.term = e.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY e.query_id, tf.doc_id
)
SELECT query_id, rank, doc_id, score_r FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
         round(score, 6) AS score_r
  FROM scores
) WHERE rank <= {TOP_K}
"""

_SQL_EVENTS_WINDOW = """
SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start, event_type,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value,
       round(min(value), 6) AS min_value, round(max(value), 6) AS max_value
FROM events GROUP BY 1, 2
"""

_SQL_EVENTS_DISTINCT = """
SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start, event_type,
       count(*)::BIGINT AS n_events,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY 1, 2
"""

_SQL_EVENTS_SLIDING = """
WITH ev AS (
  -- floored (numpy-convention) second truncation: DuckDB // truncates
  -- toward zero and % follows the dividend sign, which would disagree
  -- with the engine's floor_temporal for pre-1970 (negative) epochs
  SELECT (epoch_us(ts) - ((epoch_us(ts) % 1000000) + 1000000) % 1000000)
           // 1000000 AS e,
         event_type, value FROM events
),
w AS (
  SELECT unnest(list_transform(generate_series(0, 1),
                i -> (e - ((e % 1800) + 1800) % 1800) - i * 1800))
           AS window_start,
         event_type, value
  FROM ev
)
SELECT window_start, event_type, count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM w GROUP BY window_start, event_type
"""

_SQL_TOP_DOCS_PER_SOURCE = """
SELECT source, rank, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC)::BIGINT AS rank
  FROM documents
) WHERE rank <= 3
"""

_SQL_IMAGE_DECODE = """
SELECT doc_id, (doc_id % 21 + 4)::BIGINT AS width,
       (doc_id % 13 + 4)::BIGINT AS height,
       3::BIGINT AS channels,
       ((doc_id * 7) % 256)::BIGINT AS mean_pixel
FROM documents
"""

_SQL_MULTIMODAL = """
SELECT doc_id,
       strlen(text)::BIGINT AS n_bytes,
       sha256(text) AS payload_sha256,
       (strlen(text) % 640 + 16)::BIGINT AS width,
       ((strlen(text) // 7) % 480 + 16)::BIGINT AS height,
       'fake' AS decoder
FROM documents
"""

_SQL_CURATION_REPORT_TMPL = """
WITH kept AS ({quality_filter_sql})
SELECT d.source,
       count(*)::BIGINT AS n_docs,
       count(k.doc_id)::BIGINT AS n_kept,
       coalesce(sum(k.n_tokens), 0)::BIGINT AS kept_tokens
FROM documents d LEFT JOIN kept k USING (doc_id)
GROUP BY d.source
"""

_SQL_QUALITY_FILTER = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
  FROM documents
),
lang AS (
  SELECT doc_id,
    len(list_filter(ts, x -> x IN ({_in_list(ts.STOPWORDS['en'])})))::BIGINT AS en_hits,
    len(list_filter(ts, x -> x IN ({_in_list(ts.STOPWORDS['de'])})))::BIGINT AS de_hits,
    len(list_filter(ts, x -> x IN ({_in_list(ts.STOPWORDS['fr'])})))::BIGINT AS fr_hits,
    len(list_filter(ts, x -> x IN ({_in_list(ts.STOPWORDS['es'])})))::BIGINT AS es_hits
  FROM toks
),
pl AS (
  SELECT doc_id,
    CASE WHEN en_hits = 0 AND de_hits = 0 AND fr_hits = 0 AND es_hits = 0 THEN 'und'
         WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits THEN 'en'
         WHEN de_hits >= fr_hits AND de_hits >= es_hits THEN 'de'
         WHEN fr_hits >= es_hits THEN 'fr'
         ELSE 'es' END AS pred_lang
  FROM lang
),
qual AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))::BIGINT AS n_tokens,
         (length(trim(text, {_TRIM_CHARS})) >= {ts.QUALITY_MIN_CHARS}
          AND len(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) >= {ts.QUALITY_MIN_WORDS}
          AND CASE WHEN length(text) > 0
              THEN len(regexp_extract_all(text, '{ts.ALPHA_CHAR_PATTERN}')) * 1.0 / length(text)
              ELSE 0.0 END >= {ts.QUALITY_MIN_ALPHA_RATIO}) AS is_quality
  FROM documents
),
ln AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents),
lc AS (SELECT doc_id, line, count(*)::BIGINT AS c, strlen(line)::BIGINT AS nb
       FROM ln GROUP BY doc_id, line),
gop AS (
  SELECT doc_id,
         sum(c * nb)::BIGINT AS line_chars,
         sum(CASE WHEN c > 1 THEN c * nb ELSE 0 END)::BIGINT AS dup_line_chars
  FROM lc GROUP BY doc_id
),
tb AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
        i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM toks WHERE len(ts) >= 2
),
tbm AS (SELECT doc_id, max(cnt)::BIGINT AS top_bigram_count FROM (
          SELECT doc_id, bg, count(*) AS cnt FROM tb GROUP BY doc_id, bg)
        GROUP BY doc_id)
SELECT q.doc_id, q.n_tokens, p.pred_lang
FROM qual q
JOIN pl p USING (doc_id)
JOIN gop g USING (doc_id)
LEFT JOIN tbm t USING (doc_id)
WHERE q.is_quality AND p.pred_lang <> 'und'
  AND g.dup_line_chars * 2 <= g.line_chars
  AND coalesce(t.top_bigram_count, 0) * 10 <= q.n_tokens
"""

_SQL_DECONTAMINATE_APPLY = f"""
WITH tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
  FROM documents
),
ng AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 12),
        i -> array_to_string(ts[i:i+12], ' '))) AS ng
  FROM tl WHERE len(ts) >= 13
),
bng AS (SELECT DISTINCT ng FROM ng WHERE doc_id % 7 = 0),
bad AS (
  SELECT DISTINCT c.doc_id FROM ng c JOIN bng USING (ng)
  WHERE c.doc_id % 7 <> 0
)
SELECT doc_id, length(text)::BIGINT AS text_chars FROM documents
WHERE doc_id % 7 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
"""

_SQL_DEDUP_LINES = """
WITH ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents),
ln AS (
  SELECT doc_id, unnest(l) AS line,
         unnest(generate_series(1, len(l))) AS i
  FROM ls
),
fo AS (SELECT doc_id, line, min(i) AS mi FROM ln GROUP BY doc_id, line),
cnt AS (SELECT doc_id, count(*)::BIGINT AS n_lines_in
        FROM ln GROUP BY doc_id),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines_kept,
         md5(string_agg(line, chr(10) ORDER BY mi)) AS cleaned_md5
  FROM fo GROUP BY doc_id
)
SELECT c.doc_id, c.n_lines_in, a.n_lines_kept, a.cleaned_md5
FROM cnt c JOIN agg a USING (doc_id)
"""

# CROSS-doc line dedup: blank (space/tab/CR-only) lines never
# participate; a participating line is kept iff it is the first
# occurrence of its exact text in (doc_id, idx) order anywhere in the
# corpus — the engine's groupby(line_md5).min(doc_id*STRIDE+idx).
_SQL_GLOBAL_LINE_DEDUP = """
WITH ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents),
ln AS (
  SELECT doc_id, unnest(l) AS line,
         unnest(generate_series(1, len(l))) AS idx
  FROM ls
),
marked AS (
  SELECT doc_id, idx, line,
         CASE WHEN trim(line, ' ' || chr(9) || chr(13)) = '' THEN TRUE
              ELSE row_number() OVER (
                     PARTITION BY CASE
                       WHEN trim(line, ' ' || chr(9) || chr(13)) = ''
                       THEN NULL ELSE md5(line) END
                     ORDER BY doc_id, idx) = 1
         END AS kept
  FROM ln
)
SELECT doc_id,
       count(*)::BIGINT AS n_lines_in,
       (count(*) FILTER (WHERE kept))::BIGINT AS n_lines_kept,
       md5(coalesce(string_agg(line, chr(10) ORDER BY idx)
                    FILTER (WHERE kept), '')) AS cleaned_md5
FROM marked GROUP BY doc_id
"""

_SQL_CLUSTER_ASSIGN = """
WITH c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, embedding
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
),
sims AS (
  SELECT e.vec_id, c.cluster,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS cos
  FROM embeddings e CROSS JOIN c
)
SELECT vec_id, cluster::BIGINT AS cluster FROM (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, cluster ASC) AS r
  FROM sims
) WHERE r = 1
"""

_SQL_SEMDEDUP = f"""
WITH c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, embedding
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8)
),
sims AS (
  SELECT e.vec_id, c.cluster,
         round(list_cosine_similarity(e.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS cos
  FROM embeddings e CROSS JOIN c
),
assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, cluster ASC) AS r
    FROM sims
  ) WHERE r = 1
)
SELECT a1.cluster::BIGINT AS cluster, e1.vec_id AS vec_id_a,
       e2.vec_id AS vec_id_b,
       round(list_cosine_similarity(e1.embedding::DOUBLE[],
                                    e2.embedding::DOUBLE[]), 6) AS cosine
FROM assign a1
JOIN assign a2 ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
JOIN embeddings e1 ON e1.vec_id = a1.vec_id
JOIN embeddings e2 ON e2.vec_id = a2.vec_id
WHERE list_cosine_similarity(e1.embedding::DOUBLE[],
                             e2.embedding::DOUBLE[]) >= {EMB_DUP_THRESHOLD}
"""

_SQL_TOKEN_PACK = f"""
WITH tc AS (
  SELECT doc_id,
         length(regexp_extract_all(lower(text), '{TOKEN_PATTERN}'))::BIGINT
           AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS start_pos
  FROM tc
)
SELECT doc_id, n_tokens, start_pos,
       (start_pos // 2048)::BIGINT AS seq_first,
       ((start_pos + n_tokens - 1) // 2048)::BIGINT AS seq_last
FROM cum WHERE n_tokens > 0
"""

_SQL_HEAVY_HITTERS = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tc AS (SELECT term, count(*)::BIGINT AS count FROM toks GROUP BY term)
SELECT row_number() OVER (ORDER BY count DESC, term ASC)::BIGINT AS rank,
       term, count
FROM tc ORDER BY count DESC, term ASC LIMIT 20
"""

_SQL_GOPHER = f"""
WITH ln AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
),
lc AS (
  SELECT doc_id, line, count(*)::BIGINT AS c, strlen(line)::BIGINT AS nb
  FROM ln GROUP BY doc_id, line
),
lagg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_lines,
         sum(c * nb)::BIGINT AS line_chars,
         sum(CASE WHEN c > 1 THEN c * nb ELSE 0 END)::BIGINT
           AS dup_line_chars,
         sum(CASE WHEN line LIKE '%...' THEN c ELSE 0 END)::BIGINT
           AS n_ellipsis_lines
  FROM lc GROUP BY doc_id
),
tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
  FROM documents
),
tb AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
        i -> ts[i] || ' ' || ts[i + 1])) AS bg
  FROM tl WHERE len(ts) >= 2
),
tbc AS (SELECT doc_id, bg, count(*) AS cc FROM tb GROUP BY doc_id, bg),
tbm AS (SELECT doc_id, max(cc)::BIGINT AS top_bigram_count
        FROM tbc GROUP BY doc_id)
SELECT l.doc_id, l.n_lines, l.line_chars, l.dup_line_chars,
       l.n_ellipsis_lines,
       coalesce(t.top_bigram_count, 0)::BIGINT AS top_bigram_count
FROM lagg l LEFT JOIN tbm t USING (doc_id)
"""

_SQL_PII_REDACT = f"""
SELECT doc_id,
       length(regexp_extract_all(text, '{ts.EMAIL_PATTERN}'))::BIGINT
         AS n_emails,
       length(regexp_extract_all(text, '{ts.LONG_DIGIT_RUN_PATTERN}'))::BIGINT
         AS n_long_digit_runs,
       md5(regexp_replace(
             regexp_replace(text, '{ts.EMAIL_PATTERN}', '[EMAIL]', 'g'),
             '{ts.LONG_DIGIT_RUN_PATTERN}', '[NUM]', 'g'))
         AS redacted_md5
FROM documents
"""

_SQL_DECONTAMINATE = f"""
WITH tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_PATTERN}') AS ts
  FROM documents
),
ng AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 12),
        i -> array_to_string(ts[i:i+12], ' '))) AS ng
  FROM tl WHERE len(ts) >= 13
),
bng AS (SELECT DISTINCT ng FROM ng WHERE doc_id % 7 = 0)
SELECT c.doc_id, count(DISTINCT c.ng)::BIGINT AS n_contaminated
FROM ng c JOIN bng USING (ng)
WHERE c.doc_id % 7 <> 0
GROUP BY c.doc_id
"""

_SQL_AUDIO_FEATURES = """
WITH s AS (SELECT doc_id, 160 + doc_id % 40 AS n FROM documents),
samp AS (
  SELECT doc_id, n,
         unnest(generate_series(0, n - 1)) AS i,
         unnest(list_transform(generate_series(0, n - 1),
                i -> (doc_id * 31 + i * 17) % 2048 - 1024)) AS v
  FROM s
),
flags AS (
  SELECT doc_id, n, v,
         CASE WHEN (v < 0) <> (lag(v) OVER (PARTITION BY doc_id ORDER BY i) < 0)
              THEN 1 ELSE 0 END AS zc
  FROM samp
)
SELECT doc_id, 8000::BIGINT AS sample_rate, max(n)::BIGINT AS n_samples,
       (max(n) * 1000 // 8000)::BIGINT AS duration_ms,
       max(abs(v))::BIGINT AS peak, sum(v * v)::BIGINT AS energy,
       sum(zc)::BIGINT AS zero_crossings
FROM flags GROUP BY doc_id
"""

_SQL_VIDEO_FRAMES = """
WITH f AS (SELECT doc_id, 6 + doc_id % 5 AS nf FROM documents),
idx AS (SELECT doc_id, nf, unnest(generate_series(0, nf - 1)) AS j FROM f)
SELECT doc_id, j::BIGINT AS frame_idx, nf::BIGINT AS n_frames,
       ((doc_id + j) % 9 + 2)::BIGINT AS width,
       ((doc_id * 3 + j) % 7 + 2)::BIGINT AS height,
       ((doc_id * 11 + j * 29) % 256)::BIGINT AS mean_pixel
FROM idx WHERE j % 2 = 0
"""


# --- round-3 wave 3: TPC-H Q3/Q6 shapes + deterministic split ---------

def q_revenue_forecast(sf_dir: str) -> pa.Table:
    """TPC-H Q6 shape: filter-only discount-revenue sum (no shuffle)."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
    )
    return rel.revenue_forecast(li)


def q_shipping_priority(sf_dir: str) -> rd.Dataset:
    """TPC-H Q3 shape: 3-table join -> grouped revenue -> pinned top-10."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_orderpriority"])
    lineitem = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey", "l_extendedprice",
                                        "l_discount", "l_shipdate"])
    return rel.shipping_priority(customer, orders, lineitem)


def q_bm25_must_not(sf_dir: str) -> pa.Table:
    """Boolean MUST/MUST-NOT: adjacent head-term pairs as ``a -b`` —
    rank on the first term, exclude every doc containing the second
    (stats stay full-corpus; exclusion is a ranking mask only)."""
    index_dir = ensure_index(sf_dir)
    pairs = pair_query_table(index_dir)
    toks = [q.split() for q in pairs.column("query").to_pylist()]
    queries = pa.table({
        "query_id": pairs.column("query_id"),
        "query": pa.array([f"{a} -{b}" for a, b in toks],
                          type=pa.string()),
    })
    res = _collect(run_queries(index_dir, rd.from_arrow(queries), CFG,
                               k=TOP_K, method="boolean"))
    res = _round_col(res, "score")
    return res.rename_columns(
        ["query_id", "rank", "doc_id", "score_r"]
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def q_link_degrees(sf_dir: str) -> rd.Dataset:
    """Link-graph degree table over the deterministic hash edge set."""
    from semantic_pdf_search_engine_ray.pipelines import graph as gr

    docs = rd.read_parquet(documents_path(sf_dir), columns=["doc_id"])
    return gr.degree_table(docs, n_docs=docs.count())


def q_pagerank(sf_dir: str) -> rd.Dataset:
    """Fixed-point integer PageRank, 5 power-iteration rounds as
    Dataset join + groupby exchanges (bit-identical to the SQL mirror
    by construction — all-integer update rule)."""
    from semantic_pdf_search_engine_ray.pipelines import graph as gr

    docs = rd.read_parquet(documents_path(sf_dir), columns=["doc_id"])
    # functional plan: one grouped-sum exchange per round (edges are a
    # pure function of doc_id); the general join plan is pytest-pinned
    # bit-equal and soaked separately
    return gr.pagerank(docs, n_docs=docs.count(), n_iters=5)


def q_local_supplier_revenue(sf_dir: str) -> rd.Dataset:
    """TPC-H Q5 shape: 6-table same-nation revenue (dimension tables
    broadcast, fact tables hash-joined)."""
    import pyarrow.parquet as _pq

    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    lineitem = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey", "l_suppkey",
                                        "l_extendedprice", "l_discount"])
    supplier = _pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                              columns=["s_suppkey", "s_nationkey"])
    nation = _pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = _pq.read_table(os.path.join(sf_dir, "region.parquet"))
    return rel.local_supplier_revenue(customer, orders, lineitem,
                                      supplier, nation, region)


def q_promo_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q14 shape: promo-part share of discounted revenue (part
    bitmap broadcast; fact side streams, no shuffle)."""
    import pyarrow.parquet as _pq

    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    lineitem = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_partkey", "l_shipdate",
                                        "l_extendedprice", "l_discount"])
    part = _pq.read_table(os.path.join(sf_dir, "part.parquet"),
                          columns=["p_partkey", "p_type"])
    return rel.promo_revenue_share(lineitem, part)


def q_events_rollup(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP (detail + per-type subtotals + grand total)."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["ts", "event_type", "value"])
    return win.rollup_events(events)


def q_user_event_lag(sf_dir: str) -> rd.Dataset:
    """row_number()/lag() OVER (PARTITION BY user ORDER BY ts, id)."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["event_id", "user_id", "ts"])
    return win.user_event_lag(events)


def q_value_moments(sf_dir: str) -> rd.Dataset:
    """Per-type mean/variance/stddev from exact integer power sums."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["event_type", "value"])
    return win.value_moments(events)


def q_kmeans_lloyd(sf_dir: str) -> rd.Dataset:
    """Iterated Lloyd k-means fit in fixed-point integers (3 assign +
    update rounds; bit-exact SQL mirror, one CTE pair per round)."""
    from semantic_pdf_search_engine_ray.pipelines import similarity as sim

    return sim.kmeans_lloyd(embeddings_path(sf_dir))


def q_global_quantiles(sf_dir: str) -> pa.Table:
    """Exact global p50/p95/p99 via the domain-bounded cents histogram
    (no sort; exchange is (bin, count) partials)."""
    events = rd.read_parquet(events_path(sf_dir), columns=["value"])
    return win.global_quantiles_histogram(events)


def q_curation_pipeline(sf_dir: str) -> rd.Dataset:
    """The END-TO-END curation chain a training-data user actually
    runs, composed from the engine's own stages with the survivor set
    checkpointed to parquet between phases (the resumable-output
    contract):

      1. quality_filter      (fused C4/Gopher keep filter)
      2. decontaminate_apply (benchmark 13-gram exclusion, full-corpus
                              benchmark membership)
      -> survivors = intersection, SEMI-joined against the corpus and
         spilled to partitioned parquet
      3. global_line_dedup   over the survivor corpus (cross-doc
                              first-occurrence now scoped to survivors)
      4. split_assign        (hash train/val/test)

    Output per surviving doc: line-dedup evidence (n_lines_in,
    n_lines_kept, cleaned_md5) + split columns. The oracle is the SAME
    composition in one SQL statement — every stage's semantics checked
    through the chain, not just in isolation."""
    import shutil as _shutil

    from semantic_pdf_search_engine_ray.pipelines import sampling as smp

    docs = read_docs(sf_dir)
    qf_ids = ts.quality_filter_apply(docs).select_columns(["doc_id"])
    ok_ids = dd.apply_decontamination(
        read_docs(sf_dir), benchmark_mod=7, n=13
    ).select_columns(["doc_id"])

    survivors = (
        docs.join(qf_ids.materialize(), "left_semi", 4, on=("doc_id",),
                  right_on=("doc_id",))
        .join(ok_ids.materialize(), "left_semi", 4, on=("doc_id",),
              right_on=("doc_id",))
    )
    spill = f"{_SCRATCH}/spse_curation_{_sf_cache_key(sf_dir)}"
    _shutil.rmtree(spill, ignore_errors=True)
    survivors.write_parquet(spill)

    ld = dd.global_line_dedup(spill)
    split = smp.split_assign(
        rd.read_parquet(spill, columns=["doc_id"])
    ).select_columns(["doc_id", "bucket", "split"])
    return ld.join(
        split.materialize(), "inner", 4,
        on=("doc_id",), right_on=("doc_id",),
    ).select_columns(["doc_id", "n_lines_in", "n_lines_kept",
                      "cleaned_md5", "bucket", "split"])


def q_lang_confusion(sf_dir: str) -> rd.Dataset:
    """Language-ID confusion matrix (predicted vs labeled)."""
    docs = rd.read_parquet(documents_path(sf_dir),
                           columns=["doc_id", "text", "lang"])
    return ts.lang_confusion(docs)


def ensure_rank_store(sf_dir: str) -> str:
    """Materialize the PageRank prior ONCE as a rank-store parquet next
    to the index (doc_id, rank_micro) — written by `write_parquet`
    streaming, never collected on the driver. Query actors resolve it in
    `__init__` (the `FacetActor` doc-store-column pattern,
    `search.py:201`); at corpus scale this column ships with the index
    shards exactly like `doc_len` does. Idempotent via a _DONE marker
    recording the row count."""
    from semantic_pdf_search_engine_ray.pipelines import graph as gr

    rank_dir = f"{_SCRATCH}/spse_ray_rank_{_sf_cache_key(sf_dir)}"
    marker = os.path.join(rank_dir, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(rank_dir, ignore_errors=True)
        docs = rd.read_parquet(documents_path(sf_dir), columns=["doc_id"])
        n_docs = docs.count()
        gr.pagerank(docs, n_docs, n_iters=5).write_parquet(rank_dir)
        with open(marker, "w") as f:
            f.write(str(n_docs))
    return rank_dir


class BlendedRankActor:
    """Actor-pool stage: BM25 + static-rank blended top-k. The prior
    column loads once per actor from the rank store (never via the
    driver); per-shard dense layout, O(shard docs) actor memory."""

    def __init__(self, index_dir: str, rank_dir: str, weight: float = 0.1):
        import numpy as np

        from semantic_pdf_search_engine_ray.stages.query import IndexReader

        self.reader = IndexReader(index_dir)
        t = pq.read_table(rank_dir, columns=["doc_id", "rank_micro"])
        prior = np.zeros(len(self.reader.doc_len), dtype=np.float64)
        prior[t.column("doc_id").to_numpy()] = weight * np.log(
            t.column("rank_micro").to_numpy().astype(np.float64))
        self.prior = prior

    def __call__(self, batch: pa.Table) -> pa.Table:
        from semantic_pdf_search_engine_ray.stages.query import (
            score_query_batch,
        )

        return score_query_batch(
            batch,
            lambda q, k: self.reader.top_k_blended(q, k, self.prior),
            TOP_K,
        )


def q_bm25_static_rank(sf_dir: str) -> pa.Table:
    """Web-search static-rank blending: score = BM25 + 0.1*ln(PageRank
    micro-units), applied over the match set only. The prior comes from
    the fixed-point PageRank (bit-exact across engines), so the only
    float novelty vs plain BM25 is the identically-written ln term.
    Round 4: the prior is a rank-store COLUMN resolved per actor
    (`ensure_rank_store`), not a driver-built dense array."""
    index_dir = ensure_index(sf_dir)
    rank_dir = ensure_rank_store(sf_dir)
    queries = derive_query_table(index_dir)

    res = _collect(
        rd.from_arrow(queries).map_batches(
            BlendedRankActor,
            fn_constructor_args=(index_dir, rank_dir),
            batch_format="pyarrow", concurrency=2,
            batch_size=64,
        )
    )
    res = _round_col(res, "score")
    return res.rename_columns(
        ["query_id", "rank", "doc_id", "blended_r"]
    ).sort_by([("query_id", "ascending"), ("rank", "ascending")])


def q_hits_scores(sf_dir: str) -> rd.Dataset:
    """Kleinberg HITS (2 integer fixed-point rounds; round 4: the
    dense-chunk plan — the edge list is materialized once into a
    chunk-partitioned layout so the reversed-edge hub gather is a
    vectorized per-chunk scatter, same exchange as PageRank's
    functional plan; the join plan remains pytest-pinned bit-equal)."""
    from semantic_pdf_search_engine_ray.pipelines import graph as gr

    docs = rd.read_parquet(documents_path(sf_dir), columns=["doc_id"])
    return gr.hits_scores(docs, n_docs=docs.count(), n_iters=2)


def q_pagerank_seeded(sf_dir: str) -> rd.Dataset:
    """Personalized PageRank: restart mass only on the seed set
    (doc_id % 10 == 0) — same fixed-point dense-chunk plan, seeded
    teleport vector."""
    from semantic_pdf_search_engine_ray.pipelines import graph as gr

    docs = rd.read_parquet(documents_path(sf_dir), columns=["doc_id"])
    return gr.pagerank(docs, n_docs=docs.count(), n_iters=5,
                       seed_mod=10)


def q_triangle_count(sf_dir: str) -> pa.Table:
    """Exact triangle count (canonical low->high orientation, wedge
    self-join + closing semi-join)."""
    from semantic_pdf_search_engine_ray.pipelines import graph as gr

    docs = rd.read_parquet(documents_path(sf_dir), columns=["doc_id"])
    return gr.triangle_count(docs, n_docs=docs.count())


def q_events_resampled(sf_dir: str) -> pa.Table:
    """Gap-filled hourly resample: full (type, hour) grid, 0-filled."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["ts", "event_type", "value"])
    return win.resample_hourly_filled(events)


def q_daily_reconciliation(sf_dir: str) -> rd.Dataset:
    """Per-day events x orders FULL OUTER reconciliation (zero-filled
    missing sides)."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    events = rd.read_parquet(events_path(sf_dir), columns=["ts"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderdate"])
    return rel.daily_reconciliation(events, orders)


def q_funnel_counts(sf_dir: str) -> pa.Table:
    """Greedy view->click->purchase funnel conversion counts."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["user_id", "ts", "event_type"])
    return win.funnel_counts(events)


def q_retention_cohorts(sf_dir: str) -> rd.Dataset:
    """Cohort retention triangle: (first-seen day, age in days) ->
    distinct active users."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["user_id", "ts"])
    return win.retention_cohorts(events)


def q_event_transitions(sf_dir: str) -> rd.Dataset:
    """Per-user event-type transition (Markov) counts."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["user_id", "event_id", "ts",
                                      "event_type"])
    return win.event_transitions(events)


def q_substring_counts(sf_dir: str) -> rd.Dataset:
    """grep -c through the trigram planner: per (pattern, doc)
    non-overlapping occurrence counts."""
    import pyarrow.dataset as pads

    from semantic_pdf_search_engine_ray.pipelines.substring import (
        substring_match_counts,
    )

    index_dir = _trigram_index(sf_dir)
    src = pads.dataset(documents_path(sf_dir)).to_table(
        columns=["doc_id", "text"]).sort_by("doc_id")
    pats = [
        t[SUBSTRING_OFF:SUBSTRING_OFF + SUBSTRING_LEN]
        for t in src.column("text").to_pylist()[:SUBSTRING_PATTERNS]
    ]
    tbl = pa.table({
        "pattern_id": pa.array(range(len(pats)), type=pa.int64()),
        "pattern": pa.array(pats, type=pa.string()),
    })
    return substring_match_counts(index_dir, tbl)


def q_source_vocab_overlap(sf_dir: str) -> rd.Dataset:
    """Pairwise source vocabulary Jaccard (corpus similarity matrix)."""
    docs = rd.read_parquet(documents_path(sf_dir),
                           columns=["source", "text"])
    return ts.source_vocab_overlap(docs)


def q_vocab_overlap_thresholded(sf_dir: str) -> rd.Dataset:
    """Prefix-filtered (PPJoin-style) source vocabulary Jaccard at
    J >= 0.5 — the bounded scale path; exact, so SQL mirrors it."""
    docs = rd.read_parquet(documents_path(sf_dir),
                           columns=["source", "text"])
    return ts.source_vocab_overlap_thresholded(docs, threshold=0.5)


def q_ngram_novelty(sf_dir: str) -> rd.Dataset:
    """Per-doc fraction of distinct 3-grams unique to that doc."""
    return ts.ngram_novelty(read_docs(sf_dir), n=3)


def q_trimmed_mean(sf_dir: str) -> rd.Dataset:
    """Per-type 5-95% trimmed mean (robust aggregate, exact cents)."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["event_type", "value"])
    return win.trimmed_mean(events)


def q_anomalous_days(sf_dir: str) -> rd.Dataset:
    """Daily-volume anomaly days (|z| > 2 vs all-days mean/std)."""
    events = rd.read_parquet(events_path(sf_dir), columns=["ts"])
    return win.anomalous_days(events)


def q_late_order_priorities(sf_dir: str) -> rd.Dataset:
    """TPC-H Q4 shape: per-priority counts of orders with a line
    shipped after the order date (cross-table EXISTS)."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])
    lineitem = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey", "l_shipdate"])
    return rel.late_order_priority_counts(orders, lineitem)


def q_token_entropy(sf_dir: str) -> rd.Dataset:
    """Per-doc token-distribution Shannon entropy (lexical diversity)."""
    return ts.token_entropy(read_docs(sf_dir))


def q_vocab_growth(sf_dir: str) -> rd.Dataset:
    """Heaps-law vocabulary growth per doc_id decile."""
    return ts.vocab_growth(read_docs(sf_dir))


def q_orders_per_customer(sf_dir: str) -> rd.Dataset:
    """Zero-inflated orders-per-customer degree histogram."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey"])
    return rel.orders_per_customer_hist(customer, orders)


def q_skipgram_pmi(sf_dir: str) -> pa.Table:
    """Window-3 skip-gram PMI collocations (distances collapsed; the
    feature-building generalization of adjacent-bigram PMI)."""
    return ts.collocations_pmi(read_docs(sf_dir), window=3)


def q_customer_value_deciles(sf_dir: str) -> rd.Dataset:
    """Customer lifetime-value NTILE(10) segmentation (exact cents,
    pinned ordering, zero-order customers included)."""
    from semantic_pdf_search_engine_ray.pipelines import relational as rel

    customer = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                               columns=["c_custkey"])
    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"])
    return rel.customer_value_deciles(customer, orders)


def q_weekday_profile(sf_dir: str) -> rd.Dataset:
    """Per-(type, weekday) seasonality profile (counts + exact cents)."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["ts", "event_type", "value"])
    return win.weekday_profile(events)


def q_source_dup_rate(sf_dir: str) -> rd.Dataset:
    """Per-source exact-duplicate rate off the content fingerprint."""
    docs = rd.read_parquet(documents_path(sf_dir),
                           columns=["text", "source"])
    return ts.source_dup_rate(docs)


def q_props_field_stats(sf_dir: str) -> rd.Dataset:
    """JSON property-bag extraction + per-type aggregates (vectorized
    Arrow regex; identical RE2 pattern in the SQL mirror)."""
    events = rd.read_parquet(events_path(sf_dir),
                             columns=["event_type", "props"])
    return win.props_field_stats(events)


def q_hll_distinct(sf_dir: str) -> rd.Dataset:
    """HyperLogLog distinct users per event_type (the approximate scale
    path next to events_distinct_users' exact two-stage groupby);
    register construction is integer-exact and SQL-mirrored."""
    from semantic_pdf_search_engine_ray.pipelines import sketch as sk

    events = rd.read_parquet(events_path(sf_dir),
                             columns=["event_type", "user_id"])
    return sk.hll_distinct_users(events)


def q_split_assign(sf_dir: str) -> rd.Dataset:
    """Deterministic hash train/val/test assignment over documents."""
    from semantic_pdf_search_engine_ray.pipelines import sampling as smp

    docs = rd.read_parquet(documents_path(sf_dir), columns=["doc_id"])
    return smp.split_assign(docs)


_SQL_REVENUE_FORECAST = """
SELECT coalesce(sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5)
                         AS BIGINT)), 0)::BIGINT AS revenue_c,
       count(*)::BIGINT AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""

_SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, revenue_c, o_orderdate, o_orderpriority FROM (
  SELECT l.l_orderkey AS l_orderkey,
         sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 10000
                        + 0.5) AS BIGINT))::BIGINT AS revenue_c,
         o.o_orderdate, o.o_orderpriority
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
    AND l.l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
  GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
)
ORDER BY revenue_c DESC, o_orderdate, l_orderkey
LIMIT 10
"""

_SQL_BM25_MUST_NOT = f"""
WITH {_TOKS_CTE},
qpairs AS (
  SELECT a.r::BIGINT AS query_id, a.term AS pos_term, b.term AS neg_term
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
scores AS (
  SELECT qp.query_id, tf.doc_id, sum({_BM25_CONTRIB}) AS score
  FROM qpairs qp
  JOIN tf ON tf.term = qp.pos_term
  JOIN df ON df.term = qp.pos_term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE NOT EXISTS (SELECT 1 FROM tf t2
                    WHERE t2.doc_id = tf.doc_id
                      AND t2.term = qp.neg_term)
  GROUP BY qp.query_id, tf.doc_id
)
SELECT query_id, rank, doc_id, score_r FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
         round(score, 6) AS score_r
  FROM scores
) WHERE rank <= {TOP_K}
"""

from semantic_pdf_search_engine_ray.pipelines.graph import (
    DEGREE_ORACLE_SQL as _GRAPH_DEGREE_SQL,
    pagerank_oracle_sql as _pagerank_oracle_sql,
)

_GRAPH_PAGERANK_SQL = _pagerank_oracle_sql(n_iters=5)

from semantic_pdf_search_engine_ray.pipelines.sketch import (
    HLL_ORACLE_SQL as _HLL_SQL,
)
from semantic_pdf_search_engine_ray.pipelines.similarity import (
    kmeans_oracle_sql as _kmeans_oracle_sql,
)
from semantic_pdf_search_engine_ray.pipelines.graph import (
    pagerank_oracle_ctes as _pagerank_oracle_ctes,
)

_PR_CTES = ",\n".join(_pagerank_oracle_ctes(n_iters=5))

from semantic_pdf_search_engine_ray.pipelines.graph import (
    hits_oracle_sql as _hits_oracle_sql,
)

_SQL_HITS = _hits_oracle_sql(n_iters=2)

from semantic_pdf_search_engine_ray.pipelines.graph import (
    TRIANGLE_ORACLE_SQL as _SQL_TRIANGLES,
    pagerank_oracle_sql as _pagerank_oracle_sql_fn,
)

_SQL_PAGERANK_SEEDED = _pagerank_oracle_sql_fn(n_iters=5, seed_mod=10)

_SQL_BM25_STATIC_RANK = f"""
WITH {_TOKS_CTE},
{_PR_CTES},
qterms AS (
  SELECT r::BIGINT AS query_id, term FROM head
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, a.term FROM head a WHERE a.r < {N_HEAD_TERMS - 1}
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, b.term
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
scores AS (
  SELECT qt.query_id, tf.doc_id, sum({_BM25_CONTRIB}) AS score
  FROM qterms qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
blended AS (
  SELECT sc.query_id, sc.doc_id, sc.score + 0.1 * ln(p.r) AS b
  FROM scores sc JOIN r5 p ON p.doc_id = sc.doc_id
)
SELECT query_id, rank, doc_id, blended_r FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY b DESC, doc_id ASC)::BIGINT AS rank,
         round(b, 6) AS blended_r
  FROM blended
) WHERE rank <= {TOP_K}
"""

_SQL_KMEANS = _kmeans_oracle_sql(n_clusters=8, n_iters=3)

_SQL_LOCAL_SUPPLIER_REVENUE = """
SELECT n_name,
       sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5)
                AS BIGINT))::BIGINT AS revenue_c,
       count(*)::BIGINT AS n_items
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""

_SQL_PROMO_REVENUE = """
WITH f AS (
  SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5)
              AS BIGINT) AS rev_c,
         p_type = 'PROMO' AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT coalesce(sum(CASE WHEN is_promo THEN rev_c ELSE 0 END), 0)::BIGINT
         AS promo_c,
       coalesce(sum(rev_c), 0)::BIGINT AS total_c,
       round(100.0 * coalesce(sum(CASE WHEN is_promo THEN rev_c ELSE 0
                                  END), 0)
             / coalesce(sum(rev_c), 0), 6) AS promo_pct_r
FROM f
"""

_SQL_EVENTS_RESAMPLED = """
WITH agg AS (
  SELECT event_type,
         epoch(date_trunc('hour', ts))::BIGINT AS window_start,
         count(*)::BIGINT AS n_events,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS value_c
  FROM events GROUP BY 1, 2
),
span AS (SELECT min(window_start) AS lo, max(window_start) AS hi FROM agg),
grid AS (
  SELECT k.event_type, g.ws
  FROM (SELECT DISTINCT event_type FROM agg) k
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, 3600)) AS ws
              FROM span) g
)
SELECT g.event_type, g.ws AS window_start,
       coalesce(a.n_events, 0)::BIGINT AS n_events,
       coalesce(a.value_c, 0)::BIGINT AS value_c
FROM grid g LEFT JOIN agg a
  ON a.event_type = g.event_type AND a.window_start = g.ws
"""

_SQL_TRANSITIONS = """
WITH e AS (
  SELECT user_id, event_type,
         epoch(date_trunc('second', ts))::BIGINT AS es, event_id
  FROM events
),
seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY es, event_id) AS nxt
  FROM e
)
SELECT event_type AS prev_type, nxt AS next_type,
       count(*)::BIGINT AS n_transitions
FROM seq WHERE nxt IS NOT NULL
GROUP BY prev_type, next_type
"""

_SQL_RETENTION = """
WITH ud AS (
  SELECT DISTINCT user_id,
         epoch(date_trunc('day', ts))::BIGINT // 86400 AS day
  FROM events
),
fs AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
SELECT fs.cohort_day, (ud.day - fs.cohort_day)::BIGINT AS age_days,
       count(*)::BIGINT AS n_users
FROM ud JOIN fs ON fs.user_id = ud.user_id
GROUP BY fs.cohort_day, age_days
"""

_SQL_FUNNEL = """
WITH e AS (
  SELECT user_id, event_type,
         epoch(date_trunc('second', ts))::BIGINT AS es
  FROM events
),
v AS (SELECT user_id, min(es) AS e FROM e
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.es) AS e
      FROM e JOIN v ON v.user_id = e.user_id AND e.es > v.e
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.es) AS e
      FROM e JOIN c ON c.user_id = e.user_id AND e.es > c.e
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT (SELECT count(*) FROM v)::BIGINT AS n_view,
       (SELECT count(*) FROM c)::BIGINT AS n_click_after,
       (SELECT count(*) FROM p)::BIGINT AS n_purchase_after
"""

_SQL_DAILY_RECON = """
WITH ev AS (
  SELECT epoch(date_trunc('day', ts))::BIGINT AS day,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1
),
od AS (
  SELECT epoch(date_trunc('day', o_orderdate))::BIGINT AS day,
         count(*)::BIGINT AS n_orders
  FROM orders GROUP BY 1
)
SELECT coalesce(ev.day, od.day) AS day,
       coalesce(ev.n_events, 0)::BIGINT AS n_events,
       coalesce(od.n_orders, 0)::BIGINT AS n_orders
FROM ev FULL OUTER JOIN od ON od.day = ev.day
"""

_SQL_EVENTS_ROLLUP = """
WITH h AS (
  SELECT event_type, EXTRACT(hour FROM ts)::BIGINT AS hour,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
)
SELECT event_type, hour,
       count(*)::BIGINT AS n_events,
       sum(v_c)::BIGINT AS value_c
FROM h GROUP BY ROLLUP(event_type, hour)
"""

_SQL_GLOBAL_QUANTILES = """
SELECT 0.5::DOUBLE AS q, quantile_disc(value, 0.5) AS value FROM events
UNION ALL
SELECT 0.95::DOUBLE, quantile_disc(value, 0.95) FROM events
UNION ALL
SELECT 0.99::DOUBLE, quantile_disc(value, 0.99) FROM events
"""

_SQL_VALUE_MOMENTS = """
WITH c AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x_c
  FROM events
)
SELECT event_type, count(*)::BIGINT AS n,
       round(sum(x_c) / count(*) / 100.0, 6) AS mean_r,
       round((sum(x_c * x_c) * 1.0 / count(*)
              - (sum(x_c) * 1.0 / count(*))
                * (sum(x_c) * 1.0 / count(*))) / 10000.0, 6) AS var_r,
       round(sqrt((sum(x_c * x_c) * 1.0 / count(*)
                   - (sum(x_c) * 1.0 / count(*))
                     * (sum(x_c) * 1.0 / count(*))) / 10000.0), 6)
         AS std_r
FROM c GROUP BY event_type
"""

_SQL_USER_EVENT_LAG = """
WITH e AS (
  SELECT event_id, user_id,
         epoch(date_trunc('second', ts))::BIGINT AS es
  FROM events
)
SELECT event_id, user_id,
       row_number() OVER w::BIGINT AS seq,
       (es - lag(es) OVER w)::BIGINT AS gap_s
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
"""

_SQL_CURATION_PIPELINE = f"""
WITH qf AS (SELECT doc_id FROM ({_SQL_QUALITY_FILTER})),
ok AS (SELECT doc_id FROM ({_SQL_DECONTAMINATE_APPLY})),
surv AS (SELECT doc_id FROM qf INTERSECT SELECT doc_id FROM ok),
ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM documents
       WHERE doc_id IN (SELECT doc_id FROM surv)),
ln AS (
  SELECT doc_id, unnest(l) AS line,
         unnest(generate_series(1, len(l))) AS idx
  FROM ls
),
marked AS (
  SELECT doc_id, idx, line,
         CASE WHEN trim(line, ' ' || chr(9) || chr(13)) = '' THEN TRUE
              ELSE row_number() OVER (
                     PARTITION BY CASE
                       WHEN trim(line, ' ' || chr(9) || chr(13)) = ''
                       THEN NULL ELSE md5(line) END
                     ORDER BY doc_id, idx) = 1
         END AS kept
  FROM ln
),
ld AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_lines_in,
         (count(*) FILTER (WHERE kept))::BIGINT AS n_lines_kept,
         md5(coalesce(string_agg(line, chr(10) ORDER BY idx)
                      FILTER (WHERE kept), '')) AS cleaned_md5
  FROM marked GROUP BY doc_id
)
SELECT doc_id, n_lines_in, n_lines_kept, cleaned_md5,
       CAST(md5_number_lower('split:' || doc_id::VARCHAR) % 100
            AS BIGINT) AS bucket,
       CASE WHEN md5_number_lower('split:' || doc_id::VARCHAR) % 100 < 80
              THEN 'train'
            WHEN md5_number_lower('split:' || doc_id::VARCHAR) % 100 < 90
              THEN 'val'
            ELSE 'test' END AS split
FROM ld
"""

_SQL_SPLIT_ASSIGN = """
WITH b AS (
  SELECT doc_id,
         CAST(md5_number_lower('split:' || doc_id::VARCHAR) % 100
              AS BIGINT) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""

K_CAND_HYBRID = 10
# the IVF variant runs at a different candidate depth so the two hybrid
# entries are independent checks, not one result hashed twice
K_CAND_HYBRID_IVF = 12
HYBRID_IVF_CELLS = 8


def ensure_hashed_vec_store(sf_dir: str) -> str:
    """Materialize the corpus's hashed-tf-idf LONG-form vectors
    (doc_id, bucket, value) once as parquet — the sparse 'embedding
    store' the hybrid retrieval path joins against. Written by
    ``write_parquet`` streaming; idempotent via a _DONE marker."""
    vec_dir = f"{_SCRATCH}/spse_ray_hvec_{_sf_cache_key(sf_dir)}"
    marker = os.path.join(vec_dir, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(vec_dir, ignore_errors=True)
        ts.hashed_tfidf(read_docs(sf_dir)).write_parquet(vec_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return vec_dir


def q_hybrid_topk(sf_dir: str) -> pa.Table:
    """End-to-end HYBRID retrieval over one corpus (VERDICT r3 next #5;
    the reference's semantic-search capability, `embed.rs:44-78` +
    `qdrant.rs:70-96`, re-expressed with the deterministic
    public-knowledge featurizer): per text query, BM25 top-10 (lexical
    leg) fused with hashed-tf-idf sparse-cosine top-10 (vector leg,
    bucket-join inverted retrieval — no dense scan) by reciprocal-rank
    fusion; output the fused top-5."""
    from semantic_pdf_search_engine_ray.pipelines.rerank import (
        hybrid_sparse_rrf,
    )

    index_dir = ensure_index(sf_dir)
    vec_dir = ensure_hashed_vec_store(sf_dir)
    queries = derive_query_table(index_dir)
    return hybrid_sparse_rrf(
        index_dir, vec_dir, queries, k=TOP_K, k_cand=K_CAND_HYBRID,
        dim=ts.HASHED_TFIDF_DIM,
    )


def ensure_dense_vec_store(sf_dir: str) -> str:
    """Materialize the corpus's hashed-tf-idf DENSE round-6 vectors
    (doc_id, embedding list<float64>[dim]) once as parquet — the store
    the IVF-served hybrid leg builds its cell-partitioned index over.
    Values are the SAME half-away-rounded entries as the long form, so
    dense dot == bucket-join cosine exactly."""
    vec_dir = f"{_SCRATCH}/spse_ray_dvec_{_sf_cache_key(sf_dir)}"
    marker = os.path.join(vec_dir, "_DONE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(vec_dir, ignore_errors=True)
        ts.hashed_tfidf(read_docs(sf_dir), dense=True,
                        round6=True).write_parquet(vec_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return vec_dir


def q_hybrid_ivf_topk(sf_dir: str, nprobe: int | None = None,
                      scan_stats: dict | None = None) -> pa.Table:
    """The composed dense retrieval path (VERDICT r4 next #7): text
    query -> hashed-tf-idf dense vector -> cell-partitioned IVF probed
    cosine top-k_cand -> RRF fusion with BM25. At the default full probe
    (nprobe=None) the result is EXACTLY the brute-force hybrid, so the
    SQL oracle value-checks the whole composition; nprobe < n_cells is
    the scale configuration (probed-cells-only reads — pruning evidence
    pinned by tests/test_hybrid_ivf.py)."""
    from semantic_pdf_search_engine_ray.pipelines.rerank import (
        hybrid_ivf_rrf,
    )

    index_dir = ensure_index(sf_dir)
    dvec_dir = ensure_dense_vec_store(sf_dir)
    queries = derive_query_table(index_dir)
    return hybrid_ivf_rrf(
        index_dir, dvec_dir, queries, k=TOP_K, k_cand=K_CAND_HYBRID_IVF,
        dim=ts.HASHED_TFIDF_DIM, n_cells=HYBRID_IVF_CELLS, nprobe=nprobe,
        scan_stats=scan_stats,
    )


N_RECT_TERMS = 8
RECT_DOCS_PER_QUERY = 3
RECT_EXT = 40

from semantic_pdf_search_engine_ray.functions.geometry import (  # noqa: E402
    CHAR_W, LINE_COLS, LINE_H, PAGE_LINES,
)


def q_highlight_rects(sf_dir: str) -> pa.Table:
    """Render-ready page-geometry highlights (VERDICT r3 missing #2;
    the reference's `extract_char_bboxes` -> `PageHighlight` path,
    `webapp.rs:262-445`): for the first N_RECT_TERMS head terms, the
    3 lowest-doc_id exact-occurrence docs each yield merged highlight
    rects on the deterministic monospace grid (first occurrence + a
    40-char snippet window). Integer geometry — the SQL mirror
    recomputes every rect exactly (grid cells, whitespace breaks,
    same-line islands)."""
    from semantic_pdf_search_engine_ray.pipelines.search import (
        exact_highlight_rects,
    )

    import pyarrow.compute as pc

    index_dir = ensure_index(sf_dir)
    full = derive_query_table(index_dir)
    mask = pc.less(full.column("query_id"), N_RECT_TERMS)
    return exact_highlight_rects(
        documents_path(sf_dir), full.filter(mask),
        per_query=RECT_DOCS_PER_QUERY, ext=RECT_EXT,
    )


_SQL_HIGHLIGHT_RECTS = f"""
WITH {_TOKS_CTE},
rterms AS (
  SELECT r::BIGINT AS query_id, term FROM head WHERE r < {N_RECT_TERMS}
),
hits AS (
  SELECT t.query_id, d.doc_id,
         (strpos(d.text, t.term) - 1)::BIGINT AS pos,
         length(t.term)::BIGINT AS qlen,
         length(d.text)::BIGINT AS tlen,
         d.text
  FROM rterms t JOIN documents d ON strpos(d.text, t.term) > 0
),
sel AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY doc_id ASC) AS rn
    FROM hits
  ) WHERE rn <= {RECT_DOCS_PER_QUERY}
),
chars AS (
  SELECT query_id, doc_id, i,
         substr(text, i + 1, 1) AS ch,
         (i // {LINE_COLS})::BIGINT AS line,
         (i % {LINE_COLS})::BIGINT AS col
  FROM (
    SELECT *, unnest(generate_series(
        pos, least(pos + qlen + {RECT_EXT}, tlen) - 1)) AS i
    FROM sel)
),
ink AS (
  SELECT *, i - row_number() OVER (PARTITION BY query_id, doc_id
                                   ORDER BY i) AS grp
  FROM chars
  WHERE ch NOT IN (' ', chr(9), chr(13), chr(10))
),
islands AS (
  SELECT query_id, doc_id, line,
         min(i) AS i0, min(col) AS c0, count(*)::BIGINT AS n
  FROM ink GROUP BY query_id, doc_id, line, grp
)
SELECT query_id, doc_id,
       (row_number() OVER (PARTITION BY query_id, doc_id
                           ORDER BY i0) - 1)::BIGINT AS rect_idx,
       (line // {PAGE_LINES})::BIGINT AS page,
       (c0 * {CHAR_W})::BIGINT AS x,
       ((line % {PAGE_LINES}) * {LINE_H})::BIGINT AS y,
       (n * {CHAR_W})::BIGINT AS width,
       {LINE_H}::BIGINT AS height
FROM islands
ORDER BY query_id, doc_id, rect_idx
"""


def _sql_hybrid_topk(k_cand: int) -> str:
    """The hybrid-retrieval oracle, parameterized by per-leg candidate
    depth: BM25 top-k_cand FULL OUTER JOIN hashed-tf-idf cosine
    top-k_cand, RRF, fused top-TOP_K. Shared verbatim by hybrid_topk
    (sparse bucket-join vector leg) and hybrid_ivf_topk (dense IVF
    full-probe vector leg) — the two engine paths must produce the SAME
    values; only the physical plan differs."""
    return f"""
WITH {_TOKS_CTE},
qterms AS (
  SELECT r::BIGINT AS query_id, term FROM head
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, a.term FROM head a WHERE a.r < {N_HEAD_TERMS - 1}
  UNION ALL
  SELECT ({N_HEAD_TERMS} + a.r)::BIGINT, b.term
  FROM head a JOIN head b ON b.r = a.r + 1 WHERE a.r < {N_HEAD_TERMS - 1}
),
scores AS (
  SELECT qt.query_id, tf.doc_id, sum({_BM25_CONTRIB}) AS score
  FROM qterms qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
),
lex AS (
  SELECT query_id, doc_id, lrank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC)::BIGINT AS lrank
    FROM scores
  ) WHERE lrank <= {k_cand}
),
hvw AS (
  SELECT tf.doc_id,
         (md5_number_lower(tf.term) % {ts.HASHED_TFIDF_DIM})::BIGINT AS bucket,
         sum(tf.tf * ln(s.n_docs * 1.0 / df.df)) AS w
  FROM tf JOIN df USING (term) CROSS JOIN stats s
  GROUP BY tf.doc_id, bucket
),
hv AS (
  SELECT doc_id, bucket,
         round(w / sqrt(sum(w * w) OVER (PARTITION BY doc_id)), 6) AS value
  FROM hvw WHERE w != 0
),
qw AS (
  SELECT qt.query_id,
         (md5_number_lower(qt.term) % {ts.HASHED_TFIDF_DIM})::BIGINT AS bucket,
         sum(ln(s.n_docs * 1.0 / df.df)) AS w
  FROM (SELECT DISTINCT query_id, term FROM qterms) qt
  JOIN df USING (term) CROSS JOIN stats s
  GROUP BY qt.query_id, bucket
),
qvec AS (
  SELECT query_id, bucket,
         round(w / sqrt(sum(w * w) OVER (PARTITION BY query_id)), 6) AS qval
  FROM qw WHERE w != 0
),
cosim AS (
  SELECT q.query_id, h.doc_id, sum(h.value * q.qval) AS cos
  FROM qvec q JOIN hv h USING (bucket)
  GROUP BY q.query_id, h.doc_id
),
vec AS (
  SELECT query_id, doc_id, vrank FROM (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(cos, 6) DESC, doc_id ASC)::BIGINT AS vrank
    FROM cosim
  ) WHERE vrank <= {k_cand}
),
fused AS (
  SELECT coalesce(l.query_id, v.query_id) AS query_id,
         coalesce(l.doc_id, v.doc_id) AS doc_id,
         coalesce(1.0 / (60 + l.lrank), 0.0)
           + coalesce(1.0 / (60 + v.vrank), 0.0) AS rrf
  FROM lex l FULL OUTER JOIN vec v
    ON l.query_id = v.query_id AND l.doc_id = v.doc_id
)
SELECT query_id, rank, doc_id, rrf_r FROM (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf DESC, doc_id ASC)::BIGINT AS rank,
         round(rrf, 6) AS rrf_r
  FROM fused
) WHERE rank <= {TOP_K}
"""


_SQL_HYBRID_TOPK = _sql_hybrid_topk(K_CAND_HYBRID)
_SQL_HYBRID_IVF_TOPK = _sql_hybrid_topk(K_CAND_HYBRID_IVF)


QUERIES = {
    "doc_stats": q_doc_stats,
    "token_classes": q_token_classes,
    "quality": q_quality,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "winnow_fingerprint": q_winnow,
    "unigram_logprob": q_unigram_logprob,
    "bigram_logprob": q_bigram_logprob,
    "hashed_tfidf": q_hashed_tfidf,
    "source_cap_sample": q_source_cap,
    "hashed_text_dup": q_hashed_text_dup,
    "length_outliers": q_length_outliers,
    "source_token_kl": q_source_kl,
    "substring_search": q_substring_search,
    "regex_search": q_regex_search,
    "index_stats": q_index_stats,
    "term_df": q_term_df,
    "term_stats": q_term_stats,
    "bm25_topk": q_bm25_topk,
    "bm25_conjunctive": q_bm25_conjunctive,
    "bm25_prefix_topk": q_bm25_prefix,
    "spell_suggest": q_spell_suggest,
    "more_like_this": q_more_like_this,
    "bm25_lang_filtered": q_bm25_lang_filtered,
    "bm25_tombstoned": q_bm25_tombstoned,
    "facet_counts": q_facet_counts,
    "bm25_sharded": q_bm25_sharded,
    "bm25_prf_rerank": q_bm25_prf_rerank,
    "hybrid_topk": q_hybrid_topk,
    "hybrid_ivf_topk": q_hybrid_ivf_topk,
    "highlight_rects": q_highlight_rects,
    "phrase_topk": q_phrase_topk,
    "proximity_topk": q_proximity_topk,
    "bm25_chunks_topk": q_bm25_chunks,
    "chunks": q_chunks,
    "chunks_reconstruct": q_chunks_reconstruct,
    "normalize": q_normalize,
    "highlights": q_highlights,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_apply": q_dedup_apply,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "ann_brute_topk": q_ann_brute,
    "ann_ivf_topk": q_ann_ivf,
    "ann_ivf_pruned": q_ann_ivf_pruned,
    "events_window": q_events_window,
    "events_sessionize": q_sessionize,
    "dedup_components": q_dup_components,
    "dedup_apply_components": q_dedup_apply_components,
    "regex_features": q_regex_features,
    "tfidf_top_terms": q_tfidf_top_terms,
    "collocations_pmi": q_collocations_pmi,
    "sample_10pct": q_sample,
    "value_histogram": q_value_histogram,
    "value_quantiles": q_value_quantiles,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "csv_roundtrip": q_csv_roundtrip,
    "sample_stratified": q_stratified_sample,
    "pricing_summary": q_pricing_summary,
    "segment_revenue": q_segment_revenue,
    "asof_clicks": q_asof_clicks,
    "orders_no_lineitem": q_orders_no_lineitem,
    "profile_events": q_profile_events,
    "customers_with_orders": q_customers_with_orders,
    "interval_join_clicks": q_interval_join,
    "events_distinct_users": q_events_distinct,
    "events_sliding": q_events_sliding,
    "top_docs_per_source": q_top_docs_per_source,
    "multimodal_decode": q_multimodal_decode,
    "image_decode": q_image_decode,
    "audio_features": q_audio_features,
    "video_frame_sample": q_video_frames,
    "decontaminate": q_decontaminate,
    "gopher_repetition": q_gopher_repetition,
    "pii_redact": q_pii_redact,
    "heavy_hitter_terms": q_heavy_hitters,
    "token_pack": q_token_pack,
    "embedding_cluster_assign": q_cluster_assign,
    "semdedup_pairs": q_semdedup_pairs,
    "dedup_lines": q_dedup_lines,
    "global_line_dedup": q_global_line_dedup,
    "decontaminate_apply": q_decontaminate_apply,
    "quality_filter": q_quality_filter,
    "curation_report": q_curation_report,
    "bm25_must_not": q_bm25_must_not,
    "decontaminate_bloom": q_decontaminate_bloom,
    "link_degrees": q_link_degrees,
    "pagerank": q_pagerank,
    "hll_distinct_users": q_hll_distinct,
    "events_rollup": q_events_rollup,
    "value_moments": q_value_moments,
    "kmeans_lloyd": q_kmeans_lloyd,
    "global_quantiles": q_global_quantiles,
    "curation_pipeline": q_curation_pipeline,
    "lang_confusion": q_lang_confusion,
    "bm25_static_rank": q_bm25_static_rank,
    "hits_scores": q_hits_scores,
    "pagerank_seeded": q_pagerank_seeded,
    "triangle_count": q_triangle_count,
    "events_resampled": q_events_resampled,
    "daily_reconciliation": q_daily_reconciliation,
    "funnel_counts": q_funnel_counts,
    "retention_cohorts": q_retention_cohorts,
    "event_transitions": q_event_transitions,
    "substring_counts": q_substring_counts,
    "source_vocab_overlap": q_source_vocab_overlap,
    "vocab_overlap_thresholded": q_vocab_overlap_thresholded,
    "ngram_novelty": q_ngram_novelty,
    "trimmed_mean": q_trimmed_mean,
    "anomalous_days": q_anomalous_days,
    "late_order_priorities": q_late_order_priorities,
    "token_entropy": q_token_entropy,
    "vocab_growth": q_vocab_growth,
    "orders_per_customer": q_orders_per_customer,
    "skipgram_pmi": q_skipgram_pmi,
    "customer_value_deciles": q_customer_value_deciles,
    "weekday_profile": q_weekday_profile,
    "source_dup_rate": q_source_dup_rate,
    "props_field_stats": q_props_field_stats,
    "user_event_lag": q_user_event_lag,
    "local_supplier_revenue": q_local_supplier_revenue,
    "promo_revenue_share": q_promo_revenue,
    "revenue_forecast": q_revenue_forecast,
    "shipping_priority": q_shipping_priority,
    "split_assign": q_split_assign,
}

# normalize: the fixture's web text is verified-clean (the M1 normalizer
# is identity on every row), so the mirror pins md5 + char length of the
# raw text — any engine-side mangling of clean input breaks the hash.
_SQL_NORMALIZE = """
SELECT doc_id,
       md5(text) AS clean_md5,
       length(text)::BIGINT AS clean_chars
FROM documents
"""

# chunker coverage: concat(chunks) minus ASCII whitespace must equal the
# document minus ASCII whitespace (the splitter partitions the text into
# trimmed spans — nothing lost, nothing duplicated)
_SQL_CHUNKS_RECONSTRUCT = r"""
SELECT doc_id,
       md5(regexp_replace(text,
           '[\x{0009}-\x{000d}\x{001c}-\x{0020}\x{0085}\x{00a0}\x{1680}\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+',
           '', 'g')) AS recon_md5
FROM documents
"""

ORACLE_SQL = {
    "normalize": _SQL_NORMALIZE,
    "chunks_reconstruct": _SQL_CHUNKS_RECONSTRUCT,
    "doc_stats": _SQL_DOC_STATS,
    "token_classes": _SQL_TOKEN_CLASSES,
    "quality": _SQL_QUALITY,
    "lang_id": _SQL_LANG_ID,
    "fingerprint": _SQL_FINGERPRINT,
    "winnow_fingerprint": _SQL_WINNOW,
    "unigram_logprob": _SQL_UNIGRAM_LL,
    "bigram_logprob": _SQL_BIGRAM_LL,
    "hashed_tfidf": _SQL_HASHED_TFIDF,
    "source_cap_sample": _SQL_SOURCE_CAP,
    "hashed_text_dup": _SQL_HASHED_TEXT_DUP,
    "length_outliers": _SQL_LENGTH_OUTLIERS,
    "source_token_kl": _SQL_SOURCE_KL,
    "substring_search": _SQL_SUBSTRING,
    "regex_search": _SQL_REGEX_SEARCH,
    "index_stats": _SQL_INDEX_STATS,
    "term_df": _SQL_TERM_DF,
    "term_stats": _SQL_TERM_STATS,
    "bm25_topk": _SQL_BM25_TOPK,
    "bm25_conjunctive": _SQL_BM25_CONJ,
    "bm25_prefix_topk": _SQL_BM25_PREFIX,
    "spell_suggest": _SQL_SPELL_SUGGEST,
    "more_like_this": _SQL_MORE_LIKE_THIS,
    "bm25_lang_filtered": _SQL_BM25_LANG,
    "bm25_tombstoned": _SQL_BM25_TOMBSTONED,
    "facet_counts": _SQL_FACETS,
    "bm25_sharded": _SQL_BM25_TOPK,  # sharded must equal monolithic
    "bm25_prf_rerank": _SQL_BM25_PRF,
    "phrase_topk": _SQL_PHRASE_TOPK,
    "proximity_topk": _SQL_PROXIMITY_TOPK,
    "dedup_exact": _SQL_DEDUP_EXACT,
    "dedup_ngram_jaccard": _SQL_NGRAM_JACCARD,
    # LSH-vs-exact pairing caveat: with 128 perms / 32 bands x 4 rows the
    # probability of MISSING a true pair is (1-J^4)^32 — ~3e-9 at J=0.8,
    # 5e-15 at J=0.9, but ~13% at exactly J=0.5. The oracle pairing is
    # sound for corpora whose near-dup pairs sit well above the
    # threshold (all fixture sf dirs: every true pair has J >= 0.9, next
    # tier < 0.15); a corpus dense in J~0.5 pairs would need more bands
    # or a lower LSH operating point than the output threshold.
    "dedup_minhash_lsh": _SQL_NGRAM_JACCARD,
    "dedup_apply": _SQL_DEDUP_APPLY,
    "dedup_simhash": _SQL_SIMHASH,
    "dedup_embedding": _SQL_EMB_DUP,
    "ann_brute_topk": _SQL_ANN_BRUTE,
    # full-probe IVF over the cell-partitioned layout is exactly brute
    "ann_ivf_topk": _SQL_ANN_BRUTE,
    "events_window": _SQL_EVENTS_WINDOW,
    "events_sliding": _SQL_EVENTS_SLIDING,
    "events_sessionize": _SQL_SESSIONIZE,
    "dedup_components": _SQL_DUP_COMPONENTS,
    "dedup_apply_components": _SQL_DEDUP_APPLY_COMPONENTS,
    "regex_features": _SQL_REGEX_FEATURES,
    "tfidf_top_terms": _SQL_TFIDF_TOP,
    "collocations_pmi": _SQL_COLLOCATIONS,
    "sample_10pct": _SQL_SAMPLE,
    "value_histogram": _SQL_VALUE_HISTOGRAM,
    "value_quantiles": _SQL_VALUE_QUANTILES,
    "jsonl_roundtrip": _SQL_JSONL_ROUNDTRIP,
    "csv_roundtrip": _SQL_JSONL_ROUNDTRIP,
    "sample_stratified": _SQL_STRATIFIED_SAMPLE,
    "pricing_summary": _SQL_PRICING_SUMMARY,
    "segment_revenue": _SQL_SEGMENT_REVENUE,
    "asof_clicks": _SQL_ASOF_CLICKS,
    "orders_no_lineitem": _SQL_ORDERS_NO_LINEITEM,
    "profile_events": _SQL_PROFILE_EVENTS,
    "customers_with_orders": _SQL_CUSTOMERS_WITH_ORDERS,
    "interval_join_clicks": _SQL_INTERVAL_JOIN,
    "events_distinct_users": _SQL_EVENTS_DISTINCT,
    "top_docs_per_source": _SQL_TOP_DOCS_PER_SOURCE,
    "multimodal_decode": _SQL_MULTIMODAL,
    "image_decode": _SQL_IMAGE_DECODE,
    "audio_features": _SQL_AUDIO_FEATURES,
    "video_frame_sample": _SQL_VIDEO_FRAMES,
    "decontaminate": _SQL_DECONTAMINATE,
    "gopher_repetition": _SQL_GOPHER,
    "pii_redact": _SQL_PII_REDACT,
    "heavy_hitter_terms": _SQL_HEAVY_HITTERS,
    "token_pack": _SQL_TOKEN_PACK,
    "embedding_cluster_assign": _SQL_CLUSTER_ASSIGN,
    "semdedup_pairs": _SQL_SEMDEDUP,
    "dedup_lines": _SQL_DEDUP_LINES,
    "global_line_dedup": _SQL_GLOBAL_LINE_DEDUP,
    "decontaminate_apply": _SQL_DECONTAMINATE_APPLY,
    "quality_filter": _SQL_QUALITY_FILTER,
    "curation_report": _SQL_CURATION_REPORT_TMPL.format(
        quality_filter_sql=_SQL_QUALITY_FILTER
    ),
    "bm25_must_not": _SQL_BM25_MUST_NOT,
    "decontaminate_bloom": _SQL_DECONTAMINATE,
    "link_degrees": _GRAPH_DEGREE_SQL,
    "pagerank": _GRAPH_PAGERANK_SQL,
    "hll_distinct_users": _HLL_SQL,
    "events_rollup": _SQL_EVENTS_ROLLUP,
    "value_moments": _SQL_VALUE_MOMENTS,
    "kmeans_lloyd": _SQL_KMEANS,
    "global_quantiles": _SQL_GLOBAL_QUANTILES,
    "curation_pipeline": _SQL_CURATION_PIPELINE,
    "lang_confusion": _SQL_LANG_CONFUSION,
    "bm25_static_rank": _SQL_BM25_STATIC_RANK,
    "hybrid_topk": _SQL_HYBRID_TOPK,
    "hybrid_ivf_topk": _SQL_HYBRID_IVF_TOPK,
    "highlight_rects": _SQL_HIGHLIGHT_RECTS,
    "hits_scores": _SQL_HITS,
    "pagerank_seeded": _SQL_PAGERANK_SEEDED,
    "triangle_count": _SQL_TRIANGLES,
    "events_resampled": _SQL_EVENTS_RESAMPLED,
    "daily_reconciliation": _SQL_DAILY_RECON,
    "funnel_counts": _SQL_FUNNEL,
    "retention_cohorts": _SQL_RETENTION,
    "event_transitions": _SQL_TRANSITIONS,
    "substring_counts": _SQL_SUBSTRING_COUNTS,
    "source_vocab_overlap": _SQL_VOCAB_OVERLAP,
    "vocab_overlap_thresholded": _SQL_VOCAB_OVERLAP_T,
    "ngram_novelty": _SQL_NGRAM_NOVELTY,
    "trimmed_mean": _SQL_TRIMMED_MEAN,
    "anomalous_days": _SQL_ANOMALOUS_DAYS,
    "late_order_priorities": _SQL_LATE_ORDER_PRIORITIES,
    "token_entropy": _SQL_TOKEN_ENTROPY,
    "vocab_growth": _SQL_VOCAB_GROWTH,
    "orders_per_customer": _SQL_ORDERS_PER_CUSTOMER,
    "skipgram_pmi": _SQL_SKIPGRAM_PMI,
    "customer_value_deciles": _SQL_CUSTOMER_DECILES,
    "weekday_profile": _SQL_WEEKDAY_PROFILE,
    "source_dup_rate": _SQL_SOURCE_DUP_RATE,
    "props_field_stats": _SQL_PROPS_STATS,
    "user_event_lag": _SQL_USER_EVENT_LAG,
    "local_supplier_revenue": _SQL_LOCAL_SUPPLIER_REVENUE,
    "promo_revenue_share": _SQL_PROMO_REVENUE,
    "revenue_forecast": _SQL_REVENUE_FORECAST,
    "shipping_priority": _SQL_SHIPPING_PRIORITY,
    "split_assign": _SQL_SPLIT_ASSIGN,
    # pruned IVF runs with pinned centroids so DuckDB can rebuild the
    # quantizer — a full value oracle despite the approximate probe
    "ann_ivf_pruned": _SQL_ANN_IVF_PRUNED,
    # rows-only (non-SQL-expressible): chunks, highlights,
    # bm25_chunks_topk (chunk boundaries are the TextSplitter algorithm;
    # pure-Python value oracles in tests/ + the chunks_reconstruct md5
    # oracle pins coverage)
}
