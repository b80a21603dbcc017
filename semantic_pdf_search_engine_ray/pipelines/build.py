"""Index build pipeline — the Ray-Data re-expression of the reference's
ingest chain (`/root/reference/src/bin/app/handlers/upload.rs:78-87`
``process_file``: extract_and_chunk -> get_embeddings -> store_embeddings).

    read_parquet(pages)
      -> map_batches(ExtractHtml)                [stateless, Arrow]
      -> dedup by url keep max warc_ts + deterministic doc_id (sorted rank)
      -> write docs store (checkpointed)
      -> map_batches(TokenizePostings)           [vectorized]
      -> sort(term, doc_id)                      [THE shuffle]
      -> map_batches(EncodeBlocks)               [delta+varint blocks]
      -> write postings + dictionary + atomic manifest

Every stage directory is checkpointed with lineage + metrics
(state/manifest.py); re-running build() on a half-finished index resumes
at the first incomplete stage.

Scale notes (10^12-doc design):
- doc_id = rank of url under the global (url, warc_ts) sort. The sort is
  the determinism anchor (SURVEY.md §7); ``doc_id_mode="hash"`` is the
  documented escape hatch that trades rank-density for a sort-free build.
- the dedup + rank assignment needs only one sort: block metadata (first/
  last url per block) is collected driver-side (tiny: one row per block)
  and offsets broadcast back into a second map over the SAME materialized
  blocks.
- postings carry ``dl`` so no doc-length broadcast is needed at encode.
- hot terms (sampled df) get a salt column; in sort mode the range
  partitioner splits them anyway, in groupby mode the salt bounds group
  size (north-rule skew handling).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from semantic_pdf_search_engine_ray.config import EngineConfig
from semantic_pdf_search_engine_ray.stages.extract import ExtractHtml
from semantic_pdf_search_engine_ray.stages.postings import (
    AddDocLen,
    TokenizePostings,
)
from semantic_pdf_search_engine_ray.stages.encode import (
    EncodeBlocks,
    encode_group_factory,
    make_salter,
)
from semantic_pdf_search_engine_ray.state import manifest as mf


# --------------------------------------------------------------------------
# dedup-by-url + deterministic doc_id (rank under url sort)
# --------------------------------------------------------------------------

def _block_meta(batch: pa.Table) -> pa.Table:
    """Per sorted block: boundary urls + distinct-url count."""
    urls = batch.column("url").to_numpy(zero_copy_only=False)
    n_distinct = int((urls[1:] != urls[:-1]).sum()) + 1 if len(urls) else 0
    return pa.table(
        {
            "first_url": [urls[0] if len(urls) else ""],
            "last_url": [urls[-1] if len(urls) else ""],
            "n_rows": [len(urls)],
            "n_distinct": [n_distinct],
        }
    )


def assign_doc_ids(extracted: rd.Dataset) -> rd.Dataset:
    """Dedup rows by url (keep max warc_ts) and assign
    ``doc_id = global rank of url`` (deterministic across parallelism).

    Exact-dedup semantics the reference lacks (re-upload double-indexes
    under a fresh uuid, `qdrant.rs:48`) — SURVEY.md §2.6 A5. Input
    contract: (url, warc_ts) pairs unique.
    """
    sorted_ds = extracted.sort(["url", "warc_ts"]).materialize()

    meta = sorted_ds.map_batches(
        _block_meta, batch_format="pyarrow", batch_size=None
    ).take_all()
    meta = [m for m in meta if m["n_rows"] > 0]
    meta.sort(key=lambda m: (m["first_url"], m["last_url"]))

    # kept-in-block counts: subtract 1 when the block's last url continues
    # into the next block (that url is kept in its final block only)
    offsets: dict[tuple, tuple[int, bool]] = {}
    running = 0
    for i, m in enumerate(meta):
        continued = (
            i + 1 < len(meta) and meta[i + 1]["first_url"] == m["last_url"]
        )
        key = (m["first_url"], m["last_url"], m["n_rows"], m["n_distinct"])
        offsets[key] = (running, continued)
        running += m["n_distinct"] - (1 if continued else 0)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("doc_id", pa.array([], type=pa.int64()))
        urls = batch.column("url").to_numpy(zero_copy_only=False)
        key = (
            urls[0],
            urls[-1],
            len(urls),
            int((urls[1:] != urls[:-1]).sum()) + 1,
        )
        offset, continued = offsets[key]
        # keep the LAST row of each url run (max warc_ts after the sort)
        is_last_of_url = np.concatenate((urls[1:] != urls[:-1], [True]))
        if continued:
            is_last_of_url[-1] = False  # kept in a later block instead
        kept = batch.filter(pa.array(is_last_of_url))
        ranks = offset + np.arange(kept.num_rows, dtype=np.int64)
        return kept.append_column("doc_id", pa.array(ranks, type=pa.int64()))

    return sorted_ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# hot-term detection (sample-based, driver-side, broadcast into the salter)
# --------------------------------------------------------------------------

def detect_hot_terms(docs_dir: str, cfg: EngineConfig) -> set[str]:
    """Estimate head terms from a doc sample (df_sample/n >= threshold)."""
    from semantic_pdf_search_engine_ray.functions.tokenize import tokenize

    sample = (
        rd.read_parquet(docs_dir, columns=["text"])
        .limit(cfg.hot_term_sample)
        .take_all()
    )
    if not sample:
        return set()
    df: dict[str, int] = {}
    for row in sample:
        for t in set(tokenize(row["text"])):
            df[t] = df.get(t, 0) + 1
    n = len(sample)
    return {t for t, c in df.items() if c / n >= cfg.hot_df_threshold}


# --------------------------------------------------------------------------
# build
# --------------------------------------------------------------------------

def build_index_from_docs(
    docs_ds: rd.Dataset,
    index_dir: str,
    cfg: EngineConfig | None = None,
    *,
    input_lineage: dict | None = None,
    shuffle_mode: str = "sort",
) -> dict:
    """Build an index from a docs dataset with (doc_id, text [, url, ...]).

    shuffle_mode: "sort" (default; global (term, doc_id) range sort, hot
    terms split naturally at range boundaries) or "groupby_salt" (explicit
    groupby((term, salt)) with doc_id-range salting of sampled hot terms).
    Both produce the same decoded index (tests/test_salting.py).
    """
    cfg = cfg or EngineConfig()
    os.makedirs(index_dir, exist_ok=True)
    lineage_base = {
        "input": input_lineage or {},
        "params": cfg.manifest_params(),
    }
    stage_metrics: dict[str, dict] = {}

    # -- stage: docs store ---------------------------------------------------
    docs_ck = mf.StageCheckpoint(index_dir, "docs", {**lineage_base, "stage": "docs"})
    if not docs_ck.is_complete():
        out = docs_ck.fresh_dir()
        docs_ds.map_batches(
            AddDocLen(), batch_format="pyarrow"
        ).write_parquet(out)
        stage_metrics["docs"] = docs_ck.commit()
    else:
        stage_metrics["docs"] = mf.load_stage_entry(index_dir, "docs")
    docs_dir = os.path.join(index_dir, "docs")

    # -- global stats (cheap columnar read) ----------------------------------
    stats = (
        rd.read_parquet(docs_dir, columns=["doc_len"])
        .aggregate(Sum("doc_len", alias_name="total_tokens"),
                   Count(alias_name="n_docs"))
    )
    n_docs = int(stats["n_docs"])
    total_tokens = int(stats["total_tokens"] or 0)
    avgdl = total_tokens / n_docs if n_docs else 0.0

    # -- stage: postings (tokenize -> shuffle -> encode) ---------------------
    post_ck = mf.StageCheckpoint(
        index_dir,
        "postings",
        {**lineage_base, "stage": "postings", "shuffle_mode": shuffle_mode,
         "n_docs": n_docs, "total_tokens": total_tokens},
    )
    hot_terms: set[str] = set()
    if not post_ck.is_complete():
        out = post_ck.fresh_dir()
        t0 = time.monotonic()
        postings = rd.read_parquet(
            docs_dir, columns=["doc_id", "text", "doc_len"]
        ).map_batches(
            TokenizePostings(),
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
        )
        encoder = EncodeBlocks(cfg.k1, cfg.b, avgdl, cfg.block_size)
        if shuffle_mode == "sort":
            blocks = postings.sort(["term", "doc_id"]).map_batches(
                encoder, batch_format="pyarrow", batch_size=None
            )
        elif shuffle_mode == "groupby_salt":
            hot_terms = detect_hot_terms(docs_dir, cfg)
            salted = postings.map_batches(
                make_salter(hot_terms, n_docs, cfg.salt_buckets),
                batch_format="pyarrow",
            )
            blocks = salted.groupby(["term", "salt"]).map_groups(
                encode_group_factory(cfg.k1, cfg.b, avgdl, cfg.block_size),
                batch_format="pyarrow",
            )
        else:
            raise ValueError(f"unknown shuffle_mode {shuffle_mode!r}")
        blocks.write_parquet(out)
        stage_metrics["postings"] = post_ck.commit(
            extra_metrics={
                "shuffle_mode": shuffle_mode,
                "hot_terms": sorted(hot_terms),
                "encode_wall_ms": round((time.monotonic() - t0) * 1000, 1),
            }
        )
    else:
        stage_metrics["postings"] = mf.load_stage_entry(index_dir, "postings")

    # -- stage: dictionary (term -> df over all blocks) ----------------------
    dict_ck = mf.StageCheckpoint(
        index_dir, "dictionary", {**lineage_base, "stage": "dictionary"}
    )
    if not dict_ck.is_complete():
        out = dict_ck.fresh_dir()
        (
            rd.read_parquet(
                os.path.join(index_dir, "postings"), columns=["term", "n_docs"]
            )
            .groupby("term")
            .aggregate(Sum("n_docs", alias_name="df"),
                       Count(alias_name="n_blocks"))
            .write_parquet(out)
        )
        stage_metrics["dictionary"] = dict_ck.commit()
    else:
        stage_metrics["dictionary"] = mf.load_stage_entry(index_dir, "dictionary")

    # -- atomic manifest commit ----------------------------------------------
    payload = {
        "build_id": mf.fingerprint(lineage_base),
        "params": cfg.manifest_params(),
        "n_docs": n_docs,
        "total_tokens": total_tokens,
        "avgdl": avgdl,
        "stages": stage_metrics,
    }
    mf.commit_manifest(index_dir, payload)
    return payload


def build_index_from_pages(
    pages_path: str | list[str],
    index_dir: str,
    cfg: EngineConfig | None = None,
    shuffle_mode: str = "sort",
) -> dict:
    """Full pipeline from a Common-Crawl-style pages parquet table."""
    cfg = cfg or EngineConfig()
    pages = rd.read_parquet(
        pages_path, columns=["url", "warc_ts", "html", "lang"]
    )
    extracted = pages.map_batches(
        ExtractHtml(cfg.remove_headers),
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
    )
    docs = assign_doc_ids(extracted)
    return build_index_from_docs(
        docs,
        index_dir,
        cfg,
        input_lineage={"pages_path": pages_path},
        shuffle_mode=shuffle_mode,
    )
