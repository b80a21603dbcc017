"""Document deletion for a committed index: tombstones + purge.

The reference can only drop EVERYTHING (`delete_all_collections`,
`/root/reference/src/qdrant.rs:44-57` -> our fresh_dir rebuild, S6);
a durable web-scale index needs doc-granular deletion. This module
implements the Lucene two-phase contract:

1. ``delete_documents`` appends doc_ids to ``<index>/tombstones/`` —
   an O(|deleted|) metadata write, no index rewrite. Readers load the
   tombstone mask at startup (stages/query._load_tombstone_mask):
   deleted docs never RANK, but corpus stats (N, avgdl, df) stay
   frozen, so surviving docs keep bit-identical scores.
2. ``purge_deleted`` rebuilds into a fresh directory from the index's
   own docs store minus the tombstoned rows, recomputing stats — the
   result is bit-identical to an index built from the filtered corpus
   (pytest-pinned), and the old directory stays valid until the new
   manifest commits (same crash-safety shape as sharding.compact_shards).
"""

from __future__ import annotations

import os
from collections.abc import Iterable

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from semantic_pdf_search_engine_ray.config import EngineConfig


def delete_documents(index_dir: str, doc_ids: Iterable[int]) -> int:
    """Tombstone ``doc_ids`` in a committed index. Appends one numbered
    parquet file (atomic tmp+rename); ids already tombstoned are written
    again harmlessly (the reader mask is idempotent). Returns the number
    of ids written."""
    ids = sorted(set(int(d) for d in doc_ids))
    if not ids:
        return 0
    tdir = os.path.join(index_dir, "tombstones")
    os.makedirs(tdir, exist_ok=True)
    # max(existing)+1, not a file count: a gap in the sequence (crash
    # cleanup, manual removal) must never make a new tombstone file
    # os.replace over an old one — that would silently un-delete docs.
    existing = [
        int(f[len("del_"):-len(".parquet")])
        for f in os.listdir(tdir)
        if f.startswith("del_") and f.endswith(".parquet")
        and f[len("del_"):-len(".parquet")].isdigit()
    ]
    seq = max(existing, default=-1) + 1
    final = os.path.join(tdir, f"del_{seq:05d}.parquet")
    tmp = final + ".tmp"
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, type=pa.int64())}), tmp
    )
    os.replace(tmp, final)
    return len(ids)


def load_tombstones(index_dir: str) -> list[int]:
    """All tombstoned doc_ids (sorted, deduped); [] when none."""
    tdir = os.path.join(index_dir, "tombstones")
    if not os.path.isdir(tdir):
        return []
    out: set[int] = set()
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".parquet"):
            out.update(
                pq.read_table(os.path.join(tdir, f), columns=["doc_id"])
                .column("doc_id").to_pylist()
            )
    return sorted(out)


def purge_deleted(
    index_dir: str,
    out_dir: str,
    cfg: EngineConfig | None = None,
) -> dict:
    """Rebuild ``index_dir`` minus its tombstoned docs into ``out_dir``
    with RECOMPUTED stats (N, avgdl, df shrink to the surviving corpus).
    Streams the docs store through the normal distributed build — the
    tombstone set rides along as a broadcast-joined filter, never a
    driver-side pass over the corpus."""
    from semantic_pdf_search_engine_ray.pipelines.build import (
        build_index_from_docs,
    )

    cfg = cfg or EngineConfig()
    dead = load_tombstones(index_dir)
    docs = rd.read_parquet(os.path.join(index_dir, "docs"))
    docs = docs.drop_columns(
        [c for c in ("doc_len",) if c in docs.schema().names]
    )
    if dead:
        removals = rd.from_arrow(
            pa.table({"doc_id": pa.array(dead, type=pa.int64())})
        )
        docs = docs.join(removals, "left_anti", 8, on=("doc_id",))
    return build_index_from_docs(
        docs, out_dir, cfg,
        input_lineage={"purged_from": os.path.abspath(index_dir),
                       "n_tombstones": len(dead)},
    )
