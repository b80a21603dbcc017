"""Engine configuration — every tunable pinned in one place.

BM25 parameters and analyzer behavior are part of the index format: they
are recorded in the index manifest at build time and re-validated at
query time (the reference pins the analogous invariant by routing build
and query through one shared model singleton, ``embed.rs:17-42``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def scratch_root() -> str:
    """Node-local scratch for derived caches / spill (NOT durable output).

    Prefers RAM-backed tmpfs (``/dev/shm``) when present so cache
    rebuilds and intermediate checkpoints are never bottlenecked on — or
    contended with — the data disk; on a real cluster every node has its
    own tmpfs, and everything written here is derivable, so losing it
    only costs a rebuild. Override with ``$SPSE_SCRATCH``.
    """
    env = os.environ.get("SPSE_SCRATCH")
    if env:
        os.makedirs(env, exist_ok=True)
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        p = os.path.join(shm, "spse")
        os.makedirs(p, exist_ok=True)
        return p
    import tempfile

    p = os.path.join(tempfile.gettempdir(), "spse")
    os.makedirs(p, exist_ok=True)
    return p


# Analyzer: lowercase + maximal [a-z0-9]+ runs. Chosen to be expressible
# identically in Python, numpy, and DuckDB (`regexp_extract_all(lower(text),
# '[a-z0-9]+')`) so the SQL oracle can replicate the engine bit-for-bit.
TOKEN_PATTERN = r"[a-z0-9]+"


@dataclass
class EngineConfig:
    # ---- BM25 scoring (pinned; written to the manifest) ----
    k1: float = 1.5
    b: float = 0.75
    # idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  — always positive
    # (Lucene-style), which block-max WAND requires for monotone bounds.

    # ---- posting-list layout ----
    block_size: int = 128           # docs per posting block (delta+varint coded)

    # ---- shuffle / skew ----
    salt_buckets: int = 8           # sub-groups a hot term is split into
    hot_term_sample: int = 2048     # docs sampled to estimate head terms
    hot_df_threshold: float = 0.25  # sample-df fraction above which a term is "hot"

    # ---- resumable (two-phase) build ----
    num_partitions: int = 32        # term-hash partitions (resume granularity).
    # At 100 TB this scales up (e.g. 64k) so each partition's postings fit in
    # one encode task's heap (~256 MB target).

    # ---- stage sizing ----
    extract_batch_size: int = 256   # html docs per extract batch (large payloads)
    tokenize_batch_size: int = 512
    query_batch_size: int = 64      # queries per batch through the query actors
    query_concurrency: int = 4      # query actor pool size

    # ---- query defaults ----
    top_k: int = 5                  # reference default: qdrant.rs:88 (limit 5)

    # ---- extraction ----
    remove_headers: bool = False    # M3 section-header removal (off for web text)

    # Bump when the on-disk index layout changes: it flows into every
    # stage-lineage fingerprint, so stale cached indexes rebuild instead
    # of being silently reused across code versions.
    INDEX_FORMAT_VERSION = 2

    def manifest_params(self) -> dict:
        return {
            "format": self.INDEX_FORMAT_VERSION,
            "k1": self.k1,
            "b": self.b,
            "block_size": self.block_size,
            "token_pattern": TOKEN_PATTERN,
            "salt_buckets": self.salt_buckets,
            # part of the on-disk layout: a resumed encode must never mix
            # part files from two different partition counts
            "num_partitions": self.num_partitions,
        }
