"""Index build pipeline — the Ray-Data re-expression of the reference's
ingest chain (`/root/reference/src/bin/app/handlers/upload.rs:78-87`
``process_file``: extract_and_chunk -> get_embeddings -> store_embeddings).

    read_parquet(pages)
      -> map_batches(ExtractHtml)                [stateless, Arrow]
      -> dedup by url keep max warc_ts + deterministic doc_id (sorted rank)
      -> write docs store (checkpointed)
      -> map_batches(TokenizePostings)           [vectorized]
      -> THE shuffle (default "hash_partition"): term-hash bucket spill
         (hot terms salted by doc range) -> per-bucket local sort+encode
      -> write postings + dictionary + atomic manifest

Every stage directory is checkpointed with lineage + metrics
(state/manifest.py); re-running build() on a half-finished index resumes
at the first incomplete stage — including between the partition spill
and the encode (mid-shuffle resume, tests/test_hash_partition.py).

Scale notes (10^12-doc design):
- doc_id = rank of url under the global (url, warc_ts) sort — the
  determinism anchor (SURVEY.md §7): identical ids at any parallelism.
- the dedup + rank assignment needs only one sort: block metadata (first/
  last url per block) is collected driver-side (tiny: one row per block)
  and offsets broadcast back into a second map over the SAME materialized
  blocks.
- postings carry ``dl`` so no doc-length broadcast is needed at encode.
- hot terms (sampled df) are salted by contiguous doc range so one
  Zipf head term spreads over ``salt_buckets`` partitions and its
  sub-lists concatenate back in doc order (north-rule skew handling);
  ``num_partitions`` scales with corpus so each encode task's bucket
  fits in one worker heap.
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
    """Per sorted block: boundary (url, warc_ts) rows + distinct-url count.

    The boundary includes warc_ts because (url, warc_ts) pairs are unique
    (input contract) while urls alone are not: a url duplicated across
    more whole blocks than one would make url-only block keys collide and
    silently mis-assign ranks."""
    urls = batch.column("url").to_numpy(zero_copy_only=False)
    ts = batch.column("warc_ts").cast(pa.int64()).to_numpy()
    n_distinct = int((urls[1:] != urls[:-1]).sum()) + 1 if len(urls) else 0
    return pa.table(
        {
            "first_url": [urls[0] if len(urls) else ""],
            "first_ts": pa.array([int(ts[0]) if len(ts) else 0],
                                 type=pa.int64()),
            "last_url": [urls[-1] if len(urls) else ""],
            "last_ts": pa.array([int(ts[-1]) if len(ts) else 0],
                                type=pa.int64()),
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

    Scale note: this is the build's ONE all-to-all (a global url sort)
    and its ``materialize()`` pins the extracted corpus in the object
    store — acceptable for per-shard builds (the sharded path builds
    each shard independently, so the sort never spans the whole corpus)
    but not for a single 10^12-doc monolith. For that case use
    ``assign_doc_ids_sampled`` below — sampled-boundary rank assignment
    with the same output contract (bit-identity pinned by
    tests/test_build_query.py), no global sort, no corpus-sized
    materialize.
    """
    sorted_ds = extracted.sort(["url", "warc_ts"]).materialize()

    meta = sorted_ds.map_batches(
        _block_meta, batch_format="pyarrow", batch_size=None
    ).take_all()
    meta = [m for m in meta if m["n_rows"] > 0]
    # (first_url, first_ts) is a unique row -> unambiguous total order
    meta.sort(key=lambda m: (m["first_url"], m["first_ts"]))

    # kept-in-block counts: subtract 1 when the block's last url continues
    # into the next block (that url is kept in its final block only)
    offsets: dict[tuple, tuple[int, bool]] = {}
    running = 0
    for i, m in enumerate(meta):
        continued = (
            i + 1 < len(meta) and meta[i + 1]["first_url"] == m["last_url"]
        )
        key = (m["first_url"], m["first_ts"], m["last_url"], m["last_ts"])
        offsets[key] = (running, continued)
        running += m["n_distinct"] - (1 if continued else 0)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("doc_id", pa.array([], type=pa.int64()))
        urls = batch.column("url").to_numpy(zero_copy_only=False)
        ts = batch.column("warc_ts").cast(pa.int64()).to_numpy()
        key = (urls[0], int(ts[0]), urls[-1], int(ts[-1]))
        offset, continued = offsets[key]
        # keep the LAST row of each url run (max warc_ts after the sort)
        is_last_of_url = np.concatenate((urls[1:] != urls[:-1], [True]))
        if continued:
            is_last_of_url[-1] = False  # kept in a later block instead
        kept = batch.filter(pa.array(is_last_of_url))
        ranks = offset + np.arange(kept.num_rows, dtype=np.int64)
        return kept.append_column("doc_id", pa.array(ranks, type=pa.int64()))

    return sorted_ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


# boundary-sample cap per batch: the driver's sample is bounded by
# this x blocks regardless of corpus size (boundaries only affect range
# BALANCE, never output values, so aggressive decimation is safe)
_SAMPLE_PER_BATCH = 64


def assign_doc_ids_sampled(
    extracted: rd.Dataset,
    spill_dir: str | None = None,
    n_ranges: int = 32,
) -> rd.Dataset:
    """Same output contract as ``assign_doc_ids`` (dedup by url keeping
    max warc_ts; ``doc_id`` = global url rank) WITHOUT a global sort or
    a corpus-sized ``materialize()`` — the monolith-scale path the
    sort-based docstring promises.

    Terasort-style plan; the output is boundary-INVARIANT (doc_id
    depends only on the global url order, never on where the range cuts
    land), which is what makes the bit-identity test against the sort
    path meaningful:

    1. ONE pass over ``extracted`` (extraction is the expensive stage;
       it never re-runs): each batch is spilled verbatim to parquet and
       returns a BOUNDED url sample — hash-subsampled, then capped to
       {_SAMPLE_PER_BATCH} evenly spaced picks per batch, so the driver
       holds at most {_SAMPLE_PER_BATCH} x blocks strings no matter how
       large the corpus. Boundary quality only affects range balance,
       never the output (see boundary-invariance above);
    2. a cheap second pass over the SPILLED parquet partitions rows
       into per-range dirs (url ranges, so every copy of a url lands
       in ONE range — dedup stays range-local);
    3. per range (parallel Ray tasks): Arrow-sort by (url, warc_ts),
       keep the last row of each url run, write back with a range-local
       rank; the task returns only its kept-doc COUNT;
    4. prefix-sum the ``n_ranges`` counts on the driver (tiny) and add
       ``doc_id = range_offset + local_rank`` in a streaming pass.

    Nothing corpus-sized ever sits in the object store or on the
    driver: each range is one worker's sort, and the driver handles
    ``n_ranges`` integers plus the capped sample. ``spill_dir`` holds
    the intermediate parquet (caller-owned; a /tmp dir is created when
    not given — at cluster scale point this at the job's scratch
    filesystem)."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    import ray

    from semantic_pdf_search_engine_ray.functions.shingle import (
        stable_hash64,
    )

    if spill_dir is None:
        from semantic_pdf_search_engine_ray.config import scratch_root
        spill_dir = tempfile.mkdtemp(prefix="spse_docid_spill_",
                                     dir=scratch_root())
    raw_all = os.path.join(spill_dir, "raw_all")
    raw_dir = os.path.join(spill_dir, "raw")
    dedup_dir = os.path.join(spill_dir, "dedup")
    for d in (raw_all, raw_dir, dedup_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    def _content_name(batch: pa.Table) -> str:
        """Deterministic per-batch filename: a retried task rewrites the
        SAME file (tmp+rename), so task retries can never duplicate
        rows — the EncodePartitionToFile idempotency discipline."""
        import hashlib

        h = hashlib.md5()
        h.update("\x00".join(batch.column("url").to_pylist()).encode())
        h.update(batch.column("warc_ts").cast(pa.int64())
                 .to_numpy().tobytes())
        return h.hexdigest()

    def _write_idempotent(batch: pa.Table, out_dir: str) -> None:
        final = os.path.join(out_dir, f"{_content_name(batch)}.parquet")
        tmp = final + f".tmp.{os.getpid()}"
        pq.write_table(batch, tmp)
        os.replace(tmp, final)

    def spill_and_sample(batch: pa.Table) -> pa.Table:
        """The single extraction-consuming pass: batch -> parquet, plus
        a bounded url sample back to the driver."""
        if batch.num_rows:
            _write_idempotent(batch, raw_all)
        urls = sorted(
            u for u in set(batch.column("url").to_pylist())
            if stable_hash64(u) % 64 == 0
        )
        if len(urls) > _SAMPLE_PER_BATCH:  # evenly spaced decimation
            step = len(urls) / _SAMPLE_PER_BATCH
            urls = [urls[int(i * step)] for i in range(_SAMPLE_PER_BATCH)]
        return pa.table({"url": pa.array(urls, type=pa.string())})

    sample: set[str] = set()
    for part in ray.get(
        extracted.map_batches(spill_and_sample, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        if "url" in part.schema.names:
            sample.update(part.column("url").to_pylist())
    ordered = sorted(sample)
    bounds = [
        ordered[i * len(ordered) // n_ranges]
        for i in range(1, n_ranges)
    ] if ordered else []
    bounds_arr = np.array(bounds, dtype=object)

    def spill_ranges(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_numpy(zero_copy_only=False)
        rng = np.searchsorted(bounds_arr, urls, side="right") \
            if len(bounds_arr) else np.zeros(len(urls), dtype=np.int64)
        for r in np.unique(rng):
            sub = batch.filter(pa.array(rng == r))
            part_dir = os.path.join(raw_dir, f"rng={int(r)}")
            os.makedirs(part_dir, exist_ok=True)
            _write_idempotent(sub, part_dir)
        return pa.table({"n": pa.array([batch.num_rows], type=pa.int64())})

    # partition pass reads the cheap spilled parquet, NOT the extraction
    if os.listdir(raw_all):
        rd.read_parquet(raw_all).map_batches(
            spill_ranges, batch_format="pyarrow"
        ).count()

    @ray.remote
    def dedup_range(r: int) -> int:
        prev_cpus = pa.cpu_count()
        pa.set_cpu_count(1)  # 1 task = 1 core; don't thrash the others
        try:
            part_dir = os.path.join(raw_dir, f"rng={r}")
            if not os.path.isdir(part_dir):
                return 0
            files = [os.path.join(part_dir, f)
                     for f in os.listdir(part_dir)
                     if f.endswith(".parquet")]
            if not files:
                return 0
            t = pa.concat_tables([pq.read_table(f) for f in files])
            t = t.sort_by([("url", "ascending"), ("warc_ts", "ascending")])
            urls = t.column("url").to_numpy(zero_copy_only=False)
            is_last = np.concatenate((urls[1:] != urls[:-1], [True])) \
                if len(urls) else np.array([], dtype=bool)
            kept = t.filter(pa.array(is_last))
            kept = kept.append_column(
                "local_rank",
                pa.array(np.arange(kept.num_rows, dtype=np.int64)),
            ).append_column(
                "rng", pa.array(np.full(kept.num_rows, r, dtype=np.int64))
            )
            pq.write_table(kept,
                           os.path.join(dedup_dir, f"rng_{r}.parquet"))
            return kept.num_rows
        finally:
            # Ray reuses worker processes: later stages in this job DO
            # want threaded Arrow (same discipline as EncodeBlocks)
            pa.set_cpu_count(prev_cpus)

    counts = ray.get([dedup_range.remote(r) for r in range(n_ranges)])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)

    def finalize(batch: pa.Table) -> pa.Table:
        rng = batch.column("rng").to_numpy()
        local = batch.column("local_rank").to_numpy()
        doc_id = offsets[rng] + local
        return batch.drop_columns(["rng", "local_rank"]).append_column(
            "doc_id", pa.array(doc_id, type=pa.int64())
        )

    files = [os.path.join(dedup_dir, f) for f in sorted(os.listdir(dedup_dir))
             if f.endswith(".parquet")]
    if not files:
        schema = extracted.schema().base_schema.append(
            pa.field("doc_id", pa.int64())
        )
        return rd.from_arrow(schema.empty_table())
    return rd.read_parquet(files).map_batches(
        finalize, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# hot-term detection (sample-based, driver-side, broadcast into the salter)
# --------------------------------------------------------------------------

def detect_hot_terms(docs_dir: str, cfg: EngineConfig) -> set[str]:
    """Estimate head terms from a doc sample (df_sample/n >= threshold).

    Driver-side by design — the sample is bounded (cfg.hot_term_sample)
    regardless of corpus size, and the Arrow kernels (lower/split/group)
    keep it a few ms, so no Ray job is spent on it."""
    import pyarrow.dataset as pads

    from semantic_pdf_search_engine_ray.stages.postings import (
        flat_token_pairs,
    )

    tbl = pads.dataset(docs_dir).head(cfg.hot_term_sample, columns=["text"])
    n = tbl.num_rows
    if n == 0:
        return set()
    parents, flat = flat_token_pairs(tbl.column("text"))
    pairs = pa.table({"i": parents, "term": flat})
    uniq = pairs.group_by(["i", "term"]).aggregate([])
    df = uniq.group_by("term").aggregate([("i", "count")])
    return {
        t
        for t, c in zip(df.column("term").to_pylist(),
                        df.column("i_count").to_pylist())
        if c / n >= cfg.hot_df_threshold
    }


def _parquet_dir_rows(path: str) -> int:
    """Total rows of a parquet directory from footers only (no data read)."""
    import pyarrow.parquet as pq

    total = 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(path, name)).num_rows
    return total


# Above this row count, small post-shuffle aggregations (global stats,
# dictionary) run as distributed Ray jobs; below it a driver-side Arrow
# pass is faster than one Ray job's fixed cost.
DRIVER_AGG_MAX_ROWS = 20_000_000


def _ensure_nonempty_parquet(path: str, schema: pa.Schema) -> None:
    """Committed == readable: if a stage wrote no fragments (empty or
    token-less corpus), materialize the schema in an explicit empty file
    so downstream pq.read_table never faces a file-less directory."""
    import pyarrow.parquet as pq

    for _r, _d, names in os.walk(path):
        if any(n.endswith(".parquet") for n in names):
            return
    pq.write_table(schema.empty_table(), os.path.join(path, "empty.parquet"))


def _target_blocks() -> int:
    """Block-count target for the wide reads: ~4 blocks per core.

    Ray Data's driver schedules every task serially (~ms each); letting
    block count track the input's file count makes driver scheduling a
    serial O(files) term that caps scaling. Pinning blocks to cluster
    parallelism keeps driver work constant per job regardless of input
    size (tasks just get bigger — which is what a streaming executor
    wants)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus * 4)


# --------------------------------------------------------------------------
# hash-partitioned two-phase shuffle (the scale path)
# --------------------------------------------------------------------------

def make_term_partitioner(
    n_partitions: int,
    hot_terms: set[str],
    doc_span: int,
    salt_buckets: int,
    doc_min: int = 0,
):
    """map_batches fn adding ``part = crc32(term) % P`` (int64).

    Hot terms are salted by contiguous doc_id range (same invariant as
    make_salter: each (term, salt) sub-list covers a disjoint doc range,
    so per-partition encoded runs concatenate into a doc_id-sorted
    posting list at read time). Terms are dictionary-encoded per batch so
    the Python crc32 loop touches only unique terms, not rows.
    """
    import pyarrow.compute as pc

    from semantic_pdf_search_engine_ray.stages.postings import term_crc32

    hot = hot_terms

    def add_part(batch: pa.Table) -> pa.Table:
        base = term_crc32(batch.column("term"))
        part = base % n_partitions
        if hot:
            enc = pc.dictionary_encode(batch.column("term")).combine_chunks()
            dic = enc.dictionary.to_pylist()
            idx = enc.indices.to_numpy(zero_copy_only=False)
            is_hot = np.asarray([t in hot for t in dic], dtype=bool)[idx]
            if is_hot.any():
                doc_ids = batch.column("doc_id").to_numpy()
                # doc_min offset: sharded sub-builds carry GLOBAL ids
                salt = np.minimum(
                    ((doc_ids - doc_min) * salt_buckets) // max(doc_span, 1),
                    salt_buckets - 1,
                )
                part = np.where(
                    is_hot, (base + 1 + salt) % n_partitions, part
                )
        return batch.append_column("part", pa.array(part, type=pa.int64()))

    return add_part


class EncodePartition:
    """One task per term-hash partition directory: read -> Arrow sort by
    (term, doc_id) -> delta+varint block encode. Replaces the global
    sample-sort exchange with an embarrassingly-parallel local sort (each
    partition fits one task's heap; at 100 TB ``cfg.num_partitions``
    scales to keep it that way)."""

    def __init__(self, k1: float, b: float, avgdl: float, block_size: int):
        self.encoder = EncodeBlocks(k1, b, avgdl, block_size)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one task per core is the unit of parallelism here; Arrow's own
        # thread pools would oversubscribe (32 tasks x 32 threads).
        # Scoped save/restore — Ray reuses worker processes for later
        # stages that do want threaded Arrow.
        old_cpu, old_io = pa.cpu_count(), pa.io_thread_count()
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        try:
            return self._encode(batch)
        finally:
            pa.set_cpu_count(old_cpu)
            pa.set_io_thread_count(old_io)

    def _encode(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        from semantic_pdf_search_engine_ray.stages.encode import BLOCKS_SCHEMA

        outs = []
        for d in batch.column("part_dir").to_pylist():
            tbl = pq.read_table(d, columns=["term", "doc_id", "tf", "dl"])
            if tbl.num_rows == 0:
                continue
            tbl = tbl.sort_by([("term", "ascending"), ("doc_id", "ascending")])
            outs.append(self.encoder(tbl))
        return pa.concat_tables(outs) if outs else BLOCKS_SCHEMA.empty_table()


class EncodePartitionToFile(EncodePartition):
    """Idempotent per-partition encode task: each partition's block rows
    land in a DETERMINISTIC file (``part-<N>.parquet``, written
    tmp+rename). A resumed encode lists finished files and re-runs only
    the missing partitions — the north rule's mid-shuffle resume at
    partition (not stage) granularity. Returns one metrics row per
    partition."""

    def __init__(self, k1, b, avgdl, block_size, out_dir: str):
        super().__init__(k1, b, avgdl, block_size)
        self.out_dir = out_dir

    def _encode(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        parts, rows_out, files = [], [], []
        for d in batch.column("part_dir").to_pylist():
            part_id = int(os.path.basename(d).split("=", 1)[1])
            fname = f"part-{part_id:05d}.parquet"
            final = os.path.join(self.out_dir, fname)
            tbl = pq.read_table(d, columns=["term", "doc_id", "tf", "dl"])
            blocks = (
                self.encoder(
                    tbl.sort_by([("term", "ascending"),
                                 ("doc_id", "ascending")])
                )
                if tbl.num_rows
                else None
            )
            if blocks is None:
                from semantic_pdf_search_engine_ray.stages.encode import (
                    BLOCKS_SCHEMA,
                )

                blocks = BLOCKS_SCHEMA.empty_table()
            tmp = final + f".tmp.{os.getpid()}"
            pq.write_table(blocks, tmp)
            os.replace(tmp, final)  # atomic; idempotent re-runs converge
            parts.append(part_id)
            rows_out.append(blocks.num_rows)
            files.append(fname)
        return pa.table(
            {"part": pa.array(parts, type=pa.int64()),
             "rows": pa.array(rows_out, type=pa.int64()),
             "file": pa.array(files, type=pa.string())}
        )


# --------------------------------------------------------------------------
# build
# --------------------------------------------------------------------------

def build_index_from_docs(
    docs_ds: rd.Dataset,
    index_dir: str,
    cfg: EngineConfig | None = None,
    *,
    input_lineage: dict | None = None,
    shuffle_mode: str = "hash_partition",
    avgdl_override: float | None = None,
) -> dict:
    """Build an index from a docs dataset with (doc_id, text [, url, ...]).

    ``avgdl_override``: score-normalization avgdl to bake into the
    posting blocks' max_tfn metadata and the manifest, instead of this
    corpus's own mean doc length. Used by sharded builds: every shard
    must encode with the GLOBAL avgdl or its block-max WAND bounds would
    under-estimate true tfn values (tfn grows with avgdl).

    shuffle_mode:
    - "hash_partition" (default, the scale path): postings spill into
      ``cfg.num_partitions`` term-hash parquet buckets (hot terms salted
      by doc range across buckets), then one local sort+encode task per
      bucket. No global sample-sort exchange; resumes at partition
      granularity (phase 1 and phase 2 are separate checkpoints).
    - "sort": global (term, doc_id) range sort; hot terms split naturally
      at range boundaries.
    - "groupby_salt": explicit groupby((term, salt)) with doc_id-range
      salting of sampled hot terms.
    All three produce the same decoded index (tests/test_salting_resume.py).
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
        _ensure_nonempty_parquet(
            out,
            pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                       ("doc_len", pa.int64())]),
        )
        stage_metrics["docs"] = docs_ck.commit()
    else:
        stage_metrics["docs"] = mf.load_stage_entry(index_dir, "docs")
    docs_dir = os.path.join(index_dir, "docs")

    # -- global stats (footer-gated: driver-side Arrow pass when small,
    #    distributed aggregate when the docs table is big) -------------------
    docs_rows = _parquet_dir_rows(docs_dir)
    if docs_rows == 0:
        n_docs = total_tokens = doc_min = doc_max = 0
    elif docs_rows <= DRIVER_AGG_MAX_ROWS:
        import pyarrow.parquet as _pq

        st = _pq.read_table(docs_dir, columns=["doc_id", "doc_len"])
        n_docs = st.num_rows
        total_tokens = (
            int(np.sum(st.column("doc_len").to_numpy(zero_copy_only=False)))
            if n_docs else 0
        )
        ids_np = st.column("doc_id").to_numpy()
        doc_min = int(ids_np.min()) if n_docs else 0
        doc_max = int(ids_np.max()) if n_docs else 0
    else:
        from ray.data.aggregate import Max as _Max, Min as _Min

        stats = (
            rd.read_parquet(docs_dir, columns=["doc_id", "doc_len"])
            .aggregate(Sum("doc_len", alias_name="total_tokens"),
                       Count(alias_name="n_docs"),
                       _Min("doc_id", alias_name="doc_min"),
                       _Max("doc_id", alias_name="doc_max"))
        )
        n_docs = int(stats["n_docs"])
        total_tokens = int(stats["total_tokens"] or 0)
        doc_min = int(stats["doc_min"] or 0)
        doc_max = int(stats["doc_max"] or 0)
    doc_span = doc_max - doc_min + 1 if n_docs else 1
    avgdl = (
        avgdl_override
        if avgdl_override is not None
        else (total_tokens / n_docs if n_docs else 0.0)
    )

    # -- stage: postings (tokenize -> shuffle -> encode) ---------------------
    post_ck = mf.StageCheckpoint(
        index_dir,
        "postings",
        # avgdl is in the lineage explicitly: with avgdl_override it is
        # NOT derivable from (n_docs, total_tokens), and stale blocks
        # encoded under a different avgdl carry invalid WAND bounds
        {**lineage_base, "stage": "postings", "shuffle_mode": shuffle_mode,
         "n_docs": n_docs, "total_tokens": total_tokens, "avgdl": avgdl},
    )
    hot_terms: set[str] = set()
    if not post_ck.is_complete():
        # hash mode resumes at partition granularity (idempotent
        # per-partition files); the other modes rebuild the stage whole
        out = (
            post_ck.resume_dir()
            if shuffle_mode == "hash_partition"
            else post_ck.fresh_dir()
        )
        t0 = time.monotonic()
        postings = rd.read_parquet(
            docs_dir, columns=["doc_id", "text", "doc_len"],
            override_num_blocks=_target_blocks(),
        ).map_batches(
            TokenizePostings(),
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
        )
        encoder = EncodeBlocks(cfg.k1, cfg.b, avgdl, cfg.block_size)
        if shuffle_mode == "hash_partition":
            hot_terms = detect_hot_terms(docs_dir, cfg)
            parts_ck = mf.StageCheckpoint(
                index_dir, "postings_parts",
                {**lineage_base, "stage": "postings_parts",
                 "n_partitions": cfg.num_partitions},
            )
            parts_dir = os.path.join(index_dir, "postings_parts")
            if not parts_ck.is_complete():
                parts_out = parts_ck.fresh_dir()
                postings.map_batches(
                    make_term_partitioner(
                        cfg.num_partitions, hot_terms, doc_span,
                        cfg.salt_buckets, doc_min=doc_min,
                    ),
                    batch_format="pyarrow",
                ).write_parquet(parts_out, partition_cols=["part"])
                stage_metrics["postings_parts"] = parts_ck.commit(
                    extra_metrics={"hot_terms": sorted(hot_terms)}
                )
            else:
                stage_metrics["postings_parts"] = mf.load_stage_entry(
                    index_dir, "postings_parts"
                )
            t_encode0 = time.monotonic()
            done_parts = {
                int(f.split("-")[1].split(".")[0])
                for f in os.listdir(out)
                if f.startswith("part-") and f.endswith(".parquet")
            }
            part_dirs = sorted(
                os.path.join(parts_dir, d)
                for d in os.listdir(parts_dir)
                if d.startswith("part=")
                and int(d.split("=", 1)[1]) not in done_parts
            )
            blocks = rd.from_items(
                [{"part_dir": d} for d in part_dirs],
                override_num_blocks=max(len(part_dirs), 1),
            ).map_batches(
                EncodePartitionToFile(cfg.k1, cfg.b, avgdl, cfg.block_size,
                                      out),
                batch_format="pyarrow",
                batch_size=None,
            ) if part_dirs else None
        elif shuffle_mode == "sort":
            blocks = postings.sort(["term", "doc_id"]).map_batches(
                encoder, batch_format="pyarrow", batch_size=None
            )
        elif shuffle_mode == "groupby_salt":
            hot_terms = detect_hot_terms(docs_dir, cfg)
            salted = postings.map_batches(
                make_salter(hot_terms, doc_span, cfg.salt_buckets,
                            doc_min=doc_min),
                batch_format="pyarrow",
            )
            blocks = salted.groupby(["term", "salt"]).map_groups(
                encode_group_factory(cfg.k1, cfg.b, avgdl, cfg.block_size),
                batch_format="pyarrow",
            )
        else:
            raise ValueError(f"unknown shuffle_mode {shuffle_mode!r}")
        extra = {
            "shuffle_mode": shuffle_mode,
            "hot_terms": sorted(hot_terms),
        }
        if shuffle_mode == "hash_partition":
            # tasks already wrote their own part-<N>.parquet files; this
            # consumes the metrics rows (and drives execution)
            encoded = blocks.count() if blocks is not None else 0
            extra["partitions_encoded"] = int(encoded)
            extra["partitions_resumed"] = len(done_parts)
            extra["phase2_encode_wall_ms"] = round(
                (time.monotonic() - t_encode0) * 1000, 1
            )
        else:
            blocks.write_parquet(out)
        from semantic_pdf_search_engine_ray.stages.encode import BLOCKS_SCHEMA

        _ensure_nonempty_parquet(out, BLOCKS_SCHEMA)
        extra["encode_wall_ms"] = round((time.monotonic() - t0) * 1000, 1)
        stage_metrics["postings"] = post_ck.commit(extra_metrics=extra)
    else:
        stage_metrics["postings"] = mf.load_stage_entry(index_dir, "postings")

    # -- stage: dictionary (term -> df over all blocks) ----------------------
    dict_ck = mf.StageCheckpoint(
        index_dir, "dictionary", {**lineage_base, "stage": "dictionary"}
    )
    if not dict_ck.is_complete():
        out = dict_ck.fresh_dir()
        postings_dir = os.path.join(index_dir, "postings")
        post_rows = _parquet_dir_rows(postings_dir)
        if post_rows == 0:
            # token-less corpus: committed == readable, so materialize
            # an empty dictionary with the schema
            import pyarrow.parquet as _pq

            _pq.write_table(
                pa.table({"term": pa.array([], type=pa.string()),
                          "df": pa.array([], type=pa.int64()),
                          "n_blocks": pa.array([], type=pa.int64())}),
                os.path.join(out, "dictionary.parquet"),
            )
        elif post_rows <= DRIVER_AGG_MAX_ROWS:
            # block-metadata rows are ~corpus/block_size: driver-side
            # Arrow group_by beats a shuffle job until ~10^10 docs
            import pyarrow.parquet as _pq

            agg = (
                _pq.read_table(postings_dir, columns=["term", "n_docs"])
                .group_by("term")
                .aggregate([("n_docs", "sum"), ("n_docs", "count")])
                .rename_columns(["term", "df", "n_blocks"])
            )
            _pq.write_table(agg, os.path.join(out, "dictionary.parquet"))
        else:
            (
                rd.read_parquet(postings_dir, columns=["term", "n_docs"])
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


def path_content_lineage(path: str | list[str]) -> dict:
    """Content-aware lineage for a local parquet path: file count + total
    bytes + max mtime. Rebuilding into an existing index_dir with CHANGED
    source data then never matches the committed stage fingerprints, so
    a stale index is rebuilt instead of silently resumed."""
    paths = path if isinstance(path, list) else [path]
    n, size, mtime = 0, 0, 0.0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in files:
                    st = os.stat(os.path.join(root, f))
                    n += 1
                    size += st.st_size
                    mtime = max(mtime, st.st_mtime)
        elif os.path.exists(p):
            st = os.stat(p)
            n += 1
            size += st.st_size
            mtime = max(mtime, st.st_mtime)
    return {"path": paths, "n_files": n, "bytes": size, "mtime": mtime}


def build_index_from_pages(
    pages_path: str | list[str],
    index_dir: str,
    cfg: EngineConfig | None = None,
    shuffle_mode: str = "hash_partition",
) -> dict:
    """Full pipeline from a Common-Crawl-style pages parquet table."""
    cfg = cfg or EngineConfig()
    pages = rd.read_parquet(
        pages_path, columns=["url", "warc_ts", "html", "lang"],
        override_num_blocks=_target_blocks(),
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
        input_lineage=path_content_lineage(pages_path),
        shuffle_mode=shuffle_mode,
    )
