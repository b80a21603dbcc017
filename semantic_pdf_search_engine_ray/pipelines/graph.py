"""Web link-graph operators: degree stats and PageRank.

A web-corpus engine needs link-graph signals (in-degree as an authority
prior, PageRank for crawl/training-data weighting). The documents
fixture carries no hyperlink column, so edges derive deterministically
from content-free hashes — edge ``j`` of doc ``d`` points at
``md5_low64("edge:{d}:{j}") % N`` with ``1 + d % max_out`` edges and
self-loops dropped. The derivation is mirrored verbatim in the SQL
oracle, so what the oracle actually checks is the graph OPERATORS:
degree aggregation and iterative rank propagation as Dataset join +
groupby rounds (the same physical plan as dedup's connected
components, `dedup.py:dup_components_ds`).

PageRank runs in FIXED-POINT integer arithmetic (micro-units, scale
1e12): a node's contribution floor-divides its rank by its out-degree,
and the damping multiply floor-divides by 100 — every engine (numpy
int64 here, DuckDB BIGINT in the oracle) computes bit-identical ranks
regardless of summation order. Same determinism trick as the
integer-cents money pipeline (`relational.py`). Dangling mass is
dropped (the "rank leaks" formulation), keeping each round one edge
join + one grouped sum on both sides.

Scale shape (default, dense-id functional plan): rank state is one
int64 vector per 32,768-doc chunk; each round is one map emitting
sparse per-destination-chunk (idx, val) buffers and one chunk-keyed
``groupby().map_groups`` scatter-add — measured ~30x faster than
running the message aggregation through the generic sort/hash
aggregate (BASELINE.md). The general join plan (edges x ranks hash
join + grouped sum, the connected-components shape) remains for
arbitrary edge lists and is pytest-pinned bit-equal. Rounds are a
fixed, documented count (power iteration converges geometrically at
damping 0.85; fixed-iteration is the standard batch formulation).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from semantic_pdf_search_engine_ray.functions.shingle import md5_hash64

SCALE = 10**12  # rank micro-units: sum of all ranks ~= SCALE
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
MAX_OUT_DEFAULT = 3


def derive_edges(
    docs: rd.Dataset, n_docs: int, max_out: int = MAX_OUT_DEFAULT
) -> rd.Dataset:
    """Deterministic hash link graph over the corpus: doc ``d`` emits
    ``1 + d % max_out`` edges, edge ``j`` targeting
    ``md5_low64('edge:{d}:{j}') % n_docs``; self-loops dropped. Pure
    map-side, mirrored by the SQL oracle's ``md5_number_lower``."""

    def edges(batch: pa.Table) -> pa.Table:
        src_out, dst_out = [], []
        for d in batch.column("doc_id").to_pylist():
            for j in range(1 + d % max_out):
                t = md5_hash64(f"edge:{d}:{j}") % n_docs
                if t != d:
                    src_out.append(d)
                    dst_out.append(t)
        return pa.table({
            "src": pa.array(src_out, type=pa.int64()),
            "dst": pa.array(dst_out, type=pa.int64()),
        })

    return docs.map_batches(edges, batch_format="pyarrow")


def degree_table(
    docs: rd.Dataset, n_docs: int, max_out: int = MAX_OUT_DEFAULT
) -> rd.Dataset:
    """(doc_id, out_deg, in_deg) for every doc, zero-degree docs
    included. One grouped sum over the union of per-edge endpoint
    markers and per-doc zero rows — no join at all (the union IS the
    left-outer join, and Ray's hash groupby pre-aggregates the
    endpoint markers map-side before the exchange)."""
    e = derive_edges(docs, n_docs, max_out=max_out)

    def endpoints(batch: pa.Table) -> pa.Table:
        src = batch.column("src")
        dst = batch.column("dst")
        n = len(batch)
        one = pa.array(np.ones(n, dtype=np.int64))
        zero = pa.array(np.zeros(n, dtype=np.int64))
        return pa.table({
            "doc_id": pa.concat_arrays(
                [src.combine_chunks(), dst.combine_chunks()]),
            "o": pa.concat_arrays([one, zero]),
            "i": pa.concat_arrays([zero, one]),
        })

    def zeros(batch: pa.Table) -> pa.Table:
        n = len(batch)
        z = pa.array(np.zeros(n, dtype=np.int64))
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "o": z, "i": z,
        })

    marks = e.map_batches(endpoints, batch_format="pyarrow").union(
        docs.map_batches(zeros, batch_format="pyarrow")
    )
    return (
        marks.groupby("doc_id")
        .aggregate(Sum("o", alias_name="out_deg"),
                   Sum("i", alias_name="in_deg"))
        .map_batches(
            lambda t: pa.table({
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "out_deg": t.column("out_deg").cast(pa.int64()),
                "in_deg": t.column("in_deg").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


def pagerank(
    docs: rd.Dataset,
    n_docs: int,
    n_iters: int = 5,
    max_out: int = MAX_OUT_DEFAULT,
    num_partitions: int = 8,
    functional_edges: bool = True,
    seed_mod: int | None = None,
) -> rd.Dataset:
    """Fixed-point PageRank over the derived link graph:

        r_0(v)     = SCALE // N
        c_t(u)     = r_t(u) // out_deg(u)            (per out-edge)
        r_{t+1}(v) = (SCALE*15//100) // N
                     + (85 * sum_{u->v} c_t(u)) // 100

    All integer (numpy int64 / DuckDB BIGINT), so ranks are
    bit-identical across engines and summation orders. Output:
    (doc_id, rank_micro) after ``n_iters`` rounds.

    Two physical plans, identical results (pytest-pinned equal):

    - ``functional_edges=True`` (default): the edge set is a pure
      function of doc_id AND doc_ids are the dense range [0, N) (the
      engine's deterministic doc_id contract), so rank state lives as
      dense per-chunk int64 vectors and each round is one map + one
      chunk-keyed buffer exchange — no edge table, no join, no
      key-row aggregate (see `_pagerank_functional`). Use the join
      plan for sparse/arbitrary id spaces.
    - ``functional_edges=False``: general plan for a materialized edge
      list — per round one edges-x-ranks hash join plus the grouped
      sum (the connected-components physical shape, linear in |E|;
      soaked at 1M/2M edges in BASELINE.md)."""
    if seed_mod is not None and not functional_edges:
        raise ValueError("personalized (seed_mod) PageRank is only "
                         "implemented on the functional plan")
    if functional_edges:
        return _pagerank_functional(docs, n_docs, n_iters, max_out,
                                    seed_mod=seed_mod)
    edges = derive_edges(docs, n_docs, max_out=max_out).materialize()
    outdeg = edges.groupby("src").aggregate(Count(alias_name="deg"))
    edges_deg = edges.join(
        outdeg.materialize(), "inner", num_partitions,
        on=("src",), right_on=("src",), right_suffix="_r",
    ).map_batches(
        lambda t: pa.table({
            "src": t.column("src").cast(pa.int64()),
            "dst": t.column("dst").cast(pa.int64()),
            "deg": t.column("deg").cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()

    base_r = SCALE // n_docs
    teleport = (SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN) // n_docs

    def init(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "r": pa.array(np.full(n, base_r, dtype=np.int64)),
        })

    doc_ids = docs.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    ranks = doc_ids.map_batches(init, batch_format="pyarrow").materialize()

    def zero_s(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "s": pa.array(np.zeros(len(batch), dtype=np.int64)),
        })

    zeros = doc_ids.map_batches(zero_s, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        r = t.column("r").to_numpy()
        deg = t.column("deg").to_numpy()
        return pa.table({
            "doc_id": t.column("dst").cast(pa.int64()),
            "s": pa.array(r // deg),
        })

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy().astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "r": pa.array(teleport + (DAMP_NUM * s) // DAMP_DEN),
        })

    for _ in range(n_iters):
        msgs = edges_deg.join(
            ranks, "inner", num_partitions,
            on=("src",), right_on=("doc_id",), right_suffix="_r",
        ).map_batches(contrib, batch_format="pyarrow")
        ranks = (
            msgs.union(zeros)
            .groupby("doc_id")
            .aggregate(Sum("s", alias_name="s"))
            .map_batches(finish, batch_format="pyarrow")
            .materialize()
        )
    return ranks.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "rank_micro": t.column("r").cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def pagerank_oracle_ctes(
    n_iters: int = 5, max_out: int = MAX_OUT_DEFAULT,
    seed_mod: int | None = None,
) -> list:
    """The CTE chain of the PageRank mirror (composable into larger
    statements, e.g. static-rank blended search); final ranks are in
    ``r{n_iters}`` as (doc_id, r). ``seed_mod`` switches to the
    PERSONALIZED variant: teleport mass goes only to docs with
    ``doc_id % seed_mod == 0`` instead of uniformly."""
    if seed_mod is None:
        teleport_expr = (
            f"(({SCALE} * {DAMP_DEN - DAMP_NUM} // {DAMP_DEN}) // n.nd)")
        init_expr = f"({SCALE} // n.nd)"
    else:
        teleport_expr = (
            f"(CASE WHEN d.doc_id % {seed_mod} = 0 THEN "
            f"(({SCALE} * {DAMP_DEN - DAMP_NUM} // {DAMP_DEN}) // n.ns) "
            f"ELSE 0 END)")
        init_expr = (
            f"(CASE WHEN doc_id % {seed_mod} = 0 THEN "
            f"({SCALE} // n.ns) ELSE 0 END)")
    seed_count = (
        "" if seed_mod is None else
        f", (SELECT count(*) FROM documents"
        f" WHERE doc_id % {seed_mod} = 0)::BIGINT AS ns")
    ctes = [
        "n AS (SELECT count(*)::BIGINT AS nd" + seed_count
        + " FROM documents)",
        f"""edges AS (
  SELECT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST(md5_number_lower('edge:' || d.doc_id::VARCHAR || ':'
                                 || j::VARCHAR) % n.nd AS BIGINT) AS dst
    FROM (SELECT doc_id, unnest(generate_series(0, doc_id % {max_out}))
                 AS j FROM documents) d, n
  ) WHERE dst != src
)""",
        """outdeg AS (SELECT src, count(*)::BIGINT AS deg
           FROM edges GROUP BY src)""",
        f"""r0 AS (SELECT doc_id, {init_expr}::BIGINT AS r
          FROM documents, n)""",
    ]
    for i in range(1, n_iters + 1):
        ctes.append(f"""r{i} AS (
  SELECT d.doc_id,
         ({teleport_expr}
          + ({DAMP_NUM} * coalesce(c.s, 0)) // {DAMP_DEN})::BIGINT AS r
  FROM documents d CROSS JOIN n
  LEFT JOIN (
    SELECT e.dst AS doc_id, sum(p.r // o.deg)::BIGINT AS s
    FROM r{i - 1} p
    JOIN edges e ON e.src = p.doc_id
    JOIN outdeg o ON o.src = p.doc_id
    GROUP BY e.dst
  ) c ON c.doc_id = d.doc_id
)""")
    return ctes


def pagerank_oracle_sql(
    n_iters: int = 5, max_out: int = MAX_OUT_DEFAULT,
    seed_mod: int | None = None,
) -> str:
    """DuckDB mirror: same edge derivation, same fixed-point update,
    one CTE per iteration (standard SQL; no recursive-CTE aggregate
    restrictions to fight)."""
    ctes = pagerank_oracle_ctes(n_iters, max_out, seed_mod=seed_mod)
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT doc_id, r AS rank_micro FROM r{n_iters}")


DEGREE_ORACLE_SQL = f"""
WITH n AS (SELECT count(*)::BIGINT AS nd FROM documents),
edges AS (
  SELECT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST(md5_number_lower('edge:' || d.doc_id::VARCHAR || ':'
                                 || j::VARCHAR) % n.nd AS BIGINT) AS dst
    FROM (SELECT doc_id, unnest(generate_series(0, doc_id % {MAX_OUT_DEFAULT}))
                 AS j FROM documents) d, n
  ) WHERE dst != src
)
SELECT d.doc_id,
       coalesce(o.c, 0)::BIGINT AS out_deg,
       coalesce(i.c, 0)::BIGINT AS in_deg
FROM documents d
LEFT JOIN (SELECT src, count(*)::BIGINT AS c FROM edges GROUP BY src) o
       ON o.src = d.doc_id
LEFT JOIN (SELECT dst, count(*)::BIGINT AS c FROM edges GROUP BY dst) i
       ON i.dst = d.doc_id
"""


PR_CHUNK = 1 << 15  # docs per dense rank chunk (32,768 x 8 B = 256 KB)


def _pagerank_functional(
    docs: rd.Dataset, n_docs: int, n_iters: int, max_out: int,
    seed_mod: int | None = None,
) -> rd.Dataset:
    """Join-free PageRank for functionally-derived edges, with the
    grouped sum replaced by a CHUNKED DENSE-VECTOR reduction.

    Why: the message aggregation's key space is the dense integer range
    [0, N), and Ray's generic sort/hash aggregate is ~30x slower than a
    numpy scatter-add on that shape (measured: 28-57 s vs 1.3 s for 3M
    messages over 1M keys, BASELINE.md). So rank state lives as one row
    per 32,768-doc chunk holding an int64 vector; each round is:

      map   : per state chunk, re-derive out-edges map-side and bucket
              integer contributions into per-DESTINATION-chunk sparse
              (idx, val) byte buffers — plus an empty marker for the
              chunk itself so every chunk survives the exchange;
      reduce: groupby(chunk) over ~P x fan-in small buffer rows;
              np.add.at scatter-adds into the dense chunk vector
              (int64, exact), then the teleport + damping update.

    One exchange per round, buffers instead of 3M key rows, all
    arithmetic int64 — bit-identical to the join plan and the SQL
    mirror (pytest-pinned). The chunk layout is also the multi-node
    partitioning story: chunk ranges ARE the hash-free partitioning
    key, and per-chunk state is O(chunk), never O(N), on any worker."""
    n_chunks = (n_docs + PR_CHUNK - 1) // PR_CHUNK

    def chunk_len(c: int) -> int:
        return min(PR_CHUNK, n_docs - c * PR_CHUNK)

    tele_total = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    if seed_mod is None:
        def init_vec(c: int) -> np.ndarray:
            return np.full(chunk_len(c), SCALE // n_docs, dtype=np.int64)

        def tele_vec(c: int, n: int) -> np.ndarray:
            return np.full(n, tele_total // n_docs, dtype=np.int64)
    else:
        # personalized: restart mass concentrates on the seed set
        # (doc_id % seed_mod == 0); everything else stays identical
        n_seeds = (n_docs + seed_mod - 1) // seed_mod

        def _seed_mask(c: int, n: int) -> np.ndarray:
            ids = c * PR_CHUNK + np.arange(n, dtype=np.int64)
            return ids % seed_mod == 0

        def init_vec(c: int) -> np.ndarray:
            n = chunk_len(c)
            return np.where(_seed_mask(c, n), SCALE // n_seeds,
                            0).astype(np.int64)

        def tele_vec(c: int, n: int) -> np.ndarray:
            return np.where(_seed_mask(c, n), tele_total // n_seeds,
                            0).astype(np.int64)

    state = rd.from_arrow(pa.table({
        "chunk": pa.array(range(n_chunks), type=pa.int64()),
        "r": pa.array(
            [init_vec(c).tobytes() for c in range(n_chunks)],
            type=pa.binary()),
    })).repartition(min(n_chunks, 32)).materialize()

    empty = b""

    def emit(t: pa.Table) -> pa.Table:
        out_c: list[int] = []
        out_idx: list[bytes] = []
        out_val: list[bytes] = []
        for c, rb in zip(t.column("chunk").to_pylist(),
                         t.column("r").to_pylist()):
            r = np.frombuffer(rb, dtype=np.int64)
            # marker row: every chunk reaches the reducer even with no
            # inbound mass (isolated ranges still get the teleport term)
            out_c.append(c)
            out_idx.append(empty)
            out_val.append(empty)
            per: dict[int, tuple[list[int], list[int]]] = {}
            base_id = c * PR_CHUNK
            for i in range(len(r)):
                d = base_id + i
                dsts = [x for x in (
                    md5_hash64(f"edge:{d}:{j}") % n_docs
                    for j in range(1 + d % max_out)
                ) if x != d]
                if not dsts:
                    continue
                cv = int(r[i]) // len(dsts)
                for x in dsts:
                    tc = x // PR_CHUNK
                    sl = per.get(tc)
                    if sl is None:
                        sl = ([], [])
                        per[tc] = sl
                    sl[0].append(x - tc * PR_CHUNK)
                    sl[1].append(cv)
            for tc, (idxs, vals) in per.items():
                out_c.append(tc)
                out_idx.append(np.asarray(idxs, dtype=np.int32).tobytes())
                out_val.append(np.asarray(vals, dtype=np.int64).tobytes())
        return pa.table({
            "chunk": pa.array(out_c, type=pa.int64()),
            "idx": pa.array(out_idx, type=pa.binary()),
            "val": pa.array(out_val, type=pa.binary()),
        })

    def reduce(group: pa.Table) -> pa.Table:
        c = group.column("chunk")[0].as_py()
        acc = np.zeros(chunk_len(c), dtype=np.int64)
        for ib, vb in zip(group.column("idx").to_pylist(),
                          group.column("val").to_pylist()):
            if ib:
                np.add.at(acc, np.frombuffer(ib, dtype=np.int32),
                          np.frombuffer(vb, dtype=np.int64))
        r_new = tele_vec(c, len(acc)) + (DAMP_NUM * acc) // DAMP_DEN
        return pa.table({
            "chunk": pa.array([c], type=pa.int64()),
            "r": pa.array([r_new.tobytes()], type=pa.binary()),
        })

    for _ in range(n_iters):
        state = (
            state.map_batches(emit, batch_format="pyarrow")
            .groupby("chunk")
            .map_groups(reduce, batch_format="pyarrow")
            .materialize()
        )

    def explode(t: pa.Table) -> pa.Table:
        ids: list[np.ndarray] = []
        rs: list[np.ndarray] = []
        for c, rb in zip(t.column("chunk").to_pylist(),
                         t.column("r").to_pylist()):
            r = np.frombuffer(rb, dtype=np.int64)
            ids.append(c * PR_CHUNK + np.arange(len(r), dtype=np.int64))
            rs.append(r)
        if not ids:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "rank_micro": pa.array([], type=pa.int64()),
            })
        return pa.table({
            "doc_id": pa.array(np.concatenate(ids)),
            "rank_micro": pa.array(np.concatenate(rs)),
        })

    return state.map_batches(explode, batch_format="pyarrow")


HITS_INIT = 1_000_000  # hub micro-units at round 0
EDGE_LAYOUT_VERSION = 1


def _edge_chunk_layout(n_docs: int, max_out: int) -> str:
    """Materialize the hash link graph ONCE as two chunk-partitioned
    parquet layouts under node-accessible scratch:

      fwd/chunk=<c>/  — edges whose SOURCE is in rank chunk ``c``
                        (srcloc:int32 local index, dst:int64)
      rev/chunk=<c>/  — edges whose DESTINATION is in chunk ``c``
                        (dstloc:int32 local index, src:int64)

    This is the multi-node answer to "the hub gather runs along
    reversed edges, which the functional rule can't derive map-side":
    the edge list is partitioned by endpoint chunk exactly like the
    IVF cell layout (`similarity.py:build_ivf_index`), so a per-chunk
    iteration task reads ONLY its chunk's edge file — static data is
    read per round, never re-shuffled per round. Multi-edges are kept
    (each parallel edge contributes separately, matching the join plan
    and the SQL mirror). Idempotent via the manifest commit."""
    from semantic_pdf_search_engine_ray.config import scratch_root
    from semantic_pdf_search_engine_ray.state import manifest as mf

    key = hashlib.md5(
        f"{n_docs}|{max_out}|{PR_CHUNK}|v{EDGE_LAYOUT_VERSION}".encode()
    ).hexdigest()[:12]
    root = os.path.join(scratch_root(), f"spse_edge_chunks_{key}")
    if mf.is_ready(root):
        return root
    ids = rd.range(n_docs).map_batches(
        lambda t: pa.table({"doc_id": t.column("id").cast(pa.int64())}),
        batch_format="pyarrow",
    )
    edges = derive_edges(ids, n_docs, max_out=max_out).materialize()

    def fwd(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        c = s // PR_CHUNK
        return pa.table({
            "chunk": pa.array(c),
            "srcloc": pa.array((s - c * PR_CHUNK).astype(np.int32)),
            "dst": t.column("dst").cast(pa.int64()),
        })

    def rev(t: pa.Table) -> pa.Table:
        d = t.column("dst").to_numpy()
        c = d // PR_CHUNK
        return pa.table({
            "chunk": pa.array(c),
            "dstloc": pa.array((d - c * PR_CHUNK).astype(np.int32)),
            "src": t.column("src").cast(pa.int64()),
        })

    edges.map_batches(fwd, batch_format="pyarrow").write_parquet(
        os.path.join(root, "fwd"), partition_cols=["chunk"])
    edges.map_batches(rev, batch_format="pyarrow").write_parquet(
        os.path.join(root, "rev"), partition_cols=["chunk"])
    mf.commit_manifest(root, {
        "kind": "edge_chunks",
        "n_docs": int(n_docs),
        "max_out": int(max_out),
        "chunk": PR_CHUNK,
        "version": EDGE_LAYOUT_VERSION,
    })
    return root


def _read_chunk_edges(root: str, direction: str, c: int,
                      loc_col: str, far_col: str):
    """(loc:int32, far:int64) arrays for one chunk's edge partition;
    missing directory = no edges in that direction for the chunk."""
    import pyarrow.parquet as _pq

    d = os.path.join(root, direction, f"chunk={c}")
    if not os.path.isdir(d):
        return (np.empty(0, dtype=np.int32), np.empty(0, dtype=np.int64))
    t = _pq.read_table(d, columns=[loc_col, far_col])
    return (t.column(loc_col).to_numpy().astype(np.int32, copy=False),
            t.column(far_col).to_numpy().astype(np.int64, copy=False))


def _hits_functional(
    docs: rd.Dataset, n_docs: int, n_iters: int, max_out: int,
) -> rd.Dataset:
    """HITS on the dense-chunk plan (`_pagerank_functional`'s exchange,
    measured ~10x faster than join + generic aggregate at 1M nodes):
    scores live as one int64 vector per 32,768-doc chunk; each
    half-round is one map over chunk states emitting per-target-chunk
    sparse (idx, val) buffers + one chunk-keyed scatter-add reduce.

    The authority half scatters h along FORWARD edges (fwd layout); the
    hub half scatters a along REVERSED edges (rev layout) — both reads
    are the chunk's own partition of the static edge layout, fully
    vectorized (no per-row hashing in the round loop). The hub reduce
    carries the round's authority vector through as a payload column so
    the final state holds both scores."""
    root = _edge_chunk_layout(n_docs, max_out)
    n_chunks = (n_docs + PR_CHUNK - 1) // PR_CHUNK

    def chunk_len(c: int) -> int:
        return min(PR_CHUNK, n_docs - c * PR_CHUNK)

    state = rd.from_arrow(pa.table({
        "chunk": pa.array(range(n_chunks), type=pa.int64()),
        "v": pa.array(
            [np.full(chunk_len(c), HITS_INIT, dtype=np.int64).tobytes()
             for c in range(n_chunks)],
            type=pa.binary()),
        "carry": pa.array([b""] * n_chunks, type=pa.binary()),
    })).repartition(min(n_chunks, 32)).materialize()

    def make_emit(direction: str, loc_col: str, far_col: str,
                  carry_out: bool):
        def emit(t: pa.Table) -> pa.Table:
            out_c: list[int] = []
            out_idx: list[bytes] = []
            out_val: list[bytes] = []
            for c, vb in zip(t.column("chunk").to_pylist(),
                             t.column("v").to_pylist()):
                v = np.frombuffer(vb, dtype=np.int64)
                # marker row: carries this chunk's state forward (and
                # guarantees every chunk reaches the reducer)
                out_c.append(c)
                out_idx.append(b"")
                out_val.append(vb if carry_out else b"")
                loc, far = _read_chunk_edges(root, direction, c,
                                             loc_col, far_col)
                if len(loc) == 0:
                    continue
                vals = v[loc]
                tc = far // PR_CHUNK
                order = np.argsort(tc, kind="stable")
                tc_s = tc[order]
                idx_s = (far[order] - tc_s * PR_CHUNK).astype(np.int32)
                val_s = vals[order]
                bounds = np.flatnonzero(np.diff(tc_s)) + 1
                for lo, hi in zip(
                        np.concatenate(([0], bounds)),
                        np.concatenate((bounds, [len(tc_s)]))):
                    out_c.append(int(tc_s[lo]))
                    out_idx.append(idx_s[lo:hi].tobytes())
                    out_val.append(val_s[lo:hi].tobytes())
            return pa.table({
                "chunk": pa.array(out_c, type=pa.int64()),
                "idx": pa.array(out_idx, type=pa.binary()),
                "val": pa.array(out_val, type=pa.binary()),
            })
        return emit

    def reduce(group: pa.Table) -> pa.Table:
        c = group.column("chunk")[0].as_py()
        acc = np.zeros(chunk_len(c), dtype=np.int64)
        carry = b""
        for ib, vb in zip(group.column("idx").to_pylist(),
                          group.column("val").to_pylist()):
            if ib:
                np.add.at(acc, np.frombuffer(ib, dtype=np.int32),
                          np.frombuffer(vb, dtype=np.int64))
            elif vb:
                carry = vb
        return pa.table({
            "chunk": pa.array([c], type=pa.int64()),
            "v": pa.array([acc.tobytes()], type=pa.binary()),
            "carry": pa.array([carry], type=pa.binary()),
        })

    auth_emit = make_emit("fwd", "srcloc", "dst", carry_out=False)
    hub_emit = make_emit("rev", "dstloc", "src", carry_out=True)
    for _ in range(n_iters):
        # authority half: a_{t+1}(v) = sum_{u->v} h_t(u)
        state = (
            state.map_batches(auth_emit, batch_format="pyarrow")
            .groupby("chunk").map_groups(reduce, batch_format="pyarrow")
            .materialize()
        )
        # hub half: h_{t+1}(v) = sum_{v->u} a_{t+1}(u); carry = a_{t+1}
        state = (
            state.map_batches(hub_emit, batch_format="pyarrow")
            .groupby("chunk").map_groups(reduce, batch_format="pyarrow")
            .materialize()
        )

    def explode(t: pa.Table) -> pa.Table:
        ids: list[np.ndarray] = []
        aus: list[np.ndarray] = []
        hbs: list[np.ndarray] = []
        for c, hb, ab in zip(t.column("chunk").to_pylist(),
                             t.column("v").to_pylist(),
                             t.column("carry").to_pylist()):
            h = np.frombuffer(hb, dtype=np.int64)
            ids.append(c * PR_CHUNK + np.arange(len(h), dtype=np.int64))
            hbs.append(h)
            aus.append(np.frombuffer(ab, dtype=np.int64))
        if not ids:
            return pa.table({
                "doc_id": pa.array([], type=pa.int64()),
                "authority_micro": pa.array([], type=pa.int64()),
                "hub_micro": pa.array([], type=pa.int64()),
            })
        return pa.table({
            "doc_id": pa.array(np.concatenate(ids)),
            "authority_micro": pa.array(np.concatenate(aus)),
            "hub_micro": pa.array(np.concatenate(hbs)),
        })

    return state.map_batches(explode, batch_format="pyarrow")


def hits_scores(
    docs: rd.Dataset,
    n_docs: int,
    n_iters: int = 3,
    max_out: int = MAX_OUT_DEFAULT,
    num_partitions: int = 4,
    functional_edges: bool = True,
) -> rd.Dataset:
    """Kleinberg HITS, unnormalized fixed-iteration integer form:

        h_0(v)     = 1e6
        a_{t+1}(v) = sum_{u->v} h_t(u)       (authority <- in-edges)
        h_{t+1}(v) = sum_{v->u} a_{t+1}(u)   (hub <- out-edges)

    Normalization is deliberately dropped (it would need a float norm
    per round); relative order per round is unchanged and every value
    stays an exact int64, so the SQL mirror is value-identical.

    Two physical plans, identical results (pytest-pinned equal):

    - ``functional_edges=True`` (default): the dense-chunk plan — the
      hub update gathers along REVERSED edges, which the functional
      rule can't derive map-side, so the edge list is materialized
      ONCE into a chunk-partitioned parquet layout (fwd by source
      chunk, rev by destination chunk; `_edge_chunk_layout`) and each
      half-round is `_pagerank_functional`'s sparse-buffer exchange.
    - ``functional_edges=False``: the general join plan — one hash
      join + grouped sum per half-round over a materialized edge
      Dataset (works for arbitrary/sparse id spaces).

    Output: (doc_id, authority_micro, hub_micro) after ``n_iters``
    full rounds."""
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if functional_edges:
        return _hits_functional(docs, n_docs, n_iters, max_out)
    edges = derive_edges(docs, n_docs, max_out=max_out).materialize()
    doc_ids = docs.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow",
    ).materialize()

    def const_col(name: str, val: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": t.column("doc_id"),
                name: pa.array(np.full(len(t), val, dtype=np.int64)),
            })
        return fn

    def zeros(name: str):
        return const_col(name, 0)

    hub = doc_ids.map_batches(const_col("v", HITS_INIT),
                              batch_format="pyarrow").materialize()

    def propagate(state: rd.Dataset, src_col: str, dst_col: str):
        """sum state.v of the ``src_col`` endpoint into the
        ``dst_col`` endpoint; zero rows keep isolated docs alive."""
        msgs = edges.join(
            state, "inner", num_partitions,
            on=(src_col,), right_on=("doc_id",), right_suffix="_r",
        ).map_batches(
            lambda t: pa.table({
                "doc_id": t.column(dst_col).cast(pa.int64()),
                "v": t.column("v").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
        return (
            msgs.union(doc_ids.map_batches(zeros("v"),
                                           batch_format="pyarrow"))
            .groupby("doc_id")
            .aggregate(Sum("v", alias_name="v"))
            .map_batches(
                lambda t: pa.table({
                    "doc_id": t.column("doc_id").cast(pa.int64()),
                    "v": t.column("v").cast(pa.int64()),
                }),
                batch_format="pyarrow",
            )
            .materialize()
        )

    auth = None
    for _ in range(n_iters):
        auth = propagate(hub, "src", "dst")
        hub = propagate(auth, "dst", "src")

    return auth.rename_columns({"v": "authority_micro"}).join(
        hub.rename_columns({"v": "hub_micro"}), "inner", num_partitions,
        on=("doc_id",), right_on=("doc_id",), right_suffix="_r",
    ).map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "authority_micro": t.column("authority_micro").cast(pa.int64()),
            "hub_micro": t.column("hub_micro").cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def hits_oracle_sql(n_iters: int = 3, max_out: int = MAX_OUT_DEFAULT) -> str:
    """DuckDB mirror: one (authority, hub) CTE pair per round."""
    ctes = [
        "n AS (SELECT count(*)::BIGINT AS nd FROM documents)",
        f"""edges AS (
  SELECT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST(md5_number_lower('edge:' || d.doc_id::VARCHAR || ':'
                                 || j::VARCHAR) % n.nd AS BIGINT) AS dst
    FROM (SELECT doc_id, unnest(generate_series(0, doc_id % {max_out}))
                 AS j FROM documents) d, n
  ) WHERE dst != src
)""",
        f"h0 AS (SELECT doc_id, {HITS_INIT}::BIGINT AS v FROM documents)",
    ]
    for t in range(1, n_iters + 1):
        ctes.append(f"""a{t} AS (
  SELECT d.doc_id, coalesce(m.s, 0)::BIGINT AS v
  FROM documents d LEFT JOIN (
    SELECT e.dst AS doc_id, sum(p.v)::BIGINT AS s
    FROM h{t - 1} p JOIN edges e ON e.src = p.doc_id GROUP BY e.dst
  ) m ON m.doc_id = d.doc_id
)""")
        ctes.append(f"""h{t} AS (
  SELECT d.doc_id, coalesce(m.s, 0)::BIGINT AS v
  FROM documents d LEFT JOIN (
    SELECT e.src AS doc_id, sum(p.v)::BIGINT AS s
    FROM a{t} p JOIN edges e ON e.dst = p.doc_id GROUP BY e.src
  ) m ON m.doc_id = d.doc_id
)""")
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT a.doc_id, a.v AS authority_micro, h.v AS hub_micro
FROM a{n_iters} a JOIN h{n_iters} h ON h.doc_id = a.doc_id""")


def triangle_count(
    docs: rd.Dataset,
    n_docs: int,
    max_out: int = MAX_OUT_DEFAULT,
    num_partitions: int = 4,
) -> pa.Table:
    """Exact triangle count of the UNDIRECTED hash graph — the classic
    multi-way graph self-join. Plan (the standard distributed recipe):

      1. canonicalize: every directed edge becomes (a, b) with a < b,
         deduplicated (one groupby);
      2. wedges: canonical edges self-join on the LOW endpoint —
         (a,b) x (a,c) with b < c (each wedge is generated exactly
         once because both legs leave the smallest node);
      3. close: wedge (b,c) pairs semi-join the canonical edge set —
         a closed wedge is a triangle, counted exactly once.

    Two hash joins + two grouped dedups; at web scale the wedge fan-out
    is bounded by sum(deg^2) of low endpoints, which the canonical
    low->high orientation keeps at the theoretical minimum (the reason
    every production triangle counter orients edges this way)."""
    e = derive_edges(docs, n_docs, max_out=max_out)

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        return pa.table({
            "a": pa.array(np.minimum(s, d)),
            "b": pa.array(np.maximum(s, d)),
        })

    edges = (
        e.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda t: pa.table({
                "a": t.column("a").cast(pa.int64()),
                "b": t.column("b").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def ordered_wedges(t: pa.Table) -> pa.Table:
        # the self-join emits both orderings of every wedge; keeping
        # strictly b < b_r generates each wedge exactly once (mirrors
        # the oracle's e2.b > e1.b)
        if "b_r" not in t.column_names:
            return pa.table({
                "wb": pa.array([], type=pa.int64()),
                "wc": pa.array([], type=pa.int64()),
            })
        t = t.filter(pa.compute.less(t.column("b"), t.column("b_r")))
        return pa.table({
            "wb": t.column("b").cast(pa.int64()),
            "wc": t.column("b_r").cast(pa.int64()),
        })

    wedges = edges.join(
        edges, "inner", num_partitions,
        on=("a",), right_on=("a",), right_suffix="_r",
    ).map_batches(ordered_wedges, batch_format="pyarrow")

    closed = wedges.join(
        edges, "inner", num_partitions,
        on=("wb", "wc"), right_on=("a", "b"), right_suffix="_r",
    )
    n_tri = closed.count()
    return pa.table({"n_triangles": pa.array([int(n_tri)],
                                             type=pa.int64())})


TRIANGLE_ORACLE_SQL = f"""
WITH n AS (SELECT count(*)::BIGINT AS nd FROM documents),
de AS (
  SELECT src, dst FROM (
    SELECT d.doc_id AS src,
           CAST(md5_number_lower('edge:' || d.doc_id::VARCHAR || ':'
                                 || j::VARCHAR) % n.nd AS BIGINT) AS dst
    FROM (SELECT doc_id, unnest(generate_series(0, doc_id % {MAX_OUT_DEFAULT}))
                 AS j FROM documents) d, n
  ) WHERE dst != src
),
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM de)
SELECT count(*)::BIGINT AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
"""
