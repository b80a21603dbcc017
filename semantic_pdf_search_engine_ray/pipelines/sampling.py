"""Deterministic sampling — the reproducibility primitive of a
training-data pipeline (every rerun, any parallelism, any partitioning
must select the SAME subset; ray.data.Dataset.random_sample is seeded
per-run, not per-ROW, so it cannot provide this contract).

Selection is a pure function of the row key: keep doc iff
md5_low64(key_text) % 100 < rate_pct, where md5_low64 ==
DuckDB ``md5_number_lower`` (functions/shingle.md5_hash64, verified
bit-identical) — so the SQL oracle recomputes the exact subset. A salt
yields independent samples at the same rate (e.g. disjoint train/eval
splits via different salts).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from semantic_pdf_search_engine_ray.functions.shingle import md5_hash64


def deterministic_sample(
    docs: rd.Dataset,
    rate_pct: int = 10,
    key_col: str = "doc_id",
    salt: str = "",
) -> rd.Dataset:
    """Keep ~rate_pct% of rows, selected by a per-row content hash —
    partition- and parallelism-invariant, rerun-stable. Embarrassingly
    parallel (pure map-side filter, no shuffle, no driver state)."""
    if not 0 <= rate_pct <= 100:
        raise ValueError("rate_pct must be within [0, 100]")

    def pick(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        mask = np.fromiter(
            (md5_hash64(f"{salt}{k}") % 100 < rate_pct for k in keys),
            dtype=bool, count=len(keys),
        )
        return batch.filter(pa.array(mask))

    return docs.map_batches(pick, batch_format="pyarrow")


def stratified_sample(
    docs: rd.Dataset,
    rates_pct: dict[str, int],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_pct: int = 0,
    salt: str = "",
) -> rd.Dataset:
    """Per-stratum deterministic sampling (e.g. downsample English to
    rebalance a multilingual corpus): each stratum gets its own keep
    rate; selection stays a pure per-row hash function, so the subset is
    partition/parallelism/rerun invariant and SQL-recomputable. Still a
    pure map-side filter — the rate table is a tiny broadcast constant,
    never a shuffle."""
    for v in rates_pct.values():
        if not 0 <= v <= 100:
            raise ValueError("rates must be within [0, 100]")

    def pick(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        strata = batch.column(stratum_col).to_pylist()
        mask = np.fromiter(
            (md5_hash64(f"{salt}{k}") % 100
             < rates_pct.get(s, default_pct)
             for k, s in zip(keys, strata)),
            dtype=bool, count=len(keys),
        )
        return batch.filter(pa.array(mask))

    return docs.map_batches(pick, batch_format="pyarrow")


def capped_per_group_sample(
    docs: rd.Dataset,
    cap: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "",
) -> rd.Dataset:
    """Keep at most ``cap`` rows per group, chosen by deterministic
    hash rank — the per-domain cap every web-corpus recipe applies
    (bound any one source's share of the training mix) with the same
    rerun/parallelism invariance as the samplers above.

    Two-phase, skew-proof: each batch keeps its LOCAL best ``cap`` per
    group (selection rank is a pure row function, so local pruning is
    lossless), then one tiny groupby over <= cap x |groups| x n_blocks
    survivors picks the global winners. The corpus itself never
    shuffles on the (hot, low-cardinality) group key.

    Selection rank: (md5_low64(salt + key) ASC, key ASC) — mirrored in
    SQL by row_number() OVER (PARTITION BY group ORDER BY
    md5_number_lower(...), key).
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")

    def local_prune(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        groups = batch.column(group_col).to_pylist()
        h = np.fromiter((md5_hash64(f"{salt}{k}") for k in keys),
                        dtype=np.uint64, count=len(keys))
        keep_idx: list[int] = []
        per: dict[str, list[int]] = {}
        for i, g in enumerate(groups):
            per.setdefault(g, []).append(i)
        for g, idxs in per.items():
            idxs.sort(key=lambda i: (h[i], keys[i]))
            keep_idx.extend(idxs[:cap])
        keep_idx.sort()
        out = batch.take(pa.array(keep_idx, type=pa.int64()))
        return out.append_column(
            "_h", pa.array(h[keep_idx].astype(np.uint64), type=pa.uint64())
        )

    def final_prune(group: pa.Table) -> pa.Table:
        keys = group.column(key_col).to_pylist()
        h = group.column("_h").to_numpy()
        order = sorted(range(len(keys)), key=lambda i: (h[i], keys[i]))
        return group.take(
            pa.array(sorted(order[:cap]), type=pa.int64())
        ).drop_columns(["_h"])

    return (
        docs.map_batches(local_prune, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final_prune, batch_format="pyarrow")
    )


def split_assign(
    docs: rd.Dataset,
    pcts: tuple[int, int, int] = (80, 10, 10),
    key_col: str = "doc_id",
    salt: str = "split:",
) -> rd.Dataset:
    """Deterministic train/val/test assignment — the canonical last step
    of a training-data pipeline. bucket = md5_low64(salt+key) % 100;
    [0,train) -> 'train', [train,train+val) -> 'val', rest -> 'test'.

    Pure map-side (no shuffle, no driver state), parallelism- and
    rerun-invariant, and content-keyed so re-ingesting the same corpus
    reproduces the same split — the property that keeps eval sets
    uncontaminated across pipeline reruns. Mirrored exactly by the SQL
    oracle via ``md5_number_lower(salt || key) % 100``."""
    train, val, test = pcts
    if train + val + test != 100 or min(pcts) < 0:
        raise ValueError("pcts must be non-negative and sum to 100")

    def assign(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        b = np.fromiter((md5_hash64(f"{salt}{k}") % 100 for k in keys),
                        dtype=np.int64, count=len(keys))
        split = np.where(b < train, "train",
                         np.where(b < train + val, "val", "test"))
        return pa.table({
            key_col: batch.column(key_col).cast(pa.int64()),
            "bucket": pa.array(b, type=pa.int64()),
            "split": pa.array(split.tolist(), type=pa.string()),
        })

    return docs.map_batches(assign, batch_format="pyarrow")
