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
