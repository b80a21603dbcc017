"""Column profiler — the data-quality sweep a pipeline runs before
training on an unknown table: per column, row/null counts, exact
distinct cardinality, min/max. Engine addition (the reference has no
table tooling at all); every number is recomputed by the SQL oracle.

Shape: one pass per column — nulls/min/max from a single Ray
aggregate, distinct cardinality from a groupby-then-count (the exact
path; the approximate scale path for ultra-wide high-cardinality
tables is one HLL sketch per column in a single pass, which cannot
hash-match SQL and is deliberately not the conformance surface).
Numeric min/max are rounded to 6 dp (round-half-away, the engine
convention); string columns report lexicographic min/max verbatim.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min

from semantic_pdf_search_engine_ray.functions.num import (
    round6_half_away as _r6,
)

_NUM_TYPES = (
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
    pa.float32(), pa.float64(),
)


def profile_table(ds: rd.Dataset, columns: list[str]) -> pa.Table:
    """One row per profiled column:
    (column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str) — num/str sides filled by column type, the other side
    null. n_distinct excludes nulls (SQL count(DISTINCT) convention)."""
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    n_rows = ds.count()
    out = {k: [] for k in ("column", "n_rows", "n_nulls", "n_distinct",
                           "min_num", "max_num", "min_str", "max_str")}
    for col in columns:
        numeric = types[col] in _NUM_TYPES
        sub = ds.select_columns([col])

        def drop_nulls(batch: pa.Table, _c=col) -> pa.Table:
            return batch.filter(batch.column(_c).is_valid())

        nonnull = sub.map_batches(drop_nulls, batch_format="pyarrow")
        agg = nonnull.aggregate(Count(alias_name="n"),
                                Min(col, alias_name="mn"),
                                Max(col, alias_name="mx")) or {}
        n_nn = int(agg.get("n") or 0)
        distinct = nonnull.groupby(col).count().count()
        out["column"].append(col)
        out["n_rows"].append(n_rows)
        out["n_nulls"].append(n_rows - n_nn)
        out["n_distinct"].append(int(distinct))
        if numeric and n_nn:
            out["min_num"].append(_r6(float(agg["mn"])))
            out["max_num"].append(_r6(float(agg["mx"])))
            out["min_str"].append(None)
            out["max_str"].append(None)
        elif n_nn:
            out["min_num"].append(None)
            out["max_num"].append(None)
            out["min_str"].append(str(agg["mn"]))
            out["max_str"].append(str(agg["mx"]))
        else:
            for k in ("min_num", "max_num", "min_str", "max_str"):
                out[k].append(None)
    return pa.table({
        "column": pa.array(out["column"], type=pa.string()),
        "n_rows": pa.array(out["n_rows"], type=pa.int64()),
        "n_nulls": pa.array(out["n_nulls"], type=pa.int64()),
        "n_distinct": pa.array(out["n_distinct"], type=pa.int64()),
        "min_num": pa.array(out["min_num"], type=pa.float64()),
        "max_num": pa.array(out["max_num"], type=pa.float64()),
        "min_str": pa.array(out["min_str"], type=pa.string()),
        "max_str": pa.array(out["max_str"], type=pa.string()),
    })
