"""Windowed aggregation over an event stream table.

The reference has no windowing at all (SURVEY.md §2.6: "no joins-proper,
windows, watermarks"); this is an engine addition for the training-data
pipeline surface. Tumbling windows are expressed the Ray-Data-first way:
a vectorized window-assignment ``map_batches`` (Arrow ``floor_temporal``)
followed by a single hash-keyed ``groupby().aggregate()`` — the window
key is uniform, so the shuffle has no skew by construction.

Window starts are emitted as int64 epoch seconds (not timestamps) so the
result is comparable across engines (the SQL oracle uses
``epoch(date_trunc(...))::BIGINT``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from semantic_pdf_search_engine_ray.functions.num import round6_half_away

_UNIT_SECONDS = {"hour": 3600, "day": 86400, "minute": 60}


def _epoch_seconds(col) -> pa.Array:
    """Timestamp column (ANY unit: s/ms/us/ns) -> int64 epoch seconds.
    Flooring to whole seconds first makes the unit cast lossless, so a
    pandas-born ns column and a parquet us column window identically."""
    whole = pc.floor_temporal(col, unit="second")
    return pc.cast(pc.cast(whole, pa.timestamp("s")), pa.int64())


def assign_tumbling(unit: str):
    """map_batches fn: add ``window_start`` (int64 epoch seconds)."""
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unsupported window unit {unit!r}")

    def assign(batch: pa.Table) -> pa.Table:
        floored = pc.floor_temporal(batch.column("ts"), unit=unit)
        return batch.append_column(
            "window_start", _epoch_seconds(floored)
        )

    return assign


def assign_sliding(size_s: int, step_s: int):
    """map_batches fn: one input row -> one row per overlapping sliding
    window (``window_start`` int64 epoch seconds). ceil(size/step) windows
    cover each event; fully vectorized repeat+mask."""
    if size_s % step_s != 0:
        raise ValueError("size must be a multiple of step")
    k = size_s // step_s

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np

        epoch = _epoch_seconds(batch.column("ts")).to_numpy(
            zero_copy_only=False
        )
        # numpy % is FLOORED modulo, so pre-1970 (negative-epoch) events
        # still land in the window containing them; the SQL oracle
        # mirrors this with ((e % step) + step) % step
        base = epoch - epoch % step_s
        n = len(epoch)
        # with size a multiple of step, EVERY one of the k trailing
        # windows covers the event (w <= e < w+size holds for all k),
        # so the fan-out is unconditional
        idx = np.repeat(np.arange(n), k)
        offs = np.tile(np.arange(k, dtype=np.int64) * step_s, n)
        starts = base[idx] - offs
        out = batch.take(pa.array(idx))
        return out.append_column(
            "window_start", pa.array(starts, type=pa.int64())
        )

    return assign


def sliding_agg(
    events: rd.Dataset,
    size_s: int = 3600,
    step_s: int = 1800,
    key: str = "event_type",
) -> rd.Dataset:
    """Sliding-window aggregate: count/sum of ``value`` per
    (window_start, key) for windows of ``size_s`` advancing by
    ``step_s``. The window fan-out (xk rows) happens map-side and the
    exchange stays one hash aggregate — no per-window jobs."""
    return (
        events.map_batches(assign_sliding(size_s, step_s),
                           batch_format="pyarrow")
        .select_columns(["window_start", key, "value"])
        .groupby(["window_start", key])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"),
        )
    )


def sessionize(
    events: rd.Dataset,
    gap_s: int = 1800,
) -> rd.Dataset:
    """Gap-based session assignment — the classic event-stream operator
    (a session ends after ``gap_s`` seconds of user inactivity).

    Ray-Data-first shape: ONE hash shuffle on user_id
    (``groupby().map_groups``), then each group is sorted and split
    locally with vectorized numpy (diff > gap). user_id is a uniform
    key; per-user event counts are human-bounded, so groups never
    explode — the same partitioning assumption every sessionizer makes.
    Output: one row per session
    (user_id, session_id, n_events, sum_value, t_start, t_end) with
    session_id numbered 0.. per user in time order and int64-second
    bounds (comparable across engines, like the window ops).
    """

    def split_user(group: pa.Table) -> pa.Table:
        import numpy as np

        epoch = _epoch_seconds(group.column("ts")).to_numpy(
            zero_copy_only=False
        )
        value = group.column("value").to_numpy(zero_copy_only=False)
        order = np.argsort(epoch, kind="stable")
        epoch = epoch[order]
        value = value[order]
        # new session where the gap STRICTLY exceeds gap_s (pinned; the
        # SQL oracle uses the same > comparison)
        new_sess = np.zeros(len(epoch), dtype=np.int64)
        if len(epoch) > 1:
            new_sess[1:] = (np.diff(epoch) > gap_s).astype(np.int64)
        sess = np.cumsum(new_sess)
        n_sessions = int(sess[-1]) + 1 if len(sess) else 0
        uid = group.column("user_id")[0].as_py()
        out_n = np.bincount(sess, minlength=n_sessions)
        out_sum = np.bincount(sess, weights=value, minlength=n_sessions)
        starts = np.zeros(n_sessions, dtype=np.int64)
        ends = np.zeros(n_sessions, dtype=np.int64)
        first = np.searchsorted(sess, np.arange(n_sessions), side="left")
        last = np.searchsorted(sess, np.arange(n_sessions), side="right") - 1
        starts = epoch[first]
        ends = epoch[last]
        return pa.table(
            {"user_id": pa.array([uid] * n_sessions, type=pa.int64()),
             "session_id": pa.array(np.arange(n_sessions, dtype=np.int64)),
             "n_events": pa.array(out_n.astype(np.int64)),
             "sum_value": pa.array(
                 [round6_half_away(float(x)) for x in out_sum],
                 type=pa.float64()),
             "t_start": pa.array(starts),
             "t_end": pa.array(ends)}
        )

    return (
        events.select_columns(["user_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(split_user, batch_format="pyarrow")
    )


def value_histogram(
    events: rd.Dataset, width: float = 5.0, key: str = "event_type"
) -> rd.Dataset:
    """Per-(key, bin) histogram with PINNED bins (bin = floor(value /
    width)) — no min/max pre-pass, so the bin spec is deterministic and
    SQL-mirrorable. Map-side partial counting (an Arrow group_by inside
    every batch) shrinks the shuffle to one row per (key, bin, block)
    before the global hash aggregate — the explicit combiner pattern the
    100 TB plan requires for high-cardinality histograms."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        vals = batch.column("value").to_numpy(zero_copy_only=False)
        bins = np.floor(vals / width).astype(np.int64)
        t = pa.table({key: batch.column(key),
                      "bin": pa.array(bins)})
        return t.group_by([key, "bin"]).aggregate([([], "count_all")]) \
            .rename_columns([key, "bin", "partial_n"])

    return (
        events.select_columns([key, "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([key, "bin"])
        .aggregate(Sum("partial_n", alias_name="n"))
    )


def value_quantiles(
    events: rd.Dataset,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    key: str = "event_type",
) -> rd.Dataset:
    """Exact per-key quantiles, DuckDB ``quantile_disc`` convention
    (sorted element at index ceil(q*n)-1 — verified against DuckDB 1.0).
    One hash shuffle on the key; per-group numpy sort. Exactness is the
    oracle contract; the approximate scale path for ungrouped/huge groups
    is a mergeable sketch (t-digest/KLL) which cannot hash-match SQL and
    is therefore deliberately not the conformance surface."""

    def group_q(group: pa.Table) -> pa.Table:
        import math

        import numpy as np

        vals = np.sort(group.column("value").to_numpy(
            zero_copy_only=False))
        n = len(vals)
        k = group.column(key)[0].as_py()
        out_q, out_v = [], []
        for q in qs:
            idx = max(int(math.ceil(q * n)) - 1, 0)
            out_q.append(q)
            # exact data element — bit-identical to SQL, no rounding
            out_v.append(float(vals[idx]))
        return pa.table(
            {key: pa.array([k] * len(qs)),
             "q": pa.array(out_q, type=pa.float64()),
             "value": pa.array(out_v, type=pa.float64())}
        )

    return (
        events.select_columns([key, "value"])
        .groupby(key)
        .map_groups(group_q, batch_format="pyarrow")
    )


def tumbling_agg(
    events: rd.Dataset, unit: str = "hour", key: str = "event_type"
) -> rd.Dataset:
    """Per (tumbling window, key): count / sum / min / max of ``value``.

    Pre-aggregation note: Ray Data's hash aggregate already combines
    per-block before the exchange, so the shuffle moves one partial row
    per (window, key, block) — the map-side combine the 100 TB plan
    requires.
    """
    return (
        events.map_batches(assign_tumbling(unit), batch_format="pyarrow")
        .select_columns(["window_start", key, "value"])
        .groupby(["window_start", key])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
    )


def tumbling_distinct_users(
    events: rd.Dataset, unit: str = "hour", key: str = "event_type"
) -> rd.Dataset:
    """Per (tumbling window, key): event count + EXACT distinct-user
    count — the count-distinct aggregate class (DAU/uniques). Exact by
    a two-stage shuffle: groupby(window, key, user) collapses each
    user to one row with their event count (combiner-friendly, skew
    bounded by true cardinality), then a tiny groupby(window, key)
    counts rows and sums events. The approximate scale path for
    billion-user windows is a mergeable HLL sketch, which cannot
    hash-match SQL and is deliberately not the conformance surface."""
    per_user = (
        events.map_batches(assign_tumbling(unit), batch_format="pyarrow")
        .select_columns(["window_start", key, "user_id"])
        .groupby(["window_start", key, "user_id"])
        .aggregate(Count(alias_name="n"))
    )
    return (
        per_user.groupby(["window_start", key])
        .aggregate(Count(alias_name="n_users"),
                   Sum("n", alias_name="n_events"))
    )


def rollup_events(
    events: rd.Dataset, key: str = "event_type"
) -> rd.Dataset:
    """GROUP BY ROLLUP((key, hour-of-day)) — detail rows plus per-key
    subtotals plus a grand total, NULL key columns marking the subtotal
    levels (the SQL ROLLUP output contract).

    Scale shape: only the DETAIL aggregation touches the corpus (one
    hash groupby with Ray's built-in map-side combine); both subtotal
    levels re-aggregate the already-tiny detail table (|keys| x 24
    rows), so the rollup costs one corpus pass regardless of how many
    levels it emits. Money-style exactness: ``value`` is 2-decimal and
    positive, so integer cents make every subtotal an exact BIGINT."""

    def derive(batch: pa.Table) -> pa.Table:
        hour = pc.hour(batch.column("ts")).cast(pa.int64())
        v = batch.column("value").to_numpy()
        return pa.table({
            key: batch.column(key),
            "hour": hour,
            "value_c": pa.array(
                np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    detail = (
        events.map_batches(derive, batch_format="pyarrow")
        .groupby([key, "hour"])
        .aggregate(Count(alias_name="n_events"),
                   Sum("value_c", alias_name="value_c"))
        .map_batches(
            lambda t: pa.table({
                key: t.column(key),
                "hour": t.column("hour").cast(pa.int64()),
                "n_events": t.column("n_events").cast(pa.int64()),
                "value_c": t.column("value_c").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .materialize()
    )

    per_key = (
        detail.groupby(key)
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("value_c", alias_name="value_c"))
        .map_batches(
            lambda t: pa.table({
                key: t.column(key),
                "hour": pa.nulls(len(t), type=pa.int64()),
                "n_events": t.column("n_events").cast(pa.int64()),
                "value_c": t.column("value_c").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )

    tot = detail.aggregate(Sum("n_events", alias_name="n"),
                           Sum("value_c", alias_name="v"))
    total = rd.from_arrow(pa.table({
        key: pa.nulls(1, type=pa.string()),
        "hour": pa.nulls(1, type=pa.int64()),
        "n_events": pa.array([int(tot.get("n") or 0)], type=pa.int64()),
        "value_c": pa.array([int(tot.get("v") or 0)], type=pa.int64()),
    }))
    return detail.union(per_key).union(total)


def user_event_lag(events: rd.Dataset) -> rd.Dataset:
    """Ordered window functions per partition: for every event, its
    1-based sequence number within the user's timeline and the gap in
    whole seconds since the user's previous event (NULL on the first) —
    row_number() and lag() OVER (PARTITION BY user ORDER BY ts, id).

    One user-hash shuffle (groupby.map_groups, the sessionize plan);
    inside each group a single argsort orders the timeline. Ordering
    key pinned (epoch_s, event_id) so concurrent same-second events
    sequence deterministically."""

    def seq(group: pa.Table) -> pa.Table:
        epoch = _epoch_seconds(group.column("ts")).to_numpy(
            zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, epoch))
        epoch_o = epoch[order]
        gaps = np.empty(len(order), dtype=np.float64)
        gaps[0] = np.nan
        if len(order) > 1:
            gaps[1:] = (epoch_o[1:] - epoch_o[:-1]).astype(np.float64)
        return pa.table({
            "event_id": pa.array(eid[order], type=pa.int64()),
            "user_id": group.column("user_id").take(
                pa.array(order, type=pa.int64())).cast(pa.int64()),
            "seq": pa.array(np.arange(1, len(order) + 1,
                                      dtype=np.int64)),
            "gap_s": pa.array(
                [None if np.isnan(g) else int(g) for g in gaps],
                type=pa.int64()),
        })

    return (
        events.select_columns(["event_id", "user_id", "ts"])
        .groupby("user_id")
        .map_groups(seq, batch_format="pyarrow")
    )


def value_moments(events: rd.Dataset, key: str = "event_type") -> rd.Dataset:
    """Per-key statistical moments (count, mean, population variance /
    stddev) from EXACT integer power sums: value is 2-decimal positive,
    so sum(x_c) and sum(x_c^2) in cents are exact BIGINTs and the only
    float ops are the closing divisions — written identically in the
    SQL oracle, so the distributed summation order cannot move a digit
    (the Welford-vs-naive numerical-stability debate disappears when
    the sums are integers). One hash groupby with built-in map-side
    combine."""

    def derive(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy()
        x = np.floor(v * 100 + 0.5).astype(np.int64)
        return pa.table({
            key: batch.column(key),
            "x_c": pa.array(x),
            "x2_c": pa.array(x * x),
        })

    agg = (
        events.map_batches(derive, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Count(alias_name="n"),
                   Sum("x_c", alias_name="s1"),
                   Sum("x2_c", alias_name="s2"))
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy().astype(np.int64)
        s1 = t.column("s1").to_numpy().astype(np.int64)
        s2 = t.column("s2").to_numpy().astype(np.int64)
        # expressions mirrored 1:1 in SQL (same association order)
        mean = s1 / n / 100.0
        var = (s2 * 1.0 / n - (s1 * 1.0 / n) * (s1 * 1.0 / n)) / 10000.0
        std = np.sqrt(var)

        def r6(v: np.ndarray) -> np.ndarray:
            # vectorized DuckDB round() (half away from zero)
            return np.copysign(np.floor(np.abs(v) * 1e6 + 0.5), v) / 1e6

        return pa.table({
            key: t.column(key),
            "n": pa.array(n, type=pa.int64()),
            "mean_r": pa.array(r6(mean), type=pa.float64()),
            "var_r": pa.array(r6(var), type=pa.float64()),
            "std_r": pa.array(r6(std), type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def global_quantiles_histogram(
    events: rd.Dataset, qs: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> pa.Table:
    """EXACT global quantiles without any sort — the scale path for
    bounded-precision numeric columns (here 2-decimal money-like
    values): the whole distribution reduces to a cents histogram whose
    size is bounded by the value DOMAIN (~49k bins), not the row count,
    so a 10^12-row column still exchanges only (bin, count) partials.
    Selection walks the cumulative histogram to the same
    ``ceil(q*n)-1`` index `value_quantiles` uses, and ``cent/100.0`` is
    the identical IEEE double the source stored (both are the nearest
    double to the exact 2-decimal rational — asserted on the fixture),
    so the result is bit-identical to DuckDB's ``quantile_disc`` over
    the raw column."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy()
        c = np.floor(v * 100 + 0.5).astype(np.int64)
        cents, counts = np.unique(c, return_counts=True)
        return pa.table({
            "cent": pa.array(cents),
            "n": pa.array(counts.astype(np.int64)),
        })

    hist = (
        events.select_columns(["value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cent")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # domain-bounded: <=|distinct cents| rows
        .sort_values("cent")
    )
    import math

    cents = hist["cent"].to_numpy()
    cum = hist["n"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        idx = max(int(math.ceil(q * n)) - 1, 0)
        pos = int(np.searchsorted(cum, idx + 1, side="left"))
        out_q.append(q)
        out_v.append(float(cents[pos] / 100.0))
    return pa.table({
        "q": pa.array(out_q, type=pa.float64()),
        "value": pa.array(out_v, type=pa.float64()),
    })


def resample_hourly_filled(
    events: rd.Dataset, key: str = "event_type"
) -> pa.Table:
    """Gap-filled hourly resampling: every (key, hour) cell of the full
    [min hour, max hour] grid, zero-filled where no events landed — the
    time-series shaping step before any forecasting/anomaly model.

    Scale shape: the corpus pass is the same one hash aggregate as
    `tumbling_agg`; the GRID is bounded by time-span x |keys| (hours,
    not rows — a year is 8,760 cells/key no matter how many trillion
    events), so densification happens on the aggregated table. Output:
    (key, window_start, n_events, value_c) with integer-cents sums."""

    def derive(batch: pa.Table) -> pa.Table:
        floored = pc.floor_temporal(batch.column("ts"), unit="hour")
        v = batch.column("value").to_numpy()
        return pa.table({
            key: batch.column(key),
            "window_start": _epoch_seconds(floored),
            "value_c": pa.array(
                np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    agg = (
        events.map_batches(derive, batch_format="pyarrow")
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n_events"),
                   Sum("value_c", alias_name="value_c"))
        .to_pandas()  # span x keys bounded, not row-count bounded
    )
    if len(agg) == 0:
        return pa.table({
            key: pa.array([], type=pa.string()),
            "window_start": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "value_c": pa.array([], type=pa.int64()),
        })
    lo, hi = int(agg["window_start"].min()), int(agg["window_start"].max())
    grid_ws = np.arange(lo, hi + 1, 3600, dtype=np.int64)
    keys = sorted(agg[key].unique())
    have = {(k, int(w)): (int(n), int(v)) for k, w, n, v in zip(
        agg[key], agg["window_start"], agg["n_events"], agg["value_c"])}
    out_k, out_w, out_n, out_v = [], [], [], []
    for k in keys:
        for w in grid_ws:
            n, v = have.get((k, int(w)), (0, 0))
            out_k.append(k)
            out_w.append(int(w))
            out_n.append(n)
            out_v.append(v)
    return pa.table({
        key: pa.array(out_k, type=pa.string()),
        "window_start": pa.array(out_w, type=pa.int64()),
        "n_events": pa.array(out_n, type=pa.int64()),
        "value_c": pa.array(out_v, type=pa.int64()),
    })


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_counts(events: rd.Dataset) -> pa.Table:
    """Greedy 3-stage funnel (the product-analytics conversion query):
    a user converts stage k when an event of that type exists STRICTLY
    after their stage-(k-1) match (earliest-match greedy, whole-second
    timestamps — the same convention as the windows family). Output:
    one row of per-stage converted-user counts.

    One user-hash shuffle (groupby.map_groups emits a 3-flag row per
    user), then a count-sum over |users| tiny rows."""

    def per_user(group: pa.Table) -> pa.Table:
        epoch = _epoch_seconds(group.column("ts")).to_numpy(
            zero_copy_only=False)
        types = group.column("event_type").to_pylist()
        flags = []
        cutoff = -np.inf
        for stage in FUNNEL_STAGES:
            cand = [e for e, t in zip(epoch, types)
                    if t == stage and e > cutoff]
            if not cand:
                flags.extend([0] * (len(FUNNEL_STAGES) - len(flags)))
                break
            cutoff = min(cand)
            flags.append(1)
        return pa.table({
            "s1": pa.array([flags[0]], type=pa.int64()),
            "s2": pa.array([flags[1]], type=pa.int64()),
            "s3": pa.array([flags[2]], type=pa.int64()),
        })

    agg = (
        events.select_columns(["user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .aggregate(Sum("s1", alias_name="n_view"),
                   Sum("s2", alias_name="n_click_after"),
                   Sum("s3", alias_name="n_purchase_after"))
    )
    return pa.table({
        "n_view": pa.array([int(agg.get("n_view") or 0)],
                           type=pa.int64()),
        "n_click_after": pa.array([int(agg.get("n_click_after") or 0)],
                                  type=pa.int64()),
        "n_purchase_after": pa.array(
            [int(agg.get("n_purchase_after") or 0)], type=pa.int64()),
    })


def retention_cohorts(events: rd.Dataset) -> rd.Dataset:
    """Cohort retention (the classic growth-analytics triangle): users
    cohorted by FIRST-SEEN day; for every (cohort_day, age_days) cell,
    how many distinct cohort members were active age_days days later.

    Plan: first-seen = one user groupby (min day); activity days =
    per-(user, day) collapse (distinct-day dedup, combiner-friendly);
    the two user-keyed tables hash-join (both shrink to |users| and
    |user-days| rows long before the join — at web scale this is the
    join of two pre-aggregates, never raw events); then a tiny
    (cohort, age) grouped count."""
    from ray.data.aggregate import Min as AggMin

    def to_days(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.timestamp("s")), pa.int64())
        return pa.table({
            "user_id": batch.column("user_id").cast(pa.int64()),
            "day": pc.divide(day, 86400).cast(pa.int64()),
        })

    user_days = (
        events.select_columns(["user_id", "ts"])
        .map_batches(to_days, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Count(alias_name="_n"))
        .materialize()
    )
    first_seen = (
        user_days.groupby("user_id")
        .aggregate(AggMin("day", alias_name="cohort_day"))
        .materialize()
    )
    joined = user_days.join(
        first_seen, "inner", 4,
        on=("user_id",), right_on=("user_id",), right_suffix="_r",
    )

    def derive(t: pa.Table) -> pa.Table:
        day = t.column("day").to_numpy()
        cohort = t.column("cohort_day").to_numpy()
        return pa.table({
            "cohort_day": pa.array(cohort.astype(np.int64)),
            "age_days": pa.array((day - cohort).astype(np.int64)),
        })

    return (
        joined.map_batches(derive, batch_format="pyarrow")
        .groupby(["cohort_day", "age_days"])
        .aggregate(Count(alias_name="n_users"))
        .map_batches(
            lambda t: pa.table({
                "cohort_day": t.column("cohort_day").cast(pa.int64()),
                "age_days": t.column("age_days").cast(pa.int64()),
                "n_users": t.column("n_users").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


def event_transitions(events: rd.Dataset) -> rd.Dataset:
    """First-order behavior model: counts of (previous event_type ->
    next event_type) transitions along each user's timeline — the
    empirical Markov transition matrix user-journey models start from.
    Ordering pinned to (epoch_s, event_id) like `user_event_lag`. One
    user-hash shuffle; per-group transition pairs pre-count in-group
    (at most |types|^2 rows leave each group) before the global sum."""

    def per_user(group: pa.Table) -> pa.Table:
        epoch = _epoch_seconds(group.column("ts")).to_numpy(
            zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_pylist()
        order = np.lexsort((eid, epoch))
        seq = [types[i] for i in order]
        counts: dict[tuple[str, str], int] = {}
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        return pa.table({
            "prev_type": pa.array([k[0] for k in counts],
                                  type=pa.string()),
            "next_type": pa.array([k[1] for k in counts],
                                  type=pa.string()),
            "n": pa.array(list(counts.values()), type=pa.int64()),
        })

    return (
        events.select_columns(["user_id", "event_id", "ts",
                               "event_type"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n_transitions"))
        .map_batches(
            lambda t: pa.table({
                "prev_type": t.column("prev_type"),
                "next_type": t.column("next_type"),
                "n_transitions": t.column("n_transitions").cast(
                    pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


def trimmed_mean(
    events: rd.Dataset,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    key: str = "event_type",
) -> rd.Dataset:
    """Robust per-key mean: average of values inside the
    [quantile_disc(lo), quantile_disc(hi)] band — the outlier-immune
    aggregate monitoring dashboards actually want. Band bounds use the
    same ceil(q*n)-1 discrete-quantile rule as `value_quantiles`;
    band-inclusive values sum in exact integer cents, so the only
    float op is the closing division. One hash shuffle + per-group
    sort (bounded groups); the unsorted scale path for huge groups is
    the cents histogram (`global_quantiles_histogram`)."""

    def group_tm(group: pa.Table) -> pa.Table:
        import math

        v = group.column("value").to_numpy(zero_copy_only=False)
        c = np.sort(np.floor(v * 100 + 0.5).astype(np.int64))
        n = len(c)
        lo = c[max(int(math.ceil(lo_q * n)) - 1, 0)]
        hi = c[max(int(math.ceil(hi_q * n)) - 1, 0)]
        band = c[(c >= lo) & (c <= hi)]
        s, m = int(band.sum()), len(band)
        tm = s * 1.0 / m / 100.0
        tm_r = math.copysign(math.floor(abs(tm) * 1e6 + 0.5), tm) / 1e6
        return pa.table({
            key: pa.array([group.column(key)[0].as_py()]),
            "n_in_band": pa.array([m], type=pa.int64()),
            "trimmed_mean_r": pa.array([tm_r], type=pa.float64()),
        })

    return (
        events.select_columns([key, "value"])
        .groupby(key)
        .map_groups(group_tm, batch_format="pyarrow")
    )


def anomalous_days(
    events: rd.Dataset, z_threshold: float = 2.0
) -> rd.Dataset:
    """Volume-anomaly days: daily event counts whose z-score against
    the all-days mean/std exceeds the threshold — the monitoring alarm
    every event pipeline ends in. One corpus-sized hash aggregate
    (daily counts); mean/std derive from exact integer power sums over
    the span-bounded daily table, and the z expression is written
    identically in SQL (both sides flag the same days bit-for-bit)."""

    def day_counts(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.timestamp("s")), pa.int64())
        return pa.table({"day": day})

    daily = (
        events.select_columns(["ts"])
        .map_batches(day_counts, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n_events"))
        .to_pandas()  # span-bounded (days), not row-bounded
    )
    n = daily["n_events"].to_numpy().astype(np.int64)
    days = daily["day"].to_numpy().astype(np.int64)
    m = len(n)
    s1, s2 = int(n.sum()), int((n * n).sum())
    mean = s1 * 1.0 / m
    var = s2 * 1.0 / m - (s1 * 1.0 / m) * (s1 * 1.0 / m)
    std = float(np.sqrt(var))
    if std == 0.0:
        # zero variance = every day identical = nothing anomalous; the
        # SQL mirror's `abs((n-mean)/std) > t` is likewise empty (NULL
        # from division never exceeds t). Guarding avoids nan/inf flags.
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "day": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "z_r": pa.array([], type=pa.float64()),
        }))
    z = (n - mean) / std
    keep = np.abs(z) > z_threshold
    z_r = np.copysign(np.floor(np.abs(z[keep]) * 1e6 + 0.5),
                      z[keep]) / 1e6
    import ray.data as _rd

    return _rd.from_arrow(pa.table({
        "day": pa.array(days[keep]),
        "n_events": pa.array(n[keep]),
        "z_r": pa.array(z_r, type=pa.float64()),
    }))


def weekday_profile(events: rd.Dataset, key: str = "event_type") -> rd.Dataset:
    """Seasonality profile: per (key, ISO weekday 0=Mon..6=Sun) event
    counts and exact-cents value sums — the weekly-shape fingerprint
    dashboards overlay. One hash aggregate with a 7-value derived key
    (no skew by construction)."""

    def derive(batch: pa.Table) -> pa.Table:
        # Arrow day_of_week: 0=Monday (matches DuckDB isodow-1)
        dow = pc.day_of_week(batch.column("ts")).cast(pa.int64())
        v = batch.column("value").to_numpy()
        return pa.table({
            key: batch.column(key),
            "weekday": dow,
            "value_c": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    return (
        events.map_batches(derive, batch_format="pyarrow")
        .groupby([key, "weekday"])
        .aggregate(Count(alias_name="n_events"),
                   Sum("value_c", alias_name="value_c"))
        .map_batches(
            lambda t: pa.table({
                key: t.column(key),
                "weekday": t.column("weekday").cast(pa.int64()),
                "n_events": t.column("n_events").cast(pa.int64()),
                "value_c": t.column("value_c").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


PROPS_K_PATTERN = '"k": (?P<kv>[0-9]+)'


def props_field_stats(events: rd.Dataset, key: str = "event_type") -> rd.Dataset:
    """Semi-structured extraction: pull the integer ``k`` field out of
    the JSON ``props`` column and aggregate it per key (count, sum,
    min, max, distinct count) — the schema-on-read step every event
    pipeline needs for its property bags. Extraction is VECTORIZED
    Arrow regex (`pc.extract_regex`), no per-row JSON parser; the SQL
    mirror uses the identical RE2 pattern, so both engines read the
    same bytes. Distinct count is exact via the two-stage collapse
    (the `tumbling_distinct_users` plan)."""

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), PROPS_K_PATTERN)
        k_val = pc.cast(pc.struct_field(m, "kv"), pa.int64())
        return pa.table({
            key: batch.column(key),
            "k": k_val,
        })

    ext = events.map_batches(extract, batch_format="pyarrow")
    per_kv = (
        ext.groupby([key, "k"])
        .aggregate(Count(alias_name="n"))
        .materialize()
    )
    base = (
        ext.groupby(key)
        .aggregate(Count(alias_name="n_events"),
                   Sum("k", alias_name="sum_k"),
                   Min("k", alias_name="min_k"),
                   Max("k", alias_name="max_k"))
    )
    distinct = per_kv.groupby(key).aggregate(
        Count(alias_name="n_distinct_k"))
    return base.join(
        distinct.materialize(), "inner", 2,
        on=(key,), right_on=(key,), right_suffix="_r",
    ).map_batches(
        lambda t: pa.table({
            key: t.column(key),
            "n_events": t.column("n_events").cast(pa.int64()),
            "sum_k": t.column("sum_k").cast(pa.int64()),
            "min_k": t.column("min_k").cast(pa.int64()),
            "max_k": t.column("max_k").cast(pa.int64()),
            "n_distinct_k": t.column("n_distinct_k").cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )
