"""Relational operators over the TPC-H-style side tables — the general
data-processing surface of the engine (a user of the reference's
pipeline also has orders/lineitem-shaped logs next to their documents).

    pricing_summary   TPC-H Q1-shaped grouped aggregate over lineitem
    segment_revenue   orders x customer hash join -> per-segment totals
    asof_click_attribution
                      AS-OF join inside the events stream: every
                      purchase attributed to the same user's latest
                      click at-or-before it

Money arithmetic is INTEGER-EXACT by design: 2-decimal prices and
discounts are scaled to integer cents (floor(x*scale + 0.5) — positive
half-away rounding, mirrored verbatim in the SQL oracles) before
summing, so distributed vs sequential float summation order can never
flip a digit. Averages divide exact integers once (bit-identical
doubles in every engine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max as MaxAgg, Sum

Q1_CUTOFF = "1998-09-02 00:00:00"  # mid-range of the synthetic shipdates


def _cents(arr: np.ndarray, scale: int) -> np.ndarray:
    """Positive-domain half-away integer scaling (== the SQL oracle's
    CAST(floor(x * scale + 0.5) AS BIGINT))."""
    return np.floor(arr * scale + 0.5).astype(np.int64)


def pricing_summary(lineitem: rd.Dataset) -> rd.Dataset:
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus) over rows with
    l_shipdate <= Q1_CUTOFF — item counts, quantity, base price,
    discounted price, charge (all exact-integer sums) and their
    averages. One pinned-key hash aggregate; Ray's hash groupby combines
    per block before the exchange (map-side combine for free)."""

    def derive(batch: pa.Table) -> pa.Table:
        mask = pc.less_equal(
            batch.column("l_shipdate"),
            pa.scalar(np.datetime64(Q1_CUTOFF.replace(" ", "T"), "us")),
        )
        batch = batch.filter(mask)
        qty = batch.column("l_quantity").to_numpy()
        price = batch.column("l_extendedprice").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        tax = batch.column("l_tax").to_numpy()
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pa.array(qty.astype(np.int64)),
                "base_c": pa.array(_cents(price, 100)),
                # price(2dp) * (1-disc)(2dp) -> exact at 4 decimals
                "disc_c": pa.array(_cents(price * (1.0 - disc), 10_000)),
                # * (1+tax)(2dp) -> exact at 6 decimals
                "charge_c": pa.array(
                    _cents(price * (1.0 - disc) * (1.0 + tax), 1_000_000)
                ),
            }
        )

    agg = (
        lineitem.map_batches(derive, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_c", alias_name="sum_base_c"),
            Sum("disc_c", alias_name="sum_disc_c"),
            Sum("charge_c", alias_name="sum_charge_c"),
            Count(alias_name="n_items"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_items").to_numpy().astype(np.float64)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": batch.column("sum_qty").cast(pa.int64()),
                "sum_base_c": batch.column("sum_base_c").cast(pa.int64()),
                "sum_disc_c": batch.column("sum_disc_c").cast(pa.int64()),
                "sum_charge_c": batch.column("sum_charge_c").cast(
                    pa.int64()
                ),
                "n_items": batch.column("n_items").cast(pa.int64()),
                # exact-int / exact-int: bit-identical double everywhere
                "avg_qty": pa.array(
                    batch.column("sum_qty").to_numpy() / n,
                    type=pa.float64(),
                ),
                "avg_price_c": pa.array(
                    batch.column("sum_base_c").to_numpy() / n,
                    type=pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def segment_revenue(
    orders: rd.Dataset, customer: rd.Dataset, num_partitions: int = 4
) -> rd.Dataset:
    """Revenue per market segment: orders hash-JOINED to customer on
    custkey (at TPC-H shape customer is the small side; at web scale
    both sides shuffle — which is what Dataset.join does), then one
    grouped integer-exact sum."""

    def order_cents(batch: pa.Table) -> pa.Table:
        total = batch.column("o_totalprice").to_numpy()
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey").cast(pa.int64()),
                "total_c": pa.array(_cents(total, 100)),
            }
        )

    joined = orders.map_batches(order_cents, batch_format="pyarrow").join(
        customer.select_columns(["c_custkey", "c_mktsegment"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return (
        joined.groupby("c_mktsegment")
        .aggregate(
            Sum("total_c", alias_name="revenue_c"),
            Count(alias_name="n_orders"),
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "c_mktsegment": t.column("c_mktsegment"),
                    "revenue_c": t.column("revenue_c").cast(pa.int64()),
                    "n_orders": t.column("n_orders").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def asof_click_attribution(events: rd.Dataset) -> rd.Dataset:
    """AS-OF join expressed Ray-Data-first: attribute every ``purchase``
    event to the same user's latest ``click`` at-or-before it.

    One user_id hash shuffle (groupby.map_groups); inside each group a
    sorted numpy searchsorted does the as-of matching — the composition
    pattern for time-travel joins when the key partitions cleanly
    (the partitioning assumption: one user's events fit one group).
    Output: (event_id, user_id, purchase_e, click_e nullable, gap_s
    nullable), epochs in floored int64 seconds."""

    def attribute(group: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        epoch = _pc.cast(
            _pc.floor_temporal(group.column("ts"), unit="second"),
            pa.timestamp("s"),
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        etype = group.column("event_type").to_pylist()
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        uid = group.column("user_id")[0].as_py()
        is_click = np.array([t == "click" for t in etype])
        is_purchase = np.array([t == "purchase" for t in etype])
        click_e = np.sort(epoch[is_click])
        out_id, out_pe, out_ce, out_gap = [], [], [], []
        for e_id, pe in zip(eid[is_purchase], epoch[is_purchase]):
            out_id.append(int(e_id))
            out_pe.append(int(pe))
            k = int(np.searchsorted(click_e, pe, side="right")) - 1
            if k >= 0:
                out_ce.append(int(click_e[k]))
                out_gap.append(int(pe - click_e[k]))
            else:
                out_ce.append(None)
                out_gap.append(None)
        return pa.table(
            {
                "event_id": pa.array(out_id, type=pa.int64()),
                "user_id": pa.array([uid] * len(out_id), type=pa.int64()),
                "purchase_e": pa.array(out_pe, type=pa.int64()),
                "click_e": pa.array(out_ce, type=pa.int64()),
                "gap_s": pa.array(out_gap, type=pa.int64()),
            }
        )

    return (
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(attribute, batch_format="pyarrow")
    )


def interval_join_clicks(
    events: rd.Dataset, window_s: int = 3600
) -> rd.Dataset:
    """INTERVAL (range) join expressed Ray-Data-first: every
    ``purchase`` event pairs with EVERY same-user ``click`` in the
    trailing window [purchase_ts - window_s, purchase_ts] — the
    one-to-many generalization of the as-of join above (attribution
    windows, fraud co-occurrence, session stitching).

    Same partitioning assumption and shape as asof_click_attribution:
    ONE user_id hash shuffle, then per-group sorted searchsorted gives
    each purchase its click range in O(log n) — no per-pair scan. The
    fan-out is the true join cardinality (pairs within the window),
    which no engine can avoid emitting.

    Output: (user_id, purchase_id, click_id, lag_s) with lag_s =
    purchase_epoch - click_epoch in [0, window_s], epochs floored to
    int64 seconds. Ties and ordering are value-determined (row set
    compared, not row order)."""

    def pair(group: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        epoch = _pc.cast(
            _pc.floor_temporal(group.column("ts"), unit="second"),
            pa.timestamp("s"),
        ).cast(pa.int64()).to_numpy(zero_copy_only=False)
        etype = group.column("event_type").to_pylist()
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        uid = group.column("user_id")[0].as_py()
        is_click = np.array([t == "click" for t in etype])
        is_purchase = np.array([t == "purchase" for t in etype])
        c_order = np.argsort(epoch[is_click], kind="stable")
        click_e = epoch[is_click][c_order]
        click_id = eid[is_click][c_order]
        out_u, out_p, out_c, out_lag = [], [], [], []
        for p_id, pe in zip(eid[is_purchase], epoch[is_purchase]):
            lo = int(np.searchsorted(click_e, pe - window_s, side="left"))
            hi = int(np.searchsorted(click_e, pe, side="right"))
            for j in range(lo, hi):
                out_u.append(uid)
                out_p.append(int(p_id))
                out_c.append(int(click_id[j]))
                out_lag.append(int(pe - click_e[j]))
        return pa.table(
            {"user_id": pa.array(out_u, type=pa.int64()),
             "purchase_id": pa.array(out_p, type=pa.int64()),
             "click_id": pa.array(out_c, type=pa.int64()),
             "lag_s": pa.array(out_lag, type=pa.int64())}
        )

    return (
        events.select_columns(["event_id", "user_id", "ts", "event_type"])
        .groupby("user_id")
        .map_groups(pair, batch_format="pyarrow")
    )


def orders_without_lineitems(
    orders: rd.Dataset, lineitem: rd.Dataset, num_partitions: int = 8
) -> rd.Dataset:
    """ANTI-join: orders with no lineitem rows (referential-integrity
    sweep). One hash exchange via Dataset.join left_anti — the same
    physical plan the dedup apply family uses."""
    return orders.join(
        lineitem.select_columns(["l_orderkey"]).materialize(),
        "left_anti", num_partitions,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )


def customers_with_orders(
    customer: rd.Dataset, orders: rd.Dataset, num_partitions: int = 8
) -> rd.Dataset:
    """SEMI-join: customers having at least one order (EXISTS), without
    duplicating customer rows per order — Dataset.join left_semi."""
    return customer.join(
        orders.select_columns(["o_custkey"]).materialize(),
        "left_semi", num_partitions,
        on=("c_custkey",), right_on=("o_custkey",),
    )


Q3_CUTOFF = "1998-06-01 00:00:00"  # mid-range: both date filters selective, non-empty
Q6_YEAR_LO = "1997-01-01 00:00:00"
Q6_YEAR_HI = "1998-01-01 00:00:00"


def _ts(s: str) -> "pa.Scalar":
    return pa.scalar(np.datetime64(s.replace(" ", "T"), "us"))


def revenue_forecast(lineitem: rd.Dataset) -> pa.Table:
    """TPC-H Q6 shape: total discount revenue over one shipdate year for
    mid-band discounts (integer cents, floor(x*100+0.5) in [5,7]) and
    small quantities (< 24). Pure map-side filter + one global sum — no
    shuffle at all; at 100 TB this is the cheapest possible plan (the
    shipdate/discount/quantity filters belong in the parquet row-group
    predicate at a real deployment).

    Discount band is compared in INTEGER cents on both sides (engine and
    SQL oracle) so IEEE representation of 0.05/0.07 can never flip a
    row's membership."""

    def derive(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate")
        mask = pc.and_(pc.greater_equal(ship, _ts(Q6_YEAR_LO)),
                       pc.less(ship, _ts(Q6_YEAR_HI)))
        batch = batch.filter(mask)
        disc = batch.column("l_discount").to_numpy()
        disc_c = _cents(disc, 100)
        qty = batch.column("l_quantity").to_numpy()
        keep = (disc_c >= 5) & (disc_c <= 7) & (qty < 24.0)
        price = batch.column("l_extendedprice").to_numpy()[keep]
        # price(2dp) * discount(2dp) -> exact at 4 decimals
        return pa.table({"rev_c": pa.array(_cents(price * disc[keep], 10_000))})

    d = lineitem.map_batches(derive, batch_format="pyarrow")
    agg = d.aggregate(Sum("rev_c", alias_name="revenue_c"),
                      Count(alias_name="n_items"))
    rev = agg.get("revenue_c")
    return pa.table({
        "revenue_c": pa.array([int(rev or 0)], type=pa.int64()),
        "n_items": pa.array([int(agg.get("n_items") or 0)], type=pa.int64()),
    })


def shipping_priority(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    segment: str = "BUILDING",
    k: int = 10,
    num_partitions: int = 8,
) -> rd.Dataset:
    """TPC-H Q3 shape: top-k unshipped orders of one market segment by
    discounted revenue. Plan (scale-ordered): filter BOTH fact sides at
    the map (o_orderdate < D before the join, l_shipdate > D before the
    join — at 100 TB these predicates drop most row groups at the read);
    SEMI-join orders against the segment's customers (customer keys only
    cross the wire, no payload duplication); inner hash join lineitem ->
    surviving orders on orderkey; integer-cents grouped sum; global sort
    is over the aggregated (orders-sized, post-filter tiny) table only.

    Tie-break pinned: (revenue_c DESC, o_orderdate ASC, l_orderkey ASC),
    mirrored in the SQL oracle so the top-k SET is deterministic."""
    cutoff = _ts(Q3_CUTOFF)

    seg_cust = customer.map_batches(
        lambda t: t.filter(pc.equal(t.column("c_mktsegment"), segment))
                   .select(["c_custkey"]),
        batch_format="pyarrow",
    ).materialize()

    def open_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("o_orderdate"), cutoff))
        return t.select(["o_orderkey", "o_custkey", "o_orderdate",
                         "o_orderpriority"])

    ords = (
        orders.map_batches(open_orders, batch_format="pyarrow")
        .join(seg_cust, "left_semi", num_partitions,
              on=("o_custkey",), right_on=("c_custkey",))
    )

    def li_cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), cutoff))
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        return pa.table({
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "rev_c": pa.array(_cents(price * (1.0 - disc), 10_000)),
        })

    joined = (
        lineitem.map_batches(li_cents, batch_format="pyarrow")
        .join(ords.materialize(), "inner", num_partitions,
              on=("l_orderkey",), right_on=("o_orderkey",))
    )
    top = (
        joined.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
        .aggregate(Sum("rev_c", alias_name="revenue_c"))
        .sort(["revenue_c", "o_orderdate", "l_orderkey"],
              descending=[True, False, False])
        .limit(k)
    )
    return top.map_batches(
        lambda t: pa.table({
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "revenue_c": t.column("revenue_c").cast(pa.int64()),
            "o_orderdate": t.column("o_orderdate"),
            "o_orderpriority": t.column("o_orderpriority"),
        }),
        batch_format="pyarrow",
    )


Q5_REGION = "EUROPE"
Q5_LO = "1996-01-01 00:00:00"
Q5_HI = "1998-01-01 00:00:00"


def local_supplier_revenue(
    customer: rd.Dataset,
    orders: rd.Dataset,
    lineitem: rd.Dataset,
    supplier_tbl: pa.Table,
    nation_tbl: pa.Table,
    region_tbl: pa.Table,
    region: str = Q5_REGION,
    num_partitions: int = 8,
) -> rd.Dataset:
    """TPC-H Q5 shape: revenue per nation from orders where the
    customer and the line's supplier sit in the same nation of one
    region. The physical plan separates the two table classes:

    - region -> nation -> supplier are DIMENSION tables (thousands of
      rows at any real scale): resolved on the driver into two small
      dicts (nationkey -> name, suppkey -> nationkey) and broadcast
      once via ``ray.put`` — no shuffle. If supplier ever outgrew
      dimension size the suppkey map would become a third Dataset.join
      on l_suppkey; the broadcast is a documented assumption, not a
      requirement of the operator.
    - customer x orders x lineitem are FACT tables: two hash
      Dataset.joins (custkey, then orderkey), each side filtered at the
      map before the exchange (date window on orders, region nations on
      customers).

    The same-nation condition and the grouping key resolve against the
    broadcast dicts inside ``map_batches``; money sums are integer
    cents (4-decimal exact)."""
    region_keys = {
        rk for rk, rn in zip(region_tbl.column("r_regionkey").to_pylist(),
                             region_tbl.column("r_name").to_pylist())
        if rn == region
    }
    nation_name = {
        nk: nm for nk, nm, rk in zip(
            nation_tbl.column("n_nationkey").to_pylist(),
            nation_tbl.column("n_name").to_pylist(),
            nation_tbl.column("n_regionkey").to_pylist())
        if rk in region_keys
    }
    supp_nation = {
        sk: nk for sk, nk in zip(
            supplier_tbl.column("s_suppkey").to_pylist(),
            supplier_tbl.column("s_nationkey").to_pylist())
        if nk in nation_name
    }
    nation_ref = ray.put(nation_name)
    supp_ref = ray.put(supp_nation)
    lo, hi = _ts(Q5_LO), _ts(Q5_HI)

    def region_cust(t: pa.Table) -> pa.Table:
        nn = ray.get(nation_ref)
        keys = t.column("c_nationkey").to_pylist()
        mask = pa.array([k in nn for k in keys])
        t = t.filter(mask)
        return pa.table({
            "c_custkey": t.column("c_custkey").cast(pa.int64()),
            "c_nationkey": t.column("c_nationkey").cast(pa.int64()),
        })

    def window_orders(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate")
        t = t.filter(pc.and_(pc.greater_equal(od, lo), pc.less(od, hi)))
        return pa.table({
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_custkey": t.column("o_custkey").cast(pa.int64()),
        })

    ords = (
        orders.map_batches(window_orders, batch_format="pyarrow")
        .join(customer.map_batches(region_cust, batch_format="pyarrow")
              .materialize(),
              "inner", num_partitions,
              on=("o_custkey",), right_on=("c_custkey",))
    )

    def li_proj(t: pa.Table) -> pa.Table:
        sn = ray.get(supp_ref)
        supp = t.column("l_suppkey").to_pylist()
        mask = pa.array([s in sn for s in supp])
        t = t.filter(mask)
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        return pa.table({
            "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
            "l_suppkey": t.column("l_suppkey").cast(pa.int64()),
            "rev_c": pa.array(_cents(price * (1.0 - disc), 10_000)),
        })

    joined = (
        lineitem.map_batches(li_proj, batch_format="pyarrow")
        .join(ords.materialize(), "inner", num_partitions,
              on=("l_orderkey",), right_on=("o_orderkey",))
    )

    def same_nation(t: pa.Table) -> pa.Table:
        sn = ray.get(supp_ref)
        nn = ray.get(nation_ref)
        supp = t.column("l_suppkey").to_pylist()
        cnat = t.column("c_nationkey").to_pylist()
        keep, names = [], []
        for i, (s, c) in enumerate(zip(supp, cnat)):
            if sn[s] == c:
                keep.append(i)
                names.append(nn[c])
        t = t.take(pa.array(keep, type=pa.int64()))
        return pa.table({
            "n_name": pa.array(names, type=pa.string()),
            "rev_c": t.column("rev_c"),
        })

    return (
        joined.map_batches(same_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev_c", alias_name="revenue_c"),
                   Count(alias_name="n_items"))
        .map_batches(
            lambda t: pa.table({
                "n_name": t.column("n_name"),
                "revenue_c": t.column("revenue_c").cast(pa.int64()),
                "n_items": t.column("n_items").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


Q14_LO = "1997-01-01 00:00:00"
Q14_HI = "1998-01-01 00:00:00"


def promo_revenue_share(
    lineitem: rd.Dataset, part_tbl: pa.Table
) -> pa.Table:
    """TPC-H Q14 shape: share of one shipdate-year's discounted revenue
    that comes from PROMO-type parts. part is a dimension table — the
    partkey -> is-promo bitmap broadcasts once via ``ray.put`` and the
    fact side streams through one map + one global sum pair (no
    shuffle). Numerator/denominator are exact integer cents; the single
    closing division is written identically in the SQL oracle."""
    promo = {
        pk for pk, pt in zip(part_tbl.column("p_partkey").to_pylist(),
                             part_tbl.column("p_type").to_pylist())
        if pt == "PROMO"
    }
    promo_ref = ray.put(frozenset(promo))
    lo, hi = _ts(Q14_LO), _ts(Q14_HI)

    def derive(t: pa.Table) -> pa.Table:
        pr = ray.get(promo_ref)
        ship = t.column("l_shipdate")
        t = t.filter(pc.and_(pc.greater_equal(ship, lo),
                             pc.less(ship, hi)))
        price = t.column("l_extendedprice").to_numpy()
        disc = t.column("l_discount").to_numpy()
        rev = _cents(price * (1.0 - disc), 10_000)
        is_promo = np.fromiter(
            (pk in pr for pk in t.column("l_partkey").to_pylist()),
            dtype=bool, count=len(t),
        )
        return pa.table({
            "promo_c": pa.array(np.where(is_promo, rev, 0)),
            "total_c": pa.array(rev),
        })

    agg = lineitem.map_batches(derive, batch_format="pyarrow").aggregate(
        Sum("promo_c", alias_name="promo_c"),
        Sum("total_c", alias_name="total_c"),
    )
    promo_c = int(agg.get("promo_c") or 0)
    total_c = int(agg.get("total_c") or 0)
    pct = 100.0 * promo_c / total_c if total_c else 0.0
    import math

    pct_r = math.copysign(math.floor(abs(pct) * 1e6 + 0.5), pct) / 1e6
    return pa.table({
        "promo_c": pa.array([promo_c], type=pa.int64()),
        "total_c": pa.array([total_c], type=pa.int64()),
        "promo_pct_r": pa.array([pct_r], type=pa.float64()),
    })


def daily_reconciliation(
    events: rd.Dataset, orders: rd.Dataset, num_partitions: int = 4
) -> rd.Dataset:
    """Ops-reconciliation shape: per-day event counts FULL OUTER JOINed
    to per-day order counts — days alive on only one side surface with
    a zero on the other (the daily "did both systems log?" audit).
    Both sides pre-aggregate to day granularity BEFORE the join, so the
    exchange is span-bounded (days), not row-bounded; the join itself
    exercises Dataset.join full_outer."""

    def day_of(col: pa.ChunkedArray) -> pa.Array:
        return pc.cast(
            pc.cast(pc.floor_temporal(col, unit="day"),
                    pa.timestamp("s")), pa.int64())

    ev = (
        events.map_batches(
            lambda t: pa.table({"day": day_of(t.column("ts"))}),
            batch_format="pyarrow",
        )
        .groupby("day")
        .aggregate(Count(alias_name="n_events"))
        .materialize()
    )
    od = (
        orders.map_batches(
            lambda t: pa.table(
                {"o_day": day_of(t.column("o_orderdate"))}),
            batch_format="pyarrow",
        )
        .groupby("o_day")
        .aggregate(Count(alias_name="n_orders"))
        .materialize()
    )

    def finish(t: pa.Table) -> pa.Table:
        # full_outer coalesces the join key into one `day` column;
        # only the count columns carry nulls to zero-fill
        return pa.table({
            "day": t.column("day").cast(pa.int64()),
            "n_events": pc.coalesce(
                t.column("n_events"), pa.scalar(0)).cast(pa.int64()),
            "n_orders": pc.coalesce(
                t.column("n_orders"), pa.scalar(0)).cast(pa.int64()),
        })

    return ev.join(
        od, "full_outer", num_partitions,
        on=("day",), right_on=("o_day",),
    ).map_batches(finish, batch_format="pyarrow")


Q4_LO = "1996-01-01 00:00:00"
Q4_HI = "1998-01-01 00:00:00"


def late_order_priority_counts(
    orders: rd.Dataset, lineitem: rd.Dataset, num_partitions: int = 8
) -> rd.Dataset:
    """TPC-H Q4 shape: per-priority counts of window orders having at
    least one line shipped AFTER the order date (EXISTS with a
    cross-table predicate — not expressible as a plain semi-join key
    match, so the plan is: window-filter orders map-side, inner hash
    join lineitem on orderkey, apply the ship>order predicate on the
    joined rows, collapse to distinct orders (first groupby carries the
    priority through), then the tiny per-priority count."""
    lo, hi = _ts(Q4_LO), _ts(Q4_HI)

    def window_orders(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate")
        t = t.filter(pc.and_(pc.greater_equal(od, lo), pc.less(od, hi)))
        return pa.table({
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "o_orderdate": t.column("o_orderdate"),
            "o_orderpriority": t.column("o_orderpriority"),
        })

    joined = (
        lineitem.select_columns(["l_orderkey", "l_shipdate"])
        .join(orders.map_batches(window_orders, batch_format="pyarrow")
              .materialize(),
              "inner", num_partitions,
              on=("l_orderkey",), right_on=("o_orderkey",))
        .map_batches(
            lambda t: t.filter(pc.greater(t.column("l_shipdate"),
                                          t.column("o_orderdate"))),
            batch_format="pyarrow",
        )
    )
    per_order = (
        joined.groupby("l_orderkey")
        .aggregate(MaxAgg("o_orderpriority", alias_name="o_orderpriority"))
    )
    return (
        per_order.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_orders"))
        .map_batches(
            lambda t: pa.table({
                "o_orderpriority": t.column("o_orderpriority"),
                "n_orders": t.column("n_orders").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )


def orders_per_customer_hist(
    customer: rd.Dataset, orders: rd.Dataset, num_partitions: int = 4
) -> rd.Dataset:
    """Degree distribution of the customer->orders relation: how many
    customers placed exactly k orders, k = 0 included (the
    zero-inflated engagement histogram). Two cheap aggregations — per-
    customer counts, then counts-of-counts — plus a LEFT ANTI join to
    recover the zero class (customers with no orders); everything after
    the first groupby is |customers|-sized, then |distinct k|-sized."""
    per_cust = (
        orders.select_columns(["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="k"))
        .materialize()
    )
    n_zero = customer.select_columns(["c_custkey"]).join(
        per_cust, "left_anti", num_partitions,
        on=("c_custkey",), right_on=("o_custkey",),
    ).count()
    hist = (
        per_cust.groupby("k")
        .aggregate(Count(alias_name="n_customers"))
        .map_batches(
            lambda t: pa.table({
                "k": t.column("k").cast(pa.int64()),
                "n_customers": t.column("n_customers").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )
    zero_row = rd.from_arrow(pa.table({
        "k": pa.array([0], type=pa.int64()),
        "n_customers": pa.array([int(n_zero)], type=pa.int64()),
    }))
    return hist.union(zero_row)


def customer_value_deciles(
    customer: rd.Dataset, orders: rd.Dataset, num_partitions: int = 4
) -> rd.Dataset:
    """Customer lifetime-value deciles (the marketing segmentation
    cut): per-customer total order cents, ranked into NTILE(10)
    buckets with SQL's exact remainder rule — the first ``n mod 10``
    buckets get the extra member — ordering pinned (total_c ASC,
    custkey ASC). Zero-order customers count with total 0. Output per
    decile: member count, summed value (exact cents).

    Scale note: the per-customer totals table is |customers|-sized;
    the decile assignment needs its global sort — at web scale that is
    the one genuine ds.sort in this operator (range-partitioned by
    Ray); the per-decile aggregate after it is 10 rows."""
    totals = (
        orders.map_batches(
            lambda t: pa.table({
                "o_custkey": t.column("o_custkey").cast(pa.int64()),
                "total_c": pa.array(_cents(
                    t.column("o_totalprice").to_numpy(), 100)),
            }),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Sum("total_c", alias_name="total_c"))
        .materialize()
    )
    zeros = customer.select_columns(["c_custkey"]).join(
        totals, "left_anti", num_partitions,
        on=("c_custkey",), right_on=("o_custkey",),
    ).map_batches(
        lambda t: pa.table({
            "o_custkey": t.column("c_custkey").cast(pa.int64()),
            "total_c": pa.array(
                np.zeros(len(t), dtype=np.int64)),
        }),
        batch_format="pyarrow",
    )
    ranked = (
        totals.map_batches(
            lambda t: pa.table({
                "o_custkey": t.column("o_custkey").cast(pa.int64()),
                "total_c": t.column("total_c").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .union(zeros)
        .sort(["total_c", "o_custkey"])
        .materialize()
    )
    n = ranked.count()
    base, rem = divmod(n, 10)

    def decile_of(idx: np.ndarray) -> np.ndarray:
        # NTILE remainder rule: buckets 0..rem-1 hold base+1 members
        cut = rem * (base + 1)
        small = np.where(idx < cut, idx // max(base + 1, 1),
                         rem + (idx - cut) // max(base, 1))
        return small.astype(np.int64)

    # global row index via block-offset cumsum over METADATA only (the
    # build.py doc-id pattern: per-block first/last keys + counts to
    # the driver, never block contents)
    def block_meta(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_c": pa.array([], type=pa.int64()),
                             "first_k": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        return pa.table({
            "first_c": pa.array([t.column("total_c")[0].as_py()],
                                type=pa.int64()),
            "first_k": pa.array([t.column("o_custkey")[0].as_py()],
                                type=pa.int64()),
            "n": pa.array([t.num_rows], type=pa.int64()),
        })

    meta = [m for m in ranked.map_batches(
        block_meta, batch_format="pyarrow", batch_size=None
    ).take_all() if m["n"] > 0]
    meta.sort(key=lambda m: (m["first_c"], m["first_k"]))
    offsets: dict[tuple, int] = {}
    running = 0
    for m in meta:
        offsets[(m["first_c"], m["first_k"])] = running
        running += m["n"]

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"decile": pa.array([], type=pa.int64()),
                             "total_c": pa.array([], type=pa.int64())})
        off = offsets[(t.column("total_c")[0].as_py(),
                       t.column("o_custkey")[0].as_py())]
        idx = off + np.arange(t.num_rows, dtype=np.int64)
        return pa.table({
            "decile": pa.array(decile_of(idx) + 1),
            "total_c": t.column("total_c").cast(pa.int64()),
        })

    return (
        ranked.map_batches(assign, batch_format="pyarrow",
                           batch_size=None)
        .groupby("decile")
        .aggregate(Count(alias_name="n_customers"),
                   Sum("total_c", alias_name="sum_c"))
        .map_batches(
            lambda t: pa.table({
                "decile": t.column("decile").cast(pa.int64()),
                "n_customers": t.column("n_customers").cast(pa.int64()),
                "sum_c": t.column("sum_c").cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )
