"""TPC-H-shape analytics over the synthetic tables — the full 22-query
suite. Q1 (pricing_summary), Q2, Q5, Q7 and Q22 live in ``queries.py``
(they predate this module); Q3, Q4, Q6, Q8, Q9, Q10, Q11, Q12, Q13, Q14,
Q15, Q16, Q17, Q18, Q19, Q20 and Q21 are here.

The reference repo's relational surface stops at dict lookups; these
queries exercise the engine's join/aggregate machinery in the classic
decision-support shapes a warehouse user expects, adapted to the columns the
synthetic schema actually has (no shipmode/commitdate/partsupp — each
docstring names the substitution). Shared discipline with ``queries.py``:

* every computed column carries the SAME name as the DuckDB oracle;
* money in int64 ``*_e4`` / ``*_cents`` units, dates as int64 epoch days,
  so cross-engine double accumulation can never flip the value hash;
* top-k results reduce per-block local top-k first, so the driver sees
  O(blocks * k) rows, never the full aggregate (the bounded-driver-reduce
  pattern from ``similarity.brute_force_topk``);
* fact-scaled sides join distributed (``ops.hash_join``); filtered probe
  sides go through ``ops.hash_join_sized`` with the SMALL side on the
  right (Ray 2.49 sparse-side clamp — see that docstring); calendar-bounded
  dims (nation) broadcast as in q5_supplier_volume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum

from . import ops

_US_PER_DAY = 86_400_000_000


def _e4(x):  # Arrow double -> int64 1e-4 currency units (ulp-stable)
    return pc.cast(pc.round(pc.multiply(x, 10_000)), pa.int64())


def _cents(x):
    return pc.cast(pc.round(pc.multiply(x, 100)), pa.int64())


def _day(ts_col):  # timestamp[us] (midnight-aligned) -> int64 epoch days
    return pc.divide(pc.cast(ts_col, pa.int64()), _US_PER_DAY)


def _ts(s: str) -> pa.Scalar:
    return pa.scalar(pd.Timestamp(s), type=pa.timestamp("us"))


def _rev(t: pa.Table):  # l_extendedprice * (1 - l_discount)
    return pc.multiply(t["l_extendedprice"],
                       pc.subtract(pa.scalar(1.0), t["l_discount"]))


def _driver_topk(ds, k: int, sort_keys: list[str],
                 descending: list[bool]) -> pa.Table:
    """Global top-k with a per-block combiner: each block contributes its
    local top-k (vectorized lexsort), the driver merges O(blocks * k) rows
    and returns the final k. ``sort_keys`` must make rows totally ordered
    (deterministic set under ties at the boundary)."""
    def local(t: pa.Table) -> pa.Table:
        if len(t) <= k:
            return t
        cols = []
        # sort keys must be numeric (lexsort negation); all call sites rank
        # by int64 money/count columns with an int64 id tie-break
        for key, desc in zip(reversed(sort_keys), reversed(descending)):
            a = t[key].to_numpy(zero_copy_only=False)
            cols.append(-a if desc else a)
        return t.take(np.lexsort(tuple(cols))[:k])

    batches = list(
        ds.map_batches(local, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"))
    merged = pa.concat_tables([b for b in batches if len(b)],
                              promote_options="default")
    order = [(key, "descending" if d else "ascending")
             for key, d in zip(sort_keys, descending)]
    return merged.sort_by(order).slice(0, k)


_Q3_SEG = "BUILDING"
_Q3_CUT = "1998-07-01"


def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — shipping-priority top 10: revenue still to ship
    after the cutoff for orders placed before it by one market segment
    (o_orderpriority stands in for the schema's missing o_shippriority).

    Plan: segment-filtered customer keys reduce the orders side FIRST
    (sized join, small side right), so the fact-fact lineitem join only
    sees qualifying orders; revenue pre-aggregates per (orderkey, day,
    priority) inside each batch before the global groupby; the top-10 is a
    per-block local top-k + O(blocks*10) driver merge, never a full sort.
    """
    cut = _ts(_Q3_CUT)
    cust = ops.read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    ckeys = cust.map_batches(
        lambda t: pa.table({"o_custkey": pc.cast(
            t.filter(pc.equal(t["c_mktsegment"], _Q3_SEG))["c_custkey"],
            pa.int64())}),
        batch_format="pyarrow")

    orders = ops.read_table(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pc.field("o_orderdate") < cut)

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], cut))
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "o_odate_day": _day(t["o_orderdate"]),
            "o_orderpriority": t["o_orderpriority"]})

    oc = ops.hash_join_sized(
        orders.map_batches(o_prep, batch_format="pyarrow"),
        ops._compact(ops.distinct(ckeys, ["o_custkey"])),
        on=("o_custkey",))

    li = ops.read_table(sf_dir, "lineitem",
                        ["l_orderkey", "l_shipdate", "l_extendedprice",
                         "l_discount"],
                        filter=pc.field("l_shipdate") > cut)

    def l_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cut))
        return pa.table({"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                         "rev": _rev(t)})

    j = ops.hash_join_sized(
        li.map_batches(l_prep, batch_format="pyarrow"), oc,
        on=("l_orderkey",), right_on=("o_orderkey",))

    keys = ["l_orderkey", "o_odate_day", "o_orderpriority"]

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([("rev", "sum")])
        return pa.table({**{k: g[k] for k in keys}, "rev": g["rev_sum"]})

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby(keys).aggregate(Sum("rev", alias_name="rev_raw")))
    per_order = agg.map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "revenue_e4": _e4(t["rev_raw"]),
            "o_odate_day": t["o_odate_day"],
            "o_orderpriority": t["o_orderpriority"]}),
        batch_format="pyarrow")
    return _driver_topk(per_order, 10, ["revenue_e4", "l_orderkey"],
                        [True, False])


O_Q3_SHIPPING_PRIORITY = f"""
SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000)
            AS BIGINT) AS revenue_e4,
       date_diff('day', TIMESTAMP '1970-01-01', o.o_orderdate)
           AS o_odate_day,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{_Q3_SEG}'
  AND o.o_orderdate < TIMESTAMP '{_Q3_CUT}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_CUT}'
GROUP BY 1, 3, 4
ORDER BY revenue_e4 DESC, l_orderkey
LIMIT 10"""


_Q4_LO, _Q4_HI = "1996-01-01", "1997-01-01"
_Q4_LATE_DAYS = 60


def q4_order_priority(sf_dir: str):
    """TPC-H Q4 shape — order-priority checking: orders in one year with
    at least one EXISTS-qualifying lineitem (shipped > 60 days after the
    order date stands in for commitdate < receiptdate), counted per
    priority. The EXISTS is a distributed semi-join: lineitem joins the
    date-windowed orders, the lateness predicate filters, and a distinct
    combiner on (orderkey, priority) collapses to one row per qualifying
    order before the tiny priority groupby. Day math stays in int64
    epoch-micros end to end (Arrow floor_temporal / Ray timestamp
    round-trips are lossy — see arrow-timestamp notes in ops.asof_join).
    """
    lo, hi = _ts(_Q4_LO), _ts(_Q4_HI)
    orders = ops.read_table(sf_dir, "orders",
                            ["o_orderkey", "o_orderdate", "o_orderpriority"],
                            filter=(pc.field("o_orderdate") >= lo)
                            & (pc.field("o_orderdate") < hi))

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_odate_us": pc.cast(t["o_orderdate"], pa.int64()),
            "o_orderpriority": t["o_orderpriority"]})

    li = ops.read_table(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    l_prep = li.map_batches(
        lambda t: pa.table({"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                            "l_ship_us": pc.cast(t["l_shipdate"], pa.int64())}),
        batch_format="pyarrow")

    j = ops.hash_join_sized(
        l_prep, orders.map_batches(o_prep, batch_format="pyarrow"),
        on=("l_orderkey",), right_on=("o_orderkey",))
    late = j.map_batches(
        lambda t: t.filter(pc.greater(
            t["l_ship_us"],
            pc.add(t["o_odate_us"],
                   pa.scalar(_Q4_LATE_DAYS * _US_PER_DAY, pa.int64()))))
        .select(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow")
    per_order = ops.distinct(late, ["l_orderkey", "o_orderpriority"])
    g = per_order.groupby("o_orderpriority").aggregate(
        Count(alias_name="order_count"))
    out = g.map_batches(
        lambda t: pa.table({"o_orderpriority": t["o_orderpriority"],
                            "order_count": pc.cast(t["order_count"],
                                                   pa.int64())}),
        batch_format="pyarrow")
    return out.sort("o_orderpriority")


O_Q4_ORDER_PRIORITY = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO}'
  AND o.o_orderdate < TIMESTAMP '{_Q4_HI}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
                                   + INTERVAL {_Q4_LATE_DAYS} DAY)
GROUP BY 1 ORDER BY 1"""


_Q10_LO, _Q10_HI = "1996-01-01", "1996-07-01"


def q10_returned_items(sf_dir: str):
    """TPC-H Q10 shape — returned-item reporting: top-20 customers by
    revenue lost to 'R'-returnflag lineitems of orders placed in one
    half-year, with nation names. Returned lineitems join the date-windowed
    orders (sized, windowed side right), revenue pre-aggregates per custkey
    inside each batch, the per-customer rollup joins the customer table
    DISTRIBUTED (fact-scaled — the q_top_customers broadcast lesson), and
    the 25-row nation dim resolves via a vectorized index_in probe. Top-20
    is the O(blocks*20) driver merge."""
    lo, hi = _ts(_Q10_LO), _ts(_Q10_HI)
    orders = ops.read_table(sf_dir, "orders",
                            ["o_orderkey", "o_custkey", "o_orderdate"],
                            filter=(pc.field("o_orderdate") >= lo)
                            & (pc.field("o_orderdate") < hi))

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        return pa.table({"o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                         "c_custkey": pc.cast(t["o_custkey"], pa.int64())})

    li = ops.read_table(sf_dir, "lineitem",
                        ["l_orderkey", "l_returnflag", "l_extendedprice",
                         "l_discount"],
                        filter=pc.field("l_returnflag") == "R")

    def l_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        return pa.table({"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                         "rev": _rev(t)})

    j = ops.hash_join_sized(
        li.map_batches(l_prep, batch_format="pyarrow"),
        orders.map_batches(o_prep, batch_format="pyarrow"),
        on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_custkey"]).aggregate([("rev", "sum")])
        return pa.table({"c_custkey": g["c_custkey"], "rev": g["rev_sum"]})

    by_cust = (j.map_batches(partial, batch_format="pyarrow")
               .groupby("c_custkey").aggregate(Sum("rev", alias_name="rev_raw")))
    by_cust = ops._compact(by_cust.map_batches(
        lambda t: pa.table({"c_custkey": t["c_custkey"],
                            "revenue_e4": _e4(t["rev_raw"])}),
        batch_format="pyarrow"))

    cust = ops.read_table(sf_dir, "customer",
                          ["c_custkey", "c_name", "c_nationkey"]).map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                            "c_name": t["c_name"],
                            "c_nationkey": pc.cast(t["c_nationkey"],
                                                   pa.int64())}),
        batch_format="pyarrow")
    jc = ops.hash_join_sized(cust, by_cust, on=("c_custkey",))

    nation = ops.read_table(sf_dir, "nation").to_pandas()
    nkeys = pa.array(nation["n_nationkey"].astype("int64"), pa.int64())
    nnames = pa.array(nation["n_name"], pa.string())

    def with_nation(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["c_nationkey"], value_set=nkeys)
        return pa.table({"c_custkey": t["c_custkey"], "c_name": t["c_name"],
                         "n_name": pc.take(nnames, idx),
                         "revenue_e4": t["revenue_e4"]})

    out = jc.map_batches(with_nation, batch_format="pyarrow")
    return _driver_topk(out, 20, ["revenue_e4", "c_custkey"], [True, False])


O_Q10_RETURNED_ITEMS = f"""
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name, n.n_name,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000)
            AS BIGINT) AS revenue_e4
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO}'
  AND o.o_orderdate < TIMESTAMP '{_Q10_HI}'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue_e4 DESC, c_custkey
LIMIT 20"""


_Q14_LO, _Q14_HI = "1996-01-01", "1997-01-01"


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape — promotion-effect: PROMO-type share of one ship
    year's revenue (p_type = 'PROMO' stands in for the 'PROMO%%' prefix
    class). Single distributed lineitem⋈part join on partkey (part is
    fact-scaled), then a two-scalar per-batch partial; the driver folds
    O(blocks) partial pairs. The share is exposed as its exact-integer
    sufficient statistics (promo_rev_e4, total_rev_e4) — never a rounded
    ratio, which can land on .5 exactly (value-hash discipline)."""
    lo, hi = _ts(_Q14_LO), _ts(_Q14_HI)
    li = ops.read_table(sf_dir, "lineitem",
                        ["l_partkey", "l_shipdate", "l_extendedprice",
                         "l_discount"],
                        filter=(pc.field("l_shipdate") >= lo)
                        & (pc.field("l_shipdate") < hi))

    def l_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        return pa.table({"l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                         "rev": _rev(t)})

    part = ops.read_table(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table({"p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                            "is_promo": pc.cast(
                                pc.equal(t["p_type"], "PROMO"), pa.float64())}),
        batch_format="pyarrow")
    j = ops.hash_join(li.map_batches(l_prep, batch_format="pyarrow"), part,
                      on=("l_partkey",), right_on=("p_partkey",))

    def partial(t: pa.Table) -> pa.Table:
        rev = t["rev"]
        promo = pc.multiply(rev, t["is_promo"])
        return pa.table({
            "promo_raw": pa.array([pc.sum(promo).as_py() or 0.0]),
            "total_raw": pa.array([pc.sum(rev).as_py() or 0.0])})

    parts_t = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table({
        "promo_rev_e4": pa.array(
            [int(round(parts_t["promo_raw"].sum() * 10_000))], pa.int64()),
        "total_rev_e4": pa.array(
            [int(round(parts_t["total_raw"].sum() * 10_000))], pa.int64())})


O_Q14_PROMO_REVENUE = f"""
SELECT CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
                           THEN l.l_extendedprice * (1 - l.l_discount)
                           ELSE 0 END) * 10000) AS BIGINT) AS promo_rev_e4,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000)
            AS BIGINT) AS total_rev_e4
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO}'
  AND l.l_shipdate < TIMESTAMP '{_Q14_HI}'"""


_Q16_SIZES = (1, 5, 9, 13)
_Q16_EXCL_SUFFIX = "1"  # complaint list: supplier names ending in '1'


def q16_parts_supplier_cnt(sf_dir: str):
    """TPC-H Q16 shape — supplier-count per part class: for parts of four
    sizes, how many DISTINCT suppliers shipped them, excluding a
    complaint-list of suppliers (name suffix match stands in for the
    '%%Customer%%Complaints%%' LIKE; lineitem's partkey→suppkey pairs stand
    in for the missing partsupp table). Pipeline: complaint suppliers
    reduce to a key list, lineitem anti-joins it (left_anti, small side
    right), the survivor pairs join the size-filtered parts, a distinct
    combiner collapses (brand, type, size, suppkey), and the class groupby
    counts. Output ordered by (supplier_cnt DESC, brand, type, size)."""
    li = ops.read_table(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    pairs = li.map_batches(
        lambda t: pa.table({"l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64())}),
        batch_format="pyarrow")
    pairs = ops.distinct(pairs, ["l_partkey", "l_suppkey"])

    supp = ops.read_table(sf_dir, "supplier", ["s_suppkey", "s_name"])
    excl = supp.map_batches(
        lambda t: pa.table({"l_suppkey": pc.cast(
            t.filter(pc.ends_with(t["s_name"],
                                  pattern=_Q16_EXCL_SUFFIX))["s_suppkey"],
            pa.int64())}),
        batch_format="pyarrow")
    kept = ops.hash_join_sized(pairs, ops._compact(excl), on=("l_suppkey",),
                               how="left_anti")

    sizes = pa.array(list(_Q16_SIZES), pa.int64())
    part = ops.read_table(sf_dir, "part",
                          ["p_partkey", "p_brand", "p_type", "p_size"])

    def p_prep(t: pa.Table) -> pa.Table:
        t = t.set_column(t.schema.get_field_index("p_size"), "p_size",
                         pc.cast(t["p_size"], pa.int64()))
        t = t.filter(pc.is_in(t["p_size"], value_set=sizes))
        return pa.table({"p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                         "p_brand": t["p_brand"], "p_type": t["p_type"],
                         "p_size": t["p_size"]})

    jp = ops.hash_join_sized(kept,
                             part.map_batches(p_prep, batch_format="pyarrow"),
                             on=("l_partkey",), right_on=("p_partkey",))
    quad = ops.distinct(jp, ["p_brand", "p_type", "p_size", "l_suppkey"])
    g = quad.groupby(["p_brand", "p_type", "p_size"]).aggregate(
        Count(alias_name="supplier_cnt"))
    out = g.map_batches(
        lambda t: pa.table({"p_brand": t["p_brand"], "p_type": t["p_type"],
                            "p_size": t["p_size"],
                            "supplier_cnt": pc.cast(t["supplier_cnt"],
                                                    pa.int64())}),
        batch_format="pyarrow")
    return out.sort(["supplier_cnt", "p_brand", "p_type", "p_size"],
                    descending=[True, False, False, False])


O_Q16_PARTS_SUPPLIER_CNT = f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_size IN {_Q16_SIZES}
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_name LIKE '%{_Q16_EXCL_SUFFIX}')
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""


_Q18_QTY = 280


def q18_large_volume(sf_dir: str):
    """TPC-H Q18 shape — large-volume customers: orders whose total
    lineitem quantity exceeds a threshold (iceberg HAVING), with customer
    names, top-100 by order value. Quantity sums per orderkey use a
    per-batch combiner so the groupby exchanges one row per (block, order);
    the iceberg filter shrinks the survivor set BEFORE any join; orders and
    customer attach via sized joins with the survivor side right. Quantity
    is exposed in exact 1e-2 units (synthetic quantities are integral, but
    the contract shouldn't depend on that)."""
    li = ops.read_table(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                      "qty": t["l_quantity"]}).group_by(
            ["l_orderkey"]).aggregate([("qty", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"], "qty": g["qty_sum"]})

    per_order = (li.map_batches(partial, batch_format="pyarrow")
                 .groupby("l_orderkey").aggregate(Sum("qty", alias_name="q")))
    def iceberg(t: pa.Table) -> pa.Table:
        out = pa.table({"o_orderkey": t["l_orderkey"],
                        "qty_e2": _cents(t["q"])})
        return out.filter(pc.greater(
            out["qty_e2"], pa.scalar(_Q18_QTY * 100, pa.int64())))

    big = per_order.map_batches(iceberg, batch_format="pyarrow")
    big = ops._compact(big)

    orders = ops.read_table(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]).map_batches(
        lambda t: pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "o_odate_day": _day(t["o_orderdate"]),
            "o_price_cents": _cents(t["o_totalprice"])}),
        batch_format="pyarrow")
    jo = ops.hash_join_sized(orders, big, on=("o_orderkey",))

    cust = ops.read_table(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                            "c_name": t["c_name"]}),
        batch_format="pyarrow")
    jc = ops.hash_join_sized(cust, ops._compact(jo), on=("c_custkey",))
    return _driver_topk(jc, 100, ["o_price_cents", "o_orderkey"],
                        [True, False])


O_Q18_LARGE_VOLUME = f"""
WITH big AS (
  SELECT l_orderkey,
         CAST(round(sum(l_quantity) * 100) AS BIGINT) AS qty_e2
  FROM lineitem GROUP BY 1
  HAVING CAST(round(sum(l_quantity) * 100) AS BIGINT) > {_Q18_QTY * 100})
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
       CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       date_diff('day', TIMESTAMP '1970-01-01', o.o_orderdate)
           AS o_odate_day,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_price_cents,
       big.qty_e2
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o_price_cents DESC, o_orderkey
LIMIT 100"""


_Q7_N1, _Q7_N2 = "NATION_3", "NATION_19"


def q7_nation_volume(sf_dir: str):
    """TPC-H Q7 shape — volume shipping between one nation pair, both
    directions, per ship year. The 25-row nation dim resolves driver-side
    into the two key sets; supplier and customer filter to the pair BEFORE
    their joins (sized, filtered side right); lineitem extracts the ship
    year IN THE READ BATCH (timestamps never enter an exchange — year is
    int64 from the start); the direction predicate is a vectorized
    post-join filter and revenue pre-aggregates per (supp_nation,
    cust_nation, year) inside each batch before the 2x2xYears-bounded
    groupby."""
    nation = ops.read_table(sf_dir, "nation").to_pandas()
    pair = nation[nation["n_name"].isin([_Q7_N1, _Q7_N2])]
    nk_to_name = dict(zip(pair["n_nationkey"].astype(int), pair["n_name"]))
    keys64 = pa.array(list(nk_to_name), pa.int64())
    names = pa.array([nk_to_name[k] for k in nk_to_name], pa.string())

    def in_pair(table: str, key: str, nat: str, probe_key: str,
                out_name: str):
        ds = ops.read_table(sf_dir, table, [key, nat])

        def prep(t: pa.Table) -> pa.Table:
            nk = pc.cast(t[nat], pa.int64())
            keep = pc.is_in(nk, value_set=keys64)
            t = pa.table({probe_key: pc.cast(t[key], pa.int64()),
                          "_nk": nk}).filter(keep)
            idx = pc.index_in(t["_nk"], value_set=keys64)
            return pa.table({probe_key: t[probe_key],
                             out_name: pc.take(names, idx)})

        return ds.map_batches(prep, batch_format="pyarrow")

    li = ops.read_table(sf_dir, "lineitem",
                        ["l_orderkey", "l_suppkey", "l_shipdate",
                         "l_extendedprice", "l_discount"])

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                         "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                         "l_year": pc.cast(pc.year(t["l_shipdate"]),
                                           pa.int64()),
                         "rev": _rev(t)})

    orders = ops.read_table(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(
            lambda t: pa.table({
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "c_custkey": pc.cast(t["o_custkey"], pa.int64())}),
            batch_format="pyarrow")

    js = ops.hash_join_sized(
        li.map_batches(l_prep, batch_format="pyarrow"),
        in_pair("supplier", "s_suppkey", "s_nationkey",
                "l_suppkey", "supp_nation"),
        on=("l_suppkey",))
    jo = ops.hash_join(js, orders, on=("l_orderkey",),
                       right_on=("o_orderkey",))
    jc = ops.hash_join_sized(
        jo, in_pair("customer", "c_custkey", "c_nationkey",
                    "c_custkey", "cust_nation"),
        on=("c_custkey",))

    keys = ["supp_nation", "cust_nation", "l_year"]

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["supp_nation"], t["cust_nation"]))
        g = t.group_by(keys).aggregate([("rev", "sum")])
        return pa.table({**{k: g[k] for k in keys}, "rev": g["rev_sum"]})

    agg = (jc.map_batches(partial, batch_format="pyarrow")
           .groupby(keys).aggregate(Sum("rev", alias_name="rev_raw")))
    out = agg.map_batches(
        lambda t: pa.table({**{k: t[k] for k in keys},
                            "revenue_e4": _e4(t["rev_raw"])}),
        batch_format="pyarrow")
    return out.sort(keys)


O_Q7_NATION_VOLUME = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000)
            AS BIGINT) AS revenue_e4
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
    OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""


_Q22_RECENT = "2000-01-01"


def q22_idle_balance(sf_dir: str):
    """TPC-H Q22 shape — global-relationship anti-join: customers whose
    balance exceeds the GLOBAL average (scalar subquery, compared as exact
    integers: cents * n_customers > total_cents) and who have placed no
    RECENT orders (the synthetic corpus gives every customer at least one
    lifetime order, so the idle test is date-windowed; market segment
    stands in for the schema's missing phone-prefix). The global average
    is an O(blocks) two-scalar partial fold; the no-recent-orders test is
    a distributed left_anti against the DISTINCT recent custkeys (one row
    per active customer enters the exchange, not one per order)."""
    cust = ops.read_table(
        sf_dir, "customer",
        ["c_custkey", "c_mktsegment", "c_acctbal"]).map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t["c_custkey"], pa.int64()),
                            "c_mktsegment": t["c_mktsegment"],
                            "bal_cents": _cents(t["c_acctbal"])}),
        batch_format="pyarrow").materialize()

    parts = [b for b in cust.map_batches(
        lambda t: pa.table({
            "s": pa.array([pc.sum(t["bal_cents"]).as_py() or 0], pa.int64()),
            "n": pa.array([len(t)], pa.int64())}),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    # iter_batches may coalesce the per-block partial rows — fold them ALL
    total = sum(v for p in parts for v in p["s"].to_pylist())
    n_cust = sum(v for p in parts for v in p["n"].to_pylist())

    rich = cust.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["bal_cents"], pa.scalar(n_cust, pa.int64())),
            pa.scalar(total, pa.int64()))),
        batch_format="pyarrow")

    cutoff = _ts(_Q22_RECENT)
    active = ops.read_table(sf_dir, "orders",
                            ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(
            t.filter(pc.greater_equal(t["o_orderdate"],
                                      cutoff))["o_custkey"],
            pa.int64())}),
        batch_format="pyarrow")
    active = ops._compact(ops.distinct(active, ["c_custkey"]))
    # sized: the filtered `rich` side can be sparser than the partition
    # count at small scale (Ray 2.49 sparse-side hazard — see
    # hash_join_sized); its tiny-side path anti-filters via `is_in`
    idle = ops.hash_join_sized(rich, active, on=("c_custkey",),
                               how="left_anti")
    g = idle.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_cust"), Sum("bal_cents", alias_name="bal"))
    out = g.map_batches(
        lambda t: pa.table({"c_mktsegment": t["c_mktsegment"],
                            "n_cust": pc.cast(t["n_cust"], pa.int64()),
                            "bal_cents": pc.cast(t["bal"], pa.int64())}),
        batch_format="pyarrow")
    return out.sort("c_mktsegment")


O_Q22_IDLE_BALANCE = f"""
WITH c AS (SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment,
                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
g AS (SELECT sum(cents) AS total, count(*) AS n FROM c)
SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(c.cents) AS BIGINT) AS bal_cents
FROM c, g
WHERE c.cents * g.n > g.total
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.k
                  AND o.o_orderdate >= TIMESTAMP '{_Q22_RECENT}')
GROUP BY 1 ORDER BY 1"""


_Q11_NUM, _Q11_DEN = 12, 10  # keep parts worth > 1.2x the mean part value


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape — important-stock identification: parts whose total
    lineitem value exceeds 1.2x the MEAN part value (lineitem revenue
    stands in for the missing partsupp supplycost*availqty; a mean-relative
    threshold keeps the selectivity scale-invariant where TPC-H's fixed
    fraction assumes a known SF). The global-scalar HAVING never recomputes
    the input: per-part values come from one combiner+groupby, the global
    (total, n_parts) is an exact int64 fold of the per-part cents
    (O(parts-per-block) driver rows), and the threshold compares
    ``value_cents * n_parts * DEN > total_cents * NUM`` — integer math, no
    fraction or average is ever floated. Both sides define the total
    identically as the sum of PER-PART ROUNDED cents (summing raw doubles
    then rounding once would diverge between engines)."""
    li = ops.read_table(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                      "v": t["l_extendedprice"]}).group_by(
            ["l_partkey"]).aggregate([("v", "sum")])
        return pa.table({"l_partkey": g["l_partkey"], "v": g["v_sum"]})

    per_part = (li.map_batches(partial, batch_format="pyarrow")
                .groupby("l_partkey").aggregate(Sum("v", alias_name="v_raw")))
    per_part = per_part.map_batches(
        lambda t: pa.table({"l_partkey": t["l_partkey"],
                            "value_cents": _cents(t["v_raw"])}),
        batch_format="pyarrow").materialize()
    total, n_parts = 0, 0
    for b in per_part.map_batches(
            lambda t: pa.table({
                "s": pa.array([pc.sum(t["value_cents"]).as_py() or 0],
                              pa.int64()),
                "n": pa.array([len(t)], pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        total += sum(b["s"].to_pylist())
        n_parts += sum(b["n"].to_pylist())
    thresh = pa.scalar(total * _Q11_NUM, pa.int64())
    mult = pa.scalar(n_parts * _Q11_DEN, pa.int64())
    keep = per_part.map_batches(
        lambda t: t.filter(pc.greater(pc.multiply(t["value_cents"], mult),
                                      thresh)),
        batch_format="pyarrow")
    return keep.sort(["value_cents", "l_partkey"], descending=[True, False])


O_Q11_IMPORTANT_PARTS = f"""
WITH p AS (SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
                  CAST(round(sum(l_extendedprice) * 100) AS BIGINT)
                      AS value_cents
           FROM lineitem GROUP BY 1),
g AS (SELECT sum(value_cents) AS total, count(*) AS n FROM p)
SELECT p.l_partkey, p.value_cents
FROM p, g
WHERE p.value_cents * g.n * {_Q11_DEN} > g.total * {_Q11_NUM}
ORDER BY value_cents DESC, l_partkey"""


def q13_order_distribution(sf_dir: str):
    """TPC-H Q13 shape — customer order-count distribution: how many
    customers placed exactly N orders, INCLUDING the zero-order customers
    (left join, null count → 0). Per-custkey counts come from a combiner +
    groupby; the customer side joins distributed (fact-scaled) and the
    final histogram groupby is order-count-bounded."""
    orders = ops.read_table(sf_dir, "orders", ["o_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"c_custkey": pc.cast(t["o_custkey"], pa.int64())}) \
            .group_by(["c_custkey"]).aggregate([("c_custkey", "count")])
        return pa.table({"c_custkey": g["c_custkey"],
                         "n": pc.cast(g["c_custkey_count"], pa.int64())})

    counts = (orders.map_batches(partial, batch_format="pyarrow")
              .groupby("c_custkey").aggregate(Sum("n", alias_name="c_count")))
    cust = ops.read_table(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t["c_custkey"], pa.int64())}),
        batch_format="pyarrow")
    j = ops.hash_join(cust, ops._compact(counts), on=("c_custkey",),
                      how="left_outer")
    filled = j.map_batches(
        lambda t: pa.table({"c_count": pc.coalesce(
            pc.cast(t["c_count"], pa.int64()), pa.scalar(0, pa.int64()))}),
        batch_format="pyarrow")
    g = filled.groupby("c_count").aggregate(Count(alias_name="custdist"))
    out = g.map_batches(
        lambda t: pa.table({"c_count": t["c_count"],
                            "custdist": pc.cast(t["custdist"], pa.int64())}),
        batch_format="pyarrow")
    return out.sort(["custdist", "c_count"], descending=[True, True])


O_Q13_ORDER_DISTRIBUTION = """
WITH c AS (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
           FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
           GROUP BY 1)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""


_Q15_LO, _Q15_HI = "1996-01-01", "1996-04-01"


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — top supplier(s): suppliers whose quarter revenue
    EQUALS the global maximum (the view + scalar-subquery max pattern; ties
    all surface, exactly as the spec demands). Per-supplier revenue is a
    combiner + supplier-bounded groupby rounded to int64 e4 units; the max
    is a per-block local-max fold (O(blocks) driver rows); the equality
    filter runs distributed. Supplier names attach via a sized join (the
    winner set is tiny; supplier stays distributed above threshold)."""
    lo, hi = _ts(_Q15_LO), _ts(_Q15_HI)
    li = ops.read_table(sf_dir, "lineitem",
                        ["l_suppkey", "l_shipdate", "l_extendedprice",
                         "l_discount"],
                        filter=(pc.field("l_shipdate") >= lo)
                        & (pc.field("l_shipdate") < hi))

    def l_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        g = pa.table({"s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                      "rev": _rev(t)}).group_by(["s_suppkey"]).aggregate(
            [("rev", "sum")])
        return pa.table({"s_suppkey": g["s_suppkey"], "rev": g["rev_sum"]})

    per_supp = (li.map_batches(l_prep, batch_format="pyarrow")
                .groupby("s_suppkey").aggregate(Sum("rev", alias_name="r")))
    per_supp = per_supp.map_batches(
        lambda t: pa.table({"s_suppkey": t["s_suppkey"],
                            "total_rev_e4": _e4(t["r"])}),
        batch_format="pyarrow").materialize()
    best = 0
    for b in per_supp.map_batches(
            lambda t: pa.table({"m": pa.array(
                [pc.max(t["total_rev_e4"]).as_py() or 0], pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        best = max(best, max(b["m"].to_pylist()))
    winners = per_supp.map_batches(
        lambda t: t.filter(pc.equal(t["total_rev_e4"],
                                    pa.scalar(best, pa.int64()))),
        batch_format="pyarrow")
    supp = ops.read_table(sf_dir, "supplier", ["s_suppkey", "s_name"]) \
        .map_batches(
            lambda t: pa.table({"s_suppkey": pc.cast(t["s_suppkey"],
                                                     pa.int64()),
                                "s_name": t["s_name"]}),
            batch_format="pyarrow")
    out = ops.hash_join_sized(supp, ops._compact(winners), on=("s_suppkey",))
    return out.sort("s_suppkey")


O_Q15_TOP_SUPPLIER = f"""
WITH r AS (SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
                  CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000)
                       AS BIGINT) AS total_rev_e4
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
             AND l_shipdate < TIMESTAMP '{_Q15_HI}'
           GROUP BY 1)
SELECT r.s_suppkey, s.s_name, r.total_rev_e4
FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.total_rev_e4 = (SELECT max(total_rev_e4) FROM r)
ORDER BY r.s_suppkey"""


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — small-quantity-order revenue: total revenue of
    lineitems whose quantity is below 20 %% of their part's average
    quantity. Decorrelated: per-part (n, Σqty) stats from a combiner +
    groupby; one distributed fact⋈stats join; the 0.2·avg predicate is the
    exact integer cross-multiplication ``qty_e2 * 5 * n < sum_qty_e2``
    (never a floated average or fraction). Returns the exact sufficient
    statistics (revenue_e4, n_lines) in one row — TPC-H's /7.0 is left to
    the reader, a rounded ratio would be hash-fragile."""
    li = ops.read_table(sf_dir, "lineitem",
                        ["l_partkey", "l_quantity", "l_extendedprice",
                         "l_discount"]).map_batches(
        lambda t: pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "qty_e2": _cents(t["l_quantity"]),
            "rev": _rev(t)}),
        batch_format="pyarrow").materialize()

    def stat_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_partkey"]).aggregate(
            [("qty_e2", "sum"), ("qty_e2", "count")])
        return pa.table({"l_partkey": g["l_partkey"],
                         "sq": pc.cast(g["qty_e2_sum"], pa.int64()),
                         "n": pc.cast(g["qty_e2_count"], pa.int64())})

    stats = (li.map_batches(stat_partial, batch_format="pyarrow")
             .groupby("l_partkey")
             .aggregate(Sum("sq", alias_name="sum_qty_e2"),
                        Sum("n", alias_name="n_lines_part")))
    j = ops.hash_join(li, ops._compact(stats), on=("l_partkey",))
    small = j.map_batches(
        lambda t: t.filter(pc.less(
            pc.multiply(pc.multiply(t["qty_e2"], pa.scalar(5, pa.int64())),
                        t["n_lines_part"]),
            t["sum_qty_e2"])),
        batch_format="pyarrow")
    rev = 0.0
    n_lines = 0
    for b in small.map_batches(
            lambda t: pa.table({
                "r": pa.array([pc.sum(t["rev"]).as_py() or 0.0],
                              pa.float64()),
                "n": pa.array([len(t)], pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        rev += sum(b["r"].to_pylist())
        n_lines += sum(b["n"].to_pylist())
    return pa.table({
        "revenue_e4": pa.array([int(round(rev * 10_000))], pa.int64()),
        "n_lines": pa.array([n_lines], pa.int64())})


O_Q17_SMALL_QTY_REVENUE = """
WITH s AS (SELECT CAST(l_partkey AS BIGINT) AS p,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
                       AS BIGINT) AS sq
           FROM lineitem GROUP BY 1)
SELECT CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000)
            AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN s ON CAST(l.l_partkey AS BIGINT) = s.p
WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * 5 * s.n < s.sq"""


def suppliers_all_regions(sf_dir: str):
    """RELATIONAL DIVISION (the FOR-ALL shape): suppliers whose shipped
    lineitems reach customers in EVERY region — the universal-quantifier
    query that no plain join/filter expresses. Plan: the fact-fact
    lineitem⋈orders join runs distributed on projected (key, key) sides;
    customer attaches size-adaptively; nationkey→regionkey maps via an
    index_in broadcast probe (nation is calendar-bounded); a per-batch
    DISTINCT (suppkey, region) combiner bounds the exchange to
    O(blocks × suppliers × regions) rows; division is then
    count(distinct region) == |regions| — exact integers."""
    nation = ops.read_table(sf_dir, "nation").to_pandas()
    n_regions = int(nation["n_regionkey"].nunique())
    nkey = pa.array(nation["n_nationkey"].astype(int), pa.int64())
    nreg = pa.array(nation["n_regionkey"].astype(int), pa.int64())

    li = ops.read_table(sf_dir, "lineitem",
                        ["l_orderkey", "l_suppkey"]).map_batches(
        lambda t: pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "s_suppkey": pc.cast(t["l_suppkey"], pa.int64())}),
        batch_format="pyarrow")
    orders = ops.read_table(sf_dir, "orders",
                            ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64())}),
        batch_format="pyarrow")
    cust = ops.read_table(sf_dir, "customer",
                          ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table({
            "o_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "c_nationkey": pc.cast(t["c_nationkey"], pa.int64())}),
        batch_format="pyarrow")
    lo = ops.hash_join(li, orders, on=("l_orderkey",),
                       right_on=("o_orderkey",))
    loc_ = ops.hash_join_sized(lo, ops._compact(cust), on=("o_custkey",))

    def pairs(t: pa.Table) -> pa.Table:
        reg = pc.take(nreg, pc.index_in(t["c_nationkey"], value_set=nkey))
        d = pa.table({"s_suppkey": t["s_suppkey"], "region": reg})
        g = d.group_by(["s_suppkey", "region"]).aggregate([])
        return g

    dr = ops.distinct(loc_.map_batches(pairs, batch_format="pyarrow"),
                      ["s_suppkey", "region"])

    def cnt(t: pa.Table) -> pa.Table:
        g = t.group_by(["s_suppkey"]).aggregate([("region", "count")])
        return pa.table({"s_suppkey": g["s_suppkey"],
                         "nr": pc.cast(g["region_count"], pa.int64())})

    per = (dr.map_batches(cnt, batch_format="pyarrow")
           .groupby("s_suppkey").aggregate(Sum("nr", alias_name="nr")))
    winners = per.map_batches(
        lambda t: pa.table({"s_suppkey": t.filter(
            pc.equal(pc.cast(t["nr"], pa.int64()),
                     pa.scalar(n_regions, pa.int64())))["s_suppkey"]}),
        batch_format="pyarrow")
    supp = ops.read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_name"]).map_batches(
        lambda t: pa.table({"s_suppkey": pc.cast(t["s_suppkey"],
                                                 pa.int64()),
                            "s_name": t["s_name"]}),
        batch_format="pyarrow")
    out = ops.hash_join_sized(supp, ops._compact(winners), on=("s_suppkey",))
    return out.sort("s_suppkey")


O_SUPPLIERS_ALL_REGIONS = """
WITH pr AS (SELECT DISTINCT CAST(l.l_suppkey AS BIGINT) AS s_suppkey,
                   n.n_regionkey
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN (SELECT s_suppkey FROM pr GROUP BY 1
      HAVING count(*) = (SELECT count(DISTINCT n_regionkey) FROM nation))
     w ON CAST(s.s_suppkey AS BIGINT) = w.s_suppkey
ORDER BY s.s_suppkey"""


def nation_share_of_region(sf_dir: str):
    """Percent-of-parent hierarchy rollup (the RATIO_TO_REPORT window
    shape): each supplier nation's revenue alongside its region's total,
    as exact integer sufficient statistics (nation_rev_e4,
    region_rev_e4). Revenue rounds per row to e4 (2-dec × 2-dec → exact,
    order-independent int sums); the fact side reduces with a per-batch
    per-suppkey combiner, the supplier (suppkey → nationkey) projection
    joins size-adaptively, and the nation→region parent totals fold over
    the 25-row nation table on the driver (calendar-bounded dim)."""
    li = ops.read_table(sf_dir, "lineitem",
                        ["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "rev_e4": pc.cast(pc.round(pc.multiply(_rev(t), 10_000)),
                              pa.int64())}).group_by(
            ["s_suppkey"]).aggregate([("rev_e4", "sum")])
        return pa.table({"s_suppkey": g["s_suppkey"],
                         "rev_e4": g["rev_e4_sum"]})

    per_supp = (li.map_batches(partial, batch_format="pyarrow")
                .groupby("s_suppkey")
                .aggregate(Sum("rev_e4", alias_name="rev_e4")))
    supp = ops.read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table({"s_suppkey": pc.cast(t["s_suppkey"],
                                                 pa.int64()),
                            "s_nationkey": pc.cast(t["s_nationkey"],
                                                   pa.int64())}),
        batch_format="pyarrow")
    j = ops.hash_join_sized(ops._compact(per_supp), ops._compact(supp),
                            on=("s_suppkey",))

    def nat_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["s_nationkey"]).aggregate([("rev_e4", "sum")])
        return pa.table({"s_nationkey": g["s_nationkey"],
                         "r": pc.cast(g["rev_e4_sum"], pa.int64())})

    per_nation = (j.map_batches(nat_partial, batch_format="pyarrow")
                  .groupby("s_nationkey")
                  .aggregate(Sum("r", alias_name="nation_rev_e4"))) \
        .to_pandas()
    nation = ops.read_table(sf_dir, "nation").to_pandas()
    region = ops.read_table(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")
    m = per_nation.merge(dim, left_on="s_nationkey",
                         right_on="n_nationkey")
    m["nation_rev_e4"] = m["nation_rev_e4"].astype("int64")
    reg_tot = m.groupby("r_name")["nation_rev_e4"].transform("sum")
    m = m.sort_values("n_name")
    return pa.table({
        "n_name": pa.array(m["n_name"], pa.string()),
        "r_name": pa.array(m["r_name"], pa.string()),
        "nation_rev_e4": pa.array(m["nation_rev_e4"], pa.int64()),
        "region_rev_e4": pa.array(reg_tot[m.index].astype("int64"),
                                  pa.int64())})


O_NATION_SHARE_OF_REGION = """
WITH nr AS (SELECT n.n_name, r.r_name,
                   CAST(sum(CAST(round((l.l_extendedprice *
                        (1 - l.l_discount)) * 10000) AS BIGINT))
                        AS BIGINT) AS nation_rev_e4
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2)
SELECT n_name, r_name, nation_rev_e4,
       CAST(sum(nation_rev_e4) OVER (PARTITION BY r_name) AS BIGINT)
           AS region_rev_e4
FROM nr ORDER BY n_name"""


_Q6_LO, _Q6_HI = "1996-01-01", "1997-01-01"
_Q6_QTY = 24.0


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — forecast revenue change: one filtered pass over
    lineitem, no join, no shuffle at all (the cheapest query in the suite;
    it exists to prove the engine's scan+filter floor). The discount band
    compares in integer percent (``round(disc*100) in 5..7``) so
    float-equality on the band edges can never disagree between engines,
    and revenue rounds PER ROW to int64 e4 units: ep and disc are
    2-decimal, so ``ep*disc`` is exactly 4-decimal and the rounded int64
    sum is associative — block order can never flip the value hash the way
    a float-sum-then-round could. Each block contributes one (sum, count)
    row; the driver folds O(blocks) rows."""
    lo, hi = _ts(_Q6_LO), _ts(_Q6_HI)
    li = ops.read_table(sf_dir, "lineitem",
                        ["l_shipdate", "l_discount", "l_quantity",
                         "l_extendedprice"],
                        filter=(pc.field("l_shipdate") >= lo)
                        & (pc.field("l_shipdate") < hi))

    def partial(t: pa.Table) -> pa.Table:
        disc_pct = pc.cast(pc.round(pc.multiply(t["l_discount"], 100)),
                           pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                    pc.less(t["l_shipdate"], hi)),
            pc.and_(pc.and_(pc.greater_equal(disc_pct, 5),
                            pc.less_equal(disc_pct, 7)),
                    pc.less(t["l_quantity"], _Q6_QTY)))
        t2 = t.filter(keep)
        rev = pc.cast(pc.round(pc.multiply(
            pc.multiply(t2["l_extendedprice"], t2["l_discount"]), 10_000)),
            pa.int64())
        return pa.table({
            "revenue_e4": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            "n_lines": pa.array([len(t2)], pa.int64())})

    rev = n = 0
    for b in li.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        rev += sum(b["revenue_e4"].to_pylist())
        n += sum(b["n_lines"].to_pylist())
    return pa.table({"revenue_e4": pa.array([rev], pa.int64()),
                     "n_lines": pa.array([n], pa.int64())})


O_Q6_FORECAST_REVENUE = f"""
SELECT CAST(coalesce(sum(CAST(round((l_extendedprice * l_discount) * 10000)
                               AS BIGINT)), 0) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}'
  AND l_shipdate < TIMESTAMP '{_Q6_HI}'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < {_Q6_QTY}"""


_Q12_LO, _Q12_HI = "1996-01-01", "1997-01-01"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_line_priority(sf_dir: str):
    """TPC-H Q12 shape — shipping-class service quality: lines shipped in
    one year, bucketed by ``l_linestatus`` (stands in for the schema's
    missing l_shipmode), counting lines from high-priority orders vs the
    rest. The fact-fact lineitem⋈orders join runs distributed with each
    side projected to (key, one tiny column) first; the result reduces via
    a per-batch (status, is_high) count combiner so the final groupby
    exchanges at most 2 rows per block per status value."""
    lo, hi = _ts(_Q12_LO), _ts(_Q12_HI)
    li = ops.read_table(sf_dir, "lineitem",
                        ["l_orderkey", "l_shipdate", "l_linestatus"],
                        filter=(pc.field("l_shipdate") >= lo)
                        & (pc.field("l_shipdate") < hi))

    def l_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        return pa.table({"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                         "l_linestatus": t["l_linestatus"]})

    orders = ops.read_table(sf_dir, "orders",
                            ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table({"o_orderkey": pc.cast(t["o_orderkey"],
                                                  pa.int64()),
                            "o_orderpriority": t["o_orderpriority"]}),
        batch_format="pyarrow")
    j = ops.hash_join(li.map_batches(l_prep, batch_format="pyarrow"), orders,
                      on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        hi_i = pc.cast(pc.is_in(t["o_orderpriority"],
                                value_set=pa.array(list(_Q12_HIGH))),
                       pa.int64())
        g = pa.table({"l_linestatus": t["l_linestatus"], "h": hi_i,
                      "l": pc.subtract(pa.scalar(1, pa.int64()), hi_i)}) \
            .group_by(["l_linestatus"]).aggregate([("h", "sum"),
                                                   ("l", "sum")])
        return pa.table({"l_linestatus": g["l_linestatus"],
                         "h": g["h_sum"], "l": g["l_sum"]})

    g = (j.map_batches(partial, batch_format="pyarrow")
         .groupby("l_linestatus")
         .aggregate(Sum("h", alias_name="high_line_count"),
                    Sum("l", alias_name="low_line_count")))
    out = g.map_batches(
        lambda t: pa.table({
            "l_linestatus": t["l_linestatus"],
            "high_line_count": pc.cast(t["high_line_count"], pa.int64()),
            "low_line_count": pc.cast(t["low_line_count"], pa.int64())}),
        batch_format="pyarrow")
    return out.sort("l_linestatus")


O_Q12_LINE_PRIORITY = f"""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q12_LO}'
  AND l.l_shipdate < TIMESTAMP '{_Q12_HI}'
GROUP BY 1 ORDER BY 1"""


# (brand, size_lo, size_hi, qty_lo, qty_hi) — three disjunctive bands
_Q19_BANDS = (("Brand#1", 1, 10, 1.0, 11.0),
              ("Brand#2", 11, 20, 10.0, 20.0),
              ("Brand#3", 21, 30, 20.0, 30.0))


def q19_discounted_revenue(sf_dir: str):
    """TPC-H Q19 shape — disjunctive brand/size/quantity predicates: total
    discounted revenue of lineitems matching any of three (brand, size
    band, quantity band) conjunctions. The part side filters to the UNION
    of the brand/size bands BEFORE the join (only candidate parts enter
    the exchange — a tiny fraction of part); the per-band quantity
    predicate applies vectorized after a size-adaptive join; revenue
    rounds per row to int64 e4 (2-dec × 2-dec = exact 4-dec, so the int
    sum is block-order-independent) and the driver folds one (sum, count)
    row per block."""
    part = ops.read_table(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])

    def p_prep(t: pa.Table) -> pa.Table:
        keep = None
        for brand, s_lo, s_hi, _, _ in _Q19_BANDS:
            c = pc.and_(pc.equal(t["p_brand"], brand),
                        pc.and_(pc.greater_equal(t["p_size"], s_lo),
                                pc.less_equal(t["p_size"], s_hi)))
            keep = c if keep is None else pc.or_(keep, c)
        t = t.filter(keep)
        return pa.table({"p_partkey": pc.cast(t["p_partkey"], pa.int64()),
                         "p_brand": t["p_brand"]})

    li = ops.read_table(sf_dir, "lineitem",
                        ["l_partkey", "l_quantity", "l_extendedprice",
                         "l_discount"]).map_batches(
        lambda t: pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "l_quantity": t["l_quantity"],
            "rev_e4": pc.cast(pc.round(pc.multiply(_rev(t), 10_000)),
                              pa.int64())}),
        batch_format="pyarrow")
    j = ops.hash_join_sized(
        li, ops._compact(part.map_batches(p_prep, batch_format="pyarrow")),
        on=("l_partkey",), right_on=("p_partkey",))

    def partial(t: pa.Table) -> pa.Table:
        keep = None
        for brand, _, _, q_lo, q_hi in _Q19_BANDS:
            c = pc.and_(pc.equal(t["p_brand"], brand),
                        pc.and_(pc.greater_equal(t["l_quantity"], q_lo),
                                pc.less_equal(t["l_quantity"], q_hi)))
            keep = c if keep is None else pc.or_(keep, c)
        t2 = t.filter(keep)
        return pa.table({
            "revenue_e4": pa.array([pc.sum(t2["rev_e4"]).as_py() or 0],
                                   pa.int64()),
            "n_lines": pa.array([len(t2)], pa.int64())})

    rev = n = 0
    for b in j.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        rev += sum(b["revenue_e4"].to_pylist())
        n += sum(b["n_lines"].to_pylist())
    return pa.table({"revenue_e4": pa.array([rev], pa.int64()),
                     "n_lines": pa.array([n], pa.int64())})


def _q19_band_sql(brand: str, s_lo: int, s_hi: int,
                  q_lo: float, q_hi: float) -> str:
    return (f"(p.p_brand = '{brand}' AND p.p_size BETWEEN {s_lo} AND {s_hi}"
            f" AND l.l_quantity BETWEEN {q_lo} AND {q_hi})")


O_Q19_DISCOUNTED_REVENUE = f"""
SELECT CAST(coalesce(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount))
                                    * 10000) AS BIGINT)), 0) AS BIGINT)
           AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {' OR '.join(_q19_band_sql(*b) for b in _Q19_BANDS)}"""


_Q20_LO, _Q20_HI = "1996-01-01", "1997-01-01"
_Q20_SUFFIX = "widget"
_Q20_REGION = "EUROPE"
_Q20_NUM, _Q20_DEN = 3, 2  # keep pairs shipping > 1.5x the mean pair qty


def q20_promotion_suppliers(sf_dir: str):
    """TPC-H Q20 shape — potential part-promotion suppliers: suppliers in
    one region who shipped an outsized quantity of a name-matched part
    family in one year (lineitem shipped-quantity stands in for the
    missing partsupp availqty; the 0.5*availqty bar becomes a
    mean-relative one — pairs shipping > 1.5x the mean (supplier, part)
    quantity — so selectivity is scale-invariant). The nested-semi-join
    plan: name-filtered part keys reduce the lineitem side FIRST (sized
    join, small side right); per-(supplier, part) quantities come from a
    per-batch combiner + one groupby in exact e2 units; the global
    (total, n_pairs) folds O(blocks) driver rows and the threshold is the
    integer cross-multiplication ``q * n * DEN > total * NUM``; winning
    suppliers dedup via distinct, then the region-filtered supplier dim
    (nation⋈region broadcast as in q5) joins size-adaptively."""
    lo, hi = _ts(_Q20_LO), _ts(_Q20_HI)
    part = ops.read_table(sf_dir, "part", ["p_partkey", "p_name"])
    pkeys = part.map_batches(
        lambda t: pa.table({"p_partkey": pc.cast(
            t.filter(pc.ends_with(t["p_name"], _Q20_SUFFIX))["p_partkey"],
            pa.int64())}),
        batch_format="pyarrow")

    li = ops.read_table(sf_dir, "lineitem",
                        ["l_partkey", "l_suppkey", "l_shipdate",
                         "l_quantity"],
                        filter=(pc.field("l_shipdate") >= lo)
                        & (pc.field("l_shipdate") < hi))

    def l_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        g = pa.table({"s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                      "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                      "q": _cents(t["l_quantity"])}).group_by(
            ["s_suppkey", "l_partkey"]).aggregate([("q", "sum")])
        return pa.table({"s_suppkey": g["s_suppkey"],
                         "l_partkey": g["l_partkey"], "q": g["q_sum"]})

    lp = ops.hash_join_sized(
        li.map_batches(l_prep, batch_format="pyarrow"),
        ops._compact(ops.distinct(pkeys, ["p_partkey"])),
        on=("l_partkey",), right_on=("p_partkey",))
    pairs = (lp.groupby(["s_suppkey", "l_partkey"])
             .aggregate(Sum("q", alias_name="qty_e2"))).materialize()

    total = n_pairs = 0
    for b in pairs.map_batches(
            lambda t: pa.table({
                "s": pa.array([pc.sum(t["qty_e2"]).as_py() or 0], pa.int64()),
                "n": pa.array([len(t)], pa.int64())}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        total += sum(b["s"].to_pylist())
        n_pairs += sum(b["n"].to_pylist())
    thresh = pa.scalar(total * _Q20_NUM, pa.int64())
    mult = pa.scalar(n_pairs * _Q20_DEN, pa.int64())
    winners = ops.distinct(
        pairs.map_batches(
            lambda t: pa.table({"s_suppkey": t.filter(
                pc.greater(pc.multiply(t["qty_e2"], mult),
                           thresh))["s_suppkey"]}),
            batch_format="pyarrow"),
        ["s_suppkey"])

    nation = ops.read_table(sf_dir, "nation").to_pandas()
    region = ops.read_table(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    nkeys = set(dim[dim["r_name"] == _Q20_REGION]["n_nationkey"].astype(int))
    supp = ops.read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_name", "s_nationkey"]).map_batches(
        lambda t: pa.table({
            "s_suppkey": pc.cast(
                t.filter(pc.is_in(pc.cast(t["s_nationkey"], pa.int64()),
                                  value_set=pa.array(sorted(nkeys),
                                                     pa.int64())))
                ["s_suppkey"], pa.int64()),
            "s_name": t.filter(pc.is_in(pc.cast(t["s_nationkey"],
                                                pa.int64()),
                               value_set=pa.array(sorted(nkeys),
                                                  pa.int64())))["s_name"]}),
        batch_format="pyarrow")
    out = ops.hash_join_sized(supp, ops._compact(winners), on=("s_suppkey",))
    return out.sort("s_suppkey")


O_Q20_PROMOTION_SUPPLIERS = f"""
WITH pairs AS (SELECT CAST(l.l_suppkey AS BIGINT) AS s,
                      CAST(l.l_partkey AS BIGINT) AS pk,
                      CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT))
                           AS BIGINT) AS q
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
               WHERE p.p_name LIKE '%{_Q20_SUFFIX}'
                 AND l.l_shipdate >= TIMESTAMP '{_Q20_LO}'
                 AND l.l_shipdate < TIMESTAMP '{_Q20_HI}'
               GROUP BY 1, 2),
g AS (SELECT CAST(sum(q) AS BIGINT) AS total, count(*) AS n FROM pairs),
w AS (SELECT DISTINCT s FROM pairs, g
      WHERE q * g.n * {_Q20_DEN} > g.total * {_Q20_NUM})
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN w ON s.s_suppkey = w.s
JOIN nation nt ON s.s_nationkey = nt.n_nationkey
JOIN region r ON nt.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_Q20_REGION}'
ORDER BY s.s_suppkey"""


_Q21_TOPK = 20


def q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape — suppliers who kept multi-supplier orders waiting:
    for finished ('F') orders touched by >= 2 suppliers, the UNIQUE
    supplier whose lines carry the strictly latest ship day (l_shipdate
    stands in for the missing receipt/commit dates; "only this supplier is
    late" maps to "only this supplier attains the order's max ship day").
    Plan: orders filters to 'F' keys and joins the lineitem projection
    distributed (fact-fact); a per-batch (order, supplier) max-day
    combiner bounds every order group to <= suppliers-per-order rows; the
    blocker test runs inside groupby(order).map_groups on pyarrow groups;
    per-supplier wait counts reduce with a count combiner and the top-20
    is a per-block local top-k + O(blocks*k) driver merge
    (numwait DESC, s_suppkey tie-break = total order). Winner names attach
    driver-side: the winner set is <= k rows by construction."""
    li = ops.read_table(sf_dir, "lineitem",
                        ["l_orderkey", "l_suppkey", "l_shipdate"])

    def l_prep(t: pa.Table) -> pa.Table:
        g = pa.table({"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                      "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                      "d": _day(t["l_shipdate"])}).group_by(
            ["l_orderkey", "s_suppkey"]).aggregate([("d", "max")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "s_suppkey": g["s_suppkey"], "d": g["d_max"]})

    okeys = ops.read_table(sf_dir, "orders",
                           ["o_orderkey", "o_orderstatus"]).map_batches(
        lambda t: pa.table({"l_orderkey": pc.cast(
            t.filter(pc.equal(t["o_orderstatus"], "F"))["o_orderkey"],
            pa.int64())}),
        batch_format="pyarrow")
    j = ops.hash_join(li.map_batches(l_prep, batch_format="pyarrow"), okeys,
                      on=("l_orderkey",))

    def blocker(t: pa.Table) -> pa.Table:
        # group = one order; rows may repeat (supplier, day) across input
        # blocks — reduce to per-supplier max first, then the unique-argmax
        # test. Groups are bounded by suppliers-per-order.
        g = t.group_by(["s_suppkey"]).aggregate([("d", "max")])
        if len(g) < 2:
            return pa.table({"s_suppkey": pa.array([], pa.int64())})
        d = g["d_max"].to_numpy(zero_copy_only=False)
        at_max = np.flatnonzero(d == d.max())
        if len(at_max) != 1:
            return pa.table({"s_suppkey": pa.array([], pa.int64())})
        return pa.table({"s_suppkey": g["s_suppkey"].take(
            pa.array(at_max, pa.int32()))})

    blocked = j.groupby("l_orderkey").map_groups(blocker,
                                                 batch_format="pyarrow")

    def cnt(t: pa.Table) -> pa.Table:
        g = t.group_by(["s_suppkey"]).aggregate([("s_suppkey", "count")])
        return pa.table({"s_suppkey": g["s_suppkey"],
                         "n": pc.cast(g["s_suppkey_count"], pa.int64())})

    numwait = (blocked.map_batches(cnt, batch_format="pyarrow")
               .groupby("s_suppkey").aggregate(Sum("n", alias_name="numwait")))
    numwait = numwait.map_batches(
        lambda t: pa.table({"s_suppkey": t["s_suppkey"],
                            "numwait": pc.cast(t["numwait"], pa.int64())}),
        batch_format="pyarrow")
    top = _driver_topk(numwait, _Q21_TOPK, ["numwait", "s_suppkey"],
                       [True, False])

    supp = ops.read_table(sf_dir, "supplier", ["s_suppkey", "s_name"])
    keys = pa.array(top["s_suppkey"].to_pylist(), pa.int64())
    name_batches = [b for b in supp.map_batches(
        lambda t: t.filter(pc.is_in(pc.cast(t["s_suppkey"], pa.int64()),
                                    value_set=keys)),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        if len(b)]
    names = pa.concat_tables(name_batches) if name_batches else \
        pa.table({"s_suppkey": pa.array([], pa.int64()),
                  "s_name": pa.array([], pa.string())})
    names = pa.table({"s_suppkey": pc.cast(names["s_suppkey"], pa.int64()),
                      "s_name": names["s_name"]})
    out = top.join(names, keys=["s_suppkey"], join_type="inner")
    return out.sort_by([("numwait", "descending"),
                        ("s_suppkey", "ascending")])


O_Q21_WAITING_SUPPLIERS = f"""
WITH pm AS (SELECT CAST(l.l_orderkey AS BIGINT) AS ok,
                   CAST(l.l_suppkey AS BIGINT) AS sk,
                   max(date_diff('day', TIMESTAMP '1970-01-01',
                                 l.l_shipdate)) AS d
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
            GROUP BY 1, 2),
st AS (SELECT ok, max(d) AS md, count(*) AS ns FROM pm GROUP BY 1),
blk AS (SELECT pm.sk FROM pm JOIN st ON pm.ok = st.ok
        WHERE st.ns >= 2 AND pm.d = st.md
          AND 1 = (SELECT count(*) FROM pm p2
                   WHERE p2.ok = pm.ok AND p2.d = st.md)),
c AS (SELECT sk AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
      FROM blk GROUP BY 1)
SELECT c.s_suppkey, s.s_name, c.numwait
FROM c JOIN supplier s ON s.s_suppkey = c.s_suppkey
ORDER BY numwait DESC, c.s_suppkey LIMIT {_Q21_TOPK}"""


_Q8_LO, _Q8_HI = "1996-01-01", "1998-01-01"
_Q8_REGION = "AMERICA"
_Q8_NATIONKEY = 6  # NATION_6 sits in AMERICA (regionkey 1)
_Q8_TYPE = "PROMO"


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape — national market share: of the revenue from one
    part type sold to customers in one region over two years, the share
    supplied by one nation, per order year. The ratio ships as its exact
    integer sufficient statistics (num_e4 / den_e4) — a rounded float
    share would be hash-fragile. Plan: type-filtered part keys and the
    supplier (suppkey → nationkey) projection join size-adaptively; the
    region-filtered customer keys reduce the date-filtered orders side
    BEFORE the fact-fact lineitem⋈orders join (same push-the-dim-down
    ordering as q5); revenue rounds per row to int64 e4 (2-dec × 2-dec,
    order-independent sum) and a per-batch (year, is_target) combiner
    leaves the final groupby exchanging 2 rows per block per year."""
    lo, hi = _ts(_Q8_LO), _ts(_Q8_HI)
    nation = ops.read_table(sf_dir, "nation").to_pandas()
    region = ops.read_table(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    ckeys_set = sorted(dim[dim["r_name"] == _Q8_REGION]["n_nationkey"]
                       .astype(int))
    cnat = pa.array(ckeys_set, pa.int64())

    cust = ops.read_table(sf_dir, "customer",
                          ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: pa.table({"o_custkey": pc.cast(
            t.filter(pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                              value_set=cnat))["c_custkey"], pa.int64())}),
        batch_format="pyarrow")

    orders = ops.read_table(sf_dir, "orders",
                            ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        return pa.table({"o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                         "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                         "o_year": pc.cast(pc.year(t["o_orderdate"]),
                                           pa.int64())})

    ord_f = ops.hash_join_sized(
        orders.map_batches(o_prep, batch_format="pyarrow"),
        ops._compact(ops.distinct(cust, ["o_custkey"])), on=("o_custkey",))

    pkeys = ops.read_table(sf_dir, "part",
                           ["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table({"l_partkey": pc.cast(
            t.filter(pc.equal(t["p_type"], _Q8_TYPE))["p_partkey"],
            pa.int64())}),
        batch_format="pyarrow")

    li = ops.read_table(sf_dir, "lineitem",
                        ["l_orderkey", "l_partkey", "l_suppkey",
                         "l_extendedprice", "l_discount"]).map_batches(
        lambda t: pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "rev_e4": pc.cast(pc.round(pc.multiply(_rev(t), 10_000)),
                              pa.int64())}),
        batch_format="pyarrow")
    lp = ops.hash_join_sized(li, ops._compact(pkeys), on=("l_partkey",))
    supp = ops.read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table({"l_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                            "s_nationkey": pc.cast(t["s_nationkey"],
                                                   pa.int64())}),
        batch_format="pyarrow")
    lps = ops.hash_join_sized(lp, ops._compact(supp), on=("l_suppkey",))
    full = ops.hash_join(lps, ord_f, on=("l_orderkey",),
                         right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        is_t = pc.cast(pc.equal(t["s_nationkey"],
                                pa.scalar(_Q8_NATIONKEY, pa.int64())),
                       pa.int64())
        g = pa.table({"o_year": t["o_year"],
                      "num": pc.multiply(is_t, t["rev_e4"]),
                      "den": t["rev_e4"]}).group_by(["o_year"]).aggregate(
            [("num", "sum"), ("den", "sum")])
        return pa.table({"o_year": g["o_year"], "num": g["num_sum"],
                         "den": g["den_sum"]})

    g = (full.map_batches(partial, batch_format="pyarrow")
         .groupby("o_year").aggregate(Sum("num", alias_name="num_e4"),
                                      Sum("den", alias_name="den_e4")))
    out = g.map_batches(
        lambda t: pa.table({"o_year": t["o_year"],
                            "num_e4": pc.cast(t["num_e4"], pa.int64()),
                            "den_e4": pc.cast(t["den_e4"], pa.int64())}),
        batch_format="pyarrow")
    return out.sort("o_year")


O_Q8_MARKET_SHARE = f"""
WITH ord AS (SELECT o.o_orderkey,
                    CAST(year(o.o_orderdate) AS BIGINT) AS o_year
             FROM orders o
             JOIN customer c ON c.c_custkey = o.o_custkey
             JOIN nation n ON c.c_nationkey = n.n_nationkey
             JOIN region r ON n.n_regionkey = r.r_regionkey
             WHERE r.r_name = '{_Q8_REGION}'
               AND o.o_orderdate >= TIMESTAMP '{_Q8_LO}'
               AND o.o_orderdate < TIMESTAMP '{_Q8_HI}')
SELECT ord.o_year,
       CAST(coalesce(sum(CASE WHEN s.s_nationkey = {_Q8_NATIONKEY}
                              THEN CAST(round((l.l_extendedprice *
                                   (1 - l.l_discount)) * 10000) AS BIGINT)
                              ELSE 0 END), 0) AS BIGINT) AS num_e4,
       CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 10000)
                     AS BIGINT)) AS BIGINT) AS den_e4
FROM lineitem l
JOIN ord ON l.l_orderkey = ord.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = '{_Q8_TYPE}'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1 ORDER BY 1"""


_Q9_NEEDLE = "bolt"
_Q9_COST = 0.1  # cost proxy: p_retailprice * l_quantity * 0.1


def q9_product_type_profit(sf_dir: str):
    """TPC-H Q9 shape — product-type profit by supplier nation and year:
    profit of name-matched parts, where cost substitutes
    ``p_retailprice * l_quantity * {_Q9_COST}`` for the schema's missing
    partsupp supplycost. Profit rounds PER ROW with the oracle's exact
    double expression order (rev minus (retail*qty)*cost-rate, then *1e4)
    so both engines fold identical int64 values in any block order. Plan:
    name-filtered part (carrying retailprice) and the supplier nationkey
    projection join size-adaptively; orders project to (key, year) and
    join distributed (no date filter — the year IS the group key); nation
    names attach via an index_in broadcast probe inside the final
    combiner."""
    part = ops.read_table(sf_dir, "part",
                          ["p_partkey", "p_name", "p_retailprice"])
    pf = part.map_batches(
        lambda t: (lambda f: pa.table({
            "l_partkey": pc.cast(f["p_partkey"], pa.int64()),
            "p_retailprice": f["p_retailprice"]}))(
                t.filter(pc.match_substring(t["p_name"], _Q9_NEEDLE))),
        batch_format="pyarrow")

    li = ops.read_table(sf_dir, "lineitem",
                        ["l_orderkey", "l_partkey", "l_suppkey",
                         "l_quantity", "l_extendedprice", "l_discount"]) \
        .map_batches(
        lambda t: pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "l_quantity": t["l_quantity"],
            "rev": _rev(t)}),
        batch_format="pyarrow")
    lp = ops.hash_join_sized(li, ops._compact(pf), on=("l_partkey",))
    supp = ops.read_table(sf_dir, "supplier",
                          ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table({"l_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                            "s_nationkey": pc.cast(t["s_nationkey"],
                                                   pa.int64())}),
        batch_format="pyarrow")
    lps = ops.hash_join_sized(lp, ops._compact(supp), on=("l_suppkey",))
    orders = ops.read_table(sf_dir, "orders",
                            ["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({"o_orderkey": pc.cast(t["o_orderkey"],
                                                  pa.int64()),
                            "o_year": pc.cast(pc.year(t["o_orderdate"]),
                                              pa.int64())}),
        batch_format="pyarrow")
    full = ops.hash_join(lps, orders, on=("l_orderkey",),
                         right_on=("o_orderkey",))

    nation = ops.read_table(sf_dir, "nation").to_pandas()
    nkey = pa.array(nation["n_nationkey"].astype(int), pa.int64())
    nname = pa.array(nation["n_name"].astype(str), pa.string())

    def partial(t: pa.Table) -> pa.Table:
        cost = pc.multiply(pc.multiply(t["p_retailprice"], t["l_quantity"]),
                           _Q9_COST)
        profit = pc.cast(pc.round(pc.multiply(pc.subtract(t["rev"], cost),
                                              10_000)), pa.int64())
        names = pc.take(nname, pc.index_in(t["s_nationkey"],
                                           value_set=nkey))
        g = pa.table({"n_name": names, "o_year": t["o_year"],
                      "p": profit}).group_by(
            ["n_name", "o_year"]).aggregate([("p", "sum")])
        return pa.table({"n_name": g["n_name"], "o_year": g["o_year"],
                         "p": g["p_sum"]})

    g = (full.map_batches(partial, batch_format="pyarrow")
         .groupby(["n_name", "o_year"])
         .aggregate(Sum("p", alias_name="profit_e4")))
    out = g.map_batches(
        lambda t: pa.table({"n_name": t["n_name"], "o_year": t["o_year"],
                            "profit_e4": pc.cast(t["profit_e4"],
                                                 pa.int64())}),
        batch_format="pyarrow")
    return out.sort(["n_name", "o_year"], descending=[False, True])


O_Q9_PRODUCT_TYPE_PROFIT = f"""
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                            - p.p_retailprice * l.l_quantity * {_Q9_COST})
                           * 10000) AS BIGINT)) AS BIGINT) AS profit_e4
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%{_Q9_NEEDLE}%'
GROUP BY 1, 2 ORDER BY n_name, o_year DESC"""
