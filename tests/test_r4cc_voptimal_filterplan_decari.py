"""V-optimal histogram, filter-order planner, decade ARI."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_voptimal_hist_is_optimal():
    t = Q.QUERIES["orders_voptimal_hist"](SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderdate"]).to_pandas()
    m = (o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month - 1)
    cnt = m.value_counts()
    lo, hi = int(m.min()), int(m.max())
    ys = [int(cnt.get(i, 0)) for i in range(lo, hi + 1)]
    d = len(ys)

    def sse(s, e):  # 0-based inclusive
        seg = ys[s:e + 1]
        n_ = len(seg)
        sy = sum(seg)
        return sum(v * v for v in seg) * 10**9 - Q._div_nano(sy * sy, n_)

    # buckets partition the span contiguously
    assert list(t.start_m)[0] == lo and list(t.end_m)[-1] == hi
    for a, b in zip(t.itertuples(), list(t.itertuples())[1:]):
        assert b.start_m == a.end_m + 1
    # reported SSEs match recomputation
    total = 0
    for r in t.itertuples():
        v = sse(r.start_m - lo, r.end_m - lo)
        assert r.sse_nano == v
        total += v
    # optimality: exhaustive search over all 3-split choices (D<=small)
    best = None
    for s1 in range(0, d - 3):
        c1 = sse(0, s1)
        for s2 in range(s1 + 1, d - 2):
            c2 = c1 + sse(s1 + 1, s2)
            for s3 in range(s2 + 1, d - 1):
                c = c2 + sse(s2 + 1, s3) + sse(s3 + 1, d - 1)
                if best is None or c < best:
                    best = c
    assert total == best


def test_filter_order_planner_properties():
    t = Q.QUERIES["docs_filter_order_planner"](SF).to_pandas() \
        .set_index("scheme")
    # greedy never costs more than naive under the same model
    assert t.loc["greedy"].exp_cost_nano <= t.loc["naive"].exp_cost_nano
    # both orders contain each filter exactly once
    for r in t.itertuples():
        assert sorted(r.filter_order.split(">")) \
            == sorted(Q._FILTER_COSTS)
    # cost at least the first filter's cost (it always runs)
    first = t.loc["greedy"].filter_order.split(">")[0]
    assert t.loc["greedy"].exp_cost_nano \
        >= Q._FILTER_COSTS[first] * 10**9


def test_decade_ari_bounds_and_selfconsistency():
    t = Q.QUERIES["kg_decade_ari"](SF).to_pandas()
    assert (t.decade_from < t.decade_to).all()
    assert (t.ari_nano <= 10**9).all()
    assert (t.k_a <= t.n_nodes).all() and (t.k_b <= t.n_nodes).all()
    # consecutive attested decades only, in order
    assert list(t.decade_from) == sorted(t.decade_from)
