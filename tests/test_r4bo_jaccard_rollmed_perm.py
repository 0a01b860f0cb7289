"""Supplier-part Jaccard, rolling median, hash-permutation test."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_supplier_jaccard_matches_pandas():
    t = Q.QUERIES["supplier_part_jaccard"](SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_suppkey", "l_partkey"]).to_pandas()
    sets = {s: set(g.l_partkey) for s, g in li.groupby("l_suppkey")}
    rows = []
    ks = sorted(sets)
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            c = len(sets[a] & sets[b])
            if c:
                u = len(sets[a] | sets[b])
                rows.append((a, b, c, u, Q._div_nano(c, u)))
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    assert list(t.itertuples(index=False, name=None)) \
        == rows[:Q._SUPP_JACCARD_TOP]
    assert (t.n_common <= t.n_union).all()


def test_rolling_median_matches_pandas():
    t = Q.QUERIES["orders_rolling_median"](SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderdate"]).to_pandas()
    days = (o.o_orderdate.astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000)
    counts = days.value_counts()
    lo, hi = int(days.min()), int(days.max())
    ys = [int(counts.get(d, 0)) for d in range(lo, hi + 1)]
    assert list(t.epoch_day) == list(range(lo, hi + 1))
    assert list(t.n_orders) == ys
    for i, m in enumerate(t.med7_x2):
        w = sorted(ys[max(0, i - Q._ROLLMED_W + 1):i + 1])
        assert m == w[(len(w) - 1) // 2] + w[len(w) // 2]
    # full windows: doubled median bounded by doubled min/max of window
    assert (t.med7_x2 >= 0).all()


def test_permutation_test_matches_bruteforce():
    t = Q.QUERIES["events_permutation_test"](SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type", "value"]
                       ).to_pandas()
    ev = ev[ev.event_type.isin(["purchase", "view"])
            & ev.value.notna()].copy()
    c = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    is_p = (ev.event_type == "purchase").to_numpy()
    eid = ev.event_id.to_numpy().astype(np.int64)
    n_p, n_v = int(is_p.sum()), int((~is_p).sum())
    s_p, s_v = int(c[is_p].sum()), int(c[~is_p].sum())
    assert (t.n_purchase, t.n_view) == (n_p, n_v)
    assert (t.sum_purchase_cents, t.sum_view_cents) == (s_p, s_v)
    n_all, s_all = len(c), int(c.sum())
    t_obs = abs(s_p * n_v - s_v * n_p)
    extreme = 0
    for b in range(1, Q._PERM_B + 1):
        h = ((eid % 4294967296) * 1000003 + b * 40503) % 4294967296
        side = ((h >> 15) & 1).astype(bool)
        n1 = int(side.sum())
        s1 = int(c[side].sum())
        n0, s0 = n_all - n1, s_all - s1
        if n1 == 0 or n0 == 0 or \
                abs(s1 * n0 - s0 * n1) * n_p * n_v >= t_obs * n1 * n0:
            extreme += 1
    assert t.n_extreme == extreme
    assert t.p_nano == Q._div_nano(1 + extreme, Q._PERM_B + 1)
    # p is a valid probability and never exactly 0 (the +1 smoothing)
    assert 0 < t.p_nano <= 10**9
