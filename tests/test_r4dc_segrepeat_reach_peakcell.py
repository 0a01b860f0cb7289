"""Segment repeat, supplier reach, peak cell."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_segment_repeat_matches_pandas():
    t = Q.QUERIES["customer_segment_repeat"](SF).to_pandas() \
        .set_index("segment")
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_custkey"]).to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet",
                      columns=["c_custkey", "c_mktsegment"]).to_pandas()
    n_ord = o.groupby("o_custkey").size()
    j = c[c.c_custkey.isin(n_ord.index)].copy()
    j["multi"] = (n_ord.loc[j.c_custkey] > 1).to_numpy()
    for seg, g in j.groupby("c_mktsegment"):
        row = t.loc[seg]
        assert row.n_customers == len(g)
        assert row.n_multi == int(g.multi.sum())
        assert row.repeat_nano == Q._div_nano(int(g.multi.sum()), len(g))


def test_supplier_reach_matches_pandas():
    t = Q.QUERIES["supplier_reach"](SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_suppkey", "l_orderkey"]).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_custkey"]).to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"]).to_pandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey") \
        .merge(c, left_on="o_custkey", right_on="c_custkey")
    g = j.groupby("l_suppkey").agg(n_nations=("c_nationkey", "nunique"),
                                   n_customers=("o_custkey", "nunique"))
    rows = sorted(((s, int(r.n_nations), int(r.n_customers))
                   for s, r in g.iterrows()),
                  key=lambda r: (-r[1], r[0]))[:Q._REACH_TOP]
    assert list(t.itertuples(index=False, name=None)) == rows
    assert (t.n_nations <= 25).all()


def test_peak_cell_matches_bruteforce():
    t = Q.QUERIES["events_peak_cell"](SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    us = ev.ts.astype("datetime64[us]").astype(np.int64)
    dow = (us // 86_400_000_000 + 4) % 7
    hour = (us // 3_600_000_000) % 24
    code = dow * 24 + hour
    cnt = np.bincount(code, minlength=168)
    mx = int(cnt.max())
    c = int(np.flatnonzero(cnt == mx).min())
    assert (t.peak_dow, t.peak_hour) == (c // 24, c % 24)
    assert t.n_events == mx
    assert t.share_nano == Q._div_nano(mx, len(ev))
