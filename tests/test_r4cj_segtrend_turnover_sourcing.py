"""Segmented trend, host turnover, single-source risk."""

from __future__ import annotations

import glob
import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_segmented_trend_is_optimal():
    t = Q.QUERIES["orders_segmented_trend"](SF).to_pandas().iloc[0]
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderdate"]).to_pandas()
    m = (o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month - 1)
    cnt = m.value_counts()
    lo, hi = int(m.min()), int(m.max())
    ys = [int(cnt.get(i, 0)) for i in range(lo, hi + 1)]
    d = len(ys)

    def seg(a, b):
        n = b - a + 1
        st = sum(range(a, b + 1))
        stt = sum(x * x for x in range(a, b + 1))
        sy = sum(ys[a:b + 1])
        sty = sum(x * ys[x] for x in range(a, b + 1))
        syy = sum(v * v for v in ys[a:b + 1])
        det = n * stt - st * st
        nb = n * sty - st * sy
        sse = syy * 10**9 - Q._div_nano(sy * sy, n) \
            - (Q._div_nano(nb * nb, n * det) if det else 0)
        return sse, (Q._div_nano(nb, det) if det else 0)

    best = None
    for s in range(1, d - 2 + 1):
        if s < 1 or d - 1 - (s + 1) + 1 < 2:
            continue
        s1, sl1 = seg(0, s)
        s2, sl2 = seg(s + 1, d - 1)
        if best is None or s1 + s2 < best[0]:
            best = (s1 + s2, s, sl1, sl2)
    assert t.sse_total_nano == best[0]
    assert t.knot_m == lo + best[1] + 1
    assert (t.slope1_nano, t.slope2_nano) == (best[2], best[3])


def test_host_turnover_matches_bruteforce():
    t = Q.QUERIES["pages_host_turnover"](SF).to_pandas()
    by_dec = {}
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        tb = pq.read_table(f, columns=["url", "warc_ts"])
        for u, ts in zip(tb["url"].to_pylist(),
                         tb["warc_ts"].to_pylist()):
            host = re.sub(r"/.*$", "", re.sub(r"^[a-z]+://", "", u))
            by_dec.setdefault((ts.year // 10) * 10, set()).add(host)
    decs = sorted(by_dec)
    assert list(t.decade_from) == decs[:-1]
    for r in t.itertuples():
        sa, sb = by_dec[r.decade_from], by_dec[r.decade_to]
        assert (r.n_a, r.n_b) == (len(sa), len(sb))
        assert r.n_common == len(sa & sb)
        assert r.jaccard_nano == Q._div_nano(len(sa & sb), len(sa | sb))


def test_single_source_risk_matches_pandas():
    t = Q.QUERIES["part_single_source_risk"](SF).to_pandas() \
        .set_index("bucket")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey",
                                "l_extendedprice"]).to_pandas()
    li["cents"] = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    pp = li.groupby("l_partkey").agg(
        ns=("l_suppkey", "nunique"), cents=("cents", "sum"))
    pp["bucket"] = np.where(pp.ns == 1, "1",
                            np.where(pp.ns == 2, "2", "3+"))
    g = pp.groupby("bucket").agg(n_parts=("ns", "size"),
                                 cents=("cents", "sum"))
    total = int(g.cents.sum())
    assert set(t.index) == set(g.index)
    for b, row in g.iterrows():
        assert t.loc[b].n_parts == row.n_parts
        assert t.loc[b].revenue_cents == row.cents
        assert t.loc[b].revenue_share_nano \
            == Q._div_nano(int(row.cents), total)
    # shares sum to ~1 (within per-bucket rounding)
    assert abs(t.revenue_share_nano.sum() - 10**9) <= len(t)
