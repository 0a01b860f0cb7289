"""Lead-time quantiles, cohort LTV curve, MATTR rollup."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.stages.textstats import mattr_nano

SF = "/root/testdata/sf0.001"


def test_lead_time_matches_pandas_quantiles():
    t = Q.QUERIES["lineitem_lead_time"](SF).to_pandas() \
        .set_index("o_orderpriority")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_shipdate"]).to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_orderkey", "o_orderdate",
                                "o_orderpriority"]).to_pandas()
    m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    m["d"] = ((m.l_shipdate.astype("int64")
               - m.o_orderdate.astype("int64")) // 86_400_000_000)
    for p, g in m.groupby("o_orderpriority"):
        vs = np.sort(g.d.to_numpy())
        n = len(vs)
        row = t.loc[p]
        assert row.n == n
        assert row.p25_days == vs[(n + 3) // 4 - 1]
        assert row.p50_days == vs[(n + 1) // 2 - 1]
        assert row.p75_days == vs[(3 * n + 3) // 4 - 1]
        assert abs(row.mean_days_nano / 1e9 - vs.mean()) < 1e-6


def test_ltv_curve_cumulative_consistency():
    t = Q.QUERIES["orders_ltv_curve"](SF).to_pandas()
    # cumulative = running sum of rev within each cohort
    for c, g in t.groupby("cohort_month"):
        g = g.sort_values("months_since")
        assert (g.cum_rev_cents == g.rev_cents.cumsum()).all()
        assert g.months_since.iloc[0] == 0  # first month always present
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_totalprice"]).to_pandas()
    assert t.n_orders.sum() == len(od)
    assert t.rev_cents.sum() == int(
        (od.o_totalprice * 100).round().astype(int).sum())


def test_mattr_kernel_vs_bruteforce():
    rng = np.random.default_rng(3)
    for _ in range(20):
        toks = [str(x) for x in rng.integers(0, 9, size=rng.integers(1, 70))]
        w = 10
        n = len(toks)
        if n <= w:
            want = round(len(set(toks)) / n * 1e9)
        else:
            s = sum(len(set(toks[i:i + w])) for i in range(n - w + 1))
            want = Q._div_nano(s, w * (n - w + 1))
        assert mattr_nano(toks, window=w) == want


def test_docs_mattr_rollup_bounds():
    t = Q.QUERIES["docs_mattr"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source"]).to_pandas()
    assert t.n_docs.sum() == len(docs)
    assert ((t.min_mattr_nano <= t.mean_mattr_nano)
            & (t.mean_mattr_nano <= t.max_mattr_nano)).all()
    assert (t.max_mattr_nano <= 10**9).all()
