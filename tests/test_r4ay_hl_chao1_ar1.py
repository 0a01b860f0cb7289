"""Hodges-Lehmann convolution, Chao1 richness, AR(1) daily fit."""

from __future__ import annotations

import statistics

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_hodges_lehmann_matches_naive_walsh_median():
    """Histogram convolution == brute-force median of all i<=j Walsh
    averages, per group (exact, on the real sf0.001 lineitem)."""
    t = Q.QUERIES["lineitem_hodges_lehmann"](SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_returnflag", "l_quantity"]).to_pandas()
    for _, row in t.iterrows():
        ys = sorted(int(v) for v in
                    li[li.l_returnflag == row.l_returnflag].l_quantity)
        sums = [ys[i] + ys[j] for i in range(len(ys))
                for j in range(i, len(ys))]
        hl = statistics.median(sums) / 2
        assert row.n == len(ys)
        assert abs(row.hl_nano / 1e9 - hl) < 1e-6


def test_hodges_lehmann_support_bound_raises():
    import pytest

    old = Q._HL_MAX_SUPPORT
    Q._HL_MAX_SUPPORT = 1
    try:
        with pytest.raises(ValueError, match="support bound"):
            Q.QUERIES["lineitem_hodges_lehmann"](SF)
    finally:
        Q._HL_MAX_SUPPORT = old


def test_chao1_matches_pandas_recompute():
    t = Q.QUERIES["events_chao1_richness"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    for _, row in t.iterrows():
        k = ev[ev.event_type == row.event_type].groupby("user_id").size()
        d, f1, f2, n = len(k), int((k == 1).sum()), int((k == 2).sum()), \
            int(k.sum())
        assert row.n_users == d and row.f1 == f1 and row.f2 == f2
        chao1 = d + f1 * (f1 - 1) / (2 * (f2 + 1))
        assert abs(row.chao1_nano / 1e9 - chao1) < 1e-6
        assert abs(row.p0_nano / 1e9 - f1 / n) < 1e-6
        # estimate can only add unseen users
        assert row.chao1_nano >= d * 10**9


def test_ar1_matches_numpy_lstsq():
    r = Q.QUERIES["orders_ar1_forecast"](SF).to_pylist()[0]
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_orderdate"]).to_pandas()
    days = (od.o_orderdate.astype("int64") // 86_400_000_000).value_counts()
    lo, hi = days.index.min(), days.index.max()
    ys = np.array([int(days.get(d, 0)) for d in range(lo, hi + 1)], float)
    assert r["n_days"] == len(ys)
    x, y = ys[:-1], ys[1:]
    a = np.vstack([x, np.ones_like(x)]).T
    (phi, c), *_ = np.linalg.lstsq(a, y, rcond=None)
    assert abs(r["phi_nano"] / 1e9 - phi) < 1e-6
    assert abs(r["c_nano"] / 1e9 - c) < 1e-6
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert abs(r["r2_nano"] / 1e9 - r2) < 1e-6
    assert r["sse_naive"] == int(((y - x) ** 2).sum())
