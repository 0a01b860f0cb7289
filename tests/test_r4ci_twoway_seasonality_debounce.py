"""Two-way eta, agency seasonality, debounce sweep."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_twoway_eta_matches_bruteforce():
    t = Q.QUERIES["lineitem_twoway_eta"](SF).to_pandas().iloc[0]
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_returnflag", "l_linestatus",
                                "l_extendedprice"]).to_pandas()
    li["x"] = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    n = len(li)
    s = int(li.x.sum())
    sq = int((li.x.astype(object) ** 2).sum())
    corr = Q._div_nano(s * s, n)

    def ssq_of(groups):
        return sum(Q._div_nano(int(g.x.sum()) ** 2, len(g))
                   for _, g in groups) - corr

    ss_a = ssq_of(li.groupby("l_returnflag"))
    ss_b = ssq_of(li.groupby("l_linestatus"))
    ss_c = ssq_of(li.groupby(["l_returnflag", "l_linestatus"]))
    ss_t = sq * 10**9 - corr
    assert t.n == n
    assert t.eta_a_nano == Q._div_nano(ss_a, ss_t)
    assert t.eta_b_nano == Q._div_nano(ss_b, ss_t)
    assert t.eta_inter_nano == Q._div_nano(ss_c - ss_a - ss_b, ss_t)
    assert t.eta_resid_nano == Q._div_nano(ss_t - ss_c, ss_t)
    # shares bounded; residual dominates for near-independent factors
    for v in [t.eta_a_nano, t.eta_b_nano, t.eta_resid_nano]:
        assert 0 <= v <= 10**9


def test_agency_seasonality_matches_bruteforce():
    t = Q.QUERIES["kg_agency_seasonality"](SF).to_pandas() \
        .set_index("qid")
    m = Q._linked(SF).to_pandas()
    m["month"] = m.warc_ts.dt.month
    for qid, g in m.groupby("qid"):
        cnt = g.month.value_counts()
        n = len(g)
        mx = int(cnt.max())
        peak = int(min(mo for mo in cnt.index if cnt[mo] == mx))
        ssq = int((cnt.astype(object) ** 2).sum())
        row = t.loc[qid]
        assert row.n == n
        assert row.peak_month == peak
        assert row.peak_share_nano == Q._div_nano(mx, n)
        assert row.chi2_nano == Q._div_nano(12 * ssq, n) - n * 10**9
    assert ((t.peak_month >= 1) & (t.peak_month <= 12)).all()


def test_debounce_sweep_matches_bruteforce():
    t = Q.QUERIES["events_debounce_sweep"](SF).to_pandas() \
        .set_index("window_s")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_id"]).to_pandas()
    ev["tus"] = ev.ts.astype("datetime64[us]").astype(np.int64)
    for w in Q._DEBOUNCE_WINDOWS_S:
        total = 0
        for _, g in ev.groupby("user_id"):
            ts = np.sort(g.tus.to_numpy())
            total += 1 + int((np.diff(ts) > w * 1_000_000).sum())
        assert t.loc[w].n_survivors == total
    # monotone: bigger windows keep fewer events
    vals = [t.loc[w].n_survivors for w in Q._DEBOUNCE_WINDOWS_S]
    assert vals == sorted(vals, reverse=True)
