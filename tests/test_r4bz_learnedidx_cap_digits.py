"""Learned index, frequency cap, cents digit test."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_learned_index_matches_bruteforce():
    t = Q.QUERIES["lineitem_learned_index"](SF).to_pandas().iloc[0]
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_extendedprice"]).to_pandas()
    cents = np.sort(np.round(li.l_extendedprice.to_numpy() * 100)
                    .astype(np.int64))
    n = len(cents)
    keys, first = np.unique(cents, return_index=True)
    counts = np.diff(np.concatenate([first, [n]]))
    lo = first.astype(np.int64)
    hi = lo + counts - 1
    m = len(keys)
    sk = int(keys.astype(object).sum())
    skk = int((keys.astype(object) ** 2).sum())
    sl = int(lo.astype(object).sum())
    skl = int((keys.astype(object) * lo.astype(object)).sum())
    det = m * skk - sk * sk
    b = Q._div_nano(m * skl - sk * sl, det)
    a = Q._div_nano(sl * skk - sk * skl, det)
    err = max(max(abs(a + b * int(k) - int(l) * 10**9),
                  abs(a + b * int(k) - int(h) * 10**9))
              for k, l, h in zip(keys, lo, hi))
    assert (t.n_rows, t.n_keys) == (n, m)
    assert (t.b_nano, t.a_nano) == (b, a)
    assert t.max_err_nano == err
    # a sane learned index: positive slope, error below the key count
    assert t.b_nano > 0
    assert t.max_err_nano < n * 10**9


def test_frequency_cap_matches_bruteforce():
    t = Q.QUERIES["events_frequency_cap"](SF).to_pandas() \
        .set_index("epoch_day")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["day"] = (ev.ts.astype("datetime64[us]").astype(np.int64)
                 // 86_400_000_000)
    ud = ev.groupby(["day", "user_id"]).size()
    for day, g in ud.groupby(level=0):
        c = g.to_numpy()
        row = t.loc[day]
        assert row.n_events == c.sum()
        assert row.n_admitted == np.minimum(c, Q._FREQ_CAP).sum()
        assert row.n_suppressed == row.n_events - row.n_admitted
    assert (t.n_admitted <= t.n_events).all()


def test_cents_digits_matches_bruteforce():
    t = Q.QUERIES["orders_cents_digits"](SF).to_pandas().iloc[0]
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_totalprice"]).to_pandas()
    last2 = (np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
             % 100)
    cnt = np.bincount(last2, minlength=100)
    n = int(cnt.sum())
    ssq = int((cnt.astype(object) ** 2).sum())
    assert t.n_orders == n
    assert t.n_distinct_last2 == int((cnt > 0).sum())
    assert t.chi2_nano == Q._div_nano(100 * ssq, n) - n * 10**9
    mx = int(cnt.max())
    assert t.max_n == mx
    assert t.max_last2 == int(np.flatnonzero(cnt == mx).min())
    # chi2 is non-negative by construction
    assert t.chi2_nano >= 0
