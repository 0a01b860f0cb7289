"""Triadic closure per year, Mahalanobis outliers, value drawdown."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_triadic_closure_matches_bruteforce():
    t = Q.QUERIES["kg_triadic_closure"](SF).to_pandas().set_index("year")
    rows = (Q.kg.cooccurrence_edges(Q._mentions(SF)).map_batches(
        lambda b: b.select(["src_qid", "dst_qid", "year"]),
        batch_format="pyarrow").take_all())
    by_year = {}
    for r in rows:
        by_year.setdefault(int(r["year"]), set()).add(
            (r["src_qid"], r["dst_qid"]))
    seen = set()
    for y in sorted(by_year):
        new = by_year[y] - seen
        seen |= by_year[y]
        prev = by_year.get(y - 1, set())
        nbr = {}
        for a, b in prev:
            nbr.setdefault(a, set()).add(b)
            nbr.setdefault(b, set()).add(a)
        closed = sum(1 for a, b in new
                     if nbr.get(a, set()) & nbr.get(b, set()))
        row = t.loc[y]
        assert row.n_new == len(new)
        assert row.n_closed == closed
        assert row.n_closed <= row.n_new
    # first year has no previous graph: zero closures
    assert t.iloc[0].n_closed == 0


def test_mahalanobis_matches_pandas():
    t = Q.QUERIES["customer_mahalanobis"](SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_custkey", "o_totalprice"]).to_pandas()
    o["cents"] = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    g = o.groupby("o_custkey").agg(x=("cents", "size"),
                                   cents=("cents", "sum"))
    g["y"] = (2 * g.cents + 100_000) // 200_000
    n = len(g)
    sx, sy = int(g.x.sum()), int(g.y.sum())
    sxx = int((g.x * g.x).sum())
    sxy = int((g.x * g.y).sum())
    syy = int((g.y.astype(object) * g.y.astype(object)).sum())
    mxx, mxy, myy = n * sxx - sx * sx, n * sxy - sx * sy, n * syy - sy * sy
    det = mxx * myy - mxy * mxy
    scores = {}
    for c, row in g.iterrows():
        dx, dy = n * int(row.x) - sx, n * int(row.y) - sy
        scores[c] = Q._div_nano(
            myy * dx * dx - 2 * mxy * dx * dy + mxx * dy * dy, det)
    expect = sorted(((c, s) for c, s in scores.items()),
                    key=lambda p: (-p[1], p[0]))[:Q._MAH_TOP]
    assert [(r.c_custkey, r.mah2_nano)
            for r in t.itertuples()] == expect
    for r in t.itertuples():
        assert r.n_orders == g.loc[r.c_custkey].x
        assert r.spend_kd == g.loc[r.c_custkey].y
    assert (t.mah2_nano >= 0).all()


def test_drawdown_matches_bruteforce():
    t = Q.QUERIES["events_value_drawdown"](SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    day = (ev.ts.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    import collections
    daily = collections.defaultdict(int)
    for d, c in zip(day, cents):
        daily[int(d)] += int(c)
    lo, hi = min(daily), max(daily)
    cum, runmax, peak, maxdd, trough = 0, 0, 0, 0, lo
    for d in range(lo, hi + 1):
        cum += daily.get(d, 0)
        runmax = max(runmax, cum)
        peak = max(peak, cum)
        if runmax - cum > maxdd:
            maxdd, trough = runmax - cum, d
    assert t.n_days == hi - lo + 1
    assert t.total_cents == cum
    assert t.peak_cents == peak
    assert t.max_drawdown_cents == maxdd
    assert t.trough_epoch_day == (trough if maxdd else lo)
    # drawdown never exceeds peak minus global minimum of the cum path
    assert 0 <= t.max_drawdown_cents
