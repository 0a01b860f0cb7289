"""Activation rate, NIL surfaces, ship weekday."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_activation_rate_matches_bruteforce():
    t = Q.QUERIES["events_activation_rate"](SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["day"] = (ev.ts.astype("datetime64[us]").astype(np.int64)
                 // 86_400_000_000)
    n = act = 0
    for _, g in ev.groupby("user_id"):
        n += 1
        first = int(g.day.min())
        c = int((g.day < first + Q._ACTIVATION_WINDOW_D).sum())
        act += c >= Q._ACTIVATION_K
    assert (t.n_users, t.n_activated) == (n, act)
    assert t.rate_nano == Q._div_nano(act, n)


def test_nil_surfaces_match_bruteforce():
    t = Q.QUERIES["kg_nil_surfaces"](SF).to_pandas()
    m = Q._mentions(SF).to_pandas()
    nil = m[m.qid == "NIL"]
    cnt = nil.groupby("surface_norm").size()
    total = len(nil)
    rows = sorted(((s, int(v)) for s, v in cnt.items()),
                  key=lambda r: (-r[1], r[0]))[:Q._NIL_TOP]
    assert [(r.surface_norm, r.n) for r in t.itertuples()] == rows
    for r in t.itertuples():
        assert r.share_of_nil_nano == Q._div_nano(r.n, total)


def test_ship_weekday_matches_bruteforce():
    t = Q.QUERIES["lineitem_ship_weekday"](SF).to_pandas() \
        .set_index("dow")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_shipdate"]).to_pandas()
    day = (li.l_shipdate.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    dow = (day + 4) % 7
    cnt = np.bincount(dow, minlength=7)
    total = int(cnt.sum())
    for d in range(7):
        if cnt[d]:
            assert t.loc[d].n_items == cnt[d]
            assert t.loc[d].share_nano == Q._div_nano(int(cnt[d]), total)
    assert t.n_items.sum() == total
