"""Bandit replay, embedding distance histogram, fulfillment backlog."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_bandit_replay_matches_bruteforce():
    t = Q.QUERIES["events_bandit_replay"](SF).to_pandas() \
        .set_index("arm")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type", "value"]).to_pandas()
    day = (ev.ts.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    grid = collections.defaultdict(lambda: [0, 0])
    for d, a, c in zip(day, ev.event_type, cents):
        grid[(int(d), a)][0] += int(c)
        grid[(int(d), a)][1] += 1
    arms = Q._BANDIT_ARMS
    p = dict.fromkeys(arms, 0)
    n = dict.fromkeys(arms, 0)
    s = dict.fromkeys(arms, 0)
    for d in range(int(day.min()), int(day.max()) + 1):
        untried = [a for a in arms if p[a] == 0]
        if untried:
            chosen = untried[0]
        else:
            chosen = arms[0]
            for a in arms[1:]:
                an, ad = (s[a], n[a]) if n[a] > 0 else (0, 1)
                bn_, bd = (s[chosen], n[chosen]) if n[chosen] > 0 \
                    else (0, 1)
                if an * bd > bn_ * ad:
                    chosen = a
        ds, dm = grid.get((d, chosen), [0, 0])
        p[chosen] += 1
        n[chosen] += dm
        s[chosen] += ds
    for a in arms:
        row = t.loc[a]
        assert (row.n_days_chosen, row.events_observed,
                row.reward_cents) == (p[a], n[a], s[a])
    # replay walks every day exactly once; explore-first touches all arms
    assert t.n_days_chosen.sum() == int(day.max()) - int(day.min()) + 1
    assert (t.n_days_chosen >= 1).all()


def test_dist_hist_matches_bruteforce():
    t = Q.QUERIES["embeddings_dist_hist"](SF).to_pandas()
    e = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    qm = Q._q6v(np.array(e["embedding"].to_pylist(), np.float64))
    n = len(qm)
    d2 = ((qm[:, None, :] - qm[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(n, 1)
    bins = np.minimum(d2[iu] // Q._DIST_HIST_W, Q._DIST_HIST_BINS - 1)
    cnt = np.bincount(bins.astype(np.int64),
                      minlength=Q._DIST_HIST_BINS)
    assert list(t.n_pairs) == cnt.tolist()
    assert int(t.n_pairs.sum()) == n * (n - 1) // 2
    assert list(t.lo_d2) == [b * Q._DIST_HIST_W
                             for b in range(Q._DIST_HIST_BINS)]


def test_backlog_matches_bruteforce():
    t = Q.QUERIES["orders_open_backlog"](SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_orderdate"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_shipdate"]).to_pandas()
    start = dict(zip(o.o_orderkey,
                     o.o_orderdate.astype("datetime64[us]")
                     .astype(np.int64) // 86_400_000_000))
    end = (li.assign(d=li.l_shipdate.astype("datetime64[us]")
                     .astype(np.int64) // 86_400_000_000)
           .groupby("l_orderkey").d.max())
    deltas = collections.defaultdict(int)
    for k, e in end.items():
        deltas[start[k]] += 1
        deltas[int(e) + 1] -= 1
    lo, hi = min(deltas), max(deltas) - 1
    cur, expect = 0, []
    for d in range(lo, hi + 1):
        cur += deltas.get(d, 0)
        expect.append(cur)
    assert list(t.epoch_day) == list(range(lo, hi + 1))
    assert list(t.n_open) == expect
    # backlog is non-negative and drains to a small tail at the end
    assert (t.n_open >= 0).all()
    assert t.n_open.iloc[-1] <= t.n_open.max()
