"""RANGE window frames, daily metrics spine, bot-signal audit."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_range_window_peers_share_sum():
    """Events with identical (user, ts) must carry identical frame sums —
    the RANGE (not ROWS) frame contract."""
    t = Q.QUERIES["events_range_window"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts",
                                "value"]).to_pandas()
    m = ev.merge(t, on=["event_id", "user_id"])
    dup = m.groupby(["user_id", "ts"]).hour_sum_cents.nunique()
    assert (dup == 1).all()


def test_range_window_matches_pandas():
    t = Q.QUERIES["events_range_window"](SF).to_pandas() \
        .set_index("event_id").hour_sum_cents
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts",
                                "value"]).to_pandas()
    ev["cents"] = (ev.value * 100).round().astype(int)
    for _, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        ts = g.ts.astype("int64").to_numpy()
        c = g.cents.to_numpy()
        csum = np.concatenate([[0], np.cumsum(c)])
        lo = np.searchsorted(ts, ts - 3_600_000_000, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        want = csum[hi] - csum[lo]
        got = t.loc[g.event_id].to_numpy()
        assert (got == want).all()


def test_spine_is_gap_free_and_sums_match():
    t = Q.QUERIES["daily_metrics_spine"](SF).to_pandas()
    assert (t.day.diff().dropna() == 1).all()
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_totalprice"]).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["value"]).to_pandas()
    assert t.n_orders.sum() == len(od)
    assert t.n_events.sum() == len(ev)
    assert t.order_cents.sum() == int(
        (od.o_totalprice * 100).round().astype(int).sum())
    assert t.event_cents.sum() == int(
        (ev.value * 100).round().astype(int).sum())


def test_bot_scores_signals_consistent():
    t = Q.QUERIES["events_bot_scores"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts",
                                "event_type"]).to_pandas()
    assert t.n_events.sum() == len(ev)
    assert set(t.user_id) == set(ev.user_id)
    # flags follow their definitions exactly
    assert ((t.peak_hour > Q._BOT_PEAK_HOUR) == t.bursty).all()
    assert ((t.n_events > Q._BOT_RATE_PER_DAY * t.n_active_days)
            == t.high_rate).all()
    # recompute one user's peak hour
    u = int(t.user_id.iloc[0])
    g = ev[ev.user_id == u]
    peak = (g.ts.astype("int64") // 3_600_000_000).value_counts().max()
    assert int(t[t.user_id == u].peak_hour.iloc[0]) == int(peak)
    # type count bounded by global type vocabulary
    assert (t.n_types <= ev.event_type.nunique()).all()


def test_spine_zero_fill_between_sources():
    """Orders live in 1995-2001, events in 2024 — the spine must bridge
    the gap with explicit zero days (no silent truncation)."""
    t = Q.QUERIES["daily_metrics_spine"](SF).to_pandas()
    mid = t[(t.day > 12000) & (t.day < 19000)]  # 2002..2022 era
    assert len(mid) > 1000
    assert (mid.n_orders == 0).all() and (mid.n_events == 0).all()
