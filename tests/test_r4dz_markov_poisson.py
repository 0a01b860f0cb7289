"""Markov removal-effect attribution, Poisson bootstrap."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_markov_attribution_matches_bruteforce():
    t = Q.QUERIES["events_markov_attribution"](SF).to_pandas() \
        .set_index("channel")
    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"]).to_pandas() \
        .sort_values(["user_id", "ts", "event_id"])
    counts: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        tp = list(g.event_type)
        if Q._MK_CONV in tp:
            path = tp[:tp.index(Q._MK_CONV)] + ["CONV"]
        else:
            path = tp + ["NULL"]
        path = ["START"] + path
        counts.update(zip(path, path[1:]))
    counts = dict(counts)
    channels = sorted({s for s, _ in counts if s != "START"}
                      | {d for _, d in counts if d not in ("CONV", "NULL")})
    p_full = Q._markov_conv_prob(counts, ["START"] + channels)
    assert int(t.loc["OVERALL"].removal_effect_nano) == \
        int(round(p_full * 1e9))
    assert set(t.index) == set(channels) | {"OVERALL"}
    for ch in channels:
        removed: dict = {}
        for (s, d), c in counts.items():
            if s == ch:
                continue
            k = (s, "NULL" if d == ch else d)
            removed[k] = removed.get(k, 0) + c
        p_r = Q._markov_conv_prob(
            removed, ["START"] + [c for c in channels if c != ch])
        eff = 1.0 - p_r / p_full
        assert int(t.loc[ch].removal_effect_nano) == int(round(eff * 1e9))
        assert int(t.loc[ch].n_visits) == sum(
            c for (s, d), c in counts.items() if d == ch)
    # purchase is the conversion, never a scored channel
    assert Q._MK_CONV not in t.index
    # removal effects are genuine probability losses
    chs = [c for c in t.index if c != "OVERALL"]
    assert all(-1e-6 <= t.loc[c].removal_effect_nano / 1e9 <= 1 + 1e-6
               for c in chs)


def test_poisson_bootstrap_matches_bruteforce_and_is_calibrated():
    t = Q.QUERIES["lineitem_poisson_bootstrap"](SF).to_pandas() \
        .set_index("replicate")
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber",
                 "l_extendedprice"]).to_pandas()
    cents = np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    assert len(t) == Q._PB_B
    w = Q._pb_weight_matrix(Q._pb_key_u64(
        li.l_orderkey.to_numpy().astype(np.int64),
        li.l_linenumber.to_numpy().astype(np.int64)))
    for b in (0, 7, 31):  # spot-check three replicates exactly
        assert int(t.loc[b].total_cents) == int((w[:, b] * cents).sum())
        assert int(t.loc[b].n_effective) == int(w[:, b].sum())
    # Poisson(1) weights: effective n stays within ±5 sd of n
    n = len(cents)
    assert (np.abs(t.n_effective - n) < 5 * np.sqrt(n)).all()
    # replicate spread brackets the true total (CI sanity)
    true_total = int(cents.sum())
    assert t.total_cents.min() <= true_total <= t.total_cents.max()
