"""Sequential A/B with O'Brien-Fleming boundaries."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_sequential_ab_matches_bruteforce():
    t = Q.QUERIES["events_sequential_ab"](SF).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts",
                                "event_type"]).to_pandas()
    ev["day"] = ev.ts.astype("datetime64[us]").astype(np.int64) \
        // 86_400_000_000
    pu = []
    for u, g in ev.groupby("user_id"):
        with np.errstate(over="ignore"):
            arm = int((np.uint64(u) * np.uint64(Q._KMV_A)
                       + np.uint64(Q._KMV_B)) & np.uint64(1))
        conv = g[g.event_type == Q._MK_CONV].day
        pu.append((arm, int(g.day.min()),
                   int(conv.min()) if len(conv) else Q._AB_SENTINEL))
    days = sorted({f for _, f, _ in pu}
                  | {c for _, _, c in pu if c < Q._AB_SENTINEL})
    expect = Q._seq_ab_rows(pu, days)
    assert len(t) == len(expect)
    for got, exp in zip(t.itertuples(), expect):
        assert (int(got.day), int(got.n_a), int(got.n_b),
                int(got.conv_a), int(got.conv_b), int(got.z_micro),
                int(got.bound_micro), bool(got.crossed)) == exp
    # invariants: enrollment and conversions are cumulative
    assert (np.diff(t.n_a) >= 0).all() and (np.diff(t.n_b) >= 0).all()
    assert (np.diff(t.conv_a) >= 0).all() and (np.diff(t.conv_b) >= 0).all()
    assert (t.conv_a <= t.n_a).all() and (t.conv_b <= t.n_b).all()
    # the OBF boundary is strictly decreasing over looks
    assert (np.diff(t.bound_micro) < 0).all()
    assert int(t.bound_micro.iloc[-1]) == int(round(Q._OBF_C * 1e6))
    # under a null split (hash assignment, same data) the boundary is
    # rarely crossed — and certainly z stays finite
    assert (t.z_micro.abs() < 10 * 10**6).all()


def test_obf_boundary_shape():
    rows = Q._seq_ab_rows([(0, 0, Q._AB_SENTINEL),
                           (1, 0, Q._AB_SENTINEL)], [0, 1, 2, 3])
    K = 4
    for i, r in enumerate(rows):
        assert r[6] == int(round(Q._OBF_C / math.sqrt((i + 1) / K) * 1e6))
