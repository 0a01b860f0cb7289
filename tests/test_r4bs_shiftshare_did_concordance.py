"""Shift-share decomposition, diff-in-diff, YoY rank concordance."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_shift_share_identity_and_values():
    t = Q.QUERIES["orders_shift_share"](SF).to_pandas()
    # additivity: vol + rate + inter == (rev2 - rev1) * 1e9, per nation
    for r in t.itertuples():
        assert (r.volume_nano + r.rate_nano + r.interaction_nano
                == (r.rev2_cents - r.rev1_cents) * 10**9)
    # recompute one populated nation from raw data
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"]).to_pandas()
    n = pq.read_table(f"{SF}/nation.parquet",
                      columns=["n_nationkey", "n_name"]).to_pandas()
    o["day"] = (o.o_orderdate.astype("datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
    lo, hi = int(o.day.min()), int(o.day.max())
    cut = (lo + hi + 1) // 2
    o["cents"] = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey") \
         .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    g = j.groupby(["n_name", j.day >= cut]).cents.agg(["count", "sum"])
    checked = 0
    for r in t.itertuples():
        try:
            c1, s1 = g.loc[(r.nation, False)]
        except KeyError:
            c1, s1 = 0, 0
        try:
            c2, s2 = g.loc[(r.nation, True)]
        except KeyError:
            c2, s2 = 0, 0
        assert (r.c1, r.rev1_cents, r.c2, r.rev2_cents) \
            == (c1, s1, c2, s2)
        if c1 and c2:
            assert r.volume_nano == Q._div_nano((c2 - c1) * int(s1), c1)
            checked += 1
    assert checked > 0


def test_did_matches_bruteforce():
    t = Q.QUERIES["events_diff_in_diff"](SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "value"]).to_pandas()
    day = (ev.ts.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    lo, hi = int(day.min()), int(day.max())
    cut = (lo + hi + 1) // 2
    uid = ev.user_id.to_numpy().astype(np.int64)
    h = ((uid % 4294967296) * 1000003 + 40503) % 4294967296
    grp = (h >> 15) & 1
    post = (day >= cut).astype(int)
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    m = {}
    ns = {}
    for g_ in (0, 1):
        for p_ in (0, 1):
            sel = (grp == g_) & (post == p_)
            ns[(g_, p_)] = int(sel.sum())
            m[(g_, p_)] = (Q._div_nano(int(cents[sel].sum()),
                                       int(sel.sum()))
                           if sel.sum() else 0)
    assert (t.n_c_pre, t.n_c_post, t.n_t_pre, t.n_t_post) == \
        (ns[(0, 0)], ns[(0, 1)], ns[(1, 0)], ns[(1, 1)])
    assert t.did_nano == (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    # A/A on hash groups: effect should be small relative to means
    assert abs(t.did_nano) < max(abs(t.mean_c_pre_nano), 1) * 2


def test_rank_concordance_bounds_and_bruteforce():
    t = Q.QUERIES["kg_rank_concordance"](SF).to_pandas() \
        .set_index("year_from")
    g = (Q._linked(SF).groupby(["qid", "year"])
         .aggregate(Q.ray.data.aggregate.Count(alias_name="n"))
         .take_all())
    per = {}
    for r in g:
        per.setdefault(int(r["year"]), {})[r["qid"]] = int(r["n"])
    for y in sorted(per):
        if y + 1 not in per:
            continue
        a, b = per[y], per[y + 1]
        common = sorted(set(a) & set(b))
        mlen = len(common)
        conc = disc = 0
        for i in range(mlen):
            for j in range(i + 1, mlen):
                d = (a[common[i]] - a[common[j]]) \
                    * (b[common[i]] - b[common[j]])
                conc += d > 0
                disc += d < 0
        row = t.loc[y]
        assert (row.n_common, row.n_conc, row.n_disc) \
            == (mlen, conc, disc)
        assert abs(row.tau_nano) <= 10**9
