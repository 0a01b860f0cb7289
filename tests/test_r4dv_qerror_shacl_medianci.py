"""Cardinality q-error, SHACL audit, median order-statistic CI."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_qerror_matches_bruteforce():
    t = Q.QUERIES["orders_cardinality_qerror"](SF).to_pandas() \
        .set_index(["status", "priority"])
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderstatus",
                               "o_orderpriority"]).to_pandas()
    joint = o.groupby(["o_orderstatus", "o_orderpriority"]).size()
    n = len(o)
    ms = o.o_orderstatus.value_counts()
    mp = o.o_orderpriority.value_counts()
    assert set(t.index) == set(joint.index)
    for (s, p), true in joint.items():
        row = t.loc[(s, p)]
        est_num = int(ms[s]) * int(mp[p])
        assert int(row.true_n) == int(true)
        assert int(row.est_micro) == (2 * est_num * 10**6 + n) // (2 * n)
        qe = max(Q._div_nano(est_num, n * int(true)),
                 Q._div_nano(int(true) * n, est_num))
        assert int(row.qerror_nano) == qe
        assert row.qerror_nano >= 10**9  # q-error ≥ 1 by definition


def test_shacl_audit_all_constraints_hold_on_clean_kg():
    t = Q.QUERIES["kg_shacl_audit"](SF).to_pandas() \
        .set_index("constraint")
    assert set(t.index) == {"url_is_iri", "qid_in_vocab",
                            "year_in_range", "weight_positive"}
    # the constructed KG is clean by generator invariant
    assert (t.n_violations == 0).all() and t.holds.all()
    assert (t.n_checked > 0).all()
    # checked populations are consistent with the known sf0.001 counts
    assert int(t.loc["url_is_iri"].n_checked) == 371
    assert int(t.loc["weight_positive"].n_checked) == 330


def test_median_ci_ranks_and_coverage():
    row = Q.QUERIES["lineitem_median_ci"](SF).to_pandas().iloc[0]
    cents = np.round(pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_extendedprice"]
    ).to_pandas().l_extendedprice.to_numpy() * 100).astype(np.int64)
    n = len(cents)
    srt = np.sort(cents)
    lo_r, hi_r = Q._median_ci_ranks(n)
    assert (int(row.ci_rank_lo), int(row.ci_rank_hi)) == (lo_r, hi_r)
    assert int(row.n) == n
    assert int(row.median_cents) == int(srt[(n - 1) // 2])
    assert int(row.ci_lo_cents) == int(srt[lo_r])
    assert int(row.ci_hi_cents) == int(srt[hi_r])
    assert row.ci_lo_cents <= row.median_cents <= row.ci_hi_cents
    # the binomial construction: P[X < lo_r] ≤ 2.5% and one step more
    # would exceed it (exact big-int check at this n)
    import math

    def cdf_below(k):  # P[X < k] exact
        return sum(math.comb(n, i) for i in range(k)) / 2 ** n

    assert cdf_below(lo_r) <= 0.025 < cdf_below(lo_r + 1)
    assert hi_r == n - 1 - lo_r
