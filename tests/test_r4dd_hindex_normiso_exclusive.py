"""Agency h-index, norm-isolation concordance, exclusive revenue."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_hindex_matches_bruteforce():
    t = Q.QUERIES["kg_agency_hindex"](SF).to_pandas().set_index("qid")
    m = Q._linked(SF).to_pandas()
    g = m.groupby(["qid", "year"]).size()
    for qid, s in g.groupby(level=0):
        counts = sorted(s.values, reverse=True)
        h = max(min(i + 1, int(c)) for i, c in enumerate(counts))
        row = t.loc[qid]
        assert row.h_index == h
        assert row.n_years == len(counts)
        # h bounded by years and by max yearly count
        assert h <= len(counts) and h <= max(counts)


def test_norm_isolation_corr_matches_bruteforce():
    t = Q.QUERIES["embeddings_norm_isolation_corr"](SF) \
        .to_pandas().iloc[0]
    e = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding"])
    qm = Q._q6v(np.array(e["embedding"].to_pylist(), np.float64))
    n = len(qm)
    norm2 = (qm * qm).sum(1)
    d2 = ((qm[:, None, :] - qm[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    kth = np.partition(d2, Q._KNN_OUT_K - 1, 1)[:, Q._KNN_OUT_K - 1]
    dn = np.sign(norm2[:, None] - norm2[None, :])
    dk = np.sign(kth[:, None] - kth[None, :])
    iu = np.triu_indices(n, 1)
    prod = (dn * dk)[iu]
    conc, disc = int((prod > 0).sum()), int((prod < 0).sum())
    assert (t.n, t.n_conc, t.n_disc) == (n, conc, disc)
    assert t.tau_nano == Q._div_nano(conc - disc, n * (n - 1) // 2)


def test_exclusive_revenue_matches_pandas():
    t = Q.QUERIES["supplier_exclusive_revenue"](SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey",
                                "l_extendedprice"]).to_pandas()
    li["cents"] = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    ns = li.groupby("l_partkey").l_suppkey.nunique()
    excl = set(ns[ns == 1].index)
    li["ex"] = li.l_partkey.isin(excl).astype(np.int64)
    g = li.groupby("l_suppkey").apply(
        lambda d: (int(d.cents.sum()), int((d.cents * d.ex).sum())),
        include_groups=False)
    rows = sorted(((int(s), tot, ex, Q._div_nano(ex, tot))
                   for s, (tot, ex) in g.items()),
                  key=lambda r: (-r[3], r[0]))[:Q._EXCL_TOP]
    assert list(t.itertuples(index=False, name=None)) == rows
    assert (t.exclusive_cents <= t.total_cents).all()
