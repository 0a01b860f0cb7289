"""Agency lang shift, order-total consistency, length dispersion."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_agency_lang_shift_matches_bruteforce():
    t = Q.QUERIES["kg_agency_lang_shift"](SF).to_pandas() \
        .set_index("qid")
    m = Q._linked(SF).to_pandas()
    lo, hi = int(m.year.min()), int(m.year.max())
    cut = (lo + hi + 1) // 2
    for qid, g in m.groupby("qid"):
        early = g[g.year < cut]
        late = g[g.year >= cut]
        if len(early) == 0 or len(late) == 0:
            assert qid not in t.index
            continue
        fe = Q._div_nano(int((early.lang == "fr").sum()), len(early))
        fl = Q._div_nano(int((late.lang == "fr").sum()), len(late))
        row = t.loc[qid]
        assert (row.n_early, row.n_late) == (len(early), len(late))
        assert (row.fr_early_nano, row.fr_late_nano) == (fe, fl)
        assert row.shift_nano == fl - fe


def test_total_consistency_matches_bruteforce():
    t = Q.QUERIES["orders_total_consistency"](SF).to_pandas().iloc[0]
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_totalprice"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice"]
                       ).to_pandas()
    li["c"] = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    ls = li.groupby("l_orderkey").c.sum()
    o = o[o.o_orderkey.isin(ls.index)]
    tot = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    lsum = ls.loc[o.o_orderkey].to_numpy()
    n = len(o)
    exact = int((tot == lsum).sum())
    dev = sum(Q._div_nano(abs(int(a) - int(b)), int(a))
              for a, b in zip(tot, lsum))
    assert (t.n_orders, t.n_exact_match) == (n, exact)
    assert t.match_share_nano == Q._div_nano(exact, n)
    assert t.mean_absdev_nano == Q._rnd_div(dev, n)


def test_length_dispersion_matches_bruteforce():
    t = Q.QUERIES["docs_source_length_dispersion"](SF).to_pandas() \
        .set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "n_chars"]).to_pandas()
    for src, g in docs.groupby("source"):
        n = len(g)
        s = int(g.n_chars.sum())
        ss = int((g.n_chars.astype(object) ** 2).sum())
        row = t.loc[src]
        assert row.n_docs == n
        assert row.mean_nano == Q._div_nano(s, n)
        assert row.cv2_nano == Q._div_nano(n * ss - s * s, s * s)
    assert (t.cv2_nano >= 0).all()
