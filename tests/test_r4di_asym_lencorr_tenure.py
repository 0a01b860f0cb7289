"""Citation asymmetry, length-citation corr, value by tenure."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_citation_asymmetry_matches_bruteforce():
    t = Q.QUERIES["kg_citation_asymmetry"](SF).to_pandas()
    m = Q._linked(SF).to_pandas()
    uq = m[["url", "qid"]].drop_duplicates()
    n_a = uq.groupby("qid").size()
    from collections import Counter
    both = Counter()
    for _, g in uq.groupby("url"):
        qs = sorted(set(g.qid))
        for i in range(len(qs)):
            for j in range(i + 1, len(qs)):
                both[(qs[i], qs[j])] += 1
    rows = []
    for (a, b), nb in both.items():
        if nb >= Q._CONF_MIN_SUPPORT:
            cab = Q._div_nano(nb, int(n_a[a]))
            cba = Q._div_nano(nb, int(n_a[b]))
            rows.append((a, b, cab, cba, abs(cab - cba)))
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    assert list(t.itertuples(index=False, name=None)) \
        == rows[:Q._ASYM_TOP]
    assert (t.asymmetry_nano >= 0).all()


def test_length_citation_corr_consistency():
    t = Q.QUERIES["kg_length_citation_corr"](SF).to_pandas().iloc[0]
    pairs = t.n_pages * (t.n_pages - 1) // 2
    assert t.n_conc + t.n_disc <= pairs
    assert t.tau_nano == Q._div_nano(
        int(t.n_conc) - int(t.n_disc), pairs)
    # more text should not make citations LESS likely in this corpus
    assert t.tau_nano > 0


def test_value_by_tenure_matches_bruteforce():
    t = Q.QUERIES["orders_value_by_tenure"](SF).to_pandas() \
        .set_index("bucket")
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    o["day"] = (o.o_orderdate.astype("datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
    o["cents"] = np.round(o.o_totalprice.to_numpy() * 100) \
        .astype(np.int64)
    span = o.groupby("o_custkey").day.agg(["min", "max"])
    spans = (span["max"] - span["min"]).astype(int)

    def bucket(s):
        if s == 0:
            return "0"
        if s < 90:
            return "<90"
        if s < 365:
            return "<365"
        if s < 1095:
            return "<1095"
        return "1095+"

    o["bucket"] = [bucket(int(spans[c])) for c in o.o_custkey]
    for b, g in o.groupby("bucket"):
        row = t.loc[b]
        assert row.n_orders == len(g)
        assert row.mean_cents_nano == Q._div_nano(int(g.cents.sum()),
                                                  len(g))
    assert t.n_orders.sum() == len(o)
