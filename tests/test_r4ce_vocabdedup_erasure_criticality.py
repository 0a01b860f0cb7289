"""Vocab dedup proposals, erasure impact, host criticality."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_vocab_dedup_matches_bruteforce():
    t = Q.QUERIES["kg_vocab_dedup_proposals"](SF).to_pandas()
    names = sorted(Q._mentions(SF).to_pandas().canonical.unique())

    def tri(s):
        s = s.lower()
        return {s[i:i + 3] for i in range(len(s) - 2)}

    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ta, tb = tri(a), tri(b)
            u = len(ta | tb)
            if u:
                rows.append((a, b, len(ta & tb), u,
                             Q._div_nano(len(ta & tb), u)))
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    assert list(t.itertuples(index=False, name=None)) \
        == rows[:Q._VOCAB_DEDUP_TOP]
    assert (t.n_common <= t.n_union).all()


def test_erasure_impact_matches_pandas():
    t = Q.QUERIES["customer_erasure_impact"](SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_custkey"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey"]).to_pandas()
    n_ord = o.groupby("o_custkey").size()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    n_li = j.groupby("o_custkey").size()
    rows = [(c, int(n_ord[c]), int(n_li.get(c, 0)),
             1 + int(n_ord[c]) + int(n_li.get(c, 0)))
            for c in n_ord.index]
    rows.sort(key=lambda r: (-r[3], r[0]))
    assert list(t.itertuples(index=False, name=None)) \
        == rows[:Q._ERASURE_TOP]
    assert (t.total_rows == 1 + t.n_orders + t.n_lineitems).all()


def test_host_criticality_matches_bruteforce():
    t = Q.QUERIES["kg_host_criticality"](SF).to_pandas() \
        .set_index("host")
    m = Q._linked(SF).to_pandas()
    sup = set()
    for (h, y), g in m.groupby(["host", "year"]):
        qs = sorted(set(g.qid))
        for i in range(len(qs)):
            for j in range(i + 1, len(qs)):
                sup.add((qs[i], qs[j], h))
    from collections import Counter
    nsup = Counter((a, b) for a, b, _ in sup)
    per = {}
    for a, b, h in sup:
        e = per.setdefault(h, [0, 0])
        e[0] += 1
        e[1] += nsup[(a, b)] == 1
    assert set(t.index) == set(per)
    for h, (tot, uniq) in per.items():
        assert (t.loc[h].n_edges_supported, t.loc[h].n_unique_edges) \
            == (tot, uniq)
    assert (t.n_unique_edges <= t.n_edges_supported).all()
