"""Triple support tiers, first-vs-repeat, source OOV transfer."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_triple_support_tiers_match_bruteforce():
    t = Q.QUERIES["kg_triple_support_tiers"](SF).to_pandas() \
        .set_index("tier")
    m = Q._linked(SF).to_pandas()
    tr = m.groupby(["url", "qid"]).size()
    from collections import Counter
    census = Counter("1" if n == 1 else ("2-4" if n <= 4 else "5+")
                     for n in tr)
    assert set(t.index) == set(census)
    for k, v in census.items():
        assert t.loc[k].n_triples == v
    assert t.n_triples.sum() == len(tr)


def test_first_vs_repeat_matches_bruteforce():
    t = Q.QUERIES["orders_first_vs_repeat"](SF).to_pandas().iloc[0]
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    o["cents"] = np.round(o.o_totalprice.to_numpy() * 100) \
        .astype(np.int64)
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    fs = fn = rs = rn = 0
    nmulti = 0
    for c, g in o.groupby("o_custkey"):
        if len(g) < 2:
            continue
        nmulti += 1
        fs += int(g.cents.iloc[0])
        fn += 1
        rs += int(g.cents.iloc[1:].sum())
        rn += len(g) - 1
    assert t.n_customers_multi == nmulti
    assert t.mean_first_nano == Q._div_nano(fs, fn)
    assert t.mean_repeat_nano == Q._div_nano(rs, rn)
    assert t.diff_nano == t.mean_first_nano - t.mean_repeat_nano


def test_source_oov_transfer_matches_bruteforce():
    t = Q.QUERIES["docs_source_oov_transfer"](SF).to_pandas() \
        .set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    from collections import Counter, defaultdict
    per = defaultdict(Counter)
    for s, txt in zip(docs.source, docs.text):
        for w in txt.split():
            if w:
                per[s][w] += 1
    spread = Counter()
    for s in per:
        for w in per[s]:
            spread[w] += 1
    for s, cnt in per.items():
        total = sum(cnt.values())
        excl = sum(v for w, v in cnt.items() if spread[w] == 1)
        row = t.loc[s]
        assert row.total_tokens == total
        assert row.exclusive_mass == excl
        assert row.oov_nano == Q._div_nano(excl, total)
    assert (t.exclusive_mass <= t.total_tokens).all()
