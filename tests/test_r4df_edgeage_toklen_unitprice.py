"""Edge age-weight corr, token length hist, unit price outliers."""

from __future__ import annotations

import functools

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_edge_age_weight_corr_matches_bruteforce():
    t = Q.QUERIES["kg_edge_age_weight_corr"](SF).to_pandas().iloc[0]
    rows = (Q.kg.cooccurrence_edges(Q._mentions(SF)).map_batches(
        lambda b: b.select(["src_qid", "dst_qid", "year", "weight"]),
        batch_format="pyarrow").take_all())
    from collections import defaultdict
    born = {}
    w = defaultdict(int)
    for r in rows:
        k = (r["src_qid"], r["dst_qid"])
        born[k] = min(born.get(k, 9999), int(r["year"]))
        w[k] += int(r["weight"])
    stats = [(born[k], w[k]) for k in sorted(born)]
    conc = disc = 0
    for i in range(len(stats)):
        for j in range(i + 1, len(stats)):
            d = ((stats[i][0] - stats[j][0])
                 * (stats[i][1] - stats[j][1]))
            conc += d < 0
            disc += d > 0
    assert t.n_edges == len(stats)
    assert (t.n_conc, t.n_disc) == (conc, disc)
    pairs = len(stats) * (len(stats) - 1) // 2
    assert t.tau_nano == Q._div_nano(conc - disc, pairs)


def test_token_len_hist_matches_bruteforce():
    t = Q.QUERIES["docs_token_len_hist"](SF).to_pandas() \
        .set_index("token_len")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    from collections import Counter
    census = Counter(len(w) for txt in docs.text
                     for w in txt.split() if w)
    assert set(t.index) == set(census)
    for ln, n in census.items():
        assert t.loc[ln].n_occurrences == n


def test_unit_price_outliers_match_bruteforce():
    t = Q.QUERIES["lineitem_unit_price_outliers"](SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_linenumber",
                                "l_quantity", "l_extendedprice"]
                       ).to_pandas()
    cents = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    qty = np.round(li.l_quantity.to_numpy()).astype(np.int64)

    def cmp(a, b):
        lhs, rhs = a[0] * b[1], b[0] * a[1]
        if lhs != rhs:
            return -1 if lhs > rhs else 1
        return -1 if (a[2], a[3]) < (b[2], b[3]) else 1

    rows = sorted(zip((int(c) for c in cents), (int(q) for q in qty),
                      (int(o) for o in li.l_orderkey),
                      (int(x) for x in li.l_linenumber)),
                  key=functools.cmp_to_key(cmp))[:Q._UNIT_TOP]
    assert [(r.l_orderkey, r.l_linenumber, r.cents, r.qty)
            for r in t.itertuples()] \
        == [(o, x, c, q) for c, q, o, x in rows]
    for r in t.itertuples():
        assert r.unit_nano == Q._div_nano(r.cents, r.qty)
