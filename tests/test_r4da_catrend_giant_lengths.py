"""CA trend, giant share trend, page length drift."""

from __future__ import annotations

import glob

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_return_trend_matches_bruteforce():
    t = Q.QUERIES["lineitem_return_trend"](SF).to_pandas().iloc[0]
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_quantity", "l_returnflag"]).to_pandas()
    q = np.round(li.l_quantity.to_numpy()).astype(np.int64)
    ret = (li.l_returnflag == "R").to_numpy()
    bucket = np.clip((q - 1) // 10, 0, 4)
    n_tot, r_tot = len(q), int(ret.sum())
    t_num = sns = sns2 = 0
    for b in range(5):
        sel = bucket == b
        nb, rb = int(sel.sum()), int(ret[sel].sum())
        t_num += b * (rb * n_tot - nb * r_tot)
        sns += b * nb
        sns2 += b * b * nb
    var = r_tot * (n_tot - r_tot) * (n_tot * sns2 - sns * sns)
    assert (t.n_items, t.n_returned) == (n_tot, r_tot)
    assert t.t_num == t_num
    assert t.z2_nano == Q._div_nano(t_num * t_num * n_tot, var)
    assert t.z2_nano >= 0


def test_giant_share_trend_matches_bruteforce():
    t = Q.QUERIES["kg_giant_share_trend"](SF).to_pandas() \
        .set_index("decade")
    rows = (Q.kg.cooccurrence_edges(Q._mentions(SF)).map_batches(
        lambda b: b.select(["src_qid", "dst_qid", "year"]),
        batch_format="pyarrow").take_all())
    by_dec = {}
    for r in rows:
        dec = (int(r["year"]) // 10) * 10
        by_dec.setdefault(dec, set()).add((r["src_qid"], r["dst_qid"]))
    for dec, pairs in by_dec.items():
        nodes = sorted({q for p in pairs for q in p})
        parent = {q: q for q in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        from collections import Counter
        comp = Counter(find(q) for q in nodes)
        row = t.loc[dec]
        assert (row.n_nodes, row.n_edges) == (len(nodes), len(pairs))
        assert row.giant_share_nano == Q._div_nano(
            max(comp.values()), len(nodes))


def test_length_by_decade_matches_bruteforce():
    t = Q.QUERIES["pages_length_by_decade"](SF).to_pandas() \
        .set_index("decade")
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        tb = pq.read_table(f, columns=["warc_ts", "text"])
        for ts, x in zip(tb["warc_ts"].to_pylist(),
                         tb["text"].to_pylist()):
            if x is None:
                continue
            dec = (ts.year // 10) * 10
            agg[dec][0] += len(x)
            agg[dec][1] += 1
    assert set(t.index) == set(agg)
    for dec, (s, n) in agg.items():
        row = t.loc[dec]
        assert row.n_pages == n
        assert row.mean_chars_nano == Q._div_nano(s, n)
