"""Broker articles, lifespan histogram, ship consolidation."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_broker_articles_match_bruteforce():
    t = Q.QUERIES["kg_broker_articles"](SF).to_pandas().iloc[0]
    rows = (Q.kg.cooccurrence_edges(Q._mentions(SF)).map_batches(
        lambda b: b.select(["src_qid", "dst_qid", "weight"]),
        batch_format="pyarrow").take_all())
    from collections import defaultdict
    w = defaultdict(int)
    for r in rows:
        w[(r["src_qid"], r["dst_qid"])] += int(r["weight"])
    nodes = sorted({q for p in w for q in p})
    parent = {q: q for q in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b), ww in w.items():
        if ww >= Q._BROKER_THRESHOLD:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    label = {q: find(q) for q in nodes}
    m = Q._linked(SF).to_pandas()
    uq = m[["url", "qid"]].drop_duplicates()
    multi = broker = 0
    for _, g in uq.groupby("url"):
        qs = set(g.qid)
        if len(qs) > 1:
            multi += 1
            if len({label.get(q, q) for q in qs}) > 1:
                broker += 1
    assert t.n_multi_agency_articles == multi
    assert t.n_broker_articles == broker
    assert t.broker_share_nano == Q._div_nano(broker, multi)


def test_lifespan_hist_matches_bruteforce():
    t = Q.QUERIES["customer_lifespan_hist"](SF).to_pandas() \
        .set_index("bucket")
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_custkey", "o_orderdate"]).to_pandas()
    o["day"] = (o.o_orderdate.astype("datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
    span = o.groupby("o_custkey").day.agg(["min", "max"])
    spans = (span["max"] - span["min"]).astype(int)
    from collections import Counter

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

    census = Counter(bucket(int(s)) for s in spans)
    assert set(t.index) == set(census)
    for k, v in census.items():
        assert t.loc[k].n_customers == v


def test_ship_consolidation_matches_pandas():
    t = Q.QUERIES["orders_ship_consolidation"](SF).to_pandas().iloc[0]
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_shipdate"]).to_pandas()
    li["day"] = (li.l_shipdate.astype("datetime64[us]")
                 .astype(np.int64) // 86_400_000_000)
    g = li.groupby("l_orderkey").day.agg(["min", "max", "size"])
    multi = g[g["size"] > 1]
    spread = (multi["max"] - multi["min"]).astype(int)
    assert t.n_multi_line == len(multi)
    assert t.n_single_day == int((spread == 0).sum())
    assert t.consolidation_nano == Q._div_nano(
        int((spread == 0).sum()), len(multi))
    assert t.max_spread_days == int(spread.max())
