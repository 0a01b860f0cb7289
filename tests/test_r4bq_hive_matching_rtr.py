"""Hive round-trip, greedy matching, ratio-to-report."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_hive_roundtrip_matches_direct_aggregate():
    t = Q.QUERIES["docs_hive_roundtrip"](SF).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "source", "n_chars"]).to_pandas()
    want = (docs[docs.lang == Q._HIVE_LANG]
            .groupby("source")
            .agg(n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
            .reset_index())
    assert list(t.source) == list(want.source)
    assert list(t.n_docs) == list(want.n_docs)
    assert list(t.sum_chars) == list(want.sum_chars)
    # the hive layout really is one directory per lang partition
    out = "/tmp/nacr_hive_sf0.001"
    parts = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert set(parts) == {f"lang={v}" for v in docs.lang.unique()}


def test_greedy_matching_properties():
    t = Q.QUERIES["kg_greedy_matching"](SF).to_pandas()
    # a matching: no node appears twice
    nodes = list(t.src_qid) + list(t.dst_qid)
    assert len(nodes) == len(set(nodes))
    # picks ranked by weight (non-increasing) with deterministic ranks
    assert list(t.pick_rank) == list(range(1, len(t) + 1))
    assert all(a >= b for a, b in zip(t.weight, t.weight[1:]))
    # maximality: replay brute-force greedy gives the identical matching
    rows = (Q.kg.cooccurrence_edges(Q._mentions(SF)).map_batches(
        lambda b: b.select(["src_qid", "dst_qid", "weight"]),
        batch_format="pyarrow").take_all())
    agg = {}
    for r in rows:
        k = (r["src_qid"], r["dst_qid"])
        agg[k] = agg.get(k, 0) + int(r["weight"])
    edges = sorted(((w, a, b) for (a, b), w in agg.items()),
                   key=lambda e: (-e[0], e[1], e[2]))
    matched, picks = set(), []
    for w, a, b in edges:
        if a not in matched and b not in matched:
            matched.update((a, b))
            picks.append((len(picks) + 1, a, b, w))
    assert list(t.itertuples(index=False, name=None)) \
        == picks[:Q._MATCH_STEPS]


def test_ratio_to_report_matches_pandas():
    t = Q.QUERIES["orders_ratio_to_report"](SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_custkey", "o_totalprice"]
                      ).to_pandas()
    o["cents"] = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    tot = o.groupby("o_custkey").cents.sum()
    o["share"] = [Q._div_nano(int(c), int(tot[k]))
                  for c, k in zip(o.cents, o.o_custkey)]
    want = o.sort_values(["share", "o_orderkey"],
                         ascending=[False, True]).head(Q._RTR_TOP)
    assert list(t.o_orderkey) == list(want.o_orderkey)
    assert list(t.share_nano) == list(want.share)
    for r in t.itertuples():
        assert r.order_cents <= r.cust_total_cents
        assert r.cust_total_cents == tot[r.o_custkey]
    # shares are valid fractions
    assert (t.share_nano <= 10**9).all() and (t.share_nano > 0).all()
