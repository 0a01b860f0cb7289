"""Horvitz-Thompson estimator, MERGE upsert, LDG partitioner."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def _u64(key: str) -> int:
    return struct.unpack("<Q", hashlib.md5(key.encode()).digest()[8:])[0]


def test_ht_estimate_matches_bruteforce_and_is_sane():
    t = Q.QUERIES["lineitem_ht_estimate"](SF).to_pandas().iloc[0]
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"]
    ).to_pandas()
    cents = np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    hs = np.array([_u64(f"ht:{o}:{l}") for o, l in
                   zip(li.l_orderkey, li.l_linenumber)], dtype=np.uint64)
    hi = cents >= Q._HT_THRESH_CENTS
    inc = np.where(hi, hs % Q._HT_MOD_HI == 0, hs % Q._HT_MOD_LO == 0)
    w = np.where(hi, Q._HT_MOD_HI, Q._HT_MOD_LO).astype(np.int64)
    assert int(t.n_population) == len(cents)
    assert int(t.n_sampled) == int(inc.sum())
    assert int(t.true_total_cents) == int(cents.sum())
    assert int(t.ht_estimate_cents) == int((cents[inc] * w[inc]).sum())
    assert int(t.abs_err_cents) == abs(
        int(t.ht_estimate_cents) - int(t.true_total_cents))
    # design-unbiased estimator should land within ~15% at n=6000
    assert t.abs_err_cents < 0.15 * t.true_total_cents
    # both strata are genuinely sampled at their rates (loose 3x bands)
    assert 0 < int(inc[hi].sum()) and 0 < int(inc[~hi].sum())


def test_merge_upsert_matches_bruteforce():
    t = Q.QUERIES["orders_merge_upsert"](SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_totalprice"]).to_pandas()
    k = o.o_orderkey.astype(np.int64).to_numpy()
    cents = np.round(o.o_totalprice.to_numpy() * 100).astype(np.int64)
    m = k % 10
    expect = {}
    for kk, cc, mm in zip(k, cents, m):
        if mm == 7:
            continue
        expect[int(kk)] = (int(cc) + 500 if mm == 3 else int(cc),
                           "U" if mm == 3 else "K")
    for kk, cc, mm in zip(k, cents, m):
        if mm == 9:
            expect[int(kk) + 1_000_000_000] = (int(cc), "I")
    got = {int(r.o_orderkey): (int(r.total_cents), r.op)
           for r in t.itertuples()}
    assert got == expect
    # all three op classes occur and deletes actually removed rows
    assert {"K", "U", "I"} == set(t.op.unique())
    assert len(t) == len(o) - int((m == 7).sum()) + int((m == 9).sum())


def test_ldg_partition_balanced_and_consistent():
    t = Q.QUERIES["kg_partition_cut"](SF).to_pandas()
    assert len(t) == Q._LDG_K
    n = int(t.n_nodes.sum())
    assert n > 0
    cap = max(1.0, n / Q._LDG_K) * 1.1
    assert (t.n_nodes <= int(np.ceil(cap))).all()
    # each cut edge is counted once per side: sum(cut) is even
    assert int(t.cut_edges.sum()) % 2 == 0
    # edge conservation: internal + cut/2 == |E|
    und = Q._kg_und_edges(SF).materialize()
    assert int(t.internal_edges.sum()) + int(t.cut_edges.sum()) // 2 \
        == und.count()
    # LDG beats the worst case: some locality captured
    assert int(t.internal_edges.sum()) > 0
