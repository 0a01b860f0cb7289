"""Katz centrality, interval-overlap join, join-order planner census."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import newsagency_classification_ray.ops as ops
import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"

_EDGES = [
    ("a", "b", 2.0), ("b", "a", 2.0), ("b", "c", 1.0), ("c", "b", 1.0),
    ("c", "d", 3.0), ("d", "c", 3.0), ("a", "c", 1.0), ("c", "a", 1.0),
    ("e", "a", 5.0),  # directed-only edge: e feeds a, never receives
]


def _edges_ds():
    import ray.data

    return ray.data.from_arrow(pa.table({
        "src": [s for s, _, _ in _EDGES],
        "dst": [d for _, d, _ in _EDGES],
        "w": [w for _, _, w in _EDGES],
    }))


def _katz_ref(alpha=0.05, iters=4, rd=9):
    rows = sorted(_EDGES)
    nodes = sorted({a for a, _, _ in rows} | {b for _, b, _ in rows})
    pos = {v: i for i, v in enumerate(nodes)}
    si = np.array([pos[a] for a, _, _ in rows])
    di = np.array([pos[b] for _, b, _ in rows])
    wv = np.array([w for _, _, w in rows])
    x = np.zeros(len(nodes))
    for _ in range(iters):
        c = np.zeros(len(nodes))
        np.add.at(c, di, wv * (x[si] + 1.0))
        x = np.round(alpha * c, rd)
    return dict(zip(nodes, x))


def _run_katz(**kw):
    out = ops.katz(_edges_ds(), src="src", dst="dst", weight="w", **kw)
    return {r["node"]: r["katz"] for r in out.take_all()}


def test_katz_driver_regime_matches_reference():
    assert _run_katz() == _katz_ref()


def test_katz_regimes_agree():
    ref = _katz_ref()
    dense = _run_katz(driver_edge_limit=0)  # forces dense-broadcast
    dist = _run_katz(driver_edge_limit=0, broadcast_threshold=0)
    assert dense == ref
    assert dist == ref


def test_katz_truncation_is_walk_sum():
    # one iteration = alpha * weighted in-degree exactly
    one = _run_katz(iters=1)
    indeg = {}
    for s, d, w in _EDGES:
        indeg[d] = indeg.get(d, 0.0) + w
    for n, v in one.items():
        assert v == round(0.05 * indeg.get(n, 0.0), 9)
    # 'e' never receives a walk at any depth
    assert _run_katz()["e"] == 0.0


def test_kg_katz_query_runs():
    t = Q.QUERIES["kg_katz"](SF)
    df = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
    assert set(df.columns) == {"node", "katz_share_nano"}
    assert len(df) > 0 and (df.katz_share_nano >= 0).all()
    # symmetrized co-occurrence graph: every node receives some walk mass
    assert (df.katz_share_nano > 0).all()


def test_overlap_join_matches_bruteforce():
    t = Q.QUERIES["events_overlap_join"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "user_id"]).to_pandas()
    us = ev.ts.astype("datetime64[us]").astype(np.int64)
    day = us // 86_400_000_000
    iv = pd.DataFrame({"u": ev.user_id.astype(np.int64), "day": day,
                       "us": us}).groupby(["u", "day"]).us \
        .agg(["min", "max"]).reset_index()
    expect = set()
    for d, g in iv.groupby("day"):
        rows = list(g.itertuples())
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                if a.min <= b.max and b.min <= a.max:
                    ua, ub = sorted((int(a.u), int(b.u)))
                    ov = min(a.max, b.max) - max(a.min, b.min)
                    expect.add((int(d), ua, ub, int(ov)))
    got = set(zip(t.day.astype(int), t.user_a.astype(int),
                  t.user_b.astype(int), t.overlap_us.astype(int)))
    assert got == expect
    assert (t.overlap_us >= 0).all() and (t.user_a < t.user_b).all()


def test_join_order_sizes_matches_bruteforce():
    t = Q.QUERIES["join_order_sizes"](SF).to_pandas() \
        .set_index("join_order")
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_nationkey"]).to_pandas()
    supp = pq.read_table(f"{SF}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_suppkey"]).to_pandas()
    cn = cust.c_nationkey.value_counts()
    sn = supp.s_nationkey.value_counts()
    ia = int(sum(int(cn[k]) * int(sn[k]) for k in cn.index if k in sn))
    sl = li.l_suppkey.value_counts()
    present = sl.index.intersection(supp.s_suppkey)
    ib = int(sl.loc[present].sum())
    nk = supp.set_index("s_suppkey").s_nationkey
    fin = int(sum(int(sl[k]) * int(cn.get(nk[k], 0)) for k in present))
    a = t.loc["customer_supplier_first"]
    b = t.loc["supplier_lineitem_first"]
    assert int(a.intermediate_rows) == ia
    assert int(b.intermediate_rows) == ib
    assert int(a.final_rows) == fin and int(b.final_rows) == fin
    assert bool(a.chosen) == (ia <= ib) and bool(b.chosen) == (ib <= ia)
    # the many-to-many nationkey order must genuinely be worse here
    assert ia != ib
