"""Max-spanning-forest regimes vs an independent Kruskal, gazetteer
counts vs Python str.count, and the exact-integer OLS2 kernel vs numpy
least squares."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from newsagency_classification_ray import ops
from newsagency_classification_ray.queries import _div_nano, _ols2_nano


def _edges_table(seed: int = 7, n_nodes: int = 40, n_edges: int = 160):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    w = rng.integers(1, 50, n_edges)
    # collapse parallel edges (caller contract: one row per pair)
    agg: dict = {}
    for a, b, c in zip(u, v, w):
        a, b = int(min(a, b)), int(max(a, b))
        if a == b:
            continue
        agg[(a, b)] = agg.get((a, b), 0) + int(c)
    rows = [{"src": f"n{a:03d}", "dst": f"n{b:03d}", "weight": c}
            for (a, b), c in agg.items()]
    return pa.Table.from_pylist(rows)


def _kruskal_ref(t: pa.Table):
    rows = sorted((-int(w), u, v) for u, v, w in
                  zip(t["src"].to_pylist(), t["dst"].to_pylist(),
                      t["weight"].to_pylist()))
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    out = []
    for nw, u, v in rows:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
            out.append((u, v, -nw))
    return sorted(out)


def test_msf_driver_matches_reference_kruskal(ray_session):
    t = _edges_table()
    got = ops.max_spanning_forest(ray.data.from_arrow(t)).take_all()
    got = sorted((r["src"], r["dst"], r["weight"]) for r in got)
    assert got == _kruskal_ref(t)


def test_msf_distributed_boruvka_bit_identical(ray_session):
    t = _edges_table(seed=11, n_nodes=25, n_edges=90)
    dist = ops.max_spanning_forest(
        ray.data.from_arrow(t), driver_edge_limit=0).take_all()
    dist = sorted((r["src"], r["dst"], r["weight"]) for r in dist)
    assert dist == _kruskal_ref(t)


def test_msf_disconnected_and_empty(ray_session):
    # two components -> forest has (n1-1)+(n2-1) edges
    rows = [{"src": "a", "dst": "b", "weight": 3},
            {"src": "b", "dst": "c", "weight": 2},
            {"src": "a", "dst": "c", "weight": 1},
            {"src": "x", "dst": "y", "weight": 9}]
    t = pa.Table.from_pylist(rows)
    got = sorted((r["src"], r["dst"], r["weight"]) for r in
                 ops.max_spanning_forest(ray.data.from_arrow(t)).take_all())
    assert got == [("a", "b", 3), ("b", "c", 2), ("x", "y", 9)]
    empty = pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string()),
                      "weight": pa.array([], pa.int64())})
    assert ops.max_spanning_forest(
        ray.data.from_arrow(empty)).count() == 0


def test_gazetteer_counts_vs_python(ray_session):
    docs = ["the hash join beat the sort merge twice: hash join wins",
            "table scan table scan table scan",
            "nothing here",
            "sort merge and a table scan"]
    t = pa.table({"text": pa.array(docs)})
    phrases = ["hash join", "table scan", "sort merge", "absent phrase"]
    got = {r["phrase"]: (r["n_docs"], r["n_hits"]) for r in
           ops.gazetteer_counts(ray.data.from_arrow(t), phrases).take_all()}
    for p in phrases:
        nd = sum(1 for d in docs if p in d)
        nh = sum(d.count(p) for d in docs)
        assert got[p] == (nd, nh), p


def test_gazetteer_rejects_oversized_inventory(ray_session):
    t = pa.table({"text": pa.array(["x"])})
    try:
        ops.gazetteer_counts(ray.data.from_arrow(t),
                             [f"p{i}" for i in range(10_001)])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_div_nano_half_away_from_zero():
    assert _div_nano(1, 2) == 500_000_000
    assert _div_nano(-1, 2) == -500_000_000
    assert _div_nano(1, 3) == 333_333_333
    assert _div_nano(2, 3) == 666_666_667
    # exact halves round away from zero
    assert _div_nano(3, 2 * 10**9) == 2  # 1.5 nano -> 2
    assert _div_nano(-3, 2 * 10**9) == -2


def test_ols2_nano_matches_numpy_lstsq():
    rng = np.random.default_rng(3)
    x1 = rng.integers(1, 50, 200).astype(np.int64)
    x2 = rng.integers(0, 10, 200).astype(np.int64)
    y = 700 + 13 * x1 - 4 * x2 + rng.integers(-20, 21, 200).astype(np.int64)
    n = len(y)
    stats = (n, int(x1.sum()), int(x2.sum()), int(y.sum()),
             int((x1 * x1).sum()), int((x1 * x2).sum()),
             int((x2 * x2).sum()), int((x1 * y).sum()),
             int((x2 * y).sum()), int((y * y).sum()))
    b0, b1, b2, r2 = _ols2_nano(*stats)
    X = np.column_stack([np.ones(n), x1, x2]).astype(float)
    beta = np.linalg.lstsq(X, y.astype(float), rcond=None)[0]
    assert abs(b0 / 1e9 - beta[0]) < 1e-6
    assert abs(b1 / 1e9 - beta[1]) < 1e-6
    assert abs(b2 / 1e9 - beta[2]) < 1e-6
    resid = y - X @ beta
    ss_res = float(resid @ resid)
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert abs(r2 / 1e9 - (1 - ss_res / ss_tot)) < 1e-6


def test_ols2_nano_singular_returns_zeros():
    # x2 = 2*x1 exactly -> singular normal equations
    x1 = np.arange(1, 21, dtype=np.int64)
    x2 = 2 * x1
    y = 5 * x1 + 1
    n = 20
    stats = (n, int(x1.sum()), int(x2.sum()), int(y.sum()),
             int((x1 * x1).sum()), int((x1 * x2).sum()),
             int((x2 * x2).sum()), int((x1 * y).sum()),
             int((x2 * y).sum()), int((y * y).sum()))
    assert _ols2_nano(*stats) == (0, 0, 0, 0)
