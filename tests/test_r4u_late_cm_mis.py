"""Late-arrival watermark accounting, CM-sketch join-size estimation, and
the deterministic maximal-independent-set operator."""
import numpy as np
import pyarrow as pa
import pytest
import ray

from newsagency_classification_ray import ops


def _late_ref(order, ts, grp):
    """Pure-numpy reference for late_arrival_stats."""
    import pandas as pd

    o = np.argsort(order, kind="stable")
    tsv, g = ts[o], grp[o]
    before = np.empty(len(tsv), np.int64)
    before[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(tsv[:-1], out=before[1:])
    late = tsv < before
    lat = np.where(late, before - tsv, 0)
    return (pd.DataFrame({"g": g, "late": late.astype(int), "lat": lat})
            .groupby("g")
            .agg(n_events=("late", "size"), n_late=("late", "sum"),
                 max_late_us=("lat", "max"), sum_late_us=("lat", "sum"))
            .reset_index())


def test_late_arrival_stats_matches_reference(ray_session):
    rng = np.random.default_rng(11)
    n = 4000
    order = np.arange(n)
    rng.shuffle(order)
    ts = (np.cumsum(rng.integers(0, 80, n))
          + rng.integers(-400, 400, n)).astype(np.int64)
    grp = rng.choice(["x", "y", "z"], n)
    t = pa.table({"oid": pa.array(order, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "g": pa.array(grp)})
    got = (ops.late_arrival_stats(
        ray.data.from_arrow(t).repartition(11), "oid", "ts", "g")
        .to_pandas().sort_values("g").reset_index(drop=True))
    ref = _late_ref(order, ts, grp)
    cols = ["n_events", "n_late", "max_late_us", "sum_late_us"]
    assert (got[cols].to_numpy() == ref[cols].to_numpy()).all()


def test_late_arrival_monotone_stream_has_zero_late(ray_session):
    n = 500
    t = pa.table({"oid": pa.array(np.arange(n), pa.int64()),
                  "ts": pa.array(np.arange(n) * 1000, pa.timestamp("us")),
                  "g": pa.array(["s"] * n)})
    got = ops.late_arrival_stats(
        ray.data.from_arrow(t).repartition(7), "oid", "ts", "g").to_pandas()
    assert got["n_late"].iloc[0] == 0
    assert got["max_late_us"].iloc[0] == 0


def test_late_arrival_duplicate_keys_raise(ray_session):
    t = pa.table({"oid": pa.array([1, 1, 2], pa.int64()),
                  "ts": pa.array([1, 2, 3], pa.timestamp("us")),
                  "g": pa.array(["a", "a", "a"])})
    with pytest.raises(Exception, match="unique arrival keys"):
        ops.late_arrival_stats(
            ray.data.from_arrow(t), "oid", "ts", "g").take_all()


def test_cm_inner_product_one_sided():
    rng = np.random.default_rng(5)
    a_keys = rng.integers(0, 300, 5000).astype(np.int64)
    b_keys = rng.integers(0, 300, 2000).astype(np.int64)
    a = ops.CountMinSketch(d=4, w=2048)
    a.add(a_keys)
    b = ops.CountMinSketch(d=4, w=2048)
    b.add(b_keys)
    ca = np.bincount(a_keys, minlength=300).astype(object)
    cb = np.bincount(b_keys, minlength=300).astype(object)
    exact = int((ca * cb).sum())
    est = a.inner_product(b)
    assert est >= exact  # one-sided overestimate guarantee
    assert est <= exact * 2  # sane at this (w, N)
    # self-join F2
    f2 = int((ca * ca).sum())
    assert a.inner_product(a) >= f2


def test_cm_inner_product_shape_mismatch_raises():
    a = ops.CountMinSketch(d=4, w=1024)
    b = ops.CountMinSketch(d=4, w=2048)
    with pytest.raises(ValueError):
        a.inner_product(b)


def _rand_edges(seed: int, n_nodes: int, n_edges: int):
    rng = np.random.default_rng(seed)
    nodes = [f"N{i:03d}" for i in range(n_nodes)]
    es = set()
    while len(es) < n_edges:
        u, v = rng.choice(n_nodes, 2, replace=False)
        es.add(tuple(sorted((nodes[u], nodes[v]))))
    return es


@pytest.mark.parametrize("seed,n,m", [(3, 40, 90), (9, 25, 180)])
def test_mis_regimes_identical_and_valid(ray_session, seed, n, m):
    es = _rand_edges(seed, n, m)
    t = pa.table({"u": pa.array([e[0] for e in es]),
                  "v": pa.array([e[1] for e in es])})
    eds = ray.data.from_arrow(t).repartition(5)
    drv = ops.maximal_independent_set(eds, edge_limit=10**6)
    dist = ops.maximal_independent_set(eds, edge_limit=0)
    drv_set = set(drv["node"].to_pylist())
    dist_set = (set(dist["node"].to_pylist()) if isinstance(dist, pa.Table)
                else set(dist.to_pandas()["node"]))
    assert drv_set == dist_set
    adj: dict[str, set] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for a, b in es:  # independence
        assert not (a in drv_set and b in drv_set)
    for node in adj:  # maximality
        if node not in drv_set:
            assert adj[node] & drv_set


def test_mis_empty_graph(ray_session):
    t = pa.table({"u": pa.array([], pa.string()),
                  "v": pa.array([], pa.string())})
    out = ops.maximal_independent_set(ray.data.from_arrow(t))
    assert isinstance(out, pa.Table) and len(out) == 0
    assert out.column_names == ["node"]


def test_mis_greedy_matches_sequential():
    """Parallel rounds == sequential greedy in priority order."""
    es = _rand_edges(17, 30, 60)
    adj: dict[str, set] = {}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    seq = []
    chosen: set = set()
    for node in sorted(adj, key=ops.mis_priority):
        if not (adj[node] & chosen):
            chosen.add(node)
            seq.append(node)
    assert sorted(seq) == ops._mis_greedy(es)
