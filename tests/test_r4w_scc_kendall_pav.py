"""SCC (both regimes vs an independent Kosaraju), exact Kendall tau-b vs
the O(n²) pair definition, and PAV isotonic-fit invariants."""
import numpy as np
import pyarrow as pa
import pytest
import ray

from newsagency_classification_ray import ops
from newsagency_classification_ray.queries import _kosaraju_scc, _pav_rate_nano


def _random_digraph(seed: int, n_nodes: int = 40, n_rand: int = 60):
    rng = np.random.default_rng(seed)
    nodes = [f"n{i:02d}" for i in range(n_nodes)]
    edges = set()
    # two explicit cycles (non-trivial SCCs) plus random tendrils
    for cyc in ([0, 3, 7, 11], [20, 25, 22]):
        for a, b in zip(cyc, cyc[1:] + cyc[:1]):
            edges.add((nodes[a], nodes[b]))
    for _ in range(n_rand):
        a, b = rng.integers(0, n_nodes, 2)
        if a != b:
            edges.add((nodes[a], nodes[b]))
    return edges


def _as_ds(edges):
    return ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in sorted(edges)], pa.string()),
        "dst": pa.array([b for _, b in sorted(edges)], pa.string()),
    })).repartition(4)


def test_scc_driver_matches_kosaraju(ray_session):
    for seed in (1, 2, 3):
        edges = _random_digraph(seed)
        t = ops.scc(_as_ds(edges))
        got = dict(zip(t["node"].to_pylist(), t["scc_id"].to_pylist()))
        assert got == _kosaraju_scc(edges)


def test_scc_distributed_matches_driver(ray_session):
    edges = _random_digraph(7, n_nodes=30, n_rand=30)
    drv = ops.scc(_as_ds(edges))
    dist = ops.scc(_as_ds(edges), edge_limit=1)
    dd = dist.to_pandas() if not isinstance(dist, pa.Table) else \
        dist.to_pandas()
    got = dict(zip(dd["node"], dd["scc_id"]))
    ref = dict(zip(drv["node"].to_pylist(), drv["scc_id"].to_pylist()))
    assert got == ref


def test_scc_self_loop_and_empty(ray_session):
    t = ops.scc(_as_ds({("a", "a"), ("a", "b")}))
    assert dict(zip(t["node"].to_pylist(), t["scc_id"].to_pylist())) == \
        {"a": "a", "b": "b"}
    e = ops.scc(_as_ds(set()).filter(lambda r: False))
    assert len(e) == 0 and e.column_names == ["node", "scc_id"]


def _brute_tau(x: np.ndarray, y: np.ndarray):
    sx = np.sign(x[:, None] - x[None, :])
    sy = np.sign(y[:, None] - y[None, :])
    prod = sx * sy
    iu = np.triu_indices(len(x), 1)
    conc = int((prod[iu] > 0).sum())
    disc = int((prod[iu] < 0).sum())
    n = len(x)
    n0 = n * (n - 1) // 2
    tx = int((sx[iu] == 0).sum())
    ty = int((sy[iu] == 0).sum())
    denom = float(n0 - tx) * float(n0 - ty)
    val = float(conc - disc) / np.sqrt(denom) * 1e9
    return conc, disc, int(np.sign(val) * np.floor(np.abs(val) + 0.5))


def test_kendall_matches_pair_definition(ray_session):
    rng = np.random.default_rng(11)
    n = 800
    x = rng.integers(0, 9, n)
    y = (x + rng.integers(-3, 4, n)).clip(0, 12)
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64()),
    })).repartition(5)
    t = ops.kendall_tau_b(ds, "x", "y")
    conc, disc, nano = _brute_tau(x.astype(np.int64), y.astype(np.int64))
    assert t["n_rows"][0].as_py() == n
    assert t["concordant"][0].as_py() == conc
    assert t["discordant"][0].as_py() == disc
    assert t["tau_b_nano"][0].as_py() == nano


def test_kendall_cell_limit_raises(ray_session):
    ds = ray.data.range(100).map_batches(
        lambda b: pa.table({"x": pa.array(b["id"], pa.int64()),
                            "y": pa.array(b["id"], pa.int64())}),
        batch_format="pyarrow")
    with pytest.raises(ValueError, match="bounded-cardinality"):
        ops.kendall_tau_b(ds, "x", "y", cell_limit=10)


def _pav_reference(pos, cnt):
    """Order-independent reference: merge ANY adjacent violator until
    none remain (PAV's fixpoint is unique), then emit per-bin rates."""
    pools = [[p, c, 1] for p, c in zip(pos, cnt)]
    changed = True
    while changed:
        changed = False
        for i in range(len(pools) - 1):
            if pools[i][0] * pools[i + 1][1] >= pools[i + 1][0] * pools[i][1]:
                a = pools.pop(i + 1)
                pools[i] = [pools[i][0] + a[0], pools[i][1] + a[1],
                            pools[i][2] + a[2]]
                changed = True
                break
    out = []
    for p, c, k in pools:
        out.extend([(p * 1_000_000_000 * 2 + c) // (2 * c)] * k)
    return out


def test_pav_matches_reference_and_is_monotone():
    rng = np.random.default_rng(5)
    for _ in range(25):
        k = int(rng.integers(1, 12))
        cnt = rng.integers(1, 50, k).tolist()
        pos = [int(rng.integers(0, c + 1)) for c in cnt]
        got = _pav_rate_nano(pos, cnt)
        assert got == _pav_reference(pos, cnt)
        assert all(a <= b for a, b in zip(got, got[1:]))
        # pooled fit preserves the total positive mass in rate-weighted form
        assert len(got) == k


def test_pav_already_monotone_is_identity():
    pos, cnt = [0, 2, 9], [10, 10, 10]
    assert _pav_rate_nano(pos, cnt) == [0, 200000000, 900000000]
