"""Property tests: core-number and Katz regime agreement on random graphs.

Each example spins real Ray datasets, so example counts stay small; the
value is adversarial STRUCTURE (random graphs hit vanished-node cascades
and disconnected shards the fixed fixtures cannot)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

import newsagency_classification_ray.ops as ops


def _graph_strategy():
    # up to 9 nodes, random undirected edge set (src < dst)
    return st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1, max_size=16,
    ).map(lambda es: sorted({(f"n{min(a, b)}", f"n{max(a, b)}")
                             for a, b in es if a != b}))


def _ds(edges):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "src": [a for a, _ in edges], "dst": [b for _, b in edges]}))


def _core_ref(edges):
    """Independent dense mask peel (the oracle construction)."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    pos = {v: i for i, v in enumerate(nodes)}
    ai = np.array([pos[a] for a, _ in edges], dtype=np.int64)
    bi = np.array([pos[b] for _, b in edges], dtype=np.int64)
    core = np.zeros(len(nodes), dtype=np.int64)
    alive = np.ones(len(nodes), dtype=bool)
    k = 1
    while alive.any():
        while True:
            keep = alive[ai] & alive[bi]
            deg = np.zeros(len(nodes), dtype=np.int64)
            np.add.at(deg, ai[keep], 1)
            np.add.at(deg, bi[keep], 1)
            drop = alive & (deg < k)
            if not drop.any():
                break
            core[drop] = k - 1
            alive &= ~drop
        k += 1
    return dict(zip(nodes, core.tolist()))


@settings(max_examples=10, deadline=None, derandomize=True)
@given(edges=_graph_strategy())
def test_core_numbers_regimes_agree_with_reference(ray_session, edges):
    if not edges:
        return
    ref = _core_ref(edges)
    drv = {r["node"]: r["core"]
           for r in ops.core_numbers(_ds(edges)).take_all()}
    dist = {r["node"]: r["core"]
            for r in ops.core_numbers(_ds(edges),
                                      driver_edge_limit=0).take_all()}
    assert drv == ref
    assert dist == ref
    # invariant: a node's core never exceeds its degree
    deg: dict = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for v, c in ref.items():
        assert 1 <= c <= deg[v]


@settings(max_examples=8, deadline=None, derandomize=True)
@given(edges=_graph_strategy(), alpha=st.floats(0.01, 0.3))
def test_katz_regimes_agree(ray_session, edges, alpha):
    if not edges:
        return
    # symmetrize: katz is directed; feed both orientations
    sym = edges + [(b, a) for a, b in edges]
    kw = dict(src="src", dst="dst", alpha=round(alpha, 3), iters=3)
    drv = {r["node"]: r["katz"]
           for r in ops.katz(_ds(sym), **kw).take_all()}
    dense = {r["node"]: r["katz"]
             for r in ops.katz(_ds(sym), driver_edge_limit=0,
                               **kw).take_all()}
    dist = {r["node"]: r["katz"]
            for r in ops.katz(_ds(sym), driver_edge_limit=0,
                              broadcast_threshold=0, **kw).take_all()}
    assert drv == dense == dist
    # symmetric unweighted graph: every node has positive attenuated
    # walk mass
    assert all(v > 0 for v in drv.values())
