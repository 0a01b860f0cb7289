"""Core-number decomposition, FD audit, DP count release."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import newsagency_classification_ray.ops as ops
import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"

# clique {a,b,c,d} (core 3) + triangle tail {d,e,f} (core 2) + path
# g-h-i hanging off e (core 1): exercises cascading removals where a
# node's LAST edge vanishes mid-peel (h, i after g drops).
_EDGES = [
    ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
    ("d", "e"), ("d", "f"), ("e", "f"),
    ("e", "g"), ("g", "h"), ("h", "i"),
]

_EXPECT = {"a": 3, "b": 3, "c": 3, "d": 3, "e": 2, "f": 2,
           "g": 1, "h": 1, "i": 1}


def _edges_ds():
    import ray.data

    return ray.data.from_arrow(pa.table({
        "src": [s for s, _ in _EDGES],
        "dst": [d for _, d in _EDGES],
    }))


def test_core_numbers_driver_regime():
    out = ops.core_numbers(_edges_ds())
    got = {r["node"]: r["core"] for r in out.take_all()}
    assert got == _EXPECT


def test_core_numbers_distributed_regime_matches():
    out = ops.core_numbers(_edges_ds(), driver_edge_limit=0)
    got = {r["node"]: r["core"] for r in out.take_all()}
    assert got == _EXPECT


def test_core_numbers_ring_is_uniform():
    import ray.data

    ring = [(f"n{i}", f"n{(i + 1) % 6}") for i in range(6)]
    ds = ray.data.from_arrow(pa.table({
        "src": [s for s, _ in ring], "dst": [d for _, d in ring]}))
    for lim in (500_000, 0):
        got = {r["node"]: r["core"]
               for r in ops.core_numbers(ds, driver_edge_limit=lim)
               .take_all()}
        assert got == {f"n{i}": 2 for i in range(6)}


def test_kg_core_numbers_query_consistent_with_kcore():
    cores = Q.QUERIES["kg_core_numbers"](SF).to_pandas()
    k3 = Q.QUERIES["kg_kcore"](SF).to_pandas()
    in3 = set(cores[cores.core >= 3].node)
    assert in3 == set(k3.node)
    assert (cores.core >= 1).all()


def test_fd_audit_matches_bruteforce():
    t = Q.QUERIES["fd_audit"](SF).to_pandas().set_index("fd")
    for fd, tbl, det, dep in Q._FD_CANDIDATES:
        df = pq.read_table(f"{SF}/{tbl}.parquet",
                           columns=[det, dep]).to_pandas()
        g = df.groupby(det)[dep].agg(["count", "nunique"])
        row = t.loc[fd]
        assert int(row.n_det_values) == len(g)
        assert int(row.n_violating_dets) == int((g["nunique"] > 1).sum())
        assert int(row.n_violating_rows) == \
            int(g["count"][g["nunique"] > 1].sum())
        assert bool(row.holds) == bool((g["nunique"] <= 1).all())
    # the audit must separate the true FD from the refuted ones
    assert bool(t.loc["nation.n_nationkey->n_regionkey"].holds)
    assert not bool(
        t.loc["orders.o_custkey->o_orderpriority"].holds)


def test_dp_release_noise_is_seeded_and_bounded():
    t = Q.QUERIES["events_dp_release"](SF).to_pandas() \
        .set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type"]).to_pandas()
    truth = ev.event_type.value_counts()
    assert set(t.index) == set(truth.index)
    for et in truth.index:
        z = Q._dp_noise(et)
        assert int(t.loc[et].noisy_count) == int(truth[et]) + z
        # ε=1 discrete Laplace: |z| > 40 has probability < 1e-17
        assert abs(z) <= 40
        assert int(t.loc[et].epsilon_micro) == 1_000_000
    # determinism across calls
    t2 = Q.QUERIES["events_dp_release"](SF).to_pandas() \
        .set_index("event_type")
    pd.testing.assert_frame_equal(t.sort_index(), t2.sort_index())
    # the mechanism must actually perturb something at this scale
    assert any(Q._dp_noise(et) != 0 for et in truth.index) or \
        len(truth) < 2
