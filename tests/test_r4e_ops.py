"""Unit/property tests for the late-r4 helper algorithms (z-order codes,
temporal reachability, bridges, interval union) — the driver-regime /
bit-math pieces whose correctness the oracle comparison exercises only on
the fixed test corpus."""

import numpy as np

from newsagency_classification_ray import ops
from newsagency_classification_ray.queries import (
    _ACTIVE_W_US,
    _bridge_edges,
    _temporal_reach,
)


def _morton_ref(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder16_matches_bit_loop():
    rng = np.random.RandomState(3)
    x = rng.randint(0, 1 << 16, size=500).astype(np.int64)
    y = rng.randint(0, 1 << 16, size=500).astype(np.int64)
    got = ops.zorder16(x, y)
    want = np.array([_morton_ref(int(a), int(b)) for a, b in zip(x, y)],
                    dtype=np.int64)
    assert (got == want).all()
    # keys above 16 bits use only their low 16 bits
    assert ops.zorder16(x + (1 << 20), y)[0] == ops.zorder16(x, y)[0]


def test_zorder_locality():
    # adjacent cells in either dimension stay within a small code delta —
    # the property that makes min/max zone stats prune on both keys
    z00 = int(ops.zorder16(np.array([10]), np.array([20]))[0])
    z10 = int(ops.zorder16(np.array([11]), np.array([20]))[0])
    z01 = int(ops.zorder16(np.array([10]), np.array([21]))[0])
    assert abs(z10 - z00) <= 3 and abs(z01 - z00) <= 3


def test_temporal_reach_year_gate_and_same_year_chain():
    # seed S; edge (S,a,2000); (a,b,1999) exists BEFORE a is reached →
    # b must not be reached via 1999; (a,c,2000) same-year chain counts;
    # (c,d,2001) then reaches d.
    edges = [("S", "a", 2000), ("a", "b", 1999),
             ("a", "c", 2000), ("c", "d", 2001)]
    r = _temporal_reach(edges, "S")
    assert r == {"a": 2000, "c": 2000, "d": 2001}


def test_temporal_reach_prefers_earliest_year():
    edges = [("S", "a", 1995), ("S", "a", 1990), ("a", "b", 1992)]
    r = _temporal_reach(edges, "S")
    # a reached 1990, so the 1992 edge forward-propagates
    assert r == {"a": 1990, "b": 1992}


def test_bridges_classic_cases():
    assert _bridge_edges([("a", "b"), ("b", "c"), ("a", "c"),
                          ("c", "d"), ("e", "f")]) == [("c", "d"),
                                                       ("e", "f")]
    assert _bridge_edges([("a", "b"), ("b", "c")]) == [("a", "b"),
                                                       ("b", "c")]
    assert _bridge_edges([("a", "b"), ("b", "c"), ("c", "a")]) == []
    # two cycles sharing one articulation vertex: still no bridges
    assert _bridge_edges([("a", "b"), ("b", "c"), ("c", "a"),
                          ("c", "d"), ("d", "e"), ("e", "c")]) == []


def _union_ref(ts: np.ndarray, w: int) -> tuple[int, int]:
    """Brute-force interval union length via a micro-sweep on a set."""
    covered = set()
    for t in ts.tolist():
        covered.update(range(int(t), int(t) + w))
    # islands = maximal runs
    pts = sorted(covered)
    islands = 1 + sum(1 for i in range(1, len(pts))
                      if pts[i] != pts[i - 1] + 1)
    return len(covered), islands


def test_interval_union_matches_brute_force():
    rng = np.random.RandomState(7)
    w = 50
    for _ in range(20):
        ts = np.sort(rng.randint(0, 1000, size=rng.randint(1, 12)))
        brk = np.flatnonzero(np.diff(ts) > w) + 1
        starts = np.r_[0, brk]
        ends = np.r_[brk - 1, len(ts) - 1]
        cov = int((ts[ends] + w - ts[starts]).sum())
        want_cov, want_isl = _union_ref(ts, w)
        assert cov == want_cov
        assert len(starts) == want_isl


def test_active_window_constant_is_positive():
    assert _ACTIVE_W_US > 0
