"""Articulation points vs the remove-and-count definition, lagged
cross-correlation vs numpy, entropy/MI kernel invariants."""
import numpy as np

from newsagency_classification_ray.queries import (
    _articulation_points, _entropy_mi_nano)


def _components(nodes, pairs):
    adj = {n: set() for n in nodes}
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    seen, comps = set(), 0
    for n in nodes:
        if n in seen:
            continue
        comps += 1
        stack = [n]
        seen.add(n)
        while stack:
            v = stack.pop()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
    return comps


def _brute_cutpoints(pairs):
    nodes = sorted({v for p in pairs for v in p})
    base = _components(nodes, pairs)
    out = []
    for n in nodes:
        rest = [n2 for n2 in nodes if n2 != n]
        sub = [p for p in pairs if n not in p]
        if _components(rest, sub) > base:
            out.append(n)
    return out


def test_articulation_points_match_brute():
    rng = np.random.default_rng(17)
    for _ in range(20):
        m = int(rng.integers(3, 25))
        pairs = sorted({tuple(sorted((f"v{a}", f"v{b}")))
                        for a, b in rng.integers(0, 12, (m, 2)) if a != b})
        assert _articulation_points(pairs) == _brute_cutpoints(pairs), pairs


def test_articulation_points_known_graphs():
    # path a-b-c: b is the cut vertex; triangle has none
    assert _articulation_points([("a", "b"), ("b", "c")]) == ["b"]
    assert _articulation_points(
        [("a", "b"), ("b", "c"), ("a", "c")]) == []
    # two triangles sharing vertex x
    tri2 = [("a", "b"), ("b", "x"), ("a", "x"),
            ("c", "d"), ("d", "x"), ("c", "x")]
    assert _articulation_points(tri2) == ["x"]


def test_xcorr_nano_matches_numpy():
    rng = np.random.default_rng(23)
    x = rng.integers(0, 100, 60).astype(np.int64)
    y = (np.roll(x, -3) + rng.integers(0, 10, 60)).astype(np.int64)
    for lag in range(0, 5):
        xs, yt = x[:len(x) - lag] if lag else x, y[lag:]
        n = len(xs)
        sxy, sx, sy = int((xs * yt).sum()), int(xs.sum()), int(yt.sum())
        sxx, syy = int((xs * xs).sum()), int((yt * yt).sum())
        v = float(n * sxy - sx * sy) / np.sqrt(
            float(n * sxx - sx * sx) * float(n * syy - sy * sy))
        ref = np.corrcoef(xs.astype(float), yt.astype(float))[0, 1]
        assert abs(v - ref) < 1e-9


def test_entropy_mi_independence_is_zero():
    # rank-1 contingency (independent margins) -> MI == 0 exactly at quant
    m = np.outer([10, 30, 60], [20, 80]).astype(np.int64)
    hs, hl, mi = _entropy_mi_nano(m)
    assert abs(mi) <= 1  # quantization ulp
    # entropies match direct formula
    p = np.array([0.1, 0.3, 0.6])
    assert abs(hs / 1e9 - float(-(p * np.log(p)).sum())) < 1e-8


def test_entropy_mi_perfect_association():
    # diagonal contingency: MI == H(row) == H(col)
    m = np.diag([25, 25, 50]).astype(np.int64)
    hs, hl, mi = _entropy_mi_nano(m)
    assert hs == hl
    assert abs(mi - hs) <= 2
