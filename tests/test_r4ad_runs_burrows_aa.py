"""Runs-test kernel vs hand counts, Burrows' Delta kernel vs a float
recompute, Adamic-Adar vs a networkx-free brute force."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray

from newsagency_classification_ray import ops
from newsagency_classification_ray.queries import (_burrows_delta_nano,
                                                   _runs_z_nano)


def test_runs_kernel_hand_counts():
    # deltas: + + - + - -  (zero delta between the two 8s is dropped)
    # sign runs: [+ +][-][+][- -] -> 4 runs
    n1, n2, runs, zn = _runs_z_nano([5, 6, 7, 3, 8, 8, 4, 1])
    assert (n1, n2, runs) == (3, 3, 4)
    mu = 2.0 * 3 * 3 / 6 + 1.0
    var = (mu - 1.0) * (mu - 2.0) / 5.0
    want = (4 - mu) / math.sqrt(var)
    assert abs(zn / 1e9 - want) < 1e-6


def test_runs_kernel_degenerate():
    assert _runs_z_nano([3, 3, 3]) == (0, 0, 0, 0)          # no nonzero delta
    assert _runs_z_nano([1, 2, 3, 4]) == (3, 0, 1, 0)       # monotone: n2=0
    assert _runs_z_nano([]) == (0, 0, 0, 0)


def test_burrows_delta_matches_float_recompute():
    vocab = ["the", "of", "and"]
    cells = [
        ("s1", "", 1000), ("s1", "the", 60), ("s1", "of", 30),
        ("s1", "and", 10),
        ("s2", "", 2000), ("s2", "the", 80), ("s2", "of", 90),
        ("s2", "and", 40),
        ("s3", "", 500), ("s3", "the", 40), ("s3", "of", 5),
        ("s3", "and", 20),
    ]
    got = {(a, b): d for a, b, d in _burrows_delta_nano(cells, vocab)}
    # float recompute (quantized freqs, population std) for one pair
    f = np.array([[round(60 / 1000 * 1e9), round(30 / 1000 * 1e9),
                   round(10 / 1000 * 1e9)],
                  [round(80 / 2000 * 1e9), round(90 / 2000 * 1e9),
                   round(40 / 2000 * 1e9)],
                  [round(40 / 500 * 1e9), round(5 / 500 * 1e9),
                   round(20 / 500 * 1e9)]], dtype=float)
    z = (f - f.mean(axis=0)) / f.std(axis=0)
    want12 = np.abs(z[0] - z[1]).mean()
    assert abs(got[("s1", "s2")] / 1e9 - want12) < 1e-6
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    # symmetry-by-construction: every pair emitted once, a < b
    assert all(a < b for a, b in got)


def test_burrows_delta_degenerate():
    assert _burrows_delta_nano([("s1", "", 10), ("s1", "x", 3)], ["x"]) == []


def _aa_brute(edges, k=10):
    nodes = sorted({n for e in edges for n in e})
    nbr = {n: set() for n in nodes}
    for u, v in edges:
        nbr[u].add(v)
        nbr[v].add(u)
    scores = {}
    eset = {tuple(sorted(e)) for e in edges}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in eset:
                continue
            s = 0
            for w in nbr[a] & nbr[b]:
                d = len(nbr[w])
                s += int(math.floor(1e9 / math.log(float(d)) + 0.5))
            if s > 0:
                scores[(a, b)] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(a, b, s) for (a, b), s in ranked[:k]]


def test_adamic_adar_matches_brute(ray_session):
    rng = np.random.default_rng(13)
    edges = sorted({tuple(sorted((f"n{a}", f"n{b}")))
                    for a, b in rng.integers(0, 18, (60, 2)) if a != b})
    t = pa.table({"src": pa.array([e[0] for e in edges]),
                  "dst": pa.array([e[1] for e in edges])})
    got = ops.adamic_adar_topk(ray.data.from_arrow(t), k=10)
    got_rows = [(r["u"], r["v"], r["aa_nano"]) for r in got.to_pylist()]
    assert got_rows == _aa_brute(edges, k=10)


def test_adamic_adar_empty_and_no_candidates(ray_session):
    # a single edge has no distance-2 non-edge pairs
    t = pa.table({"src": pa.array(["a"]), "dst": pa.array(["b"])})
    out = ops.adamic_adar_topk(ray.data.from_arrow(t))
    assert out.num_rows == 0
    assert out.column_names == ["u", "v", "aa_nano"]
