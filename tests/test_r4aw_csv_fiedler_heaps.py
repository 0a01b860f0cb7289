"""CSV round-trip, Fiedler kernel invariants, Heaps fit exactness."""

from __future__ import annotations

import math

import numpy as np

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.queries import (_fiedler_parts,
                                                   _heaps_fit_nano)

SF = "/root/testdata/sf0.001"


def test_csv_census_equals_parquet_census():
    got = {r["source"]: (r["n_docs"], r["chars_sum"]) for r in
           Q.QUERIES["docs_csv_roundtrip"](SF).take_all()}
    import duckdb

    ref = {r[0]: (r[1], r[2]) for r in duckdb.connect().execute(
        f"SELECT source, count(*), sum(n_chars) FROM "
        f"read_parquet('{SF}/documents.parquet') GROUP BY 1").fetchall()}
    assert got == ref


def test_fiedler_two_cliques_split():
    # two K3 cliques joined by one weak edge: the spectral cut finds them
    e = [("a1", "a2", 5), ("a1", "a3", 5), ("a2", "a3", 5),
         ("b1", "b2", 5), ("b1", "b3", 5), ("b2", "b3", 5),
         ("a1", "b1", 1)]
    parts, lam2 = _fiedler_parts(e)
    side = {n: s for n, s, _ in parts}
    assert side["a1"] == side["a2"] == side["a3"]
    assert side["b1"] == side["b2"] == side["b3"]
    assert side["a1"] != side["b1"]
    assert 0 < lam2 < 5 * 10**9  # weak bridge => small algebraic connectivity


def test_fiedler_degenerate():
    assert _fiedler_parts([]) == ([], 0)
    parts, lam2 = _fiedler_parts([("x", "y", 3)])
    assert {p[0] for p in parts} == {"x", "y"}
    assert lam2 > 0


def test_fiedler_orientation_is_pinned():
    e = [("a", "b", 1), ("b", "c", 1)]
    p1, _ = _fiedler_parts(e)
    p2, _ = _fiedler_parts(list(reversed(e)))
    assert p1 == p2


def test_heaps_fit_recovers_exact_power_law():
    # V = 3 * n^0.6 exactly on a grid
    pts = [(n, int(round(3 * n ** 0.6))) for n in
           [10, 50, 200, 1000, 5000, 20000, 100000]]
    beta, logk, r2 = _heaps_fit_nano(pts)
    assert abs(beta / 1e9 - 0.6) < 0.02
    assert abs(logk / 1e9 - math.log(3)) < 0.1
    assert r2 > 0.999e9


def test_heaps_fit_degenerate():
    assert _heaps_fit_nano([]) == (0, 0, 0)
    assert _heaps_fit_nano([(10, 5)]) == (0, 0, 0)
    # constant V -> slope 0, r2 0
    b, k, r2 = _heaps_fit_nano([(10, 7), (100, 7), (1000, 7)])
    assert b == 0 and r2 == 0


def test_heaps_query_is_nondegenerate():
    t = Q.QUERIES["docs_heaps_exponent"](SF).to_pylist()[0]
    assert t["beta_nano"] > 0
    assert t["r2_nano"] > 0
