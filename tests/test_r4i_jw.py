"""Jaro-Winkler pair scorer: bit-parity with DuckDB (the oracle engine),
the rapidfuzz edge semantics it follows, and the blocked-join contract."""

from __future__ import annotations

import numpy as np
import ray

from newsagency_classification_ray import ops


def _mat(cases):
    L = max(1, max(max(len(a), len(b)) for a, b in cases))
    M1 = np.zeros((len(cases), L), np.uint32)
    M2 = np.zeros((len(cases), L), np.uint32)
    l1 = np.zeros(len(cases), np.int64)
    l2 = np.zeros(len(cases), np.int64)
    for i, (a, b) in enumerate(cases):
        if a:
            M1[i, :len(a)] = np.frombuffer(a.encode("utf-32-le"), np.uint32)
        if b:
            M2[i, :len(b)] = np.frombuffer(b.encode("utf-32-le"), np.uint32)
        l1[i], l2[i] = len(a), len(b)
    return M1, M2, l1, l2


def test_jw_bit_parity_with_duckdb_fuzz():
    import random

    import duckdb

    random.seed(11)
    cases = [("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
             ("DIXON", "DICKSONX"), ("", "x"), ("", ""), ("abc", "abc"),
             ("abcd", "abce")]  # prefix boost exactly at the 4-char cap
    for _ in range(800):
        a = "".join(random.choices("abcdef 12", k=random.randint(0, 12)))
        b = "".join(random.choices("abcdef 12", k=random.randint(0, 12)))
        cases.append((a, b))
    got = ops._jaro_winkler_pairs(*_mat(cases))
    con = duckdb.connect()
    for i, (a, b) in enumerate(cases):
        exp = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                          [a, b]).fetchone()[0]
        assert got[i] == exp, (a, b, got[i], exp)  # BIT equality, no eps


def test_jw_edge_semantics():
    got = ops._jaro_winkler_pairs(*_mat([("", ""), ("ab", ""), ("x", "x")]))
    assert got[0] == 0.0  # both-empty is 0 (rapidfuzz/DuckDB), not 1
    assert got[1] == 0.0
    assert got[2] == 1.0


def test_jw_pairs_blocked_join(ray_session):
    rows = [
        {"b": "B1", "id": 1, "name": "martha"},
        {"b": "B1", "id": 2, "name": "marhta"},   # transposition: high sim
        {"b": "B1", "id": 3, "name": "zzzzzz"},   # no match
        {"b": "B2", "id": 4, "name": "martha"},   # other block: never paired
    ]
    ds = ray.data.from_items(rows).repartition(2)
    out = ops.jw_pairs(ds, "b", "id", "name", min_sim=0.9).take_all()
    assert [(r["b"], r["id_a"], r["id_b"]) for r in out] == [("B1", 1, 2)]
    import duckdb

    exp = duckdb.connect().execute(
        "SELECT jaro_winkler_similarity('martha', 'marhta')").fetchone()[0]
    assert out[0]["jw"] == exp
