"""Bloom position math vs DuckDB HUGEINT, JL quantizer/sign determinism,
and the histogram AUC fold vs brute-force pairwise comparison."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import (_BLOOM_HASHES, _BLOOM_M,
                                                   _bloom_pos, _div_nano,
                                                   _jl_sign, _q6)


@given(st.lists(st.integers(min_value=0, max_value=2**62),
                min_size=1, max_size=16))
@settings(max_examples=50, deadline=None)
def test_bloom_positions_match_hugeint_math(ids):
    arr = np.array(ids, dtype=np.uint64)
    got = _bloom_pos(arr)
    con = duckdb.connect()
    for j, (a, b) in enumerate(_BLOOM_HASHES):
        for i, v in enumerate(ids):
            want = con.execute(
                f"SELECT CAST(((CAST({v} AS HUGEINT) * {a} + {b})"
                f" % CAST(18446744073709551616 AS HUGEINT))"
                f" % {_BLOOM_M} AS BIGINT)").fetchone()[0]
            assert int(got[j][i]) == want, (j, v)


def test_bloom_inserted_keys_always_hit():
    # a filter never false-negatives: every inserted key probes positive
    ids = np.arange(0, 5000, dtype=np.uint64)
    bits = np.zeros(_BLOOM_M, dtype=bool)
    for pos in _bloom_pos(ids):
        bits[pos.astype(np.int64)] = True
    member = np.ones(len(ids), dtype=bool)
    for pos in _bloom_pos(ids):
        member &= bits[pos.astype(np.int64)]
    assert member.all()


@given(st.floats(min_value=-10, max_value=10, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_q6_matches_sql_sign_floor(x):
    con = duckdb.connect()
    want = con.execute(
        "SELECT CAST(sign(CAST(? AS DOUBLE) * 1000000.0)"
        " * floor(abs(CAST(? AS DOUBLE) * 1000000.0) + 0.5) AS BIGINT)",
        [x, x]).fetchone()[0]
    assert _q6(x) == want


def test_jl_sign_matches_sql_expression():
    con = duckdb.connect()
    for i in range(1, 65):
        for j in range(1, 17):
            want = con.execute(
                f"SELECT CASE WHEN (({i} * 2654435761 + {j} * 40503)"
                f" // 8192) % 2 = 0 THEN 1 ELSE -1 END").fetchone()[0]
            assert _jl_sign(i, j) == want, (i, j)
    # both signs occur (the matrix is not degenerate)
    s = {_jl_sign(i, j) for i in range(1, 65) for j in range(1, 17)}
    assert s == {1, -1}


def _auc_brute(scores, labels) -> int:
    """2·n1·n0·AUC by brute pairwise comparison with 0.5 tie credit."""
    u2 = 0
    for s1, l1 in zip(scores, labels):
        if not l1:
            continue
        for s0, l0 in zip(scores, labels):
            if l0:
                continue
            u2 += 2 if s1 > s0 else (1 if s1 == s0 else 0)
    return u2


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=8),
                          st.booleans()), min_size=2, max_size=40))
@settings(max_examples=200, deadline=None)
def test_auc_histogram_fold_matches_brute_pairwise(items):
    scores = [s for s, _ in items]
    labels = [l for _, l in items]
    # histogram fold (the query's driver loop)
    from collections import defaultdict
    c1m, c0m = defaultdict(int), defaultdict(int)
    for s, l in items:
        (c1m if l else c0m)[s] += 1
    u2 = c0_less = 0
    for s in sorted(set(scores)):
        u2 += c1m[s] * (2 * c0_less + c0m[s])
        c0_less += c0m[s]
    assert u2 == _auc_brute(scores, labels)
    n1, n0 = sum(labels), len(labels) - sum(labels)
    if n1 and n0:
        # perfect separation sanity: AUC in [0, 1] nano
        a = _div_nano(u2, 2 * n1 * n0)
        assert 0 <= a <= 10**9
