"""Butterfly-census pair math, Yule's K exact-integer division, and the
Holt-Winters seasonal recursion vs an independently-structured fold."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import (_div_nano,
                                                   _holtwinters_nano)


def test_yule_k_hand_spectrum():
    # tokens "a a a b b c": N=6, V=3, S2=9+4+1=14
    # K = 1e4 * (14 - 6) / 36 = 2222.2222... -> nano rounds half-away
    assert _div_nano(10**4 * (14 - 6), 6 * 6) == 2222222222222

    # uniform spectrum (every token hapax): S2 == N -> K == 0 exactly
    assert _div_nano(10**4 * (7 - 7), 7 * 7) == 0


def test_yule_k_matches_duckdb_hugeint_expression():
    import duckdb

    con = duckdb.connect()
    for total, s2 in [(6, 14), (7, 7), (1, 1), (12345, 999888777),
                      (3, 9), (10**6, 10**13)]:
        got = con.execute(
            f"SELECT CAST((2 * (10000 * (CAST({s2} AS HUGEINT) - {total})"
            f" * 1000000000) + CAST({total} AS HUGEINT) * {total})"
            f" // (2 * CAST({total} AS HUGEINT) * {total}) AS BIGINT)"
        ).fetchone()[0]
        assert got == _div_nano(10**4 * (s2 - total), total * total), \
            (total, s2)


def _hw_reference(cnts, alpha=0.5, beta=0.3, gamma=0.3, period=7):
    """Independently-structured Holt-Winters fold: seasonal state kept as
    a rotating list (pop/append) instead of modular indexing."""
    if len(cnts) < 2 * period:
        return 0, 0, 0
    m0 = sum(float(c) for c in cnts[:period]) / period
    m1 = sum(float(c) for c in cnts[period:2 * period]) / period
    lv, b = m0, (m1 - m0) / period
    ring = [float(c) - m0 for c in cnts[:period]]  # ring[0] == s_{t mod p}
    for x in cnts[period:]:
        s_old = ring.pop(0)
        prev = lv
        lv = alpha * (float(x) - s_old) + (1.0 - alpha) * (lv + b)
        b = beta * (lv - prev) + (1.0 - beta) * b
        ring.append(gamma * (float(x) - lv) + (1.0 - gamma) * s_old)

    def q(v):
        vn = v * 1e9
        return int(math.floor(vn + 0.5)) if vn >= 0 \
            else -int(math.floor(-vn + 0.5))

    return q(lv), q(b), q(lv + b + ring[0])


@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=0, max_size=60))
@settings(max_examples=200, deadline=None)
def test_holtwinters_matches_rotating_ring_fold(cnts):
    assert _holtwinters_nano(cnts) == _hw_reference(cnts)


def test_holtwinters_short_series_and_flat_seasonal():
    assert _holtwinters_nano(list(range(13))) == (0, 0, 0)
    # two exact seasons of a pure weekly pattern: seasonal absorbs the
    # cycle, trend stays 0, level stays at the season mean
    pat = [10, 20, 30, 40, 30, 20, 10]
    lv, b, f = _holtwinters_nano(pat + pat)
    mean = sum(pat) / 7
    assert b == 0
    assert lv == round(mean * 1e9)
    # forecast = level + 0 + s_{14 mod 7 = 0}; after one update of s_0
    # with x == the seasonal value the state is unchanged: s_0 = pat[0]-mean
    assert f == round((mean + (pat[0] - mean)) * 1e9)


def test_butterfly_formula_identity():
    # urls U1{a,b,c} U2{a,b} U3{a,b} U4{c}:
    # pairs: (a,b)->3, (a,c)->1, (b,c)->1
    # wedges = 5, butterflies = C(3,2) = 3, edges = 3+2+2+1 = 8
    from collections import Counter
    from itertools import combinations

    urls = {"U1": {"a", "b", "c"}, "U2": {"a", "b"}, "U3": {"a", "b"},
            "U4": {"c"}}
    pair_c = Counter(p for qs in urls.values()
                     for p in combinations(sorted(qs), 2))
    n_edges = sum(len(q) for q in urls.values())
    n_wedges = sum(pair_c.values())
    butterflies = sum(c * (c - 1) // 2 for c in pair_c.values())
    assert (n_edges, len(pair_c), n_wedges, butterflies) == (8, 3, 5, 3)
