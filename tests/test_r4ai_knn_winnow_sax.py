"""Winnowing guarantees (density, rightmost tie, shared-substring),
SAX kernel hand math, kNN tie-break vs brute force."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import (_SAX_SEG, _WIN_K, _WIN_P,
                                                   _WIN_POWS, _WIN_W,
                                                   _sax_nano)


def _winnow(text: str):
    """Reference winnowing: returns (n_kgrams, selected {pos: hash})."""
    codes = [ord(c) for c in text]
    nk = max(len(codes) - _WIN_K + 1, 0)
    h = [sum(codes[p + i] * _WIN_POWS[i] for i in range(_WIN_K)) % _WIN_P
         for p in range(nk)]
    sel = {}
    for ws in range(nk - _WIN_W + 1):
        best = min(range(ws, ws + _WIN_W),
                   key=lambda p: (h[p], -p))  # tie -> rightmost
        sel[best] = h[best]
    return nk, sel


@given(st.text(alphabet="abcd", min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_winnowing_density_guarantee(text):
    nk, sel = _winnow(text)
    if nk < _WIN_W:
        assert sel == {}
        return
    # every window of W consecutive k-grams contains a fingerprint
    pos = sorted(sel)
    for ws in range(nk - _WIN_W + 1):
        assert any(ws <= p < ws + _WIN_W for p in pos), (text, ws)


@given(st.text(alphabet="ab", min_size=20, max_size=60),
       st.text(alphabet="cd", min_size=0, max_size=20),
       st.text(alphabet="cd", min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_winnowing_shared_substring_shares_fingerprint(core, pre, suf):
    # core is >= k+w-1 chars and appears verbatim in both texts
    assert len(core) >= _WIN_K + _WIN_W - 1
    _, s1 = _winnow(pre + core + suf)
    _, s2 = _winnow(core)
    assert set(s1.values()) & set(s2.values()), (pre, core, suf)


def test_winnowing_rightmost_tie():
    # identical k-grams tie on hash; rightmost position must win
    text = "abcdefgh" * 3  # every 8th k-gram identical
    _, sel = _winnow(text)
    nk = len(text) - _WIN_K + 1
    assert sel  # and spot-check the first window's rightmost-min rule
    h = [sum(ord(text[p + i]) * _WIN_POWS[i] for i in range(_WIN_K)) % _WIN_P
         for p in range(nk)]
    w0 = min(range(0, _WIN_W), key=lambda p: (h[p], -p))
    ties = [p for p in range(0, _WIN_W) if h[p] == h[w0]]
    assert w0 == max(ties)


def test_sax_kernel_hand_math():
    # 14 identical days: std == 0 -> z == 0 -> symbol 2, paa_nano 0
    assert _sax_nano([5] * (2 * _SAX_SEG)) == [(0, 0, 2), (1, 0, 2)]
    # fewer than one segment -> empty
    assert _sax_nano([1, 2, 3]) == []
    # one low week + one high week: z = ±1 exactly (two-point series)
    lo, hi = [0] * _SAX_SEG, [2] * _SAX_SEG
    segs = _sax_nano(lo + hi)
    assert [s for s, _, _ in segs] == [0, 1]
    assert [p for _, p, _ in segs] == [-10**9, 10**9]
    assert [y for _, _, y in segs] == [0, 3]


def test_knn_lexsort_tiebreak_matches_brute():
    rng = np.random.default_rng(7)
    mat = rng.integers(0, 3, size=(12, 4)).astype(np.int64)  # many ties
    ids = np.arange(12, dtype=np.int64)
    for r in range(len(mat)):
        d2 = ((mat - mat[r]) ** 2).sum(axis=1)
        mask = ids != r
        cd, ci = d2[mask], ids[mask]
        sel = np.lexsort((ci, cd))[:3]
        got = [(int(cd[s]), int(ci[s])) for s in sel]
        want = sorted(zip(cd.tolist(), ci.tolist()))[:3]
        assert got == want
