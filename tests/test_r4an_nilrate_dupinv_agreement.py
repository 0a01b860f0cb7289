"""Dup-invoice sweep vs brute-force pair filter; NIL-share integer
division; extraction-agreement invariant on the synthetic corpus."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import (_DUPINV_BAND,
                                                   _DUPINV_DAYS)


def _sweep(rows):
    """The query's within-customer sweep (day, key, cents sorted)."""
    day = np.array([d for d, _, _ in rows], np.int64)
    key = np.array([k for _, k, _ in rows], np.int64)
    ct = np.array([c for _, _, c in rows], np.int64)
    order = np.lexsort((key, day))
    day, key, ct = day[order], key[order], ct[order]
    out = []
    for i in range(len(day)):
        j = i + 1
        while j < len(day) and day[j] - day[i] <= _DUPINV_DAYS:
            if (abs(int(ct[i]) - int(ct[j])) * _DUPINV_BAND
                    <= min(int(ct[i]), int(ct[j]))):
                out.append((int(key[i]), int(key[j]),
                            int(day[j] - day[i])))
            j += 1
    return sorted(out)


def _brute(rows):
    """SQL-style pair filter: (a < b) in (day, key) order."""
    out = []
    for da, ka, ca in rows:
        for db, kb, cb in rows:
            if ka == kb:
                continue
            if not (da < db or (da == db and ka < kb)):
                continue
            if db - da > _DUPINV_DAYS:
                continue
            if abs(ca - cb) * _DUPINV_BAND > min(ca, cb):
                continue
            out.append((ka, kb, db - da))
    return sorted(out)


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=12),
                          st.integers(min_value=1, max_value=30),
                          st.integers(min_value=100, max_value=300)),
                min_size=0, max_size=14,
                unique_by=lambda r: r[1]))
@settings(max_examples=300, deadline=None)
def test_sweep_matches_brute_pair_filter(rows):
    assert _sweep(rows) == _brute(rows)


def test_band_fence_exact():
    # exactly 10%: |110-100|*10 == 100 -> kept; just over: dropped
    assert _sweep([(0, 1, 1000), (1, 2, 1100)]) == [(1, 2, 1)]
    assert _sweep([(0, 1, 1000), (1, 2, 1101)]) == []
    # day fence: gap 3 kept, 4 dropped
    assert _sweep([(0, 1, 100), (3, 2, 100)]) == [(1, 2, 3)]
    assert _sweep([(0, 1, 100), (4, 2, 100)]) == []


def test_extraction_agreement_is_total_on_synthetic_corpus(ray_session):
    """Every both-bearing page must byte-agree — the north-star invariant
    surfaced as the query's expected fixed point on synthetic data."""
    from newsagency_classification_ray.queries import (
        q_pages_text_html_agreement)

    rows = q_pages_text_html_agreement("/root/testdata/sf0.001").take_all()
    assert rows
    for r in rows:
        assert r["n_agree"] == r["n_both"], r
        assert r["n_html"] >= r["n_both"]
