"""Vectorized-vs-scalar Wilson bit identity, sentence-dedup share math,
coverage density rational."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import (_WILSON_Z, _div_nano,
                                                   _wilson_lo_nano)


def _wilson_vec(k: np.ndarray, n: np.ndarray) -> np.ndarray:
    """The query's numpy kernel, op-for-op."""
    k = k.astype(np.float64)
    n = n.astype(np.float64)
    z = _WILSON_Z
    z2 = z * z
    p = k / n
    denom = 1.0 + z2 / n
    center = p + z2 / (2.0 * n)
    rad = z * np.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)
    lo = (center - rad) / denom
    return np.floor(lo * 1e9 + 0.5).astype(np.int64)


@given(st.lists(st.tuples(st.integers(min_value=0, max_value=500),
                          st.integers(min_value=1, max_value=500)),
                min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_vectorized_wilson_bit_identical_to_scalar(pairs):
    pairs = [(min(k, n), n) for k, n in pairs]
    k = np.array([a for a, _ in pairs], np.int64)
    n = np.array([b for _, b in pairs], np.int64)
    got = _wilson_vec(k, n)
    want = np.array([_wilson_lo_nano(a, b) for a, b in pairs], np.int64)
    assert (got == want).all()


def test_sentence_dup_share_math():
    # 3 sentences, 2 duplicated occurrences -> share 2/3
    assert _div_nano(2, 3) == 666666667
    assert _div_nano(0, 5) == 0


def test_coverage_density_rational():
    # 3 hosts x 4 years, 9 cells present -> 9/12 = 0.75
    assert _div_nano(9, 12) == 750_000_000
