"""Hill kernel vs closed form on exact Pareto data; stickiness bounds."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import (_HILL_K, _div_nano,
                                                   _hill_nano)


def test_hill_on_exact_pareto_grid():
    # x_(i) = C * (i)^(-1/alpha): Hill over the grid recovers ~1/alpha
    alpha = 2.0
    xs = [100.0 * (i + 1) ** (-1.0 / alpha) for i in range(_HILL_K + 1)]
    k, h, a = _hill_nano(xs)
    assert k == _HILL_K
    # H estimates 1/alpha = 0.5; grid (not random) -> small bias, wide box
    assert 0.35e9 < h < 0.65e9
    assert 1.5e9 < a < 3.0e9


def test_hill_degenerate_inputs():
    assert _hill_nano([]) == (0, 0, 0)
    assert _hill_nano([5.0]) == (0, 0, 0)
    # constant sample: all ratios 1 -> H = 0, alpha undefined -> 0
    k, h, a = _hill_nano([3.0] * 10)
    assert (k, h, a) == (9, 0, 0)


@given(st.lists(st.floats(min_value=0.1, max_value=1e6,
                          allow_nan=False), min_size=2, max_size=80))
@settings(max_examples=100, deadline=None)
def test_hill_invariant_under_scale(xs):
    xs = sorted(xs, reverse=True)
    k1, h1, a1 = _hill_nano(xs)
    scaled = [x * 7.0 for x in xs]
    k2, h2, a2 = _hill_nano(scaled)
    assert k1 == k2
    # Hill is exactly scale-free: log(c·x / c·y) == log(x/y) up to fp
    assert abs(h1 - h2) <= 2


def test_stickiness_bounds():
    # DAU sum over n days can't exceed n_days * MAU -> ratio <= 1
    n_days, mau, dau_sum = 30, 100, 30 * 100
    assert _div_nano(dau_sum, n_days * mau) == 10**9
    assert _div_nano(30, 30 * 100) == _div_nano(1, 100)
