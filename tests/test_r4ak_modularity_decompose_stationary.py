"""Modularity rational identity, seasonal-decomposition kernel hand math,
stationary-distribution kernel invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import (_decompose12_nano,
                                                   _div_nano,
                                                   _stationary_nano)


def test_modularity_extremes():
    # all edges intra-community, one community: Q = w_in/m - 1 = 0
    m, w_in, dc2 = 10, 10, (2 * 10) ** 2
    assert _div_nano(4 * m * w_in - dc2, 4 * m * m) == 0
    # perfect two-community split, equal degree: Q = 1/2 - 2*(1/2)^2... hand:
    # two communities, each with w_in half of m, no inter edges:
    # d_c = m each -> Q = 1 - 2*(m/2m)^2 = 1 - 1/2 = 1/2
    m, w_in = 10, 10
    dc2 = 2 * (m * m)  # two communities of degree m each (2m total degree)
    assert _div_nano(4 * m * w_in - dc2, 4 * m * m) == 500_000_000
    # all edges inter-community between two equal-degree communities:
    # Q = 0 - 1/2 = -1/2 (negative numerator path)
    m, w_in = 10, 0
    dc2 = 2 * (m * m)
    assert _div_nano(4 * m * w_in - dc2, 4 * m * m) == -500_000_000


def test_decompose_kernel_hand_math():
    # pure 12-cycle repeated 3x: trend is exactly the series mean,
    # seasonal indices recover the centered pattern
    pat = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    series = [((i % 12) + 1, pat[i % 12]) for i in range(36)]
    segs = _decompose12_nano(series)
    assert [m for m, _, _ in segs] == list(range(1, 13))
    mean = sum(pat) / 12
    for moy, n_obs, s_nano in segs:
        assert n_obs >= 1
        want = pat[moy - 1] - mean
        assert abs(s_nano - round(want * 1e9)) <= 2, (moy, s_nano, want)
    # short series -> empty
    assert _decompose12_nano(series[:12]) == []


@given(st.dictionaries(
    st.tuples(st.sampled_from("abcd"), st.sampled_from("abcd")),
    st.integers(min_value=1, max_value=100), min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_stationary_is_distribution_and_fixed_point(pairs):
    pis = _stationary_nano(pairs)
    states = [s for s, _ in pis]
    assert states == sorted({x for p in pairs for x in p})
    total = sum(p for _, p in pis)
    assert abs(total - 10**9) <= len(states)  # rounding slack
    assert all(p >= 0 for _, p in pis)


def test_stationary_two_state_hand_math():
    # a->b always, b->a always: pi = (1/2, 1/2)
    pis = dict(_stationary_nano({("a", "b"): 5, ("b", "a"): 5}))
    assert pis == {"a": 500_000_000, "b": 500_000_000}
    # a->a only plus b->a: absorbing a
    pis = dict(_stationary_nano({("a", "a"): 3, ("b", "a"): 1}))
    assert pis["a"] > 900_000_000
