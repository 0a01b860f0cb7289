"""Wilson bound ordering/monotonicity, rich-club hand math, tier fences."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import (_div_nano, _freq_tier,
                                                   _wilson_lo_nano)


def test_wilson_small_sample_ordering():
    # the motivating property: 1/1 must NOT outrank 40/50
    assert _wilson_lo_nano(1, 1) < _wilson_lo_nano(40, 50)
    assert _wilson_lo_nano(0, 0) == 0
    # bounds live in [0, 1]
    for k, n in [(0, 10), (5, 10), (10, 10), (1, 1)]:
        assert 0 <= _wilson_lo_nano(k, n) <= 10**9


@given(st.integers(min_value=1, max_value=200))
@settings(max_examples=50, deadline=None)
def test_wilson_monotone_in_k(n):
    vals = [_wilson_lo_nano(k, n) for k in range(n + 1)]
    assert vals == sorted(vals)


def test_rich_club_hand_math():
    # K4 plus a pendant: deg = {a:4, b:3, c:3, d:3, e:1}
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("a", "e")]
    deg: dict = {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    assert deg == {"a": 4, "b": 3, "c": 3, "d": 3, "e": 1}
    # k=1: nodes deg>1 = {a,b,c,d}, edges within = 6 -> phi = 12/12 = 1
    nodes = [q for q, dg in deg.items() if dg > 1]
    ek = sum(1 for s, d in edges if deg[s] > 1 and deg[d] > 1)
    assert (len(nodes), ek) == (4, 6)
    assert _div_nano(2 * ek, len(nodes) * (len(nodes) - 1)) == 10**9
    # k=3: only a remains -> phi defined as 0 (fewer than 2 nodes)
    assert len([q for q, dg in deg.items() if dg > 3]) == 1


def test_freq_tier_fences():
    assert [_freq_tier(n) for n in [0, 1, 2, 3, 5, 6, 100]] == \
        [0, 1, 1, 2, 2, 3, 3]
