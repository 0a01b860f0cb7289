"""KMV bottom-k sketch kernels + politeness burst flag invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import (_I63, _KMV_A, _KMV_B,
                                                   _KMV_K, _U64, _kmv_est,
                                                   _kmv_keys_signed)


def test_kmv_hash_is_bijective_shift():
    # signed storage is exactly h - 2^63 (order-preserving shift)
    user = np.array([0, 1, 5, 1500], np.int64)
    day = np.array([0, 1, 19000, 25000], np.int64)
    s = _kmv_keys_signed(user, day)
    key = (user << 20) + day
    for k, sv in zip(key.tolist(), s.tolist()):
        h = (k * _KMV_A + _KMV_B) % _U64
        assert sv == h - _I63


@given(st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 30000)),
                min_size=1, max_size=300, unique=True))
@settings(max_examples=50, deadline=None)
def test_kmv_hash_injective_on_distinct_keys(pairs):
    user = np.array([p[0] for p in pairs], np.int64)
    day = np.array([p[1] for p in pairs], np.int64)
    s = _kmv_keys_signed(user, day)
    # odd multiplier => bijection on u64 => distinct keys, distinct hashes
    assert len(set(s.tolist())) == len(pairs)


def test_kmv_est_exact_regime():
    assert _kmv_est(37, None) == 37


def test_kmv_est_uniform_grid_recovers_n():
    # kth smallest of n evenly spaced hashes at h_k = k/n * 2^64
    for n in (100, 1000, 10_000):
        kth_signed = (_KMV_K * _U64 // n) - _I63
        est = _kmv_est(n, kth_signed)
        assert abs(est - n) / n < 0.05  # grid: only floor error


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_kmv_est_bounds(kth_signed):
    est = _kmv_est(123, kth_signed)
    assert est >= _KMV_K - 1  # h <= 2^64 => est >= k-1
    assert est >= 0


def test_burst_flag_boundary():
    # peak*hours > 2*total <=> bursty; exact integer boundary
    from newsagency_classification_ray.queries import _BURST_FACTOR
    assert _BURST_FACTOR == 2
    # peak=4, hours=2, total=4 -> 8 > 8 false (exactly 2x mean is NOT bursty)
    assert not (4 * 2 > 2 * 4)
    assert 5 * 2 > 2 * 4


def test_kmv_queries_match_duckdb_sf0001():
    """End-to-end: all three new queries hash-match their oracles at
    sf0.001 (the per-batch dedicated check; tests/test_oracles.py also
    sweeps them as part of the full registry)."""
    import duckdb
    import pandas as pd

    import newsagency_classification_ray.queries as Q

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for name in ["events"]:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{sf}/{name}.parquet')")
    old = Q._SF001
    Q._SF001 = sf
    try:
        oracle = {
            "pages_host_politeness": Q.O_PAGES_HOST_POLITENESS(sf),
            "events_kmv_distinct": Q.O_EVENTS_KMV_DISTINCT(),
            "events_kmv_setops": Q.O_EVENTS_KMV_SETOPS(),
        }
    finally:
        Q._SF001 = old

    for name, sql in oracle.items():
        ours = Q.QUERIES[name](sf).to_pandas()
        theirs = con.execute(sql).df()
        ours = ours[sorted(ours.columns)].sort_values(
            list(sorted(ours.columns))).reset_index(drop=True)
        theirs = theirs[sorted(theirs.columns)].sort_values(
            list(sorted(theirs.columns))).reset_index(drop=True)
        pd.testing.assert_frame_equal(ours, theirs, check_dtype=False), name


def test_kmv_estimator_is_live_at_sf0001():
    """The sketch regime (not the exact fallback) must actually be
    exercised at test scale: distinct (user, day) per type > k."""
    import duckdb

    n = duckdb.connect().execute(
        "SELECT min(cnt) FROM (SELECT event_type, "
        "count(DISTINCT user_id * 1048576 + CAST(CAST(ts AS DATE) - "
        "DATE '1970-01-01' AS BIGINT)) AS cnt "
        "FROM read_parquet('/root/testdata/sf0.001/events.parquet') "
        "GROUP BY 1) t").fetchone()[0]
    assert n > _KMV_K
