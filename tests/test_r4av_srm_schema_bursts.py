"""SRM exactness, schema audit vs pyarrow, Kleinberg burst properties."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.queries import (_SRM_CRIT_NANO, _div_nano,
                                                   _kleinberg_states)

SF = "/root/testdata/sf0.001"


def test_srm_chi2_two_arm_identity():
    # chi2 gof with E=n/2 per arm collapses to (a-b)^2/n
    for a, b in [(50, 50), (60, 40), (505, 495)]:
        chi2 = _div_nano((a - b) ** 2, a + b)
        # float reference: sum (O-E)^2/E
        e = (a + b) / 2
        ref = (a - e) ** 2 / e + (b - e) ** 2 / e
        assert abs(chi2 / 1e9 - ref) < 1e-6


def test_srm_query_contract():
    t = Q.QUERIES["events_ab_srm"](SF).to_pylist()[0]
    assert t["n_users_a"] + t["n_users_b"] == 15
    assert t["n_events_a"] + t["n_events_b"] == 1000
    assert t["srm_flag"] in (0, 1)
    assert t["srm_flag"] == (1 if t["srm_chi2_nano"] > _SRM_CRIT_NANO else 0)


def test_schema_audit_matches_pyarrow():
    import pyarrow.parquet as pq

    t = {r["col_name"]: r for r in
         Q.QUERIES["orders_schema_audit"](SF).take_all()}
    md = pq.ParquetFile(f"{SF}/orders.parquet").metadata
    assert set(t) == {md.row_group(0).column(i).path_in_schema
                      for i in range(md.row_group(0).num_columns)}
    for r in t.values():
        assert r["compressed_bytes"] > 0
        assert r["null_count"] == 0  # synthetic tables carry no nulls


def test_kleinberg_flat_series_never_bursts():
    assert _kleinberg_states([10] * 50) == [0] * 50
    assert _kleinberg_states([]) == []
    assert _kleinberg_states([0, 0, 0]) == [0, 0, 0]


def test_kleinberg_detects_planted_burst():
    xs = [10] * 20 + [30] * 10 + [10] * 20
    st_ = _kleinberg_states(xs)
    assert st_[25] == 1                 # mid-burst flagged
    assert st_[5] == 0 and st_[45] == 0  # flanks stay base
    # burst region dominated by state 1
    assert sum(st_[20:30]) >= 8


@given(st.lists(st.integers(0, 100), min_size=1, max_size=60))
@settings(max_examples=50, deadline=None)
def test_kleinberg_total_length_and_binary(xs):
    st_ = _kleinberg_states(xs)
    assert len(st_) == len(xs)
    assert set(st_) <= {0, 1}
