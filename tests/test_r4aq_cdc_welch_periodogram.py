"""Gear-CDC kernel invariants, Welch-t exactness, periodogram sanity."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import (_CDC_MAX, _CDC_MIN,
                                                   _cdc_chunk_rows, _cdc_cuts,
                                                   _periodogram_nano,
                                                   _welch_nano)


@given(st.binary(min_size=0, max_size=4000))
@settings(max_examples=100, deadline=None)
def test_cdc_cuts_partition_the_input(data):
    cuts = _cdc_cuts(data)
    if not data:
        assert cuts == []
        return
    assert cuts[-1] == len(data)
    assert all(b > a for a, b in zip(cuts, cuts[1:]))
    prev = 0
    for c in cuts:
        assert c - prev <= _CDC_MAX
        prev = c
    # every chunk except possibly the LAST respects the minimum
    prev = 0
    for c in cuts[:-1]:
        assert c - prev >= _CDC_MIN
        prev = c


def test_cdc_content_defined_shift_invariance():
    """The core CDC property: boundaries re-synchronize after an edit.
    Prefixing bytes shifts early cuts but the tail cut set re-aligns."""
    rng = np.random.RandomState(7)
    body = rng.randint(0, 256, 3000, dtype=np.uint8).tobytes()
    cuts_a = set(_cdc_cuts(body))
    prefix = b"XYZ-INSERTED-"
    cuts_b = {c - len(prefix) for c in _cdc_cuts(prefix + body)}
    # compare cut positions well past the window+max-length horizon
    tail_a = {c for c in cuts_a if c > 600}
    tail_b = {c for c in cuts_b if c > 600}
    inter = len(tail_a & tail_b)
    assert inter / max(len(tail_a), 1) > 0.8


def test_cdc_chunk_rows_roundtrip():
    rows = _cdc_chunk_rows("hello world " * 50)
    assert sum(nb for _, nb in rows) == len("hello world " * 50)
    assert _cdc_chunk_rows("") == []
    assert _cdc_chunk_rows(None) == []
    # identical text -> identical fingerprints
    assert rows == _cdc_chunk_rows("hello world " * 50)


def test_welch_exactness_vs_float():
    # groups with known stats: [1..10] vs [5..20]
    a = list(range(1, 11))
    b = list(range(5, 21))
    t2, df = _welch_nano(len(a), sum(a), sum(x * x for x in a),
                         len(b), sum(b), sum(x * x for x in b))
    # float reference
    import statistics

    va, vb = statistics.variance(a), statistics.variance(b)
    se2 = va / len(a) + vb / len(b)
    t2f = (statistics.mean(a) - statistics.mean(b)) ** 2 / se2
    dff = se2 ** 2 / ((va / len(a)) ** 2 / (len(a) - 1)
                      + (vb / len(b)) ** 2 / (len(b) - 1))
    assert abs(t2 / 1e9 - t2f) < 1e-6
    assert abs(df / 1e9 - dff) < 1e-6


def test_welch_degenerate():
    assert _welch_nano(1, 5, 25, 10, 50, 260) == (0, 0)
    # zero variance both sides
    assert _welch_nano(5, 10, 20, 5, 15, 45) == (0, 0)


@given(st.lists(st.integers(0, 1000), min_size=2, max_size=40),
       st.lists(st.integers(0, 1000), min_size=2, max_size=40))
@settings(max_examples=50, deadline=None)
def test_welch_symmetry(a, b):
    t2ab, dfab = _welch_nano(len(a), sum(a), sum(x * x for x in a),
                             len(b), sum(b), sum(x * x for x in b))
    t2ba, dfba = _welch_nano(len(b), sum(b), sum(x * x for x in b),
                             len(a), sum(a), sum(x * x for x in a))
    assert (t2ab, dfab) == (t2ba, dfba)  # t² and df are order-symmetric


def test_periodogram_finds_planted_period():
    xs = [100 + int(50 * math.sin(2 * math.pi * i / 7)) for i in range(84)]
    pw = dict(_periodogram_nano(xs))
    assert max(pw, key=pw.get) == 7
    # a real sinusoid's DFT power splits between +f and -f, so the
    # one-frequency normalized power tops out at 0.5
    assert pw[7] > 0.45e9
    assert pw[7] > 10 * max(v for p, v in pw.items() if p != 7)


def test_periodogram_flat_series():
    assert all(v == 0 for _, v in _periodogram_nano([5] * 50))
    assert all(v == 0 for _, v in _periodogram_nano([1, 2]))


def test_batch_queries_match_duckdb_sf0001():
    import duckdb
    import pandas as pd

    import newsagency_classification_ray.queries as Q

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    old = Q._SF001
    Q._SF001 = sf
    try:
        oracle = {
            "docs_cdc_chunks": Q.O_DOCS_CDC_CHUNKS(),
            "lineitem_welch": Q.O_LINEITEM_WELCH(),
            "events_periodogram": Q.O_EVENTS_PERIODOGRAM(),
        }
    finally:
        Q._SF001 = old
    for name, sql in oracle.items():
        ours = Q.QUERIES[name](sf).to_pandas()
        theirs = con.execute(sql).df()
        cols = sorted(ours.columns)
        a = ours[cols].sort_values(cols).reset_index(drop=True)
        b = theirs[sorted(theirs.columns)].sort_values(cols) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False), name


def test_cdc_dup_detection_is_live_at_sf0001():
    """The corpus genuinely contains shared ≥16-byte spans, so the dup
    counters must be non-zero (not a vacuously-agreeing zero metric)."""
    import newsagency_classification_ray.queries as Q

    t = Q.QUERIES["docs_cdc_chunks"]("/root/testdata/sf0.001").to_pylist()[0]
    assert t["n_chunks"] > t["n_distinct"] > 0
    assert t["dup_bytes"] > 0
    assert 0 < t["dup_ratio_nano"] < 10**9
