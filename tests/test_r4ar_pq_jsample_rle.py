"""PQ kernel invariants, correlated join sampling, distributed RLE runs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

import newsagency_classification_ray.ops as ops
import newsagency_classification_ray.stages.similarity as sim


def test_subspace_bounds_cover_dim():
    for dim, m in [(64, 8), (64, 4), (60, 8), (7, 3)]:
        b = sim._subspace_bounds(dim, m)
        assert b[0][0] == 0 and b[-1][1] == dim
        assert all(x[1] == y[0] for x, y in zip(b, b[1:]))


def test_pq_encode_exact_codeword_roundtrip():
    # vectors that ARE codewords encode to themselves with adist 0
    rng = np.random.RandomState(3)
    cb = np.round(rng.randn(4, 8, 4), 6)   # m_sub=4, k=8, d_sub=4
    bounds = sim._subspace_bounds(16, 4)
    m = np.concatenate([cb[s][[2, 5, 0]] for s in range(4)], axis=1)
    codes = sim.pq_encode_codes(m, cb, bounds)
    assert codes.tolist() == [[2] * 4, [5] * 4, [0] * 4]
    lut = sim._pq_lut_micro(m, cb, bounds)
    for i in range(3):
        ad = lut[i, np.arange(4), codes[i]].sum()
        assert ad == 0


@given(st.integers(0, 2**31 - 1), st.integers(1, 8))
@settings(max_examples=50, deadline=None)
def test_pq_lut_micro_is_integer_and_nonneg(seed, m_sub):
    rng = np.random.RandomState(seed % 10000)
    dim = 8 * m_sub
    cb = np.round(rng.randn(m_sub, 4, 8), 6)
    q = rng.randn(2, dim)
    lut = sim._pq_lut_micro(q, cb, sim._subspace_bounds(dim, m_sub))
    assert lut.dtype == np.int64
    assert (lut >= 0).all()


def test_rle_run_stats_vs_reference():
    # keys with known runs per part, including a bucket boundary at 2^4
    rows = {
        "p": ["a"] * 7 + ["b"] * 4,
        "k": [1, 2, 3, 10, 14, 15, 16, 5, 6, 100, 102],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = {r["p"]: (r["n"], r["n_runs"]) for r in
           ops.rle_run_stats(ds, "p", "k", bucket_bits=4).take_all()}
    # a: runs {1,2,3}, {10}, {14,15,16} -> 3 (16 crosses the 2^4 boundary)
    # b: {5,6}, {100}, {102} -> 3
    assert out == {"a": (7, 3), "b": (4, 3)}


def test_rle_run_stats_duplicate_keys_count_rows_not_runs():
    rows = {"p": ["x"] * 5, "k": [7, 7, 8, 9, 20]}
    ds = ray.data.from_arrow(pa.table(rows))
    out = ops.rle_run_stats(ds, "p", "k", bucket_bits=3).take_all()
    r = out[0]
    assert (r["n"], r["n_runs"]) == (5, 2)


@given(st.lists(st.integers(0, 200), min_size=1, max_size=80),
       st.integers(2, 8))
@settings(max_examples=25, deadline=None)
def test_rle_run_stats_property_vs_sorted_scan(keys, bits):
    ds = ray.data.from_arrow(pa.table({"p": ["g"] * len(keys), "k": keys}))
    out = ops.rle_run_stats(ds, "p", "k", bucket_bits=bits).take_all()[0]
    uniq = sorted(set(keys))
    runs = 1 + sum(1 for a, b in zip(uniq, uniq[1:]) if b != a + 1)
    assert out["n"] == len(keys)
    assert out["n_runs"] == runs


def test_join_sample_estimator_unbiasedness_shape():
    """Correlated sampling keeps whole key-groups: sample_pairs must be
    exactly the pairs whose key hashes below the threshold, so est is a
    deterministic function, not a random variable."""
    import duckdb

    import newsagency_classification_ray.queries as Q

    r = Q.QUERIES["orders_join_sample_est"](
        "/root/testdata/sf0.001").to_pylist()[0]
    assert r["est_pairs"] == r["sample_pairs"] * 16
    assert r["exact_pairs"] == duckdb.connect().execute(
        "SELECT count(*) FROM "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet') l JOIN "
        "read_parquet('/root/testdata/sf0.001/orders.parquet') o "
        "ON l.l_orderkey = o.o_orderkey").fetchone()[0]
    # 1/16 correlated sampling on ~1.5k keys: estimate within 50%
    assert abs(r["est_pairs"] - r["exact_pairs"]) / r["exact_pairs"] < 0.5


def test_pq_recall_query_contract():
    import newsagency_classification_ray.queries as Q

    t = Q.QUERIES["embeddings_pq_recall"]("/root/testdata/sf0.001") \
        .to_pylist()
    assert len(t) == 8
    for r in t:
        assert 0 <= r["n_hits"] <= 10
        assert r["recall_nano"] == r["n_hits"] * 10**8
