"""merge_join correctness vs hash_join / reference; grouping-sets fold."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

import newsagency_classification_ray.ops as ops


def _ref_inner(ldf: pd.DataFrame, rdf: pd.DataFrame, on, ron) -> pd.DataFrame:
    m = ldf.merge(rdf, left_on=on, right_on=ron, how="inner")
    return m.sort_values(list(m.columns)).reset_index(drop=True)


def test_merge_join_matches_pandas_small():
    ldf = pd.DataFrame({"k": [1, 2, 2, 5, 9], "lv": list("abcde")})
    rdf = pd.DataFrame({"k2": [2, 2, 5, 7], "rv": [10, 20, 30, 40]})
    out = ops.merge_join(ray.data.from_pandas(ldf), ray.data.from_pandas(rdf),
                         on="k", right_on="k2", num_partitions=3,
                         num_buckets=8).to_pandas()
    ref = _ref_inner(ldf, rdf, "k", "k2")
    out = out.sort_values(list(out.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[sorted(out.columns)],
                                  ref[sorted(ref.columns)],
                                  check_dtype=False)


def test_merge_join_empty_sides():
    ldf = pd.DataFrame({"k": pd.array([], dtype="int64"),
                        "lv": pd.array([], dtype="string")})
    rdf = pd.DataFrame({"k": [1, 2], "rv": [5, 6]})
    out = ops.merge_join(ray.data.from_pandas(ldf),
                         ray.data.from_pandas(rdf), on="k")
    # Ray to_pandas() drops columns on fully-empty datasets; the schema
    # is the contract here
    assert out.count() == 0
    assert sorted(out.schema().names) == ["k", "lv", "rv"]


def test_merge_join_rejects_column_overlap():
    a = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    b = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": [3]}))
    try:
        ops.merge_join(a, b, on="k")
        assert False, "expected ValueError"
    except ValueError as e:
        assert "overlapping" in str(e)


@given(st.lists(st.tuples(st.integers(-50, 50), st.integers(0, 9)),
                min_size=0, max_size=120),
       st.lists(st.tuples(st.integers(-50, 50), st.integers(0, 9)),
                min_size=1, max_size=120),
       st.integers(1, 6))
@settings(max_examples=20, deadline=None)
def test_merge_join_property_vs_pandas(lrows, rrows, parts):
    ldf = pd.DataFrame({"k": [r[0] for r in lrows],
                        "lv": [r[1] for r in lrows]})
    rdf = pd.DataFrame({"rk": [r[0] for r in rrows],
                        "rv": [r[1] for r in rrows]})
    if len(ldf) == 0:
        ldf = ldf.astype({"k": "int64", "lv": "int64"})
    out = ops.merge_join(ray.data.from_pandas(ldf),
                         ray.data.from_pandas(rdf), on="k", right_on="rk",
                         num_partitions=parts, num_buckets=16).to_pandas()
    ref = _ref_inner(ldf, rdf, "k", "rk")
    if len(ref) == 0:
        # Ray to_pandas() drops columns on fully-empty datasets
        assert len(out) == 0
        return
    out = out[sorted(out.columns)].sort_values(
        sorted(out.columns)).reset_index(drop=True)
    ref = ref[sorted(ref.columns)].sort_values(
        sorted(ref.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_merge_join_output_is_range_clustered():
    """The op's reason to exist: rows of partition p all have keys below
    every key of partition p+1 (clustered output ranges)."""
    rng = np.random.RandomState(0)
    keys = rng.randint(0, 1000, 500)
    ldf = pd.DataFrame({"k": keys, "lv": np.arange(500)})
    rdf = pd.DataFrame({"rk": rng.randint(0, 1000, 300),
                        "rv": np.arange(300)})
    ds = ops.merge_join(ray.data.from_pandas(ldf),
                        ray.data.from_pandas(rdf), on="k", right_on="rk",
                        num_partitions=4, num_buckets=64)
    ranges = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if len(b):
            k = b["k"].to_numpy(zero_copy_only=False)
            ranges.append((k.min(), k.max()))
    ranges.sort()
    for (alo, ahi), (blo, bhi) in zip(ranges, ranges[1:]):
        assert ahi <= blo or (alo, ahi) == (blo, bhi) or ahi < bhi


def test_grouping_sets_fold_consistency():
    import newsagency_classification_ray.queries as Q

    t = Q.QUERIES["lineitem_grouping_sets"](
        "/root/testdata/sf0.001").to_pandas()
    total = t[t.grouping_id == 3]
    assert len(total) == 1
    fine = t[t.grouping_id == 0]
    assert fine.n.sum() == total.n.iloc[0]
    assert fine.qty_sum.sum() == total.qty_sum.iloc[0]
    by_flag = t[t.grouping_id == 1]  # flag kept, status grouped away
    assert by_flag.n.sum() == total.n.iloc[0]
    assert set(by_flag.l_returnflag) == set(fine.l_returnflag)
    assert by_flag.l_linestatus.isna().all()


def test_markup_yield_bounds():
    import newsagency_classification_ray.queries as Q

    t = Q.QUERIES["pages_markup_yield"]("/root/testdata/sf0.001").to_pylist()
    assert {r["lang"] for r in t} == {"fr", "de", "en", "lb"}
    for r in t:
        assert 0 < r["yield_nano"] < 10**9  # markup always costs something
        assert r["text_chars"] < r["html_chars"]
