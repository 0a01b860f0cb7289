"""Edge semantics for the rank-analytics + direction-asof batch:
forward/nearest as-of tie rules, row_number uniqueness guards, SQL NTILE
integer math, and the distinct-value rank statistics."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest
import ray

from newsagency_classification_ray import ops


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2020, 1, 1) + dt.timedelta(seconds=s)


def _asof(left_rows, right_rows, direction):
    lds = ray.data.from_items(
        [{"k": k, "lts": _ts(s), "lid": i}
         for i, (k, s) in enumerate(left_rows)]).repartition(2)
    rds = ray.data.from_items(
        [{"k": k, "rts": _ts(s), "rid": i}
         for i, (k, s) in enumerate(right_rows)]).repartition(2)
    out = ops.asof_join(lds, rds, left_key="k", right_key="k",
                        left_ts="lts", right_ts="rts",
                        right_cols=["rid"], direction=direction).take_all()
    return {r["lid"]: r["rid"] for r in out}


def test_asof_forward_picks_earliest_ge_max_tie(ray_session):
    # right ts 10 appears twice (rid 0, 1): forward from 5 must take the
    # EARLIEST ts >= 5 and break the ts tie to the GREATEST rid
    got = _asof([(1, 5)], [(1, 10), (1, 10), (1, 20), (1, 3)], "forward")
    assert got == {0: 1}


def test_asof_forward_unmatched_when_all_earlier(ray_session):
    assert _asof([(1, 50)], [(1, 10), (1, 20)], "forward") == {0: None}


def test_asof_nearest_tie_prefers_backward(ray_session):
    # left at 10: backward candidate at 7 (d=3), forward at 13 (d=3) — the
    # exact tie goes to the backward side
    assert _asof([(1, 10)], [(1, 7), (1, 13)], "nearest") == {0: 0}
    # asymmetric distances pick the nearer side regardless of direction
    assert _asof([(1, 10)], [(1, 4), (1, 12)], "nearest") == {0: 1}


def test_asof_nearest_one_sided_groups(ray_session):
    assert _asof([(1, 1)], [(1, 10)], "nearest") == {0: 0}   # forward only
    assert _asof([(1, 99)], [(1, 10)], "nearest") == {0: 0}  # backward only


def test_asof_bucketed_non_backward_raises(ray_session):
    lds = ray.data.from_items([{"k": 1, "lts": _ts(1), "lid": 0}])
    rds = ray.data.from_items([{"k": 1, "rts": _ts(1), "rid": 0}])
    with pytest.raises(ValueError, match="backward-only"):
        ops.asof_join(lds, rds, left_key="k", right_key="k",
                      left_ts="lts", right_ts="rts", right_cols=["rid"],
                      direction="forward", bucket_us=1_000_000)


def test_row_number_by_matches_global_order(ray_session):
    rng = np.random.RandomState(7)
    vals = rng.permutation(100)
    ds = ray.data.from_items(
        [{"v": float(v % 10), "id": int(v)} for v in vals]).repartition(5)
    out = ops.row_number_by(ds, ["v", "id"]).take_all()
    out.sort(key=lambda r: (r["v"], r["id"]))
    assert [r["rn"] for r in out] == list(range(1, 101))


def test_row_number_by_duplicate_key_raises(ray_session):
    ds = ray.data.from_items([{"v": 1.0, "id": 3}] * 4).repartition(2)
    # the in-block guard raises inside a Ray task -> RayTaskError wrapper
    with pytest.raises(Exception, match="unique sort keys"):
        ops.row_number_by(ds, ["v", "id"]).materialize()


def test_ntile_from_rn_matches_duckdb():
    import duckdb

    for n, k in [(20, 5), (7, 3), (3, 5), (1, 1), (10, 4), (13, 6)]:
        got = ops.ntile_from_rn(np.arange(1, n + 1), n, k).tolist()
        exp = [r[0] for r in duckdb.sql(
            f"SELECT ntile({k}) OVER (ORDER BY i) "
            f"FROM range(1, {n + 1}) t(i)").fetchall()]
        assert got == exp, (n, k)


def test_value_rank_counts_ties_and_prefix(ray_session):
    ds = ray.data.from_items(
        [{"x": float(v)} for v in [3, 1, 1, 2, 5, 5, 5]]).repartition(3)
    rows = ops.value_rank_counts(ds, "x").take_all()
    rows.sort(key=lambda r: r["x"])
    assert [(r["x"], r["_cnt"], r["_lt"], r["_le"]) for r in rows] == [
        (1.0, 2, 0, 2), (2.0, 1, 2, 3), (3.0, 1, 3, 4), (5.0, 3, 4, 7)]


def test_row_number_by_timestamp_composite_key(ray_session):
    import datetime as dt

    base = dt.datetime(2022, 5, 1)
    # duplicate timestamps across blocks; event id breaks the tie
    items = [{"ts": base + dt.timedelta(seconds=s), "id": i}
             for i, s in enumerate([3, 1, 1, 2, 3, 1])]
    ds = ray.data.from_items(items).repartition(3)
    out = ops.row_number_by(ds, ["ts", "id"]).take_all()
    out.sort(key=lambda r: (r["ts"], r["id"]))
    assert [r["rn"] for r in out] == [1, 2, 3, 4, 5, 6]
    assert [r["id"] for r in out] == [1, 2, 5, 3, 0, 4]
