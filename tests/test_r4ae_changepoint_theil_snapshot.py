"""Changepoint argmax vs brute-force SSE minimization, Theil index vs
float formula, latest-snapshot rollup semantics."""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray.queries import (_theil_nano,
                                                   q_events_changepoint,
                                                   q_pages_latest_snapshot)


def _events_from_daily(days, cnts):
    rows_ts, rows_id = [], []
    eid = 0
    for d, c in zip(days, cnts):
        base = np.datetime64(int(d), "D").astype("datetime64[us]")
        for k in range(c):
            rows_ts.append(base + np.timedelta64(k, "s"))
            rows_id.append(eid)
            eid += 1
    return pa.table({"event_id": pa.array(rows_id, pa.int64()),
                     "ts": pa.array(rows_ts, pa.timestamp("us")),
                     "user_id": pa.array([0] * eid, pa.int64()),
                     "event_type": pa.array(["view"] * eid),
                     "value": pa.array([0.0] * eid),
                     "props": pa.array(["{}"] * eid)})


def test_changepoint_finds_level_shift(ray_session):
    days = list(range(19700, 19712))
    cnts = [10, 11, 9, 10, 11, 10, 40, 41, 39, 40, 42, 41]  # jump at idx 6
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(_events_from_daily(days, cnts),
                       os.path.join(td, "events.parquet"))
        got = q_events_changepoint(td).to_pylist()[0]
    assert got["n_days"] == 12
    assert got["split_day"] == 19705  # last day of the low segment
    # brute-force: the chosen split minimizes total SSE in floats
    arr = np.array(cnts, dtype=float)

    def sse(k):
        return (((arr[:k] - arr[:k].mean()) ** 2).sum()
                + ((arr[k:] - arr[k:].mean()) ** 2).sum())

    assert min(range(1, 12), key=sse) == 6
    assert abs(got["left_mean_nano"] / 1e9 - arr[:6].mean()) < 1e-6
    assert abs(got["right_mean_nano"] / 1e9 - arr[6:].mean()) < 1e-6


def test_changepoint_tie_breaks_earliest(ray_session):
    # perfectly symmetric series: splits k and m-k tie; earliest wins
    days = [19700, 19701, 19702, 19703]
    cnts = [5, 9, 9, 5]
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(_events_from_daily(days, cnts),
                       os.path.join(td, "events.parquet"))
        got = q_events_changepoint(td).to_pylist()[0]
    assert got["split_day"] in (19700, 19701, 19702)
    # recompute which k wins under (ssb DESC, k ASC)
    from newsagency_classification_ray.queries import _div_nano
    s = sum(cnts)
    best_k, best = None, None
    lk = 0
    for k in range(1, 4):
        lk += cnts[k - 1]
        ssb = _div_nano(lk * lk, k) + _div_nano((s - lk) ** 2, 4 - k)
        if best is None or ssb > best:
            best, best_k = ssb, k
    assert got["split_day"] == days[best_k - 1]


def test_theil_kernel_matches_float_and_bounds():
    revs = [100, 200, 300, 0, 400]
    pos = [r for r in revs if r > 0]
    big, n = sum(pos), len(pos)
    want = sum((r / big) * math.log(r * n / big) for r in pos)
    assert abs(_theil_nano(revs) / 1e9 - want) < 1e-9
    # perfectly equal -> 0; all mass on one -> ln(n)
    assert _theil_nano([50, 50, 50, 50]) == 0
    assert abs(_theil_nano([0, 0, 77, 0]) / 1e9 - 0.0) < 1e-9  # n == 1
    assert _theil_nano([]) == 0


def test_latest_snapshot_rollup(ray_session):
    rows = [
        ("https://a.example.ch/1/x", "2024-01-01T00:00:00"),
        ("https://a.example.ch/1/x", "2024-02-01T00:00:00"),  # dup url
        ("https://a.example.ch/2/y", "2024-01-05T00:00:00"),
        ("https://b.example.ch/1/z", "2024-01-03T00:00:00"),
        ("https://b.example.ch/1/z", "2024-01-04T00:00:00"),
        ("https://b.example.ch/1/z", "2024-01-06T00:00:00"),
    ]
    t = pa.table({
        "url": pa.array([r[0] for r in rows]),
        "warc_ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                            pa.timestamp("us")),
        "html": pa.array([None] * len(rows), pa.binary()),
        "text": pa.array(["x"] * len(rows), pa.large_string()),
        "lang": pa.array(["de"] * len(rows))})
    with tempfile.TemporaryDirectory() as td:
        shard = os.path.join(td, "pages")
        os.makedirs(shard)
        pq.write_table(t, os.path.join(shard, "part-0.parquet"))
        import newsagency_classification_ray.sources.pages as ps
        orig = ps.ensure_pages
        ps.ensure_pages = lambda sf: shard
        try:
            got = {r["host"]: (r["n_urls"], r["n_snapshots"], r["n_dropped"])
                   for r in q_pages_latest_snapshot(td).take_all()}
        finally:
            ps.ensure_pages = orig
    assert got == {"a.example.ch": (2, 3, 1), "b.example.ch": (1, 3, 2)}
