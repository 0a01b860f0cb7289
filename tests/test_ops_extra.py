"""HLL approximate distinct + M17 control-char scrub."""

import pyarrow as pa
import ray.data

from newsagency_classification_ray.functions.textproc import scrub_control_chars
from newsagency_classification_ray.ops import HyperLogLog, approx_distinct


def test_hll_estimate_within_error():
    import numpy as np

    hll = HyperLogLog(p=12)
    rng = np.random.RandomState(3)
    vals = (rng.randint(0, 1 << 32, size=50_000).astype(np.uint64) << np.uint64(32)) \
        | rng.randint(0, 1 << 32, size=50_000).astype(np.uint64)
    hll.add_hashes(vals)
    true = len(np.unique(vals))
    assert abs(hll.estimate() - true) / true < 0.05


def test_hll_merge_equals_union():
    import numpy as np

    a, b, u = HyperLogLog(p=10), HyperLogLog(p=10), HyperLogLog(p=10)
    va = np.arange(1, 5000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    vb = np.arange(3000, 9000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    a.add_hashes(va); b.add_hashes(vb)
    u.add_hashes(va); u.add_hashes(vb)
    assert a.merge(b).estimate() == u.estimate()


def test_approx_distinct_on_dataset(ray_session):
    n = 20_000
    ds = ray.data.from_arrow(pa.table({"v": pa.array([i % 1777 for i in range(n)])}))
    est = approx_distinct(ds, "v")
    assert abs(est - 1777) / 1777 < 0.05


def test_scrub_control_chars_length_preserving():
    s = "a\x00b\tc\nd​e"  # NUL, tab, newline, zero-width space
    out = scrub_control_chars(s)
    assert len(out) == len(s)
    assert out == "a b c d e"
    assert scrub_control_chars("plain text.") == "plain text."


def test_asof_join_semantics(ray_session):
    """As-of join: latest right row with ts <= left ts per key; ties on ts
    break to the greatest tie column; unmatched lefts keep nulls; keys
    absent from the right side keep nulls too."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.ops import asof_join

    t = lambda s: pd.Timestamp(s).to_pydatetime()
    left = ray.data.from_arrow(pa.table({
        "eid": pa.array([1, 2, 3, 4], type=pa.int64()),
        "k": pa.array([10, 10, 10, 99], type=pa.int64()),
        "ts": pa.array([t("2024-01-05"), t("2024-01-01"), t("2023-12-01"),
                        t("2024-01-05")], type=pa.timestamp("us")),
    }))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([10, 10, 10], type=pa.int64()),
        "rts": pa.array([t("2024-01-01"), t("2024-01-01"), t("2024-01-03")],
                        type=pa.timestamp("us")),
        "rid": pa.array([7, 9, 5], type=pa.int64()),
    }))
    out = {r["eid"]: r["rid"] for r in asof_join(
        left, right, left_key="k", right_key="rk", left_ts="ts",
        right_ts="rts", right_cols=["rid"]).take_all()}
    assert out[1] == 5       # latest rts 01-03
    assert out[2] == 9       # tie on 01-01 -> greatest rid
    assert out[3] is None    # no right row <= 2023-12-01
    assert out[4] is None    # key 99 absent from right


def test_range_join_pairs_each_pair_exactly_once(ray_session):
    """Bucketed time-proximity join: every qualifying pair appears exactly
    once (left replicated to adjacent buckets, right in one bucket), pairs
    straddling bucket borders included, pairs beyond the radius excluded."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.ops import range_join_pairs

    base = pd.Timestamp("2024-01-01").to_pydatetime()
    import datetime as dt
    ts = [base + dt.timedelta(seconds=s) for s in (0, 30, 59, 61, 200)]
    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array(range(5), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    }))
    pairs = range_join_pairs(ev, ev, left_id="event_id", right_id="event_id",
                             left_ts="ts", right_ts="ts", max_dt_us=60_000_000)
    got = sorted((r["event_id"], r["event_id_right"]) for r in pairs.take_all()
                 if r["event_id"] < r["event_id_right"])
    # |dt|<=60s: (0,1) 30, (0,2) 59, (1,2) 29, (1,3) 31, (2,3) 2; (0,3) is 61s out
    assert got == [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    # self-pairs appear once per event (left copy meets its right copy once)
    selfs = [(r["event_id"], r["event_id_right"]) for r in pairs.take_all()
             if r["event_id"] == r["event_id_right"]]
    assert sorted(selfs) == [(i, i) for i in range(5)]


def test_asof_join_matches_bruteforce_on_random_data(ray_session):
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.ops import asof_join

    rng = np.random.RandomState(42)
    base = dt.datetime(2024, 1, 1)
    n_l, n_r = 200, 80
    l_key = rng.randint(0, 12, n_l)
    l_ts = [base + dt.timedelta(seconds=int(s)) for s in rng.randint(0, 5000, n_l)]
    r_key = rng.randint(0, 12, n_r)
    r_ts_s = rng.randint(0, 5000, n_r)
    r_ts = [base + dt.timedelta(seconds=int(s)) for s in r_ts_s]
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array(range(n_l), type=pa.int64()),
        "k": pa.array(l_key, type=pa.int64()),
        "ts": pa.array(l_ts, type=pa.timestamp("us")),
    }))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(r_key, type=pa.int64()),
        "rts": pa.array(r_ts, type=pa.timestamp("us")),
        "rid": pa.array(range(n_r), type=pa.int64()),
    }))
    got = {r["lid"]: r["rid"] for r in asof_join(
        left, right, left_key="k", right_key="rk", left_ts="ts",
        right_ts="rts", right_cols=["rid"]).take_all()}
    for i in range(n_l):
        cands = [(r_ts_s[j], j) for j in range(n_r)
                 if r_key[j] == l_key[i]
                 and r_ts[j] <= l_ts[i]]
        want = max(cands)[1] if cands else None
        assert got[i] == want, i


def test_range_join_matches_bruteforce_on_random_data(ray_session):
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.ops import range_join_pairs

    rng = np.random.RandomState(7)
    base = dt.datetime(2024, 1, 1)
    n = 150
    secs = rng.randint(0, 2000, n)
    ts = [base + dt.timedelta(seconds=int(s)) for s in secs]
    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    }))
    radius = 45
    pairs = range_join_pairs(ev, ev, left_id="event_id", right_id="event_id",
                             left_ts="ts", right_ts="ts",
                             max_dt_us=radius * 1_000_000)
    got = sorted((r["event_id"], r["event_id_right"]) for r in pairs.take_all())
    want = sorted((i, j) for i in range(n) for j in range(n)
                  if abs(int(secs[i]) - int(secs[j])) <= radius)
    assert got == want


def test_range_join_rejects_nonpositive_radius(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from newsagency_classification_ray.ops import range_join_pairs

    ev = ray.data.from_arrow(pa.table({"event_id": pa.array([1], type=pa.int64()),
                                       "ts": pa.array([0], type=pa.timestamp("us"))}))
    with pytest.raises(ValueError, match="max_dt_us"):
        range_join_pairs(ev, ev, left_id="event_id", right_id="event_id",
                         left_ts="ts", right_ts="ts", max_dt_us=0)


def test_range_join_skewed_density_buckets(ray_session):
    """Dense cluster (many rows in one bucket) + sparse tail: the sorted
    window sweep must still produce exactly the brute-force pair set —
    the regime where the old dense |L|x|R| diff blew up."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.ops import range_join_pairs

    rng = np.random.RandomState(11)
    base = dt.datetime(2024, 1, 1)
    # 300 rows inside one 30 s window (dense), 40 rows spread over 2 h
    dense = rng.randint(0, 30, 300)
    sparse = rng.randint(30, 7200, 40)
    secs = np.concatenate([dense, sparse])
    ts = [base + dt.timedelta(seconds=int(s)) for s in secs]
    n = len(secs)
    ev = ray.data.from_arrow(pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    }))
    radius = 30
    pairs = range_join_pairs(ev, ev, left_id="event_id", right_id="event_id",
                             left_ts="ts", right_ts="ts",
                             max_dt_us=radius * 1_000_000)
    got = sorted((r["event_id"], r["event_id_right"]) for r in pairs.take_all())
    want = sorted((i, j) for i in range(n) for j in range(n)
                  if abs(int(secs[i]) - int(secs[j])) <= radius)
    assert got == want


def test_asof_join_null_timestamps_never_match(ray_session):
    """SQL NULL semantics: a left row with null ts stays unmatched, and a
    right row with null ts is never a candidate (even for null-ts lefts)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.ops import asof_join

    t = lambda s: pd.Timestamp(s).to_pydatetime()
    left = ray.data.from_arrow(pa.table({
        "eid": pa.array([1, 2], type=pa.int64()),
        "k": pa.array([10, 10], type=pa.int64()),
        "ts": pa.array([t("2024-01-05"), None], type=pa.timestamp("us")),
    }))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([10, 10], type=pa.int64()),
        "rts": pa.array([t("2024-01-01"), None], type=pa.timestamp("us")),
        "rid": pa.array([7, 99], type=pa.int64()),
    }))
    out = {r["eid"]: r["rid"] for r in asof_join(
        left, right, left_key="k", right_key="rk", left_ts="ts",
        right_ts="rts", right_cols=["rid"]).take_all()}
    assert out[1] == 7     # null-ts right row 99 is not a candidate
    assert out[2] is None  # null-ts left row stays unmatched


def test_asof_join_hot_key_limit_enforced(ray_session):
    import datetime as dt

    import pyarrow as pa
    import pytest
    import ray.data

    from newsagency_classification_ray.ops import asof_join

    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(seconds=i) for i in range(50)]
    one_key = ray.data.from_arrow(pa.table({
        "eid": pa.array(range(50), type=pa.int64()),
        "k": pa.array([1] * 50, type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    }))
    j = asof_join(one_key, one_key, left_key="k", right_key="k",
                  left_ts="ts", right_ts="ts", right_cols=["eid"],
                  hot_key_limit=10)
    with pytest.raises(Exception, match="hot_key_limit"):
        j.take_all()


def test_asof_join_bucketed_merge_matches_plain_on_hot_key(ray_session):
    """Range-partitioned merge (bucket_us) == plain key-group path == brute
    force, on data where ONE key holds most rows spread across many blocks
    (the hot-key regime the bucketed path exists for)."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.ops import asof_join

    rng = np.random.RandomState(5)
    base = dt.datetime(2024, 1, 1)
    n_l, n_r = 400, 300
    # 85 % of rows on hot key 1, rest on keys 2..5; include ties + nulls
    l_key = np.where(rng.rand(n_l) < 0.85, 1, rng.randint(2, 6, n_l))
    r_key = np.where(rng.rand(n_r) < 0.85, 1, rng.randint(2, 6, n_r))
    l_secs = rng.randint(0, 36_000, n_l)
    r_secs = rng.randint(0, 36_000, n_r)
    l_ts = [base + dt.timedelta(seconds=int(s)) for s in l_secs]
    r_ts = [base + dt.timedelta(seconds=int(s)) for s in r_secs]
    l_ts[7] = None  # a null left ts
    left = ray.data.from_arrow(pa.table({
        "lid": pa.array(range(n_l), type=pa.int64()),
        "k": pa.array(l_key, type=pa.int64()),
        "ts": pa.array(l_ts, type=pa.timestamp("us")),
    })).repartition(16)  # hot key spans many blocks
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array(r_key, type=pa.int64()),
        "rts": pa.array(r_ts, type=pa.timestamp("us")),
        "rid": pa.array(range(n_r), type=pa.int64()),
    })).repartition(16)

    kw = dict(left_key="k", right_key="rk", left_ts="ts", right_ts="rts",
              right_cols=["rid"])
    plain = {r["lid"]: r["rid"]
             for r in asof_join(left, right, **kw).take_all()}
    # 600 s buckets -> hot key split across ~60 groups with carry rows
    bucketed = {r["lid"]: r["rid"]
                for r in asof_join(left, right, bucket_us=600_000_000,
                                   **kw).take_all()}
    assert bucketed == plain
    for i in range(n_l):  # brute force
        if l_ts[i] is None:
            assert plain[i] is None
            continue
        cands = [(int(r_secs[j]), j) for j in range(n_r)
                 if r_key[j] == l_key[i] and int(r_secs[j]) <= int(l_secs[i])]
        want = max(cands)[1] if cands else None
        assert plain[i] == want, i
