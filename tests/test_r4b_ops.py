"""Round-4 late additions: gap stats, attribution, MAD, string-agg,
vocabulary growth — edge semantics the sf-scale oracle data can't pin."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q


def _events_tbl(rows):
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    })


def test_gap_stats_semantics(ray_session, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # u1: gaps 10s, 20s, 30s → n=3, sum=60s, max=30s, lower-median=20s
        (1, s(0), "a"), (1, s(10), "a"), (1, s(30), "a"), (1, s(60), "a"),
        # u2: single event → NO row
        (2, s(0), "a"),
        # u3: duplicate timestamps → gaps 0s, 5s; lower median = 0
        (3, s(5), "a"), (3, s(5), "b"), (3, s(10), "a"),
    ]
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")
    out = Q.q_events_gap_stats(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert list(out.index) == [1, 3]
    u1 = out.loc[1]
    assert (u1.n_gaps, u1.sum_gap_us, u1.max_gap_us, u1.p50_gap_us) == \
        (3, 60_000_000, 30_000_000, 20_000_000)
    u3 = out.loc[3]
    assert (u3.n_gaps, u3.sum_gap_us, u3.max_gap_us, u3.p50_gap_us) == \
        (2, 5_000_000, 5_000_000, 0)


def test_attribution_credits_per_session_first_touch(ray_session, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    s = lambda mins: t0 + dt.timedelta(minutes=mins)
    rows = [
        # u1 session A (no purchase, starts 'view') — no credit;
        # session B 2h later starts 'click' and purchases → credit 'click'
        (1, s(0), "view"), (1, s(5), "click"),
        (1, s(120), "click"), (1, s(125), "purchase"),
        # u2: purchase IS the session's first event → credit 'purchase'
        (2, s(0), "purchase"),
        # u3: two purchases in ONE session → one credit, not two
        (3, s(0), "view"), (3, s(10), "purchase"), (3, s(20), "purchase"),
        # u4: gap of exactly 30min keeps the session together (strict >)
        (4, s(0), "view"), (4, s(30), "purchase"),
    ]
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")
    out = Q.q_events_attribution(str(tmp_path)).to_pandas() \
        .set_index("first_type")["n_sessions"].to_dict()
    assert out == {"click": 1, "purchase": 1, "view": 2}


def test_lineitem_mad_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(42)
    flags = rng.choice(["A", "N", "R"], size=400)
    price = np.round(rng.uniform(10, 10_000, size=400), 2)
    pq.write_table(pa.table({
        "l_returnflag": pa.array(flags.tolist(), pa.string()),
        "l_extendedprice": pa.array(price, pa.float64()),
    }), tmp_path / "lineitem.parquet")
    out = Q.q_lineitem_mad(str(tmp_path)).to_pandas() \
        .set_index("l_returnflag").sort_index()
    cents = np.round(price * 100).astype(np.int64)
    lower_med = lambda v: int(np.sort(v)[int(0.5 * (len(v) - 1))])
    for f in "ANR":
        v = cents[flags == f]
        med = lower_med(v)
        assert out.loc[f, "median_cents"] == med
        assert out.loc[f, "mad_cents"] == lower_med(np.abs(v - med))


def test_user_day_types_sorted_distinct(ray_session, tmp_path):
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, t0, "view"), (1, t0 + dt.timedelta(hours=2), "click"),
        (1, t0 + dt.timedelta(hours=3), "view"),          # dup type, same day
        (1, t0 + dt.timedelta(days=1), "purchase"),       # next day
        (2, t0, "zeta"), (2, t0 + dt.timedelta(minutes=1), "alpha"),
    ]
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")
    out = Q.q_events_user_day_types(str(tmp_path)).to_pandas()
    got = {(r.user_id, str(r.day)[:10]): r.types for r in out.itertuples()}
    assert got == {
        (1, "2024-03-01"): "click,view",
        (1, "2024-03-02"): "purchase",
        (2, "2024-03-01"): "alpha,zeta",
    }


def test_vocab_growth_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 9)))
             for _ in range(40)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), tmp_path / "documents.parquet")
    out = Q.q_docs_vocab_growth(str(tmp_path)).to_pandas() \
        .sort_values("bucket").reset_index(drop=True)

    seen: set[str] = set()
    exp: dict[int, int] = {}
    for d, txt in enumerate(texts):
        toks = txt.split()
        for a, b in zip(toks, toks[1:]):
            bg = f"{a} {b}"
            if bg not in seen:
                seen.add(bg)
                exp[d // 4] = exp.get(d // 4, 0) + 1
    buckets = sorted(exp)
    assert out["bucket"].tolist() == buckets
    assert out["new_bigrams"].tolist() == [exp[b] for b in buckets]
    assert out["vocab_size"].tolist() == list(np.cumsum(
        [exp[b] for b in buckets]))

def test_session_stats_counts_sessions_by_length(ray_session, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    s = lambda mins: t0 + dt.timedelta(minutes=mins)
    rows = [
        # u1: one 3-event session, then (>30 min later) one 1-event session
        (1, s(0), "a"), (1, s(1), "a"), (1, s(2), "a"), (1, s(60), "a"),
        # u2: single event → one 1-event session
        (2, s(0), "a"),
        # u3: exactly-30-min gap stays ONE session of 2 (strict >)
        (3, s(0), "a"), (3, s(30), "a"),
    ]
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")
    out = Q.q_events_session_stats(str(tmp_path)).to_pandas() \
        .set_index("session_len")["n_sessions"].to_dict()
    assert out == {1: 2, 2: 1, 3: 1}


def test_user_moving_sum_frame_semantics(ray_session, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    # u1 values 1,2,3,4 → moving sums 1,3,6,9 (cents: x100); duplicate ts
    # rows tie-break on event_id (insertion order here)
    rows = [(1, s(0), "a"), (1, s(10), "a"), (1, s(10), "a"), (1, s(20), "a"),
            (2, s(0), "a")]
    tbl = _events_tbl(rows).set_column(
        4, "value", pa.array([1.0, 2.0, 3.0, 4.0, 7.5], pa.float64()))
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = Q.q_events_user_moving_sum(str(tmp_path)).to_pandas() \
        .set_index("event_id")["moving_cents"].to_dict()
    assert out == {0: 100, 1: 300, 2: 600, 3: 900, 4: 750}


def test_diverse_sample_caps_every_cluster(ray_session):
    from newsagency_classification_ray import ops

    rng = np.random.default_rng(3)
    tbl = pa.table({
        "vec_id": pa.array(range(100), pa.int64()),
        "cluster": pa.array(rng.integers(0, 4, 100), pa.int64()),
    })
    import ray.data
    out = ops.uniform_group_sample(
        ray.data.from_arrow(tbl).repartition(5), "cluster", 10,
        id_col="vec_id").to_pandas()
    counts = out.groupby("cluster").size()
    assert (counts <= 10).all() and len(counts) == 4
    # deterministic: same pick on a re-run
    out2 = ops.uniform_group_sample(
        ray.data.from_arrow(tbl).repartition(3), "cluster", 10,
        id_col="vec_id").to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_id", "cluster"]].to_numpy()))
    assert key(out) == key(out2)

def test_user_360_coalesces_one_sided_users(ray_session, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    # events: users 1 and 2
    rows = [(1, t0, "view"), (1, t0, "click"), (2, t0, "view")]
    tbl = _events_tbl(rows).set_column(
        4, "value", pa.array([2.0, 3.0, 5.5], pa.float64()))
    pq.write_table(tbl, tmp_path / "events.parquet")
    # orders: users 2 and 3
    pq.write_table(pa.table({
        "o_custkey": pa.array([2, 3, 3], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
    }), tmp_path / "orders.parquet")
    out = Q.q_user_360(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert out.loc[1].tolist() == [0, 0, 2, 500]     # events only
    assert out.loc[2].tolist() == [1, 1000, 1, 550]  # both sides
    assert out.loc[3].tolist() == [2, 5000, 0, 0]    # orders only


def test_conversion_latency_strictly_after_first_view(ray_session, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # u1: view@0, purchase@10 → latency 10 s
        (1, s(0), "view"), (1, s(10), "purchase"),
        # u2: purchase BEFORE any view → excluded
        (2, s(0), "purchase"), (2, s(5), "view"),
        # u3: purchase at exactly the first-view ts → excluded (strict >)
        (3, s(0), "view"), (3, s(0), "purchase"),
        # u4: two purchases; first post-view one counts → 20 s
        (4, s(0), "view"), (4, s(20), "purchase"), (4, s(40), "purchase"),
        # u5: never purchases
        (5, s(0), "view"),
        # u6: view@0, purchase@30 → latency 30 s
        (6, s(0), "view"), (6, s(30), "purchase"),
    ]
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")
    out = Q.q_events_conversion_latency(str(tmp_path))
    got = dict(zip(out["q"].to_pylist(), out["latency_us"].to_pylist()))
    # three latencies (10, 20, 30 s): lower-index quantiles (floor(q·2))
    # pick indices 0, 1, 1
    assert got == {0.25: 10_000_000, 0.5: 20_000_000, 0.75: 20_000_000}

def test_type_transitions_per_user_adjacency(ray_session, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # u1: view→click→view ; u2: click (single event, no pair);
        # adjacency never crosses users
        (1, s(0), "view"), (1, s(1), "click"), (1, s(2), "view"),
        (2, s(0), "click"),
        # u3: duplicate ts ties break on event_id (insertion order)
        (3, s(0), "a"), (3, s(0), "b"),
    ]
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")
    out = Q.q_events_type_transitions(str(tmp_path)).to_pandas()
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    assert got == {("view", "click"): 1, ("click", "view"): 1, ("a", "b"): 1}


def test_pareto_head_boundary_exact(ray_session, tmp_path):
    # revenues 3.00, 1.00, 0.50, 0.50 → total 500¢, 80% boundary at 400¢.
    # Row 3 STARTS exactly at the boundary (cum−rev == 400) → excluded.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_extendedprice": pa.array([3.0, 1.0, 0.5, 0.5], pa.float64()),
    }), tmp_path / "lineitem.parquet")
    out = Q.q_lineitem_pareto(str(tmp_path)).to_pandas() \
        .sort_values("cum_cents").reset_index(drop=True)
    assert out["l_partkey"].tolist() == [1, 2]
    assert out["rev_cents"].tolist() == [300, 100]
    assert out["cum_cents"].tolist() == [300, 400]
