"""Edge semantics for the sketch-calibration + sequence-transition batch."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q


def test_hll_error_within_expected_band(ray_session):
    rows = Q.q_events_hll_error("/root/testdata/sf0.001").take_all()
    assert rows
    for r in rows:
        assert r["n_exact"] >= 1
        # p=12 -> ~1.6 % stddev; 10 % is a generous determinism check
        assert abs(r["n_est"] - r["n_exact"]) <= max(3, r["n_exact"] // 10)


def _orders(tmp_path, rows):  # rows: (custkey, day, priority)
    n = len(rows)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(n)), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderstatus": ["O"] * n,
        "o_totalprice": pa.array([1.0] * n, pa.float64()),
        "o_orderdate": pa.array(
            [dt.datetime(2024, 1, 1) + dt.timedelta(days=r[1])
             for r in rows], pa.timestamp("us")),
        "o_orderpriority": [r[2] for r in rows],
    }), tmp_path / "orders.parquet")


def test_priority_markov_sequences(ray_session, tmp_path):
    # cust 1: A(d0) -> B(d1) -> A(d2); cust 2: single order (no pair);
    # cust 3: same-day tie broken by orderkey: A(key5) then B(key6)
    _orders(tmp_path, [(1, 0, "A"), (1, 1, "B"), (1, 2, "A"),
                       (2, 0, "C"),
                       (3, 0, "A"), (3, 0, "B")])
    out = {(r["prev_priority"], r["next_priority"]): r["n"]
           for r in Q.q_orders_priority_markov(str(tmp_path)).take_all()}
    assert out == {("A", "B"): 2, ("B", "A"): 1}
