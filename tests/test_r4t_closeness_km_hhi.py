"""Edge semantics for the seed-closeness / Kaplan-Meier / HHI batch."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q


def test_seed_closeness_invariants(ray_session):
    out = Q.q_kg_seed_closeness("/root/testdata/sf0.001").take_all()
    assert out
    by = {r["node"]: r for r in out}
    # each seed present in the graph reaches itself at hop 0
    for s in Q._CLOSENESS_SEEDS:
        if s in by:
            assert by[s]["n_seeds"] >= 1
    for r in out:
        assert 1 <= r["n_seeds"] <= len(Q._CLOSENESS_SEEDS)
        assert r["max_hops"] <= r["sum_hops"] or r["sum_hops"] == 0
        assert r["sum_hops"] <= r["n_seeds"] * r["max_hops"]


def _orders(tmp_path, rows):  # rows: (okey, cust, day)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [dt.datetime(2024, 1, 1) + dt.timedelta(days=r[2])
             for r in rows], pa.timestamp("us")),
    }), tmp_path / "orders.parquet")


def test_kaplan_meier_counts(ray_session, tmp_path):
    # corpus end = day 100. cust 1: days 0..10 (T=10, last 90d before end
    # -> event). cust 2: days 0..95 (T=95, censored: within 30d of end).
    # cust 3: single order day 100 (T=0, censored). cust 4: days 5..15
    # (T=10, event).
    _orders(tmp_path, [(1, 1, 0), (2, 1, 10),
                       (3, 2, 0), (4, 2, 95),
                       (5, 3, 100),
                       (6, 4, 5), (7, 4, 15)])
    t = Q.q_customer_kaplan_meier(str(tmp_path))
    rows = {r["t_days"]: r for r in t.to_pylist()}
    assert set(rows) == {0, 10, 95}
    assert rows[0]["at_risk"] == 4 and rows[0]["n_events"] == 0 \
        and rows[0]["n_censored"] == 1
    assert rows[10]["at_risk"] == 3 and rows[10]["n_events"] == 2
    assert rows[95]["at_risk"] == 1 and rows[95]["n_censored"] == 1


def _lineitem(tmp_path, rows):  # rows: (part, supp, qty)
    n = len(rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(list(range(n)), pa.int64()),
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_quantity": pa.array([float(r[2]) for r in rows], pa.float64()),
    }), tmp_path / "lineitem.parquet")


def test_hhi_sufficient_stats(ray_session, tmp_path):
    # part 1: supp 10 ships 3 + 4 = 7, supp 11 ships 1 -> n=2, tot=8,
    # sumsq = 49 + 1 = 50 (monopoly-ish). part 2: single supplier.
    _lineitem(tmp_path, [(1, 10, 3), (1, 10, 4), (1, 11, 1), (2, 20, 5)])
    out = {r["part_key"]: r
           for r in Q.q_part_supplier_hhi(str(tmp_path)).take_all()}
    assert out[1]["n_suppliers"] == 2
    assert out[1]["total_qty"] == 8
    assert out[1]["sum_sq_qty"] == 50
    assert out[2]["n_suppliers"] == 1 and out[2]["sum_sq_qty"] == 25
