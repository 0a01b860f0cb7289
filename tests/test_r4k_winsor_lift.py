"""Edge semantics for the robust-stats + association batch: winsorization
fences at the exact disc quantiles, and basket-lift count invariants."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q


def _lineitem(tmp_path, rows):  # rows: (orderkey, partkey, extendedprice)
    n = len(rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array(list(range(n)), pa.int32()),
        "l_quantity": pa.array([1.0] * n, pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": ["N"] * n,
        "l_linestatus": ["O"] * n,
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")


def test_winsorized_fences_and_clip(ray_session, tmp_path):
    # 100 rows with cents 100..10000; disc quantiles at floor(q*(n-1)):
    # p01 -> index 0 (100 cents), p99 -> index 98 (9900 cents)
    _lineitem(tmp_path, [(i, i, (i + 1) * 1.0) for i in range(100)])
    r = Q.q_lineitem_winsorized(str(tmp_path)).take_all()[0]
    assert (r["p01_cents"], r["p99_cents"]) == (100, 9900)
    assert r["n_below"] == 0 and r["n_above"] == 1  # only the 10000 row
    total = sum((i + 1) * 100 for i in range(100))
    assert r["sum_wins_cents"] == total - (10000 - 9900)
    assert r["n"] == 100


def test_basket_lift_counts(ray_session, tmp_path):
    # orders: {1: (10, 20)}, {2: (10, 20, 30)}, {3: (10,)}; the duplicate
    # (2, 30) line must collapse before pairing
    rows = [(1, 10, 1.0), (1, 20, 1.0),
            (2, 10, 1.0), (2, 20, 1.0), (2, 30, 1.0), (2, 30, 2.0),
            (3, 10, 1.0)]
    _lineitem(tmp_path, rows)
    out = {(r["a"], r["b"]): r
           for r in Q.q_orders_basket_lift(str(tmp_path)).take_all()}
    assert out[(10, 20)]["n_ab"] == 2
    assert out[(10, 20)]["n_a"] == 3 and out[(10, 20)]["n_b"] == 2
    assert out[(10, 30)]["n_ab"] == 1 and out[(20, 30)]["n_ab"] == 1
    assert all(r["n_orders"] == 3 for r in out.values())
    assert all(r["n_ab"] <= min(r["n_a"], r["n_b"]) for r in out.values())
