"""Edge semantics for the acquisition-cohort + int8-quantization batch."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q
from newsagency_classification_ray.queries import _quantize_i8


def _orders(tmp_path, rows):  # rows: (custkey, orderdate)
    n = len(rows)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(n)), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderstatus": ["O"] * n,
        "o_totalprice": pa.array([1.0] * n, pa.float64()),
        "o_orderdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "o_orderpriority": ["P"] * n,
    }), tmp_path / "orders.parquet")


def test_repeat_cohorts_first_month_assignment(ray_session, tmp_path):
    jan, feb = dt.datetime(2024, 1, 15), dt.datetime(2024, 2, 3)
    # cust 1: first order Jan, repeats in Feb -> Jan cohort, repeat.
    # cust 2: single Feb order. cust 3: two Jan orders.
    _orders(tmp_path, [(1, jan), (1, feb), (2, feb), (3, jan),
                       (3, dt.datetime(2024, 1, 20))])
    out = {r["cohort_month"].month: r for r in
           Q.q_customer_repeat_cohorts(str(tmp_path)).take_all()}
    assert out[1]["n_customers"] == 2 and out[1]["n_repeat"] == 2
    assert out[1]["n_orders"] == 4
    assert out[2]["n_customers"] == 1 and out[2]["n_repeat"] == 0


def test_quantize_i8_half_away_from_zero_and_zero_vec():
    v = np.array([[1.0, -1.0, 0.5, -0.5],
                  [0.0, 0.0, 0.0, 0.0]])
    q = _quantize_i8(v)
    # max-abs row 1: scale 127; 0.5 -> 63.5 -> 64 (away from zero), -0.5 -> -64
    assert q[0].tolist() == [127.0, -127.0, 64.0, -64.0]
    assert q[1].tolist() == [0.0, 0.0, 0.0, 0.0]
    assert np.abs(q).max() <= 127


def test_quant_recall_bounds(ray_session):
    rows = Q.q_embeddings_quant_recall("/root/testdata/sf0.001").take_all()
    assert len(rows) == len(Q._ANN_QUERY_IDS)
    for r in rows:
        assert 0 <= r["overlap"] <= Q._ANN_K
    # int8 on 128-dim synthetic embeddings should retain most neighbors
    assert sum(r["overlap"] for r in rows) >= len(rows) * Q._ANN_K // 2
