"""Edge semantics for the PIT-join / readability / Count-Min batch."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import ops
from newsagency_classification_ray import queries as Q


def _ts(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def _events(tmp_path, rows):  # rows: (event_id, user, hour, etype)
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([_ts(r[2]) for r in rows], pa.timestamp("us")),
        "event_type": [r[3] for r in rows],
    }), tmp_path / "events.parquet")


def _orders(tmp_path, rows):  # rows: (okey, cust, hour)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderdate": pa.array([_ts(r[2]) for r in rows],
                                pa.timestamp("us")),
    }), tmp_path / "orders.parquet")


def test_pit_state_semantics(ray_session, tmp_path):
    # user 1 history: A@h0 (A@h1 repeat collapses), B@h5, A@h9
    _events(tmp_path, [(1, 1, 0, "A"), (2, 1, 1, "A"),
                       (3, 1, 5, "B"), (4, 1, 9, "A")])
    _orders(tmp_path, [
        (10, 1, 0),   # exactly at first change point -> A
        (11, 1, 4),   # inside [0, 5) -> A (repeat at h1 collapsed)
        (12, 1, 5),   # exactly at change point -> new state B
        (13, 1, 99),  # after last change -> open interval A
        (14, 2, 3),   # customer with no events -> NULL
    ])
    out = {r["o_orderkey"]: r["state"]
           for r in Q.q_orders_pit_state(str(tmp_path)).take_all()}
    assert out == {10: "A", 11: "A", 12: "B", 13: "A", 14: None}


def test_pit_order_before_first_event_is_null(ray_session, tmp_path):
    _events(tmp_path, [(1, 1, 10, "A")])
    _orders(tmp_path, [(10, 1, 2)])
    out = Q.q_orders_pit_state(str(tmp_path)).take_all()
    assert out[0]["state"] is None


def _docs(tmp_path, rows):  # rows: (source, text)
    n = len(rows)
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "source": [r[0] for r in rows],
        "text": [r[1] for r in rows],
    }), tmp_path / "documents.parquet")


def test_readability_counts(ray_session, tmp_path):
    _docs(tmp_path, [
        ("a", "Hello world. How are you?! Fine... ok"),
        ("a", ""),                      # empty: contributes only n_docs
        ("b", "Queueing!!! yay"),       # one terminator RUN, 2 words
    ])
    out = {r["source"]: r
           for r in Q.q_docs_readability(str(tmp_path)).take_all()}
    # doc a1: sentences=3 runs, words=7, vowel groups of lowercase
    assert out["a"]["n_docs"] == 2
    assert out["a"]["n_sentences"] == 3
    assert out["a"]["n_words"] == 7
    assert out["a"]["n_syllables"] == 10
    # 'queueing' -> 'ueuei' one group + 'i'? lower: q-ueuei-ng + yay: a,y...
    assert out["b"]["n_docs"] == 1
    assert out["b"]["n_sentences"] == 1  # '!!!' is one run
    assert out["b"]["n_words"] == 2


def test_countmin_is_one_sided_and_merge_invariant():
    keys = np.array([1] * 100 + [2] * 50 + list(range(100, 400)),
                    dtype=np.int64)
    one = ops.CountMinSketch(d=4, w=256)
    one.add(keys)
    split = ops.CountMinSketch(d=4, w=256)
    other = ops.CountMinSketch(d=4, w=256)
    split.add(keys[:137])
    other.add(keys[137:])
    split.merge(other)
    assert (one.counts == split.counts).all()  # block-split invariance
    q = np.array([1, 2, 100, 399], dtype=np.int64)
    exact = np.array([100, 50, 1, 1])
    est = one.estimate(q)
    assert (est >= exact).all()  # one-sided guarantee
    assert est[0] >= 100


def test_countmin_topk_tiebreak(ray_session, tmp_path):
    # users 1..25 each with 1 event: top-20 is users 1..20 by id tiebreak
    _events(tmp_path, [(i, i, 0, "A") for i in range(1, 26)])
    out = Q.q_events_countmin_topk(str(tmp_path))
    uids = out["user_id"].to_pylist()
    assert uids == list(range(1, 21))
    assert all(e >= x for e, x in zip(out["n_est"].to_pylist(),
                                      out["n_exact"].to_pylist()))
