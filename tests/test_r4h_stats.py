"""Edge semantics for the two-sample rank-test batch: the grouped prefix
counts that feed them, the Mann-Whitney doubled-U invariant, and the KS
max-gap on a constructed separation."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from newsagency_classification_ray import ops
from newsagency_classification_ray import queries as Q


def test_grouped_prefix_counts_two_cohorts(ray_session):
    rows = [(1.0, 1, 0), (1.0, 0, 1), (2.0, 1, 0), (5.0, 0, 1), (5.0, 0, 1)]
    ds = ray.data.from_items(
        [{"v": v, "a": a, "b": b} for v, a, b in rows]).repartition(3)
    out = ops.grouped_prefix_counts(ds, "v", ["a", "b"]).take_all()
    out.sort(key=lambda r: r["v"])
    got = [(r["v"], r["a"], r["b"], r["cum_a"], r["cum_b"]) for r in out]
    assert got == [(1.0, 1, 1, 1, 1), (2.0, 1, 0, 2, 1), (5.0, 0, 2, 2, 3)]


def _events(tmp_path, rows):  # rows: (event_type, value)
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": [r[0] for r in rows],
        "value": pa.array([r[1] for r in rows], pa.float64()),
        "props": ["{}"] * len(rows),
    }), tmp_path / "events.parquet")


def test_mannwhitney_separated_cohorts(ray_session, tmp_path):
    # all view values strictly below all purchase values -> U_view = 0,
    # U_purchase = n_a*n_b; 'click' rows must be ignored
    rows = ([("view", float(v)) for v in (1, 2, 3)]
            + [("purchase", float(v)) for v in (10, 11)]
            + [("click", 99.0)])
    _events(tmp_path, rows)
    r = Q.q_events_mannwhitney(str(tmp_path)).take_all()[0]
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["u2_a"] == 0 and r["u2_b"] == 2 * 3 * 2
    assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"]


def test_mannwhitney_tie_averaging(ray_session, tmp_path):
    # one shared value: ranks average. view {1, 5} vs purchase {5}:
    # U_view = #(view > purchase) + ties/2 = 0 + 0.5, so 2*U_view = 1;
    # U_purchase = 1 + 0.5 -> 2*U = 3
    rows = [("view", 1.0), ("view", 5.0), ("purchase", 5.0)]
    _events(tmp_path, rows)
    r = Q.q_events_mannwhitney(str(tmp_path)).take_all()[0]
    assert r["u2_a"] == 1 and r["u2_b"] == 3
    assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"]


def _docs(tmp_path, lens):  # doc_id = index; n_chars from lens
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(lens))), pa.int64()),
        "text": ["x" * n for n in lens],
        "lang": ["en"] * len(lens),
        "source": ["s"] * len(lens),
        "n_chars": pa.array(lens, pa.int64()),
    }), tmp_path / "documents.parquet")


def test_ks_drift_full_separation(ray_session, tmp_path):
    # even ids short, odd ids long -> ECDFs fully separate: ks_num = n_a*n_b
    _docs(tmp_path, [10, 100, 20, 200, 30, 300])
    r = Q.q_docs_ks_drift(str(tmp_path)).take_all()[0]
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["ks_num"] == 9


def test_ks_drift_identical_cohorts(ray_session, tmp_path):
    # identical length multisets -> ECDFs coincide at every step
    _docs(tmp_path, [10, 10, 20, 20])
    r = Q.q_docs_ks_drift(str(tmp_path)).take_all()[0]
    assert r["ks_num"] == 0
