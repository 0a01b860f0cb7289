"""Edge semantics for the final r4 batch: PSI drift term math, the
quality-aware (argmax, not min-id) near-dup keep policy, and the trailing
7-day windowed-distinct WAU (gap days, window boundary, same-day dedup)."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q


def _docs(tmp_path, rows):  # rows: (doc_id, text)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": [r[1] for r in rows],
        "lang": ["en"] * len(rows),
        "source": ["s"] * len(rows),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    }), tmp_path / "documents.parquet")


def _events(tmp_path, rows):  # rows: (user_id, ts)
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": [1.0] * len(rows),
        "props": ["{}"] * len(rows),
    }), tmp_path / "events.parquet")


def test_psi_drift_terms_and_smoothing(ray_session, tmp_path):
    # even ids (cohort A): 4 docs in bin 0; odd ids (cohort B): 4 in bin 1.
    # Maximal separation -> symmetric +/- PSI terms under +0.5 smoothing.
    rows = [(i, "x" * (100 if i % 2 == 0 else 250)) for i in range(8)]
    _docs(tmp_path, rows)
    out = Q.q_docs_psi_drift(str(tmp_path)).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    assert list(out.bin) == [0, 1]
    assert list(out.n_a) == [4, 0] and list(out.n_b) == [0, 4]
    p, q = (4 + 0.5) / (4 + 1.0), (0 + 0.5) / (4 + 1.0)
    m = int(round((p - q) * math.log(p / q) * 1e6))
    assert list(out.psi_term_m) == [m, m]  # symmetric by construction


def test_psi_drift_identical_cohorts_zero(ray_session, tmp_path):
    # same length distribution in both cohorts -> every term exactly 0
    rows = [(i, "y" * 150) for i in range(10)]
    _docs(tmp_path, rows)
    out = Q.q_docs_psi_drift(str(tmp_path)).to_pandas()
    assert list(out.bin) == [0]
    assert list(out.psi_term_m) == [0]
    assert int(out.n_a[0]) == 5 and int(out.n_b[0]) == 5


def test_dedup_keep_best_argmax_and_tiebreak(ray_session, tmp_path):
    base = " ".join(f"tok{i}" for i in range(60))
    longer = base + " extra words appended here beyond the shared prefix"
    other = " ".join(f"zzz{i}" for i in range(60))
    _docs(tmp_path, [
        (10, base), (11, longer), (12, base),   # cluster 10: argmax -> 11
        (20, other), (21, other),               # cluster 20: tie -> min id 20
        (30, "completely unrelated singleton text about nothing shared"),
    ])
    out = Q.q_docs_dedup_keep_best(str(tmp_path)).to_pandas() \
        .sort_values("cluster").reset_index(drop=True)
    assert list(out.cluster) == [10, 20]
    assert list(out.keep_id) == [11, 20]  # quality argmax beats min-id
    assert list(out.n_members) == [3, 2]
    assert int(out.q[0]) == len(longer.split())
    assert int(out.q[1]) == 60


def test_dup_pairs_exact_jaccard_values(ray_session, tmp_path):
    base = " ".join(f"tok{i}" for i in range(60))
    longer = base + " extra words appended here beyond the shared prefix"
    _docs(tmp_path, [(1, base), (2, longer), (3, base)])
    out = Q.q_docs_dup_pairs_exact(str(tmp_path)).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert [tuple(r) for r in out[["doc_a", "doc_b"]].values] \
        == [(1, 2), (1, 3), (2, 3)]
    # identical texts -> exactly 1.0; superset pair -> 58/66 shingles
    ex = dict(zip([tuple(r) for r in out[["doc_a", "doc_b"]].values],
                  out.jacc_m))
    assert ex[(1, 3)] == 1_000_000
    assert ex[(1, 2)] == ex[(2, 3)] == int(round(1e6 * 58 / 66))


def test_incremental_dedup_against_existing_index(ray_session, tmp_path):
    # incoming = ids 0,4,8,12; existing = everything else.
    _docs(tmp_path, [
        (0, "alpha beta gamma"),    # dup of existing 1 -> flagged
        (1, "alpha beta gamma"),
        (4, "unique incoming doc"),            # novel -> not flagged
        (8, "delta epsilon"),       # dup of existing 9 -> flagged
        (9, "delta epsilon"),
        (12, "also only incoming"),  # dup of ANOTHER incoming only -> no
        (5, "existing only text"),
    ])
    out = Q.q_docs_incremental_dedup(str(tmp_path)).to_pandas()
    assert sorted(out.doc_id) == [0, 8]


def test_wau_window_gap_and_dedup(ray_session, tmp_path):
    d0 = dt.datetime(2024, 1, 1)

    def day(n, h=0):
        return d0 + dt.timedelta(days=n, hours=h)

    _events(tmp_path, [
        (1, day(0)), (1, day(0, 5)),  # same-day repeat: counts once
        (2, day(0)),
        (2, day(1)), (3, day(1)),
        (1, day(8)),  # day 1 is 7 days earlier -> OUTSIDE the trailing 7
    ])
    out = Q.q_events_wau(str(tmp_path)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    # only ACTIVE days appear (days 2..7 have no events -> no rows)
    assert list(out.day) == [day(0), day(1), day(8)]
    assert list(out.wau) == [2, 3, 1]
