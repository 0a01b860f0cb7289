"""Hard-negative mining vs a numpy recompute, sequence-pattern negation
semantics on hand-built journeys, Theil-Sen slope vs brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from newsagency_classification_ray.queries import (_div_nano,
                                                   q_events_seq_match)
from newsagency_classification_ray.stages import similarity as sim


def test_hard_negative_topk_matches_numpy(ray_session):
    rng = np.random.default_rng(9)
    n, d = 120, 8
    vecs = rng.normal(size=(n, d))
    labels = rng.integers(0, 3, n)
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float32())),
                  "label": pa.array(labels, pa.int32())})
    # float32 storage: recompute reference from the same stored values
    stored = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    anchors = [0, 1, 2]
    got = sim.hard_negative_topk(
        ray.data.from_arrow(t).repartition(6), stored[anchors],
        anchors, [int(labels[a]) for a in anchors], k=4).take_all()
    norm = stored / np.linalg.norm(stored, axis=1, keepdims=True)
    for a in anchors:
        scores = norm @ norm[a]
        mask = (labels == labels[a]) | (np.arange(n) == a)
        scores[mask] = -np.inf
        want = np.lexsort((np.arange(n), -scores))[:4]
        rows = sorted((r for r in got if r["query_id"] == a),
                      key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == want.tolist()
        assert all(labels[r["vec_id"]] != labels[a] for r in rows)


def _ev(rows):
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                       pa.timestamp("us")),
        "event_id": pa.array([i for i in range(len(rows))], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string())})


def test_seq_match_negation_semantics(ray_session, tmp_path):
    rows = [
        # user 1: view -> purchase in 10 min, clean  => match
        (1, "2024-01-01T10:00:00", "view"),
        (1, "2024-01-01T10:10:00", "purchase"),
        # user 1: view -> purchase 40 min later      => too late
        (1, "2024-01-02T10:00:00", "view"),
        (1, "2024-01-02T10:40:00", "purchase"),
        # user 2: view -> error -> purchase in window => blocked
        (2, "2024-01-01T09:00:00", "view"),
        (2, "2024-01-01T09:05:00", "error"),
        (2, "2024-01-01T09:10:00", "purchase"),
        # user 3: two views share one purchase; the later view matches,
        # the earlier one is out of window
        (3, "2024-01-01T08:00:00", "view"),
        (3, "2024-01-01T08:45:00", "view"),
        (3, "2024-01-01T09:00:00", "purchase"),
        # user 4: error AFTER the purchase does not block
        (4, "2024-01-01T07:00:00", "view"),
        (4, "2024-01-01T07:20:00", "purchase"),
        (4, "2024-01-01T07:25:00", "error"),
    ]
    import pyarrow.parquet as pq
    pq.write_table(_ev(rows), str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r["n_matches"]
           for r in q_events_seq_match(str(tmp_path)).take_all()}
    assert got == {1: 1, 3: 1, 4: 1}


def test_theilsen_median_slope_brute(ray_session):
    days = [19700, 19701, 19702, 19703, 19710]
    cnts = [10, 13, 9, 40, 25]
    slopes = sorted(_div_nano(cnts[j] - cnts[i], days[j] - days[i])
                    for i in range(5) for j in range(i + 1, 5))
    want = slopes[(len(slopes) + 1) // 2 - 1]
    import pyarrow.parquet as pq
    import tempfile, os
    rows = []
    eid = 0
    for d, c in zip(days, cnts):
        base = np.datetime64(int(d), "D").astype("datetime64[us]")
        for k in range(c):
            rows.append((base + np.timedelta64(k, "s"), eid))
            eid += 1
    t = pa.table({"event_id": pa.array([r[1] for r in rows], pa.int64()),
                  "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                  "user_id": pa.array([0] * len(rows), pa.int64()),
                  "event_type": pa.array(["view"] * len(rows)),
                  "value": pa.array([0.0] * len(rows)),
                  "props": pa.array(["{}"] * len(rows))})
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(t, os.path.join(td, "events.parquet"))
        from newsagency_classification_ray.queries import q_events_theilsen
        got = q_events_theilsen(td).to_pylist()[0]
    assert got["n_days"] == 5
    assert got["n_pairs"] == 10
    assert got["slope_nano"] == want
