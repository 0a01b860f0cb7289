"""Edge semantics for the dedup-evaluation + seasonality batch: pair
counting against constructed exact/near clusters, and the lag windows of
the daily-count autocorrelation (calendar gap fill, lag past series end)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q

_BASE = ("the quick brown fox jumps over the lazy dog again and again "
         "while the market watches closely every single trading day ")


def _docs(tmp_path, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), tmp_path / "documents.parquet")


def test_cluster_quality_pair_counts(ray_session, tmp_path):
    # three EXACT copies (true cluster of 3, also one LSH cluster), one
    # near-dup pair (LSH cluster, two different sha1 groups), one unique
    other = ("many rivers flow gently through quiet green valleys under "
             "tall old mountains where silver clouds gather each evening ")
    texts = [_BASE * 3] * 3 \
        + [other * 3 + "tail one", other * 3 + "tail two"] \
        + ["completely unrelated tiny text"]
    _docs(tmp_path, texts)
    r = Q.q_docs_cluster_quality(str(tmp_path)).take_all()[0]
    assert r["n_docs"] == 6
    assert r["true_pairs"] == 3          # C(3,2) exact copies
    assert r["pred_pairs"] == 3 + 1      # trio cluster + near-dup pair
    assert r["both_pairs"] == 3          # near-dup pair differs in sha1


def _events(tmp_path, day_counts):  # {day_index: count}
    rows = []
    for day, n in day_counts.items():
        for k in range(n):
            rows.append(dt.datetime(2021, 1, 1) + dt.timedelta(days=day,
                                                               seconds=k))
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array(rows, pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": ["view"] * len(rows),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": ["{}"] * len(rows),
    }), tmp_path / "events.parquet")


def test_daily_acf_gap_fill_and_lag_windows(ray_session, tmp_path):
    # active days 0, 1, 3 (day 2 is a calendar gap -> zero-filled)
    _events(tmp_path, {0: 2, 1: 1, 3: 4})
    out = {r["lag"]: r for r in Q.q_events_daily_acf(str(tmp_path)).take_all()}
    assert out[1]["n_days"] == 4
    # x = [2, 1, 0, 4]
    assert out[1]["sxy"] == 2 * 1 + 1 * 0 + 0 * 4
    assert (out[1]["sx_head"], out[1]["sx_tail"]) == (3, 5)
    assert (out[1]["sxx_head"], out[1]["sxx_tail"]) == (5, 17)
    assert out[3]["sxy"] == 2 * 4
    # lag beyond the series: every window empties
    assert (out[7]["sxy"], out[7]["sx_head"], out[7]["sx_tail"]) == (0, 0, 0)
