"""Edge language support, uptime, kNN outliers."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_edge_lang_support_matches_bruteforce():
    t = Q.QUERIES["kg_edge_lang_support"](SF).to_pandas() \
        .set_index("support")
    m = Q._linked(SF).to_pandas()
    langs_per = {}
    for (h, y, lg), g in m.groupby(["host", "year", "lang"]):
        qs = sorted(set(g.qid))
        for i in range(len(qs)):
            for j in range(i + 1, len(qs)):
                langs_per.setdefault((qs[i], qs[j]), set()).add(lg)
    from collections import Counter
    census = Counter("both" if len(v) > 1 else f"{next(iter(v))}_only"
                     for v in langs_per.values())
    assert set(t.index) == set(census)
    for k, v in census.items():
        assert t.loc[k].n_edges == v
    assert t.n_edges.sum() == len(langs_per)


def test_uptime_matches_bruteforce():
    t = Q.QUERIES["events_uptime"](SF).to_pandas().set_index("epoch_day")
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    us = ev.ts.astype("datetime64[us]").astype(np.int64)
    day = us // 86_400_000_000
    hour = us // 3_600_000_000
    import pandas as pd
    dh = pd.DataFrame({"day": day, "hour": hour}).drop_duplicates()
    for d, g in dh.groupby("day"):
        assert t.loc[d].hours_active == len(g)
        assert t.loc[d].uptime_nano == Q._div_nano(len(g), 24)
    assert (t.hours_active <= 24).all()


def test_knn_outliers_match_bruteforce():
    t = Q.QUERIES["embeddings_knn_outliers"](SF).to_pandas()
    e = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(e["vec_id"].to_pylist(), np.int64)
    qm = Q._q6v(np.array(e["embedding"].to_pylist(), np.float64))
    d2 = ((qm[:, None, :] - qm[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    kth = np.partition(d2, Q._KNN_OUT_K - 1, 1)[:, Q._KNN_OUT_K - 1]
    order = np.lexsort((ids, -kth))[:Q._KNN_OUT_TOP]
    assert list(t.vec_id) == list(ids[order])
    assert list(t.knn_d2) == list(kth[order])
    # scores are sorted descending
    assert list(t.knn_d2) == sorted(t.knn_d2, reverse=True)
