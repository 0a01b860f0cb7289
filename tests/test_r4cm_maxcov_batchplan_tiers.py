"""Max-coverage selection, media batch plan, storage tiers."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
import newsagency_classification_ray.stages.multimodal as mm

SF = "/root/testdata/sf0.001"


def test_max_coverage_matches_greedy():
    t = Q.QUERIES["docs_max_coverage_select"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    sets = {int(d): set(w for w in txt.split() if w)
            for d, txt in zip(docs.doc_id, docs.text)}
    covered = set()
    picks = []
    for rank in range(1, Q._MAXCOV_K + 1):
        best, bg = None, -1
        for d in sorted(sets):
            gain = len(sets[d] - covered)
            if gain > bg:
                best, bg = d, gain
        covered |= sets[best]
        picks.append((rank, best, bg, len(covered)))
        del sets[best]
    assert list(t.itertuples(index=False, name=None)) == picks
    # diminishing returns (submodularity)
    assert list(t.gain) == sorted(t.gain, reverse=True)


def test_media_batch_plan_matches_pure():
    t = Q.QUERIES["media_batch_plan"](SF).to_pandas() \
        .set_index(["kind", "bucket"])
    src = mm.make_media_table(256)
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    for i in range(len(src)):
        meta = mm._decode_payload(src["blob"][i].as_py())
        b = meta["payload_bytes"]
        bucket = "small" if b < 64 else ("medium" if b < 192
                                         else "large")
        agg[(src["kind"][i].as_py(), bucket)][0] += 1
        agg[(src["kind"][i].as_py(), bucket)][1] += b
    assert set(t.index) == set(agg)
    for k, (n, b) in agg.items():
        row = t.loc[k]
        assert (row.n_media, row.total_bytes) == (n, b)
        assert row.n_batches == (b + Q._BATCH_BYTE_BUDGET - 1) \
            // Q._BATCH_BYTE_BUDGET


def test_storage_tiers_matches_bruteforce():
    t = Q.QUERIES["lineitem_storage_tiers"](SF).to_pandas() \
        .set_index("tier")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_shipdate", "l_extendedprice"]
                       ).to_pandas()
    day = (li.l_shipdate.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    horizon = int(day.max())
    age = horizon - day
    tier = np.where(age <= 365, "hot",
                    np.where(age <= 1095, "warm", "cold"))
    cents = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    import pandas as pd
    g = pd.DataFrame({"tier": tier, "cents": cents}) \
        .groupby("tier").agg(n=("cents", "size"), c=("cents", "sum"))
    total = len(li)
    assert set(t.index) == set(g.index)
    for tr, row in g.iterrows():
        assert t.loc[tr].n_rows == row.n
        assert t.loc[tr].revenue_cents == row.c
        assert t.loc[tr].rows_share_nano \
            == Q._div_nano(int(row.n), total)
    # the archive dominates a multi-year fact table
    assert t.loc["cold"].n_rows > t.loc["hot"].n_rows
