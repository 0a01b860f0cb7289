"""Pipeline funnel, kmeans margin, host staleness."""

from __future__ import annotations

import glob
import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_funnel_monotone_and_consistent():
    t = Q.QUERIES["kg_pipeline_funnel"](SF).to_pandas() \
        .set_index("stage")
    # raw >= dedup >= clean; mentions >= linked >= 0
    assert t.loc["raw_pages"].n_rows >= t.loc["dedup_pages"].n_rows
    assert t.loc["dedup_pages"].n_rows >= t.loc["clean_pages"].n_rows
    assert t.loc["mentions"].n_rows >= t.loc["linked_mentions"].n_rows
    # counts agree with the independent fixtures
    assert t.loc["mentions"].n_rows == Q._mentions(SF).count()
    assert t.loc["triples"].n_rows \
        == Q.kg.triples(Q._mentions(SF)).count()
    # retention chain: each stage's retained vs prev is consistent
    rows = t.reset_index().sort_values("stage_idx")
    prev = None
    for r in rows.itertuples():
        if prev is None:
            assert r.retained_nano == 10**9
        else:
            assert r.retained_nano == Q._div_nano(int(r.n_rows), prev)
        prev = int(r.n_rows)


def test_kmeans_margin_total_and_nonneg():
    t = Q.QUERIES["embeddings_kmeans_margin"](SF).to_pandas()
    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert int(t.n.sum()) == n
    assert list(t.bin) == list(range(Q._MARGIN_BINS))
    assert (t.lo_margin == t.bin * Q._MARGIN_W).all()
    # margins are non-negative by construction: bin 0 exists or not,
    # but no count can be negative
    assert (t.n >= 0).all()


def test_host_staleness_matches_bruteforce():
    t = Q.QUERIES["pages_host_staleness"](SF).to_pandas() \
        .set_index("host")
    last = {}
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        tb = pq.read_table(f, columns=["url", "warc_ts"])
        for u, ts in zip(tb["url"].to_pylist(),
                         tb["warc_ts"].to_pylist()):
            host = re.sub(r"/.*$", "", re.sub(r"^[a-z]+://", "", u))
            day = (np.datetime64(ts, "us").astype(np.int64)
                   // 86_400_000_000)
            last[host] = max(last.get(host, -10**9), int(day))
    horizon = max(last.values())
    assert set(t.index) == set(last)
    for h, d in last.items():
        assert t.loc[h].last_epoch_day == d
        assert t.loc[h].staleness_days == horizon - d
    assert (t.staleness_days >= 0).all()
    assert (t.staleness_days == 0).any()
