"""Mixture resampling, KG mention density, forecast backtest."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def _md5_mod(key: str, mod: int) -> int:
    return struct.unpack("<Q", hashlib.md5(key.encode()).digest()[8:])[0] % mod


def test_mixture_resample_predicate_and_shares():
    t = Q.QUERIES["docs_mixture_resample"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source"]).to_pandas()
    n_by = docs.groupby("source").size()
    N, S = len(docs), len(n_by)
    # exact per-doc predicate
    kept = set(t.doc_id)
    for did, src in zip(docs.doc_id, docs.source):
        h = _md5_mod(f"mix:{did}", 1_000_000)
        want = h * S * int(n_by[src]) < N * 1_000_000
        assert (did in kept) == want
    # under-represented sources (r >= 1) are kept whole
    for src, n in n_by.items():
        if S * n <= N:
            assert (t.source == src).sum() == n
    # kept shares are closer to uniform than the input shares
    ks = t.groupby("source").size().reindex(n_by.index).fillna(0)
    in_dev = (n_by / N - 1 / S).abs().max()
    out_dev = (ks / ks.sum() - 1 / S).abs().max()
    assert out_dev <= in_dev + 1e-9


def test_mention_density_page_and_mention_totals():
    t = Q.QUERIES["kg_mention_density"](SF)
    t = t.to_pandas() if hasattr(t, "to_pandas") else t
    # mention totals agree with the linked-mention table
    m = Q._mentions(SF).to_pandas()
    linked = m[m.qid != "NIL"]
    assert t.n_mentions.sum() == len(linked)
    # per-(host, year) mention cells agree
    cells = linked.groupby(["host", "year"]).size()
    got = t.set_index(["host", "year"]).n_mentions
    for (h, y), n in cells.items():
        assert got.loc[(h, int(y))] == n
    # density formula
    for _, r in t.head(50).iterrows():
        assert r.mentions_per_kchar_nano == Q._div_nano(
            int(r.n_mentions) * 1000, int(r.chars))
    assert (t.chars > 0).all() and (t.n_pages > 0).all()


def test_forecast_backtest_matches_pandas():
    t = Q.QUERIES["orders_forecast_backtest"](SF).to_pandas() \
        .set_index("forecaster")
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_orderdate"]).to_pandas()
    days = (od.o_orderdate.astype("int64") // 86_400_000_000) \
        .value_counts().sort_index()
    y = days.to_numpy()
    naive = np.abs(y[7:] - y[6:-1]).sum()
    snaive = np.abs(y[7:] - y[:-7]).sum()
    tm = np.array([Q._div_round(int(y[i - 7:i].sum()), 7)
                   for i in range(7, len(y))])
    tmean = np.abs(y[7:] - tm).sum()
    assert int(t.loc["naive"].sae) == naive
    assert int(t.loc["seasonal_naive"].sae) == snaive
    assert int(t.loc["trailing_mean7"].sae) == tmean
    assert (t.n_eval == len(y) - 7).all()
    for k in t.index:
        assert int(t.loc[k].mae_nano) == Q._div_nano(
            int(t.loc[k].sae), int(t.loc[k].n_eval))
