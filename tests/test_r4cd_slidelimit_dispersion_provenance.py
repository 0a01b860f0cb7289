"""Sliding rate limit, price dispersion, shard provenance."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_sliding_rate_limit_matches_bruteforce():
    t = Q.QUERIES["events_sliding_rate_limit"](SF).to_pandas() \
        .set_index("user_id")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_id"]).to_pandas()
    ev["tus"] = ev.ts.astype("datetime64[us]").astype(np.int64)
    for uid, g in ev.groupby("user_id"):
        ts = np.sort(g.tus.to_numpy())
        lo = np.searchsorted(ts, ts - Q._SLIDE_T_US, side="left")
        cnt = np.arange(1, len(ts) + 1) - lo
        adm = int((cnt <= Q._SLIDE_K).sum())
        row = t.loc[uid]
        assert row.n_events == len(ts)
        assert row.n_admitted == adm
        assert row.n_rejected == len(ts) - adm
    # first K events of any user are always admitted
    assert (t.n_admitted >= np.minimum(t.n_events, Q._SLIDE_K)).all()


def test_price_dispersion_matches_pandas():
    t = Q.QUERIES["part_price_dispersion"](SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey",
                                "l_extendedprice"]).to_pandas()
    li["cents"] = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    g = li.groupby(["l_partkey", "l_suppkey"]).cents.agg(["sum", "count"])
    g["mean_nano"] = (2 * g["sum"] * 10**9 + g["count"]) \
        // (2 * g["count"])
    pp = g.groupby(level=0).mean_nano.agg(["min", "max", "count"])
    pp = pp[pp["count"] >= 2]
    pp["spread"] = pp["max"] - pp["min"]
    want = pp.sort_values(["spread"], ascending=False) \
        .reset_index().sort_values(["spread", "l_partkey"],
                                   ascending=[False, True]) \
        .head(Q._DISP_TOP)
    assert list(t.l_partkey) == list(want.l_partkey)
    assert list(t.spread_nano) == list(want.spread)
    assert (t.max_mean_nano >= t.min_mean_nano).all()
    assert (t.n_suppliers >= 2).all()


def test_shard_provenance_matches_footers():
    t = Q.QUERIES["pages_shard_provenance"](SF).to_pandas() \
        .set_index("shard")
    files = sorted(glob.glob(ensure_pages(SF) + "/*.parquet"))
    assert len(t) == len(files)
    for f in files:
        assert t.loc[os.path.basename(f)].n_rows \
            == pq.read_metadata(f).num_rows
    # all pages accounted for
    assert t.n_rows.sum() == sum(pq.read_metadata(f).num_rows
                                 for f in files)
