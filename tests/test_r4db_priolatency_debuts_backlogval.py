"""Priority ship latency, host debuts, value backlog."""

from __future__ import annotations

import collections
import glob
import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_priority_ship_latency_matches_pandas():
    t = Q.QUERIES["orders_priority_ship_latency"](SF).to_pandas() \
        .set_index("o_orderpriority")
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_shipdate"]).to_pandas()
    end = (li.assign(d=li.l_shipdate.astype("datetime64[us]")
                     .astype(np.int64) // 86_400_000_000)
           .groupby("l_orderkey").d.max())
    o = o[o.o_orderkey.isin(end.index)]
    o["gap"] = (end.loc[o.o_orderkey].to_numpy()
                - o.o_orderdate.astype("datetime64[us]")
                .astype(np.int64).to_numpy() // 86_400_000_000)
    for p, g in o.groupby("o_orderpriority"):
        gaps = sorted(g.gap)
        n = len(gaps)
        row = t.loc[p]
        assert row.n_orders == n
        assert row.med_days_x2 == gaps[(n - 1) // 2] + gaps[n // 2]


def test_host_debuts_match_bruteforce():
    t = Q.QUERIES["pages_host_debuts"](SF).to_pandas().set_index("year")
    debut = {}
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        tb = pq.read_table(f, columns=["url", "warc_ts"])
        for u, ts in zip(tb["url"].to_pylist(),
                         tb["warc_ts"].to_pylist()):
            host = re.sub(r"/.*$", "", re.sub(r"^[a-z]+://", "", u))
            debut[host] = min(debut.get(host, 9999), ts.year)
    census = collections.Counter(debut.values())
    assert set(t.index) == set(census)
    for y, n in census.items():
        assert t.loc[y].n_debut_hosts == n
    assert t.n_debut_hosts.sum() == len(debut)


def test_backlog_value_matches_bruteforce():
    t = Q.QUERIES["orders_backlog_value"](SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_shipdate"]).to_pandas()
    end = (li.assign(d=li.l_shipdate.astype("datetime64[us]")
                     .astype(np.int64) // 86_400_000_000)
           .groupby("l_orderkey").d.max())
    o = o[o.o_orderkey.isin(end.index)].copy()
    o["startd"] = (o.o_orderdate.astype("datetime64[us]")
                   .astype(np.int64) // 86_400_000_000)
    o["cents"] = np.round(o.o_totalprice.to_numpy() * 100) \
        .astype(np.int64)
    deltas = collections.defaultdict(int)
    for r in o.itertuples():
        e = int(end.loc[r.o_orderkey])
        deltas[int(r.startd)] += int(r.cents)
        deltas[e + 1] -= int(r.cents)
    lo, hi = min(deltas), max(deltas) - 1
    cur, expect = 0, []
    for d in range(lo, hi + 1):
        cur += deltas.get(d, 0)
        expect.append(cur)
    assert list(t.epoch_day) == list(range(lo, hi + 1))
    assert list(t.open_cents) == expect
    assert (t.open_cents >= 0).all()
