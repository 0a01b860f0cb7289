"""Supplier overlap clusters, agency host census, capture concentration."""

from __future__ import annotations

import glob
import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_supplier_clusters_match_bruteforce():
    t = Q.QUERIES["supplier_overlap_clusters"](SF).to_pandas().iloc[0]
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_suppkey", "l_partkey"]).to_pandas()
    sets = {s: set(g.l_partkey) for s, g in li.groupby("l_suppkey")}
    ks = sorted(sets)
    parent = {s: s for s in ks}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            c = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if u and Q._div_nano(c, u) >= Q._SUPP_CLUSTER_J_NANO:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter
    comp = Counter(find(s) for s in ks)
    assert t.n_suppliers == len(ks)
    assert t.n_clusters == len(comp)
    assert t.largest_cluster == max(comp.values())
    assert t.n_isolated == sum(1 for v in comp.values() if v == 1)


def test_agency_host_census_matches_bruteforce():
    t = Q.QUERIES["kg_agency_host_census"](SF).to_pandas() \
        .set_index("n_hosts")
    m = Q._linked(SF).to_pandas()
    per = m.groupby("qid").host.nunique()
    from collections import Counter
    census = Counter(per.values)
    assert set(t.index) == set(census)
    for k, v in census.items():
        assert t.loc[k].n_agencies == v
    assert t.n_agencies.sum() == len(per)


def test_capture_concentration_matches_bruteforce():
    t = Q.QUERIES["pages_capture_concentration"](SF).to_pandas() \
        .set_index("host")
    from collections import Counter, defaultdict
    per = defaultdict(Counter)
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        tb = pq.read_table(f, columns=["url", "warc_ts"])
        for u, ts in zip(tb["url"].to_pylist(),
                         tb["warc_ts"].to_pylist()):
            host = re.sub(r"/.*$", "", re.sub(r"^[a-z]+://", "", u))
            day = np.datetime64(ts, "us").astype(np.int64) \
                // 86_400_000_000
            per[host][int(day)] += 1
    assert set(t.index) == set(per)
    for h, c in per.items():
        n = sum(c.values())
        mx = max(c.values())
        row = t.loc[h]
        assert (row.n_pages, row.top_day_n) == (n, mx)
        assert row.top_share_nano == Q._div_nano(mx, n)
