"""Syndication, price drift, filter overlap."""

from __future__ import annotations

import glob
import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_syndication_matches_bruteforce():
    t = Q.QUERIES["pages_syndication"](SF).to_pandas().iloc[0]
    from collections import defaultdict
    hosts = defaultdict(set)
    pages_n = defaultdict(int)
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        tb = pq.read_table(f, columns=["url", "text"])
        for u, x in zip(tb["url"].to_pylist(), tb["text"].to_pylist()):
            if x is None:
                continue
            host = re.sub(r"/.*$", "", re.sub(r"^[a-z]+://", "", u))
            hosts[x].add(host)
            pages_n[x] += 1
    syn = [x for x in hosts if len(hosts[x]) > 1]
    assert t.n_text_groups == len(hosts)
    assert t.n_syndicated_groups == len(syn)
    assert t.n_pages_syndicated == sum(pages_n[x] for x in syn)
    assert t.max_hosts == max((len(hosts[x]) for x in syn), default=1)
    # the synthetic corpus does contain at least one wire reprint
    assert t.n_syndicated_groups >= 1


def test_price_drift_matches_pandas():
    t = Q.QUERIES["part_price_drift"](SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    li["cents"] = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    li = li.sort_values(["l_partkey", "l_shipdate", "l_orderkey",
                         "l_linenumber"])
    rows = []
    for p, g in li.groupby("l_partkey"):
        fc = int(g.cents.iloc[0])
        lc = int(g.cents.iloc[-1])
        rows.append((p, fc, lc, lc - fc))
    rows.sort(key=lambda r: (-abs(r[3]), r[0]))
    assert list(t.itertuples(index=False, name=None)) \
        == rows[:Q._DRIFT_TOP]


def test_filter_overlap_matches_bruteforce():
    t = Q.QUERIES["docs_filter_overlap"](SF).to_pandas() \
        .set_index(["filter_a", "filter_b"])
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "n_chars"]).to_pandas()
    f_len = docs.n_chars < 200
    f_tok = docs.text.apply(
        lambda s: len([w for w in s.split() if w]) < 30)
    f_up = docs.text.apply(
        lambda s: len(re.sub(r"[^A-Z]", "", s)) * 5 >= len(s))
    fl = {"len": f_len.to_numpy(), "tokens": f_tok.to_numpy(),
          "upper": f_up.to_numpy()}
    for (a, b) in [("len", "tokens"), ("len", "upper"),
                   ("tokens", "upper")]:
        both = int((fl[a] & fl[b]).sum())
        either = int((fl[a] | fl[b]).sum())
        row = t.loc[(a, b)]
        assert (row.n_both_fail, row.n_either_fail) == (both, either)
        if either:
            assert row.jaccard_nano == Q._div_nano(both, either)
