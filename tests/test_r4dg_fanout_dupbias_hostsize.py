"""Article fan-out hist, dup quality bias, host size census."""

from __future__ import annotations

import glob
import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_article_agency_hist_matches_bruteforce():
    t = Q.QUERIES["kg_article_agency_hist"](SF).to_pandas() \
        .set_index("n_agencies")
    m = Q._linked(SF).to_pandas()
    per = m[["url", "qid"]].drop_duplicates().groupby("url").size()
    from collections import Counter
    census = Counter(per.values)
    assert set(t.index) == set(census)
    for k, v in census.items():
        assert t.loc[k].n_articles == v
    assert t.n_articles.sum() == len(per)


def test_dup_quality_bias_matches_bruteforce():
    t = Q.QUERIES["docs_dup_quality_bias"](SF).to_pandas().iloc[0]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "n_chars"]).to_pandas()
    g = docs.groupby("text").n_chars.agg(["size", "sum"])
    dup = g[g["size"] > 1]
    uni = g[g["size"] == 1]
    dn, dc = int(dup["size"].sum()), int(dup["sum"].sum())
    un, uc = int(uni["size"].sum()), int(uni["sum"].sum())
    assert (t.n_dup_docs, t.n_unique_docs) == (dn, un)
    assert t.mean_dup_nano == (Q._div_nano(dc, dn) if dn else 0)
    assert t.mean_unique_nano == (Q._div_nano(uc, un) if un else 0)
    assert t.diff_nano == t.mean_dup_nano - t.mean_unique_nano


def test_host_size_hist_matches_bruteforce():
    t = Q.QUERIES["pages_host_size_hist"](SF).to_pandas() \
        .set_index("bucket_log2")
    from collections import Counter, defaultdict
    per = Counter()
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        for u in pq.read_table(f, columns=["url"])["url"].to_pylist():
            per[re.sub(r"/.*$", "", re.sub(r"^[a-z]+://", "", u))] += 1
    census = defaultdict(lambda: [0, 0])
    for n in per.values():
        b = n.bit_length() - 1
        census[b][0] += 1
        census[b][1] += n
    assert set(t.index) == set(census)
    for b, (h, p) in census.items():
        assert (t.loc[b].n_hosts, t.loc[b].n_pages) == (h, p)
    assert t.n_pages.sum() == sum(per.values())
