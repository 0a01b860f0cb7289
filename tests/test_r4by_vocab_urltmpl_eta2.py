"""Vocab coverage, URL templates, weekday eta-squared."""

from __future__ import annotations

import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages
from newsagency_classification_ray.vocab import WIKIDATA_IDS

SF = "/root/testdata/sf0.001"


def test_vocab_coverage_matches_bruteforce():
    t = Q.QUERIES["kg_vocab_coverage"](SF).to_pandas().set_index("lang")
    m = Q._mentions(SF).to_pandas()
    nv = len(WIKIDATA_IDS)
    for lang, g in m.groupby("lang"):
        att = g.canonical.nunique()
        row = t.loc[lang]
        assert (row.n_vocab, row.n_attested) == (nv, att)
        assert row.n_missing == nv - att
        assert row.coverage_nano == Q._div_nano(att, nv)
    assert set(t.index) == set(m.lang.unique())
    # every attested canonical is in the vocabulary
    assert set(m.canonical.unique()) <= set(WIKIDATA_IDS)


def test_url_templates_match_bruteforce():
    t = Q.QUERIES["pages_url_templates"](SF).to_pandas()
    import glob
    urls = []
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        urls += pq.read_table(f, columns=["url"])["url"].to_pylist()
    from collections import defaultdict
    pages_n = defaultdict(int)
    hosts = defaultdict(set)
    for u in urls:
        su = re.sub(r"^[a-z]+://", "", u)
        tm = re.sub(r"[0-9]+", "N", su)
        pages_n[tm] += 1
        hosts[tm].add(re.sub(r"/.*$", "", su))
    want = sorted(((k, pages_n[k], len(hosts[k])) for k in pages_n),
                  key=lambda r: (-r[1], r[0]))[:Q._URL_TMPL_TOP]
    assert list(t.itertuples(index=False, name=None)) == want
    # digit-collapsed article template dominates
    assert "article-N" in t.template.iloc[0]


def test_weekday_eta2_matches_bruteforce():
    t = Q.QUERIES["orders_weekday_eta2"](SF).to_pandas().iloc[0]
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderdate"]).to_pandas()
    day = (o.o_orderdate.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    cnt = day.value_counts()
    lo, hi = int(day.min()), int(day.max())
    ys = [(d, int(cnt.get(d, 0))) for d in range(lo, hi + 1)]
    n = len(ys)
    s = sum(y for _, y in ys)
    ssq = sum(y * y for _, y in ys)
    gs = {g: [0, 0] for g in range(7)}
    for d, y in ys:
        gs[(d + 4) % 7][0] += y
        gs[(d + 4) % 7][1] += 1
    ssb = sum(Q._div_nano(sg * sg, ng) for sg, ng in gs.values() if ng) \
        - Q._div_nano(s * s, n)
    sst = ssq * 10**9 - Q._div_nano(s * s, n)
    assert t.n_days == n
    assert t.eta2_nano == Q._div_nano(ssb, sst)
    assert 0 <= t.eta2_nano <= 10**9
    prod_all = 1
    for _, ng in gs.values():
        prod_all *= max(ng, 1)
    v = {g: gs[g][0] * (prod_all // gs[g][1]) for g in gs if gs[g][1]}
    assert t.peak_dow == min(g for g in v if v[g] == max(v.values()))
    assert t.trough_dow == min(g for g in v if v[g] == min(v.values()))
