"""Citation confidence, html-only rate, chunk overlap cost."""

from __future__ import annotations

import glob
import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_citation_confidence_matches_bruteforce():
    t = Q.QUERIES["kg_citation_confidence"](SF).to_pandas()
    m = Q._linked(SF).to_pandas()
    uq = m[["url", "qid"]].drop_duplicates()
    n_a = uq.groupby("qid").size()
    from collections import Counter
    both = Counter()
    for _, g in uq.groupby("url"):
        qs = sorted(set(g.qid))
        for x in qs:
            for y in qs:
                if x != y:
                    both[(x, y)] += 1
    rows = [(a, b, n, int(n_a[a]), Q._div_nano(n, int(n_a[a])))
            for (a, b), n in both.items()
            if n >= Q._CONF_MIN_SUPPORT]
    rows.sort(key=lambda r: (-r[4], r[0], r[1]))
    assert list(t.itertuples(index=False, name=None)) \
        == rows[:Q._CONF_TOP]
    assert (t.n_both <= t.n_src).all()
    assert (t.conf_nano <= 10**9).all()


def test_html_only_rate_matches_bruteforce():
    t = Q.QUERIES["pages_html_only_rate"](SF).to_pandas() \
        .set_index("host")
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        tb = pq.read_table(f, columns=["url", "text"])
        for u, x in zip(tb["url"].to_pylist(), tb["text"].to_pylist()):
            host = re.sub(r"/.*$", "", re.sub(r"^[a-z]+://", "", u))
            agg[host][0] += 1
            agg[host][1] += x is None
    assert set(t.index) == set(agg)
    for h, (n, ho) in agg.items():
        assert (t.loc[h].n_pages, t.loc[h].n_html_only) == (n, ho)
        assert t.loc[h].share_nano == Q._div_nano(ho, n)
    # extractor path is genuinely exercised somewhere
    assert t.n_html_only.sum() > 0


def test_chunk_overlap_cost_matches_bruteforce():
    t = Q.QUERIES["docs_chunk_overlap_cost"](SF).to_pandas() \
        .set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    S, R = Q._CHUNK_SIZE, Q._CHUNK_STRIDE
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    for src, txt in zip(docs.source, docs.text):
        tok = len([w for w in txt.split() if w])
        extra = max(tok - S, 0)
        nch = 1 + (extra + R - 1) // R
        agg[src][0] += tok
        agg[src][1] += (S - R) * (nch - 1) + tok
    for src, (tok, em) in agg.items():
        row = t.loc[src]
        assert (row.total_tokens, row.emitted_tokens) == (tok, em)
        assert row.overhead_nano == Q._div_nano(em - tok, tok)
    assert (t.emitted_tokens >= t.total_tokens).all()
