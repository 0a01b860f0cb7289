"""KWIC mention contexts, Fisher price indices."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_mention_contexts_windows_are_exact():
    t = Q.QUERIES["kg_mention_contexts"](SF).to_pandas()
    assert len(t) > 0
    # every context contains its surface exactly once, with the pads
    for r in t.sample(min(50, len(t)), random_state=3).itertuples():
        assert r.context.count(r.surface) == 1
        pos = r.context.index(r.surface)
        assert pos <= Q._KWIC_PAD  # left pad never exceeds the cap
        right = len(r.context) - pos - len(r.surface)
        assert right <= Q._KWIC_PAD
    # the restriction is genuine: some linked mentions were excluded as
    # position-ambiguous (multi-occurrence surfaces exist in the corpus)
    mentions = Q._mentions(SF).to_pandas()
    linked = mentions[mentions.qid != "NIL"]
    assert len(t) < len(linked)
    # and every emitted (url, surface) really is single-occurrence
    sub = t.sample(min(25, len(t)), random_state=5)
    page_text = {}
    from newsagency_classification_ray.functions.html import extract_text
    from newsagency_classification_ray.sources.pages import ensure_pages
    import glob

    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        tb = pq.read_table(f, columns=["url", "html", "text"])
        for u, h, x in zip(tb["url"].to_pylist(), tb["html"].to_pylist(),
                           tb["text"].to_pylist()):
            page_text.setdefault(u, x if x else extract_text(h))
    for r in sub.itertuples():
        assert page_text[r.url].count(r.surface) == 1
        assert r.context in page_text[r.url]


def test_price_index_matches_bruteforce():
    row = Q.QUERIES["lineitem_price_index"](SF).to_pandas().iloc[0]
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_shipdate", "l_quantity",
                                "l_extendedprice"]).to_pandas()
    li["year"] = pd.to_datetime(li.l_shipdate).dt.year
    li["rev"] = np.round(li.l_extendedprice * 100).astype(np.int64)
    li["period"] = np.where(li.year <= Q._PIDX_BASE_MAX, 0,
                            np.where(li.year >= Q._PIDX_CUR_MIN, 1, -1))
    g = li[li.period >= 0].groupby(["l_partkey", "period"]).agg(
        rev=("rev", "sum"), qty=("l_quantity", "sum"))
    l_num = l_den = p_num = p_den = 0.0
    n = 0
    for part in sorted(li.l_partkey.unique()):
        try:
            r0, q0 = g.loc[(part, 0)]
            r1, q1 = g.loc[(part, 1)]
        except KeyError:
            continue
        if q0 <= 0 or q1 <= 0:
            continue
        n += 1
        p0, p1 = r0 / q0, r1 / q1
        l_num += p1 * q0
        l_den += p0 * q0
        p_num += p1 * q1
        p_den += p0 * q1
    lasp, paas = l_num / l_den, p_num / p_den
    assert int(row.n_common_parts) == n
    assert int(row.laspeyres_micro) == int(round(lasp * 1e6))
    assert int(row.paasche_micro) == int(round(paas * 1e6))
    assert int(row.fisher_micro) == int(round(
        math.sqrt(lasp * paas) * 1e6))
    # Fisher lies between (or at) Laspeyres and Paasche
    lo, hi = sorted((row.laspeyres_micro, row.paasche_micro))
    assert lo - 1 <= row.fisher_micro <= hi + 1
