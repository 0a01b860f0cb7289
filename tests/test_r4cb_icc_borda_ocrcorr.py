"""Cluster ICC/DEFF, supplier Borda, OCR-length concordance."""

from __future__ import annotations

import re

import glob

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_cluster_icc_matches_bruteforce():
    t = Q.QUERIES["pages_cluster_icc"](SF).to_pandas().iloc[0]
    rows = []
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        tb = pq.read_table(f, columns=["url", "text"])
        for u, x in zip(tb["url"].to_pylist(), tb["text"].to_pylist()):
            if x is not None:
                host = re.sub(r"/.*$", "",
                              re.sub(r"^[a-z]+://", "", u))
                rows.append((host, len(x)))
    from collections import defaultdict
    g = defaultdict(list)
    for h, y in rows:
        g[h].append(y)
    k, n = len(g), len(rows)
    s = sum(y for _, y in rows)
    ssq = sum(y * y for _, y in rows)
    sg2 = sum(Q._div_nano(sum(v) ** 2, len(v)) for v in g.values())
    ssb = sg2 - Q._div_nano(s * s, n)
    ssw = ssq * 10**9 - sg2
    msb = Q._rnd_div(ssb, k - 1)
    msw = Q._rnd_div(ssw, n - k)
    sn2 = sum(len(v) ** 2 for v in g.values())
    n0 = Q._rnd_div(n * 10**9 - Q._div_nano(sn2, n), k - 1)
    term = Q._div_nano((n0 - 10**9) * msw, 10**18)
    icc = Q._div_nano(msb - msw, msb + term)
    assert (t.n_pages, t.n_hosts) == (n, k)
    assert (t.msb_nano, t.msw_nano) == (msb, msw)
    assert t.n0_nano == n0
    assert t.icc_nano == icc
    assert t.deff_nano == 10**9 + Q._div_nano((n0 - 10**9) * icc, 10**18)
    # ICC is a correlation-like quantity; DEFF >= ~1 when ICC >= 0
    assert -10**9 <= t.icc_nano <= 10**9


def test_borda_consistency():
    t = Q.QUERIES["supplier_borda"](SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_suppkey", "l_partkey",
                                "l_extendedprice"]).to_pandas()
    li["cents"] = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    rev = li.groupby("l_suppkey").cents.sum()
    pn = li.groupby("l_suppkey").l_partkey.nunique()
    slopes = Q.QUERIES["supplier_trend_slopes"](SF).to_pandas() \
        .set_index("l_suppkey").slope_nano

    def ranks(series):
        order = sorted(series.index, key=lambda s: (-series[s], s))
        return {s: i + 1 for i, s in enumerate(order)}

    ra, rb, rc = ranks(rev), ranks(pn), ranks(slopes)
    want = sorted(((s, ra[s], rb[s], rc[s], ra[s] + rb[s] + rc[s])
                   for s in rev.index),
                  key=lambda r: (r[4], r[0]))[:Q._BORDA_TOP]
    assert list(t.itertuples(index=False, name=None)) == want
    # borda is the sum of its parts
    assert (t.borda == t.rank_revenue + t.rank_parts + t.rank_trend).all()


def test_ocr_length_corr_matches_bruteforce():
    t = Q.QUERIES["kg_ocr_length_corr"](SF).to_pandas().iloc[0]
    m = Q._mentions(SF).to_pandas()
    g = m.assign(ocr=(m.surface_norm != m.canonical.str.lower())
                 .astype(int)).groupby("canonical") \
        .agg(o=("ocr", "sum"), t=("ocr", "size"))
    rows = [(len(c), int(r.o), int(r.t)) for c, r in g.iterrows()]
    conc = disc = 0
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            dl = rows[i][0] - rows[j][0]
            dr = rows[i][1] * rows[j][2] - rows[j][1] * rows[i][2]
            conc += dl * dr > 0
            disc += dl * dr < 0
    assert t.n_canonicals == len(rows)
    assert (t.n_conc, t.n_disc) == (conc, disc)
    pairs = len(rows) * (len(rows) - 1) // 2
    assert t.tau_nano == Q._div_nano(conc - disc, pairs)
