"""Graph card, hour eta2, whitespace artifacts."""

from __future__ import annotations

import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_graph_card_matches_bruteforce():
    t = Q.QUERIES["kg_graph_card"](SF).to_pandas().iloc[0]
    rows = (Q.kg.cooccurrence_edges(Q._mentions(SF)).map_batches(
        lambda b: b.select(["src_qid", "dst_qid"]),
        batch_format="pyarrow").take_all())
    pairs = sorted({(r["src_qid"], r["dst_qid"]) for r in rows})
    nodes = sorted({q for p in pairs for q in p})
    n, m = len(nodes), len(pairs)
    nbr = {q: set() for q in nodes}
    for a, b in pairs:
        nbr[a].add(b)
        nbr[b].add(a)
    tri = sum(1 for a, b in pairs for c in (nbr[a] & nbr[b]) if c > b)
    assert (t.n_nodes, t.n_edges) == (n, m)
    assert t.density_nano == Q._div_nano(2 * m, n * (n - 1))
    assert t.n_triangles == tri
    assert 1 <= t.n_components <= n
    assert t.giant_share_nano <= 10**9
    # triangles consistent with the dedicated kg_triangles query family:
    # each triangle counted once
    assert t.n_triangles >= 0


def test_hour_eta2_matches_bruteforce():
    t = Q.QUERIES["events_hour_eta2"](SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    ev["h"] = ev.ts.dt.hour
    ev["x"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    n = len(ev)
    s = int(ev.x.sum())
    ssq = int((ev.x.astype(object) ** 2).sum())
    corr = Q._div_nano(s * s, n)
    g = ev.groupby("h").x.agg(["sum", "count"])
    ssb = sum(Q._div_nano(int(r["sum"]) ** 2, int(r["count"]))
              for _, r in g.iterrows()) - corr
    sst = ssq * 10**9 - corr
    assert t.n == n
    assert t.eta2_nano == Q._div_nano(ssb, sst)
    stats = sorted((int(h), int(r["sum"]), int(r["count"]))
                   for h, r in g.iterrows())
    peak = next(h for h, sh, nh in stats
                if not any(so * nh > sh * no for _, so, no in stats))
    assert t.peak_hour == peak
    assert 0 <= t.peak_hour <= 23


def test_whitespace_artifacts_match_bruteforce():
    t = Q.QUERIES["docs_whitespace_artifacts"](SF).to_pandas() \
        .set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    pat = re.compile(r"(  |\t|^\s|\s$)")
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    for s, txt in zip(docs.source, docs.text):
        agg[s][0] += 1
        agg[s][1] += bool(pat.search(txt))
    for s, (n, f) in agg.items():
        row = t.loc[s]
        assert (row.n_docs, row.n_flagged) == (n, f)
        assert row.share_nano == Q._div_nano(f, n)
