"""Threshold ARI, link edit distances, audience overlap."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.functions.textproc import edit_distance

SF = "/root/testdata/sf0.001"


def test_threshold_ari_properties():
    t = Q.QUERIES["kg_threshold_ari"](SF).to_pandas().iloc[0]
    assert (t.t_lo, t.t_hi) == (Q._ARI_T_LO, Q._ARI_T_HI)
    # pruning edges can only fragment: k_hi >= k_lo
    assert t.k_hi >= t.k_lo
    assert t.n_nodes >= t.k_lo
    assert -10**9 <= t.ari_nano <= 10**9
    # ARI of a clustering with itself is 1: recompute with t_hi == t_lo
    old = Q._ARI_T_HI
    try:
        Q._ARI_T_HI = Q._ARI_T_LO
        same = Q.QUERIES["kg_threshold_ari"](SF).to_pandas().iloc[0]
        assert same.ari_nano == 10**9
        assert same.k_lo == same.k_hi
    finally:
        Q._ARI_T_HI = old


def test_link_edit_distances_match_bruteforce():
    t = Q.QUERIES["kg_link_edit_distances"](SF).to_pandas() \
        .set_index("dist")
    g = (Q._mentions(SF).to_pandas()
         .groupby(["surface_norm", "canonical"]).size())
    hist = collections.defaultdict(lambda: [0, 0])
    for (s, c), n in g.items():
        d = edit_distance(s, c.lower(), max_dist=Q._LINK_EDIT_BAND)
        hist[d][0] += 1
        hist[d][1] += int(n)
    assert sorted(hist) == list(t.index)
    for d in hist:
        assert (t.loc[d].n_surfaces, t.loc[d].n_mentions) \
            == tuple(hist[d])
    # exact citations dominate; OCR variants exist at dist 1
    assert 0 in hist and 1 in hist
    assert t.loc[0].n_mentions > t.loc[1].n_mentions


def test_audience_overlap_matches_pandas():
    t = Q.QUERIES["events_audience_overlap"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    sets = {k: set(g.user_id) for k, g in ev.groupby("event_type")}
    ks = sorted(sets)
    assert len(t) == len(ks) * (len(ks) - 1) // 2
    for r in t.itertuples():
        a, b = sets[r.type_a], sets[r.type_b]
        assert r.n_common == len(a & b)
        assert r.n_union == len(a | b)
        assert r.jaccard_nano == Q._div_nano(len(a & b), len(a | b))
