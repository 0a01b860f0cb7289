"""Error budget, case variants, cross-source dups."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_error_budget_matches_bruteforce():
    t = Q.QUERIES["events_error_budget"](SF).to_pandas() \
        .set_index("epoch_day")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    ev["day"] = (ev.ts.astype("datetime64[us]").astype(np.int64)
                 // 86_400_000_000)
    for d, g in ev.groupby("day"):
        e = int((g.event_type == "error").sum())
        n = len(g)
        row = t.loc[d]
        assert (row.n_events, row.n_errors) == (n, e)
        assert row.burn_nano == Q._div_nano(
            e * 10**9, n * Q._ERROR_BUDGET_NANO)
    # ~20 % error rate in the synthetic stream: burn way over budget
    assert (t.burn_nano > 10**9).any()


def test_case_variants_match_bruteforce():
    t = Q.QUERIES["kg_surface_case_variants"](SF).to_pandas().iloc[0]
    m = Q._mentions(SF).to_pandas()
    per = m.groupby("surface_norm").surface.nunique()
    assert t.n_norms == len(per)
    assert t.n_with_variants == int((per > 1).sum())
    mx = int(per.max())
    assert t.max_variants == mx
    assert t.top_norm == min(k for k in per.index if per[k] == mx)


def test_cross_source_dups_match_bruteforce():
    t = Q.QUERIES["docs_cross_source_dups"](SF).to_pandas().iloc[0]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "source"]).to_pandas()
    g = docs.groupby("text").agg(ndocs=("source", "size"),
                                 nsrc=("source", "nunique"))
    dup = g[g.ndocs > 1]
    cross = dup[dup.nsrc > 1]
    assert t.n_dup_groups == len(dup)
    assert t.n_cross_source_groups == len(cross)
    assert t.n_docs_in_cross == int(cross.ndocs.sum())
    if len(dup):
        assert t.cross_share_nano == Q._div_nano(len(cross), len(dup))
