"""Entity timelines, RRF fusion, partition-key planner."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_entity_timeline_islands_match_bruteforce():
    t = Q.QUERIES["kg_entity_timeline"](SF).to_pandas().set_index("qid")
    m = Q._mentions(SF).to_pandas()
    linked = m[m.qid != "NIL"]
    for qid, g in linked.groupby("qid"):
        years = sorted(set(int(y) for y in g.year))
        row = t.loc[qid]
        assert row.first_year == years[0]
        assert row.last_year == years[-1]
        assert row.n_years == len(years)
        longest, run = 1, 1
        for a, b in zip(years, years[1:]):
            run = run + 1 if b == a + 1 else 1
            longest = max(longest, run)
        assert row.longest_run == longest
        cnt = g.groupby("year").size()
        peak = min(int(y) for y in cnt.index if cnt[y] == cnt.max())
        assert row.peak_year == peak and row.peak_n == cnt.max()
    assert row is not None


def test_rrf_scores_and_order():
    t = Q.QUERIES["docs_rrf_fusion"](SF).to_pandas()
    assert list(t["rank"]) == list(range(1, len(t) + 1))
    # scores strictly ordered with doc_id tie-break
    s = list(zip(-t.rrf_nano, t.doc_id))
    assert s == sorted(s)
    # max possible score = both-rank-1 terms
    top = Q._div_nano(1, 61) * 2
    assert (t.rrf_nano <= top).all()
    # any doc on both lists outranks a same-rank single-list doc
    assert (t.rrf_nano > 0).all()


def test_partition_planner_matches_pandas():
    import pyarrow as pa
    t = Q.QUERIES["lineitem_partition_planner"](SF)
    if hasattr(t, "to_pandas"):
        t = t.to_pandas()
    t = t.set_index("col")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=Q._PLANNER_KEYS).to_pandas()
    n = len(li)
    for col in Q._PLANNER_KEYS:
        c = li.groupby(col).size().to_numpy().astype(np.int64)
        row = t.loc[col]
        assert row.n_rows == n
        assert row.n_keys == len(c)
        assert row.max_share_nano == Q._div_nano(int(c.max()), n)
        assert row.gini_impurity_nano == 10**9 - Q._div_nano(
            int((c * c).sum()), n * n)
    # high-cardinality keys are better spread than 2-3-value flags
    assert t.loc["l_partkey"].gini_impurity_nano \
        > t.loc["l_returnflag"].gini_impurity_nano
