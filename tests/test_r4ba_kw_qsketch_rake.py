"""Kruskal-Wallis exact ranks, quantile-sketch error bound, RAKE."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.stages.retrieval import rake_phrases

SF = "/root/testdata/sf0.001"


def test_kruskal_wallis_matches_scipy_formula():
    r = Q.QUERIES["lineitem_kruskal_wallis"](SF).to_pylist()[0]
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_returnflag", "l_quantity"]).to_pandas()
    vals = li.l_quantity.astype(int).to_numpy()
    # midranks via pandas (average method == midrank for integer ties)
    import pandas as pd

    rk = pd.Series(vals).rank(method="average").to_numpy()
    n = len(vals)
    h = 0.0
    for _, grp in li.groupby("l_returnflag"):
        rs = rk[grp.index.to_numpy()].sum()
        h += rs * rs / len(grp)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    assert abs(r["h_nano"] / 1e9 - h) < 1e-4
    _, t_counts = np.unique(vals, return_counts=True)
    c = 1 - (t_counts.astype(float) ** 3 - t_counts).sum() / (n**3 - n)
    assert abs(r["hc_nano"] / 1e9 - h / c) < 1e-4
    assert r["n"] == n and r["df"] == li.l_returnflag.nunique() - 1


def test_quantile_sketch_rank_error_within_bound():
    t = Q.QUERIES["lineitem_quantile_sketch"](SF).to_pandas()
    # construction guarantee: rank error <= 2 * eps
    assert (t.rank_err_nano <= int(2 * Q._QSK_EPS * 1e9)).all()
    # estimates must be actual data values
    cents = (pq.read_table(f"{SF}/lineitem.parquet",
                           columns=["l_extendedprice"])
             .to_pandas().l_extendedprice * 100).round().astype(int)
    assert set(t.est_cents).issubset(set(cents))
    # band sanity: n_lt < rank implies est not above target region much
    assert (t.n_lt < t.n_le).all() or (t.n_lt <= t.n_le).all()


def test_quantile_sketch_exact_when_eps_large_rank1():
    """p50 estimate's true rank band must contain a value within 2 eps n
    of the target — re-derive from raw data."""
    t = Q.QUERIES["lineitem_quantile_sketch"](SF).to_pandas()
    row = t[t.p_pct == 50].iloc[0]
    assert row.n_lt + 1 <= row.rank_target + int(2 * Q._QSK_EPS *
                                                 (row.n_le + row.n_lt + 1))


def test_rake_scores_consistent_with_kernel():
    top = Q.QUERIES["docs_rake_topk"](SF).to_pandas()
    assert len(top) == 20
    # scores strictly follow the (score desc, phrase asc) order
    key = list(zip(-top.score_nano, top.phrase))
    assert key == sorted(key)
    # recompute one phrase's score by hand
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas().text
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for s in docs:
        for ph in rake_phrases(s):
            for w in ph:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(ph)
    from newsagency_classification_ray.queries import _div_nano

    ph0 = top.phrase.iloc[0].split()
    want = sum(_div_nano(deg[w], freq[w]) for w in ph0)
    assert int(top.score_nano.iloc[0]) == want
