"""Sign test, per-dim F-scores, acceptance sampling."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_sign_test_matches_bruteforce():
    t = Q.QUERIES["kg_growth_sign_test"](SF).to_pandas().set_index("qid")
    m = Q._linked(SF).to_pandas()
    g = m.groupby(["qid", "year"]).size()
    for qid, s in g.groupby(level=0):
        ys = {int(y): int(v) for (_, y), v in s.items()}
        ups = downs = 0
        for y in sorted(ys):
            if y + 1 in ys:
                ups += ys[y + 1] > ys[y]
                downs += ys[y + 1] < ys[y]
        n = ups + downs
        if n == 0:
            assert qid not in t.index
            continue
        mm = min(ups, downs)
        c, tail = 1, 0
        for k in range(mm + 1):
            tail += c
            c = c * (n - k) // (k + 1)
        row = t.loc[qid]
        assert (row.n_pairs, row.n_up) == (n, ups)
        assert row.p_nano == min(10**9, Q._div_nano(2 * tail, 2**n))
    # balanced up/down gives p = 1
    assert (t.p_nano <= 10**9).all() and (t.p_nano > 0).all()


def test_dim_fscores_match_bruteforce():
    t = Q.QUERIES["embeddings_dim_fscores"](SF).to_pandas()
    e = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    qm = Q._q6v(np.array(e["embedding"].to_pylist(), np.float64))
    lab = np.array(e["label"].to_pylist(), np.int64)
    n, dims = qm.shape
    rows = []
    for d in range(dims):
        col = qm[:, d].astype(object)
        sd = int(col.sum())
        sq = int((col ** 2).sum())
        ssb = sum(Q._div_nano(int(col[lab == lv].sum()) ** 2,
                              int((lab == lv).sum()))
                  for lv in set(lab.tolist())) - Q._div_nano(sd * sd, n)
        sst = sq * 10**9 - Q._div_nano(sd * sd, n)
        rows.append((d + 1, Q._div_nano(ssb, sst) if sst else 0))
    rows.sort(key=lambda r: (-r[1], r[0]))
    assert list(t.itertuples(index=False, name=None)) \
        == rows[:Q._DIM_FSCORE_TOP]
    assert (t.eta2_nano >= 0).all()


def test_acceptance_sampling_matches_pandas():
    t = Q.QUERIES["supplier_acceptance_sampling"](SF).to_pandas() \
        .set_index("l_suppkey")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_suppkey", "l_orderkey",
                                "l_linenumber", "l_returnflag"]
                       ).to_pandas()
    for s, g in li.groupby("l_suppkey"):
        g = g.sort_values(["l_orderkey", "l_linenumber"]).head(Q._AQL_N)
        defects = int((g.l_returnflag == "R").sum())
        row = t.loc[s]
        assert row.n_sampled == len(g)
        assert row.n_defects == defects
        assert row.accepted == int(defects <= Q._AQL_C)
    assert set(t.index) == set(li.l_suppkey.unique())
