"""Calinski-Harabasz, sort-RLE planner, Durbin-Watson."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_calinski_matches_bruteforce():
    t = Q.QUERIES["embeddings_calinski"](SF).to_pandas().iloc[0]
    e = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    qm = Q._q6v(np.array(e["embedding"].to_pylist(), np.float64))
    lab = np.array(e["label"].to_pylist(), np.int64)
    n, k = len(qm), len(set(lab.tolist()))
    sd = qm.sum(0).astype(object)
    total_sq = int((qm.astype(object) ** 2).sum())
    w_nano = total_sq * 10**9
    b_nano = 0
    for lv in sorted(set(lab.tolist())):
        sel = lab == lv
        nj = int(sel.sum())
        sj = qm[sel].sum(0).astype(object)
        w_nano -= Q._div_nano(int(sum(int(x) ** 2 for x in sj)), nj)
        b_nano += Q._div_nano(
            int(sum((int(a) * n - int(b) * nj) ** 2
                    for a, b in zip(sj, sd))), nj * n * n)
    w_q6 = (2 * w_nano + 10**9) // (2 * 10**9)
    b_q6 = (2 * b_nano + 10**9) // (2 * 10**9)
    assert (t.n, t.k) == (n, k)
    assert t.w_q6 == w_q6 and t.b_q6 == b_q6
    assert t.ch_nano == Q._div_nano(b_q6 * (n - k), w_q6 * (k - 1))
    # sanity: W + B equals total scatter around the global mean (approx,
    # up to the per-label nano roundings) — check within n*k nano slack
    tot_scatter = sum(
        Q._div_nano(int(sum((int(x) * n - int(s)) ** 2
                            for x, s in zip(row, sd))), n * n)
        for row in qm.astype(object))
    assert abs((w_nano + b_nano) - tot_scatter) < (n + k + 2) * 10**9


def test_sort_rle_planner_matches_pandas():
    t = Q.QUERIES["orders_sort_rle_planner"](SF).to_pandas() \
        .set_index("sort_key")
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    for cand in Q._RLE_SORT_KEYS:
        srt = o.sort_values([cand, "o_orderkey"])
        pr = srt.o_orderpriority.to_numpy()
        st = srt.o_orderstatus.to_numpy()
        runs_p = 1 + int((pr[1:] != pr[:-1]).sum())
        runs_s = 1 + int((st[1:] != st[:-1]).sum())
        assert t.loc[cand].runs_priority == runs_p
        assert t.loc[cand].runs_status == runs_s
    # low-cardinality sort key itself gives near-minimal runs for that col
    assert t.loc["o_orderstatus"].runs_status \
        == o.o_orderstatus.nunique()


def test_durbin_watson_matches_bruteforce():
    t = Q.QUERIES["orders_durbin_watson"](SF).to_pandas().iloc[0]
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderdate"]).to_pandas()
    day = (o.o_orderdate.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    cnt = day.value_counts()
    lo, hi = int(day.min()), int(day.max())
    ys = [int(cnt.get(d, 0)) for d in range(lo, hi + 1)]
    n = len(ys)
    sx = n * (n - 1) // 2
    sxx = (n - 1) * n * (2 * n - 1) // 6
    sy = sum(ys)
    sxy = sum(i * y for i, y in enumerate(ys))
    det = n * sxx - sx * sx
    b = Q._div_nano(n * sxy - sx * sy, det)
    a = Q._div_nano(sy * sxx - sx * sxy, det)
    e = [y * 10**9 - a - b * i for i, y in enumerate(ys)]
    num = sum((u - v) ** 2 for u, v in zip(e[1:], e))
    den = sum(v * v for v in e)
    assert (t.n_days, t.a_nano, t.b_nano) == (n, a, b)
    assert t.dw_nano == Q._div_nano(num, den)
    # DW lives in [0, 4]
    assert 0 <= t.dw_nano <= 4 * 10**9
