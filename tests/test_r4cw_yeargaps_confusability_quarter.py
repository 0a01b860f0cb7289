"""Year gaps, label confusability, quarter indices."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_year_gaps_match_bruteforce():
    t = Q.QUERIES["kg_mention_year_gaps"](SF).to_pandas().iloc[0]
    m = Q._linked(SF).to_pandas()
    ys = sorted(set(int(y) for y in m.year))
    lo, hi = ys[0], ys[-1]
    active = set(ys)
    gap = longest = run = 0
    for y in range(lo, hi + 1):
        if y not in active:
            gap += 1
            run += 1
            longest = max(longest, run)
        else:
            run = 0
    assert (t.first_year, t.last_year) == (lo, hi)
    assert t.n_years_span == hi - lo + 1
    assert t.n_active == len(active)
    assert t.n_gap_years == gap
    assert t.longest_gap == longest
    assert t.n_active + t.n_gap_years == t.n_years_span


def test_label_confusability_matches_bruteforce():
    t = Q.QUERIES["embeddings_label_confusability"](SF).to_pandas()
    e = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    qm = Q._q6v(np.array(e["embedding"].to_pylist(), np.float64))
    lab = np.array(e["label"].to_pylist(), np.int64)
    labs = sorted(set(lab.tolist()))
    sums = {lv: qm[lab == lv].astype(object).sum(0) for lv in labs}
    ns = {lv: int((lab == lv).sum()) for lv in labs}
    pairs = []
    for i, a in enumerate(labs):
        for b in labs[i + 1:]:
            num = int(sum((int(x) * ns[b] - int(y) * ns[a]) ** 2
                          for x, y in zip(sums[a], sums[b])))
            den = (ns[a] * ns[b]) ** 2
            pairs.append((a, b, (2 * num + den) // (2 * den)))
    pairs.sort(key=lambda p: (p[2], p[0], p[1]))
    assert list(t.itertuples(index=False, name=None)) \
        == pairs[:Q._CONFUSABLE_TOP]
    assert list(t.d2_q6) == sorted(t.d2_q6)


def test_quarter_index_matches_bruteforce():
    t = Q.QUERIES["orders_quarter_index"](SF).to_pandas() \
        .set_index("quarter")
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderdate"]).to_pandas()
    o["q"] = (o.o_orderdate.dt.month - 1) // 3 + 1
    o["day"] = (o.o_orderdate.astype("datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
    qd = o.groupby(["q", "day"]).size()
    per = qd.groupby(level=0).agg(["sum", "count"])
    n_tot, d_tot = int(per["sum"].sum()), int(per["count"].sum())
    for q, row in per.iterrows():
        tr = t.loc[q]
        assert (tr.n_orders, tr.n_days) == (row["sum"], row["count"])
        assert tr.index_nano == Q._div_nano(
            int(row["sum"]) * d_tot, int(row["count"]) * n_tot)
    # rate-weighted indices average to ~1e9 across quarters
    assert abs(int((t.index_nano * t.n_days).sum()) // d_tot - 10**9) \
        < 10**6
