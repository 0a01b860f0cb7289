"""Dedup-method agreement, monthly ship latency, user Gini."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def _pairs(res):
    t = res if isinstance(res, pa.Table) else pa.concat_tables(
        list(res.iter_batches(batch_format="pyarrow")))
    return set(zip((int(x) for x in t["doc_a"].to_pylist()),
                   (int(x) for x in t["doc_b"].to_pylist())))


def test_dedup_method_agreement_consistency():
    t = Q.QUERIES["docs_dedup_method_agreement"](SF).to_pandas().iloc[0]
    mh = _pairs(Q.q_minhash_pairs(SF))
    sh = _pairs(Q.q_simhash_pairs(SF))
    assert (t.n_minhash, t.n_simhash) == (len(mh), len(sh))
    assert t.n_both == len(mh & sh)
    union = len(mh | sh)
    assert t.jaccard_nano == Q._div_nano(len(mh & sh), union)
    # both sketches fire on the same exact-duplicate core
    assert t.n_both > 0


def test_monthly_ship_latency_matches_pandas():
    t = Q.QUERIES["orders_monthly_ship_latency"](SF).to_pandas() \
        .set_index("month_idx")
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_orderdate"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_shipdate"]).to_pandas()
    end = (li.assign(d=li.l_shipdate.astype("datetime64[us]")
                     .astype(np.int64) // 86_400_000_000)
           .groupby("l_orderkey").d.max())
    o = o[o.o_orderkey.isin(end.index)]
    o["m"] = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month - 1
    o["gap"] = (end.loc[o.o_orderkey].to_numpy()
                - o.o_orderdate.astype("datetime64[us]")
                .astype(np.int64).to_numpy() // 86_400_000_000)
    for m, g in o.groupby("m"):
        gaps = sorted(g.gap)
        n = len(gaps)
        med2 = gaps[(n - 1) // 2] + gaps[n // 2]
        row = t.loc[m]
        assert row.n_orders == n
        assert row.med_days_x2 == med2
    # medians live inside the observed gap range (the synthetic data
    # DOES contain ship-before-order rows — see lineitem_business_rules
    # — so negative medians are legitimate, not a bug)
    assert t.med_days_x2.min() >= 2 * o.gap.min()
    assert t.med_days_x2.max() <= 2 * o.gap.max()


def test_user_gini_matches_bruteforce():
    t = Q.QUERIES["events_user_gini"](SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "value"]).to_pandas()
    ev["cents"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    per = ev.groupby("user_id").cents.sum().sort_values(kind="stable")
    xs = sorted(zip(per.values, per.index))
    n = len(xs)
    total = int(sum(x for x, _ in xs))
    w = sum((i + 1) * int(x) for i, (x, _) in enumerate(xs))
    gini = Q._div_nano(2 * w, n * total) - Q._div_nano(n + 1, n)
    assert (t.n_users, t.total_cents) == (n, total)
    assert t.gini_nano == gini
    assert -10**9 <= t.gini_nano <= 10**9
