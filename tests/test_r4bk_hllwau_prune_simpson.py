"""HLL windowed WAU, curve-prune comparison, Simpson stratification audit."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import newsagency_classification_ray.ops as ops
import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_hll_wau_error_within_sketch_band():
    t = Q.QUERIES["events_hll_wau"](SF).to_pandas()
    assert len(t) > 0
    # exact side equals the standalone exact WAU query
    wau = Q.QUERIES["events_wau"](SF).to_pandas().set_index("day").wau
    got = t.set_index("day").wau_exact
    assert (got.sort_index() == wau.sort_index()).all()
    # p=12 sketch: ~1.6% expected error; allow a generous 10% + small-n slack
    rel = (t.wau_est - t.wau_exact).abs() / t.wau_exact.clip(lower=1)
    assert (rel < 0.10 + 5 / t.wau_exact.clip(lower=1)).all()
    # single-day union == daily sketch (union of one) is internally used;
    # estimates are positive
    assert (t.wau_est > 0).all()


def test_curve_prune_hilbert_not_worse_on_diagonal():
    t = Q.QUERIES["lineitem_curve_prune"](SF)
    import pyarrow as pa
    if hasattr(t, "take_all"):
        t = pa.Table.from_pylist(t.take_all()).to_pandas()
    elif hasattr(t, "to_pandas"):
        t = t.to_pandas()
    assert set(t.layout) == {"zorder", "hilbert"}
    assert (t.n_touched <= t.n_buckets).all()
    # totals across the diagonal workload: hilbert prunes at least as well
    tot = t.groupby("layout").n_touched.sum()
    assert tot["hilbert"] <= tot["zorder"] + len(t) // 2  # sanity bound
    # every box touches at least one bucket (boxes are data-derived)
    assert (t.groupby("box_id").n_touched.max() >= 1).all()


def test_simpson_cells_match_pandas():
    t = Q.QUERIES["events_simpson"](SF).to_pandas().set_index("stratum")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    arm = ((ev.user_id.to_numpy().astype(np.uint64)
            * np.uint64(Q._KMV_A) + np.uint64(Q._KMV_B)) & np.uint64(1)) \
        .astype(int)
    strat = (ev.ts.astype("int64") // 86_400_000_000 % 7).to_numpy()
    p = (ev.event_type == "purchase").to_numpy().astype(int)
    df = pd.DataFrame({"arm": arm, "s": strat, "p": p})
    for s, g in df.groupby("s"):
        row = t.loc[s]
        a, b = g[g.arm == 0], g[g.arm == 1]
        assert row.a_purch == a.p.sum() and row.a_total == len(a)
        assert row.b_purch == b.p.sum() and row.b_total == len(b)
        want = np.sign(int(row.a_purch) * int(row.b_total)
                       - int(row.b_purch) * int(row.a_total))
        assert row.sign == want
    # pooled row sums the strata
    pooled = t.loc[-1]
    assert pooled.a_total == (df.arm == 0).sum()
    assert pooled.b_total == (df.arm == 1).sum()
    assert pooled.a_purch == df[df.arm == 0].p.sum()
