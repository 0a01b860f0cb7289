"""l-diversity, business rules, media resize audit."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
import newsagency_classification_ray.stages.multimodal as mm

SF = "/root/testdata/sf0.001"


def test_l_diversity_matches_bruteforce():
    t = Q.QUERIES["kg_l_diversity"](SF).to_pandas()
    m = Q._linked(SF).to_pandas()
    ls = m.groupby(["host", "year"]).qid.nunique()
    want = ls.value_counts().sort_index()
    assert list(t.l) == list(want.index)
    assert list(t.n_classes) == list(want.values)
    # total classes == distinct (host, year) cells with linked mentions
    assert t.n_classes.sum() == len(ls)
    assert (t.l >= 1).all()


def test_business_rules_matches_pandas():
    t = Q.QUERIES["lineitem_business_rules"](SF).to_pandas() \
        .set_index("rule")
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    n = len(li)
    d = np.round(li.l_discount.to_numpy() * 100).astype(np.int64)
    tax = np.round(li.l_tax.to_numpy() * 100).astype(np.int64)
    p = np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    q = np.round(li.l_quantity.to_numpy()).astype(np.int64)
    assert t.loc["discount_range"].n_violations \
        == int(((d < 0) | (d > 10)).sum())
    assert t.loc["tax_range"].n_violations \
        == int(((tax < 0) | (tax > 8)).sum())
    assert t.loc["price_positive"].n_violations == int((p <= 0).sum())
    assert t.loc["qty_range"].n_violations \
        == int(((q < 1) | (q > 50)).sum())
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_orderdate"]).to_pandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    assert t.loc["ship_after_order"].n_checked == len(j)
    assert t.loc["ship_after_order"].n_violations \
        == int((j.l_shipdate < j.o_orderdate).sum())
    assert (t.n_checked.loc[["discount_range", "tax_range",
                             "price_positive", "qty_range"]] == n).all()


def test_media_resize_audit_shrinks_payloads():
    t = Q.QUERIES["media_resize_audit"](SF).to_pandas().set_index("kind")
    src = mm.make_media_table(256)
    kinds = {k: 0 for k in set(src["kind"].to_pylist())}
    for k in src["kind"].to_pylist():
        kinds[k] += 1
    assert set(t.index) == set(kinds)
    for k, n in kinds.items():
        assert t.loc[k].n_media == n
    # resize to 16x16 never grows a payload (scale is clamped at 1.0)
    assert (t.bytes_after <= t.bytes_before).all()
    assert (t.bytes_after > 0).all()
