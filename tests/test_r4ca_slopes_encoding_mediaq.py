"""Supplier trend slopes, target encoding, media quantiles."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
import newsagency_classification_ray.stages.multimodal as mm

SF = "/root/testdata/sf0.001"


def test_supplier_slopes_match_bruteforce():
    t = Q.QUERIES["supplier_trend_slopes"](SF).to_pandas() \
        .set_index("l_suppkey")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_suppkey", "l_shipdate",
                                "l_extendedprice"]).to_pandas()
    li["m"] = (li.l_shipdate.dt.year * 12 + li.l_shipdate.dt.month - 1)
    li["cents"] = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    g = li.groupby(["l_suppkey", "m"]).cents.sum()
    lo, hi = int(li.m.min()), int(li.m.max())
    n = hi - lo + 1
    st = n * (n - 1) // 2
    stt = (n - 1) * n * (2 * n - 1) // 6
    det = n * stt - st * st
    for s, gs in g.groupby(level=0):
        sy = int(gs.sum())
        sty = sum((int(m) - lo) * int(y)
                  for (_, m), y in gs.items())
        row = t.loc[s]
        assert row.n_months == len(gs)
        assert row.slope_nano == Q._div_nano(n * sty - st * sy, det)
    assert set(t.index) == set(li.l_suppkey.unique())


def test_target_encoding_matches_bruteforce():
    t = Q.QUERIES["part_target_encoding"](SF).to_pandas() \
        .set_index("brand")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_extendedprice"]
                       ).to_pandas()
    p = pq.read_table(f"{SF}/part.parquet",
                      columns=["p_partkey", "p_brand"]).to_pandas()
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["x"] = np.round(j.l_extendedprice.to_numpy() * 100).astype(np.int64)
    for brand, g in j.groupby("p_brand"):
        n, s = len(g), int(g.x.sum())
        lo, hi = int(g.x.min()), int(g.x.max())
        row = t.loc[brand]
        assert row.n == n
        assert row.mean_nano == Q._div_nano(s, n)
        dev = 0 if n < 2 else max(
            Q._div_nano(abs(s - n * lo), n * (n - 1)),
            Q._div_nano(abs(s - n * hi), n * (n - 1)))
        assert row.max_loo_dev_nano == dev
    # LOO deviation shrinks with group size: the largest group is
    # never the most drift-prone relative to a tiny one with same spread
    assert (t.max_loo_dev_nano >= 0).all()


def test_media_quantiles_match_pure():
    t = Q.QUERIES["media_bytes_quantiles"](SF).to_pandas()
    src = mm.make_media_table(256)
    by_kind = {}
    for i in range(len(src)):
        meta = mm._decode_payload(src["blob"][i].as_py())
        by_kind.setdefault(src["kind"][i].as_py(), []) \
            .append(meta["payload_bytes"])
    got = {(r.kind, r.q_pct): r.payload_bytes for r in t.itertuples()}
    for k, vs in by_kind.items():
        vs = sorted(vs)
        for q in Q._MEDIA_QS:
            assert got[(k, int(q * 100))] \
                == vs[int(np.floor(q * (len(vs) - 1)))]
    # p90 >= p50 within each kind
    for k in by_kind:
        assert got[(k, 90)] >= got[(k, 50)]
