"""Customer reactivation, media aspect census, prune savings."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
import newsagency_classification_ray.stages.multimodal as mm

SF = "/root/testdata/sf0.001"


def test_reactivation_matches_bruteforce():
    t = Q.QUERIES["customer_reactivation"](SF).to_pandas().iloc[0]
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_custkey", "o_orderdate"]).to_pandas()
    o["day"] = (o.o_orderdate.astype("datetime64[us]")
                .astype(np.int64) // 86_400_000_000)
    multi = react = 0
    mg_all = -1
    for _, g in o.groupby("o_custkey"):
        days = np.sort(g.day.to_numpy())
        if len(days) > 1:
            multi += 1
            mg = int(np.diff(days).max())
            mg_all = max(mg_all, mg)
            react += mg >= Q._REACT_GAP_DAYS
    assert t.n_customers_multi == multi
    assert t.n_reactivated == react
    assert t.share_nano == Q._div_nano(react, multi)
    assert t.max_gap_days == mg_all


def test_aspect_census_matches_pure():
    t = Q.QUERIES["media_aspect_census"](SF).to_pandas() \
        .set_index(["kind", "orientation"])
    src = mm.make_media_table(256)
    from collections import Counter
    census = Counter()
    for i in range(len(src)):
        meta = mm._decode_payload(src["blob"][i].as_py())
        o = ("landscape" if meta["width"] > meta["height"] else
             "portrait" if meta["width"] < meta["height"] else "square")
        census[(src["kind"][i].as_py(), o)] += 1
    assert set(t.index) == set(census)
    for k, v in census.items():
        assert t.loc[k].n == v


def test_prune_savings_matches_footers():
    t = Q.QUERIES["lineitem_prune_savings"](SF).to_pandas() \
        .set_index("shape")
    md = pq.read_metadata(f"{SF}/lineitem.parquet")
    sizes = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            sizes[col.path_in_schema] = sizes.get(col.path_in_schema, 0) \
                + col.total_compressed_size
    total = sum(sizes.values())
    for shape, cols in Q._PRUNE_SHAPES.items():
        scanned = sum(sizes[c] for c in cols)
        row = t.loc[shape]
        assert (row.bytes_scanned, row.total_bytes) == (scanned, total)
        assert row.savings_nano == Q._div_nano(total - scanned, total)
    # pruning down to 2 columns saves a large majority of IO
    assert t.loc["pricing_2col"].savings_nano > 5 * 10**8
