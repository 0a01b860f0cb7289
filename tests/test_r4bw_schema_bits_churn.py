"""Schema-evolution unify read, bit-width planner, top-k churn."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
import newsagency_classification_ray.ops as ops

SF = "/root/testdata/sf0.001"


def test_schema_evolution_unify_read():
    t = Q.QUERIES["docs_schema_evolution"](SF).to_pandas() \
        .sort_values("has_lang").reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    even = docs[docs.doc_id % 2 == 0]
    odd = docs[docs.doc_id % 2 == 1]
    assert list(t.has_lang) == [False, True]
    assert list(t.n_docs) == [len(even), len(odd)]
    assert list(t.sum_chars) == [even.n_chars.sum(), odd.n_chars.sum()]
    # the unified source exposes ONE schema with null-filled lang
    ds = ops.read_parquet_unify("/tmp/nacr_se_sf0.001")
    sch = ds.schema()
    assert set(sch.names) == {"doc_id", "text", "lang", "n_chars"}


def test_bitwidth_plan_matches_pandas():
    t = Q.QUERIES["lineitem_bitwidth_plan"](SF).to_pandas() \
        .set_index("col")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=Q._BITWIDTH_COLS).to_pandas()
    for c in Q._BITWIDTH_COLS:
        lo, hi = int(li[c].min()), int(li[c].max())
        bits = max(1, (hi - lo).bit_length())
        row = t.loc[c]
        assert (row.vmin, row.vmax) == (lo, hi)
        assert row.bits_packed == bits
        assert row.bits_saved == 64 - bits
    # linenumber packs into very few bits; orderkey needs many more
    assert t.loc["l_linenumber"].bits_packed \
        < t.loc["l_orderkey"].bits_packed


def test_topk_churn_matches_bruteforce():
    t = Q.QUERIES["events_topk_churn"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "value"]).to_pandas()
    ev["day"] = (ev.ts.astype("datetime64[us]").astype(np.int64)
                 // 86_400_000_000)
    ev["cents"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    du = ev.groupby(["day", "user_id"]).cents.sum().reset_index()
    boards = {}
    for d, g in du.groupby("day"):
        g = g.sort_values(["cents", "user_id"],
                          ascending=[False, True]).head(Q._TOPK_CHURN_K)
        boards[int(d)] = set(g.user_id)
    days = sorted(boards)
    expect = [(cur, len(boards[cur] - boards[prev]),
               len(boards[prev] - boards[cur]))
              for prev, cur in zip(days, days[1:])]
    assert list(t.itertuples(index=False, name=None)) == expect
    # entries and exits balance when board size is constant (k full)
    full = all(len(boards[d]) == Q._TOPK_CHURN_K for d in days)
    if full:
        assert (t.n_entries == t.n_exits).all()
