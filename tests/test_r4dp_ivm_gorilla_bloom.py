"""Incremental co-occurrence view, Gorilla DoD census, Bloom pruning."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_incremental_cooccurrence_equals_full_recompute():
    inc = _canon(Q.QUERIES["kg_incremental_cooccurrence"](SF).to_pandas())
    full = _canon(Q.QUERIES["kg_cooccurrence"](SF).to_pandas())
    inc = inc.astype(full.dtypes.to_dict())
    pd.testing.assert_frame_equal(inc, full)
    assert len(inc) > 0


def test_incremental_split_is_genuinely_incremental():
    # both halves must be non-empty or the IVM path degenerates
    import hashlib

    m = Q._mentions(SF)
    urls = [r["url"] for r in m.take_all()]
    par = [hashlib.md5(u.encode()).digest()[0] & 1 for u in urls]
    assert 0 < sum(par) < len(par)


def test_gorilla_cost_matches_bruteforce():
    t = Q.QUERIES["events_gorilla_cost"](SF).to_pandas() \
        .set_index("bit_class")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_id"]).to_pandas()
    ev["s"] = ev.ts.astype("datetime64[us]").astype(np.int64) // 1_000_000
    bits = {"header64": 64, "delta27": 27, "dod0": 1, "dod9": 9,
            "dod12": 12, "dod16": 16, "dod36": 36}
    census: dict[str, int] = {}
    for _, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        s = g.s.to_numpy()
        census["header64"] = census.get("header64", 0) + 1
        if len(s) > 1:
            census["delta27"] = census.get("delta27", 0) + 1
            d1 = np.diff(s)
            for dod in np.diff(d1):
                a = abs(int(dod))
                cls = ("dod0" if a == 0 else "dod9" if a <= 63 else
                       "dod12" if a <= 255 else "dod16" if a <= 2047
                       else "dod36")
                census[cls] = census.get(cls, 0) + 1
    census = {k: v for k, v in census.items() if v}
    assert set(t.index) == set(census)
    for k, v in census.items():
        assert int(t.loc[k].n) == v
        assert int(t.loc[k].total_bits) == v * bits[k]
    # compression must beat raw 64-bit timestamps
    assert int(t.total_bits.sum()) < 64 * len(ev)


def test_bloom_prune_no_false_negatives_and_exact_actual():
    t = Q.QUERIES["lineitem_bloom_prune"](SF).to_pandas() \
        .set_index("probe_key")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    li["p"] = li.l_orderkey.astype(np.int64) % Q._BPRUNE_PARTS
    for key in Q._BPRUNE_PROBES:
        actual = li[li.l_partkey == key].p.nunique()
        row = t.loc[key]
        assert int(row.n_actual) == actual
        # Bloom guarantee: never prune a partition that has the key
        assert int(row.n_maybe) >= actual
        assert int(row.n_false_positive) == int(row.n_maybe) - actual
    # pruning must do SOMETHING: some probe skips at least one partition
    nparts = li.p.nunique()
    assert (t.n_maybe < nparts).any()
