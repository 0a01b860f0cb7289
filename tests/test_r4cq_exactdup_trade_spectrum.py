"""Exact dup vectors, trade asymmetry, token spectrum."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_exact_dups_match_bruteforce():
    t = Q.QUERIES["embeddings_exact_dups"](SF).to_pandas().iloc[0]
    e = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    qm = Q._q6v(np.array(e["embedding"].to_pylist(), np.float64))
    from collections import Counter
    sigs = Counter(tuple(row) for row in qm)
    dup = [c for c in sigs.values() if c > 1]
    assert t.n_vectors == len(qm)
    assert t.n_dup_groups == len(dup)
    assert t.n_dup_vectors == sum(dup)
    assert t.largest_group == max(sigs.values())


def test_trade_asymmetry_matches_bruteforce():
    t = Q.QUERIES["nation_trade_asymmetry"](SF).to_pandas() \
        .set_index("nation")
    s = pq.read_table(f"{SF}/supplier.parquet",
                      columns=["s_nationkey"]).to_pandas() \
        .s_nationkey.value_counts()
    c = pq.read_table(f"{SF}/customer.parquet",
                      columns=["c_nationkey"]).to_pandas() \
        .c_nationkey.value_counts()
    n = pq.read_table(f"{SF}/nation.parquet",
                      columns=["n_nationkey", "n_name"]).to_pandas()
    assert len(t) == len(n)
    for r in n.itertuples():
        row = t.loc[r.n_name]
        ns, nc = int(s.get(r.n_nationkey, 0)), int(c.get(r.n_nationkey, 0))
        assert (row.n_suppliers, row.n_customers) == (ns, nc)
        if ns + nc:
            assert row.supplier_share_nano == Q._div_nano(ns, ns + nc)


def test_token_spectrum_matches_bruteforce():
    t = Q.QUERIES["docs_token_spectrum"](SF).to_pandas() \
        .set_index("freq")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    from collections import Counter
    tf = Counter(w for txt in docs.text for w in txt.split() if w)
    spec = Counter(min(c, Q._SPECTRUM_MAX + 1) for c in tf.values())
    assert set(t.index) == set(spec)
    for f, nt in spec.items():
        assert t.loc[f].n_types == nt
    assert t.n_types.sum() == len(tf)
