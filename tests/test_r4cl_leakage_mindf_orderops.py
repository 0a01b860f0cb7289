"""Temporal leakage, min-df sweep, order-of-ops audit."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_temporal_split_leakage_matches_bruteforce():
    t = Q.QUERIES["events_temporal_split_leakage"](SF) \
        .to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    day = (ev.ts.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    cut = (int(day.min()) + int(day.max()) + 1) // 2
    train = set(ev.user_id[day < cut])
    test = set(ev.user_id[day >= cut])
    assert (t.n_users_train, t.n_users_test) == (len(train), len(test))
    assert t.n_users_both == len(train & test)
    assert t.leakage_nano == Q._div_nano(len(train & test), len(test))


def test_min_df_sweep_matches_bruteforce():
    t = Q.QUERIES["docs_min_df_sweep"](SF).to_pandas() \
        .set_index("min_df")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    from collections import Counter, defaultdict
    tf = Counter()
    dfc = defaultdict(set)
    for did, txt in zip(docs.doc_id, docs.text):
        for w in txt.split():
            if w:
                tf[w] += 1
                dfc[w].add(did)
    total = sum(tf.values())
    for md in Q._MIN_DF_SWEEP:
        kept = [w for w in tf if len(dfc[w]) >= md]
        row = t.loc[md]
        assert row.vocab_size == len(kept)
        assert row.coverage_nano \
            == Q._div_nano(sum(tf[w] for w in kept), total)
    # vocab and coverage shrink monotonically with min_df
    assert list(t.vocab_size) == sorted(t.vocab_size, reverse=True)
    assert list(t.coverage_nano) == sorted(t.coverage_nano, reverse=True)


def test_order_of_ops_matches_bruteforce():
    t = Q.QUERIES["docs_order_of_ops_audit"](SF).to_pandas() \
        .set_index("scheme")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "n_chars"]
                         ).to_pandas()
    g = docs.groupby("text")
    dedup_first = filter_first = 0
    for _, grp in g:
        mid = grp.doc_id.min()
        passing = grp[grp.n_chars >= 200]
        if len(passing):
            filter_first += 1
            if passing.doc_id.min() == mid:
                dedup_first += 1
    assert t.loc["dedup_first"].n_rows == dedup_first
    assert t.loc["filter_first"].n_rows == filter_first
    assert t.loc["text_groups"].n_rows == docs.text.nunique()
    # filter-first can only keep MORE groups than dedup-first
    assert t.loc["filter_first"].n_rows >= t.loc["dedup_first"].n_rows
