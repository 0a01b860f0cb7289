"""Mention yield by lang, corpus card, stream card."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_mention_yield_by_lang_consistency():
    t = Q.QUERIES["kg_mention_yield_by_lang"](SF).to_pandas() \
        .set_index("lang")
    m = Q._linked(SF).to_pandas()
    ment = m.groupby("lang").size()
    assert set(t.index) == {"fr", "de"}
    for lang in t.index:
        row = t.loc[lang]
        assert row.n_mentions == int(ment.get(lang, 0))
        assert row.per_kchar_nano == Q._div_nano(
            int(row.n_mentions) * 1000, int(row.total_chars))
        assert row.total_chars > 0 and row.n_pages > 0


def test_corpus_card_matches_bruteforce():
    t = Q.QUERIES["docs_corpus_card"](SF).to_pandas().iloc[0]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "lang", "source"]).to_pandas()
    toks = [w for txt in docs.text for w in txt.split() if w]
    assert t.n_docs == len(docs)
    assert t.n_tokens == len(toks)
    assert t.vocab_size == len(set(toks))
    assert t.n_langs == docs.lang.nunique()
    assert t.n_sources == docs.source.nunique()
    g = docs.groupby("text").size()
    dup = int(g[g > 1].sum())
    assert t.dup_share_nano == Q._div_nano(dup, len(docs))


def test_stream_card_matches_bruteforce():
    t = Q.QUERIES["events_stream_card"](SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    day = (ev.ts.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    assert t.n_events == len(ev)
    assert t.n_users == ev.user_id.nunique()
    assert t.n_days_span == int(day.max()) - int(day.min()) + 1
    assert t.n_types == ev.event_type.nunique()
    assert t.mean_value_nano == Q._div_nano(int(cents.sum()), len(ev))
