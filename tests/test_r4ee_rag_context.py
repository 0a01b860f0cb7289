"""RAG context assembly (retrieve → chunk → score → pack)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_rag_context_packs_best_chunks_within_budget():
    t = Q.QUERIES["docs_rag_context"](SF).to_pandas() \
        .sort_values("slot").reset_index(drop=True)
    assert len(t) > 0
    # budget respected, cumulative is consistent
    assert int(t.cum_chars.iloc[-1]) <= Q._RAG_BUDGET
    assert (t.cum_chars == t.chunk_chars.cumsum()).all()
    # slots are 1..n and scores are ranked non-increasing
    assert list(t.slot) == list(range(1, len(t) + 1))
    assert (np.diff(t.score.to_numpy()) <= 0).all()
    assert (t.score > 0).all()
    # chunks really come from the BM25 top-5 candidate docs
    bm_df = Q.QUERIES["docs_bm25_topk"](SF).to_pandas()
    top5 = set(bm_df.sort_values(
        ["score_micro", "doc_id"], ascending=[False, True])
        .head(Q._RAG_K_DOCS).doc_id.astype(int))
    assert set(t.doc_id.astype(int)) <= top5
    # chunk text really contains the scored number of query terms
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .set_index("doc_id")
    for r in t.itertuples():
        txt = docs.loc[int(r.doc_id)].text or ""
        chunk = txt[int(r.chunk_id) * Q._RAG_STRIDE:
                    int(r.chunk_id) * Q._RAG_STRIDE + Q._RAG_CHUNK]
        assert len(chunk) == int(r.chunk_chars)
        assert sum(chunk.count(term) for term in Q._BM25_TERMS) == \
            int(r.score)
