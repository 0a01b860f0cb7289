"""Corpus retrieval operators: TF-IDF scoring and inverted-index build.

Both follow the two-pass / combiner discipline the rest of the engine uses:

* :func:`tfidf_topk` — pass 1 streams one bounded partial row per block
  (document-frequency counts for the query terms + block doc count) to the
  driver; the tiny idf vector is broadcast back and pass 2 scores each batch
  vectorized, emitting only its local top-k before the final global sort.
  No corpus-sized shuffle at any point.
* :func:`inverted_index` — within-batch distinct (token, doc_id) pairs
  (combiner) feed one groupby(token); posting lists come out sorted. The
  output is inherently corpus-proportional (it IS the index) — at scale it
  is partitioned by token hash, and hot-token posting lists are the
  documented skew (cap with ``max_postings`` when building probe indexes).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset


def _reduce_score_topk(local, k: int, id_col: str,
                       driver_limit: int = 5_000_000):
    """Merge per-block (id, score_micro) candidates into the global top-k.
    O(blocks · k) candidate rows — a bounded driver reduce for any practical
    block count (a Ray sort would pay a full range-shuffle spin-up to order
    a few thousand rows); past ``driver_limit`` fall back to the
    distributed sort."""
    import ray.data as rd

    cand = local.materialize()
    if cand.count() > driver_limit:
        return cand.sort(["score_micro", id_col],
                         descending=[True, False]).limit(k)
    df = cand.to_pandas().sort_values(
        ["score_micro", id_col], ascending=[False, True],
        kind="stable").head(k).reset_index(drop=True)
    return rd.from_arrow(pa.Table.from_pandas(
        df.astype({id_col: "int64", "score_micro": "int64"}),
        preserve_index=False))


def _term_matrix(texts: pd.Series, terms: list[str]) -> np.ndarray:
    """(n_rows, n_terms) exact whitespace-token counts, vectorized:
    one explode + one isin + one add.at."""
    tf = np.zeros((len(texts), len(terms)), dtype=np.int64)
    ex = texts.str.split().explode().dropna()
    if not len(ex):
        return tf
    cols = pd.Index(terms).get_indexer(ex.to_numpy(dtype=object))
    hit = cols >= 0
    if hit.any():
        np.add.at(tf, (ex.index.to_numpy(dtype=np.int64)[hit], cols[hit]), 1)
    return tf


def term_doc_frequencies(
    docs: Dataset, terms: list[str], text_col: str = "text"
) -> tuple[np.ndarray, int]:
    """(df per term, total docs) in one streaming pass: each block emits ONE
    bounded partial row; the driver reduces ``num_blocks`` rows."""
    terms = list(terms)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("").reset_index(drop=True)
        tf = _term_matrix(texts, terms)
        return pd.DataFrame({
            "n_docs": [len(batch)],
            "df": [(tf > 0).sum(axis=0).tolist()],
        })

    parts = docs.map_batches(partial, batch_format="pandas").take_all()
    df = np.zeros(len(terms), dtype=np.int64)
    n = 0
    for r in parts:
        n += int(r["n_docs"])
        df += np.asarray(r["df"], dtype=np.int64)
    return df, n


def tfidf_topk(
    docs: Dataset,
    terms: list[str],
    k: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Top-k documents by ``Σ_t tf(t,d) · ln(N / df(t))`` over the query
    terms (natural-log idf, df==0 terms contribute nothing). Emits
    ``(id_col, score_micro)`` — score ×1e6 rounded to int64 so the value
    hash is float-order-stable across engines. Ties break to the lower id.
    """
    terms = list(terms)
    df, n = term_doc_frequencies(docs, terms, text_col)
    idf = np.where(df > 0, np.log(np.maximum(n, 1) / np.maximum(df, 1)), 0.0)
    idf_ref = ray.put(idf.astype(np.float64))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(idf_ref)
        texts = batch[text_col].fillna("").reset_index(drop=True)
        tf = _term_matrix(texts, terms)
        score = tf.astype(np.float64) @ w
        # floor(x + .5): round-half-away for positive scores, matching SQL round()
        micro = np.floor(score * 1e6 + 0.5).astype(np.int64)
        ids = batch[id_col].to_numpy(dtype=np.int64)
        keep = micro > 0
        ids, micro = ids[keep], micro[keep]
        sel = np.lexsort((ids, -micro))[: min(k, len(ids))]
        return pd.DataFrame({id_col: ids[sel], "score_micro": micro[sel]})

    local = docs.map_batches(local_topk, batch_format="pandas")
    return _reduce_score_topk(local, k, id_col)


def inverted_index(
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int | None = None,
) -> Dataset:
    """Posting lists: ``(token, df, postings)`` with ``postings`` the sorted
    comma-joined distinct doc ids. ``df`` counts ALL matching docs even when
    ``max_postings`` truncates the stored list (probe-index mode)."""

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("").reset_index(drop=True)
        ex = texts.str.split().explode().dropna()
        if not len(ex):
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 id_col: pd.Series([], dtype="int64")})
        ids = batch[id_col].to_numpy(dtype=np.int64)[ex.index.to_numpy(dtype=np.int64)]
        out = pd.DataFrame({"token": ex.to_numpy(dtype=object), id_col: ids})
        return out.drop_duplicates()  # within-batch combiner

    def build(g: pa.Table) -> pa.Table:
        tok = g["token"][0].as_py()
        ids = np.unique(g[id_col].to_numpy(zero_copy_only=False))
        df = len(ids)
        if max_postings is not None:
            ids = ids[:max_postings]
        return pa.table({
            "token": pa.array([tok], type=pa.string()),
            "df": pa.array([df], type=pa.int64()),
            "postings": pa.array([",".join(map(str, ids.tolist()))],
                                 type=pa.string()),
        })

    return (
        docs.map_batches(pairs, batch_format="pandas")
        .groupby("token")
        .map_groups(build, batch_format="pyarrow")
    )


def bm25_topk(
    docs: Dataset,
    terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Top-k documents by BM25 over the query terms — the
    length-normalized upgrade of :func:`tfidf_topk`, same two-pass shape:
    pass 1 adds the corpus token count to the bounded per-block partial
    (df vector, doc count, Σ doc length) so ``avgdl`` is exact; pass 2
    scores each batch vectorized against the broadcast (idf, avgdl) and
    emits its local top-k.

    ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)`` (Robertson–Sparck-Jones,
    always ≥ 0), ``score = Σ_t idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))``
    with ``dl`` = whitespace token count. Scores ×1e6 rounded half-away to
    int64 (hash-stable); ties break to the lower id.
    """
    terms = list(terms)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("").reset_index(drop=True)
        tf = _term_matrix(texts, terms)
        return pd.DataFrame({
            "n_docs": [len(batch)],
            "n_tokens": [int(texts.str.split().str.len().sum())],
            "df": [(tf > 0).sum(axis=0).tolist()],
        })

    df = np.zeros(len(terms), dtype=np.int64)
    n = toks = 0
    for r in docs.map_batches(partial, batch_format="pandas").take_all():
        n += int(r["n_docs"])
        toks += int(r["n_tokens"])
        df += np.asarray(r["df"], dtype=np.int64)
    avgdl = toks / max(n, 1)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    ref = ray.put((idf.astype(np.float64), float(avgdl)))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        w, adl = ray.get(ref)
        texts = batch[text_col].fillna("").reset_index(drop=True)
        tf = _term_matrix(texts, terms).astype(np.float64)
        dl = texts.str.split().str.len().to_numpy(dtype=np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / adl)
        score = ((tf * (k1 + 1.0) / denom) @ w)
        micro = np.floor(score * 1e6 + 0.5).astype(np.int64)
        ids = batch[id_col].to_numpy(dtype=np.int64)
        keep = micro > 0
        ids, micro = ids[keep], micro[keep]
        sel = np.lexsort((ids, -micro))[: min(k, len(ids))]
        return pd.DataFrame({id_col: ids[sel], "score_micro": micro[sel]})

    local = docs.map_batches(local_topk, batch_format="pandas")
    return _reduce_score_topk(local, k, id_col)
