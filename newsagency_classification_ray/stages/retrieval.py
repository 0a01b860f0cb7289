"""Corpus retrieval operators: TF-IDF / BM25 scoring and inverted-index build.

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

Batches run ``batch_format="pyarrow"`` (zero-copy): tokenization is Arrow
``utf8_split_whitespace`` + ``list_parent_indices``; pandas appears only for
the term-vocabulary ``Index.get_indexer`` probe over already-exploded token
arrays, never for the batch.

Scale bound (documented, asserted): the DF pre-pass emits one
``len(terms)``-long partial per block, so the QUERY TERM SET must be bounded
— it is the retrieval analogue of a broadcast side. ``_MAX_QUERY_TERMS``
guards it; corpus-sized vocabularies belong in :func:`inverted_index`
(which shuffles (token, id) pairs instead of densifying per block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

# The per-block DF partial is a dense len(terms) vector; at B blocks the
# driver reduce holds O(B · len(terms)) int64. 4096 terms × 10^4 blocks is
# ~335 MB — the practical ceiling for the broadcast-query design.
_MAX_QUERY_TERMS = 4096


def _check_terms(terms: list[str]) -> list[str]:
    terms = list(terms)
    if len(terms) > _MAX_QUERY_TERMS:
        raise ValueError(
            f"query term set has {len(terms)} terms; the dense per-block DF "
            f"partial bounds this design at {_MAX_QUERY_TERMS}. For "
            f"corpus-scale vocabularies build an inverted_index (sparse "
            f"(token, doc) shuffle) instead.")
    return terms


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


def _explode_tokens(text: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, token) arrays — Arrow whitespace split + parent-index
    explode, empty tokens dropped (Python ``str.split()`` semantics)."""
    split = pc.utf8_split_whitespace(
        pc.fill_null(pc.cast(text, pa.string()), ""))
    row = pc.list_parent_indices(split).to_numpy(
        zero_copy_only=False).astype(np.int64)
    tok = np.asarray(pc.list_flatten(split).to_pylist(), dtype=object)
    if tok.size:
        keep = tok != ""
        tok, row = tok[keep], row[keep]
    return row, tok


def _term_matrix(text: pa.Array | pa.ChunkedArray, terms: list[str],
                 n_rows: int) -> np.ndarray:
    """(n_rows, n_terms) exact whitespace-token counts, vectorized:
    one Arrow explode + one ``Index.get_indexer`` probe + one ``add.at``."""
    tf = np.zeros((n_rows, len(terms)), dtype=np.int64)
    row, tok = _explode_tokens(text)
    if not tok.size:
        return tf
    cols = pd.Index(terms).get_indexer(tok)
    hit = cols >= 0
    if hit.any():
        np.add.at(tf, (row[hit], cols[hit]), 1)
    return tf


def term_doc_frequencies(
    docs: Dataset, terms: list[str], text_col: str = "text"
) -> tuple[np.ndarray, int]:
    """(df per term, total docs) in one streaming pass: each block emits ONE
    bounded partial row (dense ``len(terms)`` vector — hence the
    ``_MAX_QUERY_TERMS`` guard); the driver reduces ``num_blocks`` rows."""
    terms = _check_terms(terms)

    def partial(t: pa.Table) -> pa.Table:
        tf = _term_matrix(t[text_col], terms, len(t))
        return pa.table({
            "n_docs": pa.array([len(t)], type=pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).tolist()],
                           type=pa.list_(pa.int64())),
        })

    parts = docs.map_batches(partial, batch_format="pyarrow").take_all()
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
    terms = _check_terms(terms)
    df, n = term_doc_frequencies(docs, terms, text_col)
    idf = np.where(df > 0, np.log(np.maximum(n, 1) / np.maximum(df, 1)), 0.0)
    idf_ref = ray.put(idf.astype(np.float64))

    def local_topk(t: pa.Table) -> pa.Table:
        w = ray.get(idf_ref)
        tf = _term_matrix(t[text_col], terms, len(t))
        score = tf.astype(np.float64) @ w
        # floor(x + .5): round-half-away for positive scores, matching SQL round()
        micro = np.floor(score * 1e6 + 0.5).astype(np.int64)
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep = micro > 0
        ids, micro = ids[keep], micro[keep]
        sel = np.lexsort((ids, -micro))[: min(k, len(ids))]
        return pa.table({id_col: pa.array(ids[sel], type=pa.int64()),
                         "score_micro": pa.array(micro[sel], type=pa.int64())})

    local = docs.map_batches(local_topk, batch_format="pyarrow")
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
    _empty = pa.table({"token": pa.array([], type=pa.string()),
                       id_col: pa.array([], type=pa.int64())})

    def pairs(t: pa.Table) -> pa.Table:
        row, tok = _explode_tokens(t[text_col])
        if not tok.size:
            return _empty
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)[row]
        out = pa.table({"token": pa.array(tok, type=pa.string()),
                        id_col: pa.array(ids, type=pa.int64())})
        # within-batch combiner: Arrow group_by distinct
        return out.group_by(["token", id_col]).aggregate([])

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
        docs.map_batches(pairs, batch_format="pyarrow")
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
    terms = _check_terms(terms)

    def _dl(t: pa.Table) -> np.ndarray:
        return pc.count_substring_regex(
            pc.fill_null(pc.cast(t[text_col], pa.string()), ""),
            pattern=r"[^\s]+").to_numpy(zero_copy_only=False).astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        tf = _term_matrix(t[text_col], terms, len(t))
        return pa.table({
            "n_docs": pa.array([len(t)], type=pa.int64()),
            "n_tokens": pa.array([int(_dl(t).sum())], type=pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).tolist()],
                           type=pa.list_(pa.int64())),
        })

    df = np.zeros(len(terms), dtype=np.int64)
    n = toks = 0
    for r in docs.map_batches(partial, batch_format="pyarrow").take_all():
        n += int(r["n_docs"])
        toks += int(r["n_tokens"])
        df += np.asarray(r["df"], dtype=np.int64)
    avgdl = toks / max(n, 1)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    ref = ray.put((idf.astype(np.float64), float(avgdl)))

    def local_topk(t: pa.Table) -> pa.Table:
        w, adl = ray.get(ref)
        tf = _term_matrix(t[text_col], terms, len(t)).astype(np.float64)
        dl = _dl(t).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / adl)
        score = ((tf * (k1 + 1.0) / denom) @ w)
        micro = np.floor(score * 1e6 + 0.5).astype(np.int64)
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep = micro > 0
        ids, micro = ids[keep], micro[keep]
        sel = np.lexsort((ids, -micro))[: min(k, len(ids))]
        return pa.table({id_col: pa.array(ids[sel], type=pa.int64()),
                         "score_micro": pa.array(micro[sel], type=pa.int64())})

    local = docs.map_batches(local_topk, batch_format="pyarrow")
    return _reduce_score_topk(local, k, id_col)


# --------------------------------------------------------------------------
# RAKE keyword extraction
# --------------------------------------------------------------------------

RAKE_STOPWORDS = frozenset(
    w for prof in ("en", "fr", "de", "es")
    for w in __import__(
        "newsagency_classification_ray.stages.textstats",
        fromlist=["_STOPWORDS"])._STOPWORDS[prof])

_RAKE_TOKEN_RE = __import__("re").compile(r"[a-z0-9]+")


def rake_phrases(text: str) -> list[list[str]]:
    """RAKE candidate phrases: maximal runs of non-stopword tokens
    (lowercased ``[a-z0-9]+``), split at stopwords. Shared by the Ray
    stages AND the oracle recompute — deterministic tokenization is the
    cross-engine contract."""
    phrases: list[list[str]] = []
    cur: list[str] = []
    for tok in _RAKE_TOKEN_RE.findall((text or "").lower()):
        if tok in RAKE_STOPWORDS:
            if cur:
                phrases.append(cur)
                cur = []
        else:
            cur.append(tok)
    if cur:
        phrases.append(cur)
    return phrases
