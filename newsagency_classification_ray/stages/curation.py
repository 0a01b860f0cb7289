"""Corpus-curation operators a training-data pipeline needs at 100 TB:
PII redaction, deterministic hash-based train/val/test splitting,
benchmark-contamination detection, and intra-document repetition stats
(the Gopher/CCNet-style duplicate-n-gram filter signal).

All four are single-pass ``map_batches`` stages with no shuffle:

* ``pii_redact`` — compiled-regex scrubbing, vectorized ``Series.str`` ops;
* ``split_assign`` — salted md5 bucket per key (stable across runs, engines
  and cluster sizes; mirrors DuckDB's ``md5_number_lower`` exactly);
* ``contamination`` — the benchmark n-gram set is built once from a
  *bounded* benchmark dataset (benchmarks are small by definition),
  ``ray.put`` once and probed per batch — never re-shipped, never shuffled;
* ``repetition_stats`` — exploded-token n-gram construction with numpy
  shifts, no Python-per-row loop.
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

# Patterns are written in the RE2 ∩ Python-`re` common subset so the same
# literal string drives both the engine and a DuckDB `regexp_replace` oracle.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_redact(docs: Dataset, text_col: str = "text") -> Dataset:
    """Redact emails, NANP-style phone numbers and IPv4 addresses.

    Adds ``n_emails`` / ``n_phones`` / ``n_ipv4`` (match counts on the
    original text, int64) and ``text_redacted``. Replacement order is
    email → phone → ipv4 (fixed, so the oracle can mirror it). Pure map —
    no shuffle, regexes compiled once at module import.
    """
    pats = {k: (re.compile(p), tok) for k, (p, tok) in PII_PATTERNS.items()}

    def redact(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].fillna("")
        out = batch.copy()
        for name, (rx, _) in pats.items():
            out[f"n_{name}s" if name != "ipv4" else "n_ipv4"] = (
                text.str.count(rx).astype("int64")
            )
        red = text
        for rx, tok in pats.values():
            red = red.str.replace(rx, tok, regex=True)
        out["text_redacted"] = red
        return out

    return docs.map_batches(redact, batch_format="pandas")


def _md5_bucket(keys: list[str], buckets: int) -> np.ndarray:
    """Low 64 bits of md5 (bytes 8..16, little-endian — DuckDB
    ``md5_number_lower`` semantics) mod ``buckets``."""
    return np.fromiter(
        (struct.unpack("<Q", hashlib.md5(k.encode()).digest()[8:])[0] % buckets
         for k in keys),
        dtype=np.int64, count=len(keys),
    )


def split_assign(
    docs: Dataset,
    key_col: str = "doc_id",
    *,
    salt: str = "split",
    buckets: int = 100,
    train_lt: int = 80,
    val_lt: int = 90,
) -> Dataset:
    """Deterministic train/val/test assignment by salted content-free hash.

    ``bucket = md5_number_lower(f"{salt}:{key}") % buckets``; train when
    ``bucket < train_lt``, val when ``< val_lt``, else test. Stable under
    repartitioning, re-runs and cluster size — the property that makes the
    split safe to recompute per shard at 100 TB instead of materializing a
    membership table. Pure map, no shuffle; md5 over a short salted key
    string is the (cheap) per-row cost.
    """

    def assign(t: pa.Table) -> pa.Table:
        keys = [f"{salt}:{k}" for k in t[key_col].to_pylist()]
        b = _md5_bucket(keys, buckets)
        split = np.where(b < train_lt, "train", np.where(b < val_lt, "val", "test"))
        return t.append_column("bucket", pa.array(b)).append_column(
            "split", pa.array(split, type=pa.string())
        )

    return docs.map_batches(assign, batch_format="pyarrow")


def _word_ngrams(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, gram) arrays of word ``n``-grams for every row, built by
    exploding the whitespace tokens once and joining ``n`` shifted views —
    no Python loop over rows or grams."""
    ex = texts.str.split().explode().dropna()
    if not len(ex):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    tok = ex.to_numpy(dtype=object)
    row = ex.index.to_numpy()
    m = len(tok) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    grams = tok[:m].copy()
    for j in range(1, n):
        grams = grams + " "
        grams = grams + tok[j:m + j]
    valid = row[:m] == row[n - 1:]
    return row[:m][valid].astype(np.int64), grams[valid]


def contamination(
    docs: Dataset,
    benchmark: Dataset,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Benchmark-contamination scan: docs sharing any word ``n``-gram with
    the benchmark corpus (the standard 13-gram overlap test).

    The benchmark side is collected to the driver and broadcast once as a
    frozenset — valid because eval benchmarks are bounded (thousands of
    items), never corpus-scaled; the 100-TB side streams through one
    ``map_batches`` probe. Emits ``(id_col, n_hits)`` for contaminated docs
    only, ``n_hits`` = distinct benchmark n-grams present.
    """
    bench_texts = pd.Series(
        [r[text_col] for r in benchmark.select_columns([text_col]).take_all()]
    ).fillna("")
    _, grams = _word_ngrams(bench_texts, n)
    gram_ref = ray.put(frozenset(grams.tolist()))

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        gset = ray.get(gram_ref)
        texts = batch[text_col].fillna("").reset_index(drop=True)
        row, grams = _word_ngrams(texts, n)
        if not len(row):
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "n_hits": pd.Series([], dtype="int64")})
        s = pd.Series(grams, index=row)
        hits = s[s.isin(gset)]
        if not len(hits):
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "n_hits": pd.Series([], dtype="int64")})
        per_doc = hits.groupby(level=0).nunique()
        ids = batch[id_col].to_numpy()[per_doc.index.to_numpy()]
        return pd.DataFrame({id_col: ids.astype("int64"),
                             "n_hits": per_doc.to_numpy(dtype="int64")})

    return docs.map_batches(probe, batch_format="pandas")


def chunk_text(
    docs: Dataset,
    *,
    size: int = 200,
    stride: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Overlapping fixed-width character windows per document — the
    training-context chunking step (windows ``[k·stride, k·stride+size)``
    for every ``k·stride < len``; the final window may be short).

    Fully vectorized: one ``str.slice`` over the whole batch per window
    index ``k`` (the loop is over the per-batch max window count, not rows).
    Pure map, no shuffle; output rows ≈ ``len/stride`` per doc.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("").reset_index(drop=True)
        ids = batch[id_col].to_numpy(dtype=np.int64)
        n = texts.str.len().to_numpy(dtype=np.int64)
        outs = []
        for k in range(int(np.ceil(n.max() / stride)) if len(n) else 0):
            alive = n > k * stride
            if not alive.any():
                break
            outs.append(pd.DataFrame({
                id_col: ids[alive],
                "chunk_id": np.int64(k),
                "chunk": texts[alive].str.slice(k * stride, k * stride + size),
            }))
        if not outs:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "chunk_id": pd.Series([], dtype="int64"),
                                 "chunk": pd.Series([], dtype=object)})
        return pd.concat(outs, ignore_index=True)

    return docs.map_batches(chunks, batch_format="pandas")


def repetition_stats(
    docs: Dataset, *, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Intra-document repetition signal: total vs duplicated word n-grams
    (``n_dup = total - distinct``), the Gopher-style "fraction of duplicate
    n-grams" quality feature. One pass, vectorized n-gram build."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("").reset_index(drop=True)
        row, grams = _word_ngrams(texts, n)
        idx = pd.RangeIndex(len(batch))
        if len(row):
            s = pd.Series(grams, index=row)
            total = s.groupby(level=0).size().reindex(idx, fill_value=0)
            distinct = s.groupby(level=0).nunique().reindex(idx, fill_value=0)
        else:
            total = distinct = pd.Series(0, index=idx)
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64"),
            f"n_{n}grams": total.to_numpy(dtype="int64"),
            f"n_dup_{n}grams": (total - distinct).to_numpy(dtype="int64"),
        })

    return docs.map_batches(stats, batch_format="pandas")


# --------------------------------------------------------------------------
# DSIR-style importance scoring (data selection for language models)
# --------------------------------------------------------------------------


def _hashed_feature_matrix(texts: pd.Series, dim: int, n_max: int) -> np.ndarray:
    """(len(texts), dim) int64 hashed n-gram count matrix (1..n_max word
    grams), built on the shared exploded-token path (`_word_ngrams`) —
    no Python loop over rows. Bucketing uses pandas' fixed-key siphash
    (`pd.util.hash_array`), which is stable across processes, runs and
    cluster sizes (unlike Python's seeded `hash`)."""
    mat = np.zeros((len(texts), dim), dtype=np.int64)
    low = texts.str.lower()
    for n in range(1, n_max + 1):
        row, grams = _word_ngrams(low, n)
        if len(row):
            h = (pd.util.hash_array(grams) % dim).astype(np.int64)
            np.add.at(mat, (row, h), 1)
    return mat


def dsir_scores(
    docs: Dataset,
    target: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    n_max: int = 2,
    round_decimals: int = 9,
) -> Dataset:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document by
    the log-likelihood ratio of a TARGET hashed n-gram distribution vs the
    RAW corpus distribution — the 'select web text that looks like my
    high-quality target set' curation step.

    Two bounded streaming passes + one scoring pass, no shuffle anywhere:

    1. hashed-n-gram histograms of target and raw — each block emits ONE
       ``dim``-long int64 partial, driver-summed (integer sums: exact and
       commutative, so reduction order cannot matter);
    2. the Laplace-smoothed log-ratio vector ``r`` (``dim`` float64, rounded
       to ``round_decimals``) is ``ray.put`` ONCE;
    3. every block computes its count matrix and one matvec ``counts @ r``.

    Returns ``(id_col, score_micro)`` with the score fixed-point-scaled to
    int64 micros (same convention as tfidf_topk) so results are
    hash-comparable across engines. The per-block dense count matrix is
    ``batch_size × dim × 8`` bytes — size ``batch_size`` down if you raise
    ``dim``.
    """
    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("").reset_index(drop=True)
        mat = _hashed_feature_matrix(texts, dim, n_max)
        return pd.DataFrame({"h": [mat.sum(axis=0).tolist()]})

    def reduce_hist(ds: Dataset) -> np.ndarray:
        out = np.zeros(dim, dtype=np.int64)
        for row in ds.map_batches(hist_partial, batch_format="pandas").take_all():
            out += np.asarray(row["h"], dtype=np.int64)
        return out

    t_hist = reduce_hist(target.select_columns([text_col]))
    w_hist = reduce_hist(docs.select_columns([text_col]))
    r = np.round(
        np.log((t_hist + 1.0) / (t_hist.sum() + dim))
        - np.log((w_hist + 1.0) / (w_hist.sum() + dim)),
        round_decimals,
    )
    rref = ray.put(r)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        rv = ray.get(rref)
        texts = batch[text_col].fillna("").reset_index(drop=True)
        mat = _hashed_feature_matrix(texts, dim, n_max)
        s = mat.astype(np.float64) @ rv
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64"),
            "score_micro": np.floor(s * 1e6 + 0.5).astype(np.int64),
        })

    return docs.map_batches(score, batch_format="pandas")
