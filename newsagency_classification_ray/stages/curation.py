"""Corpus-curation operators a training-data pipeline needs at 100 TB:
PII redaction, deterministic hash-based train/val/test splitting,
benchmark-contamination detection, and intra-document repetition stats
(the Gopher/CCNet-style duplicate-n-gram filter signal).

All four are single-pass ``map_batches`` stages with no shuffle, running
``batch_format="pyarrow"`` (zero-copy from the object store — the per-byte
curation hot path pays no Arrow→pandas conversion tax):

* ``pii_redact`` — RE2 kernels (``count_substring_regex`` /
  ``replace_substring_regex``) straight on the Arrow string column;
* ``split_assign`` — salted md5 bucket per key (stable across runs, engines
  and cluster sizes; mirrors DuckDB's ``md5_number_lower`` exactly);
* ``contamination`` — the benchmark n-gram set is built once from a
  *bounded* benchmark dataset (benchmarks are small by definition),
  ``ray.put`` once and probed per batch — never re-shipped, never shuffled;
* ``repetition_stats`` — Arrow whitespace-split + ``list_parent_indices``
  explode, n-grams joined with numpy shifts, no Python-per-row loop.

pandas appears only where Arrow genuinely lacks the kernel: the per-group
``nunique`` over already-exploded gram arrays (a tiny index-groupby, never
the full batch).
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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
    no shuffle; Arrow RE2 kernels (``count_substring_regex`` /
    ``replace_substring_regex``) run directly on the zero-copy string
    column, no pandas round-trip.
    """

    def redact(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        out = t
        for name, (p, _) in PII_PATTERNS.items():
            col = f"n_{name}s" if name != "ipv4" else "n_ipv4"
            out = out.append_column(
                col, pc.cast(pc.count_substring_regex(text, pattern=p),
                             pa.int64()))
        red = text
        for p, tok in PII_PATTERNS.values():
            red = pc.replace_substring_regex(red, pattern=p, replacement=tok)
        return out.append_column("text_redacted", red)

    return docs.map_batches(redact, batch_format="pyarrow")


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


_EMPTY_NGRAMS = (np.empty(0, dtype=np.int64), np.empty(0, dtype=object))


def _word_ngrams(text: pa.Array | pa.ChunkedArray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, gram) arrays of word ``n``-grams for every row.

    Tokenization is Arrow-native (``utf8_split_whitespace`` +
    ``list_parent_indices`` explode; empty tokens from leading/trailing
    whitespace are dropped, matching Python ``str.split()`` semantics), then
    grams are joined from ``n`` shifted object-array views — no Python loop
    over rows or grams, and no pandas conversion of the batch."""
    arr = pc.fill_null(pc.cast(text, pa.string()), "")
    split = pc.utf8_split_whitespace(arr)
    row = pc.list_parent_indices(split).to_numpy(zero_copy_only=False).astype(np.int64)
    tok = np.asarray(pc.list_flatten(split).to_pylist(), dtype=object)
    if tok.size:
        keep = tok != ""
        tok, row = tok[keep], row[keep]
    m = tok.size - n + 1
    if tok.size == 0 or m <= 0:
        return _EMPTY_NGRAMS
    grams = tok[:m].copy()
    for j in range(1, n):
        grams = grams + " "
        grams = grams + tok[j:m + j]
    valid = row[:m] == row[n - 1:]
    return row[:m][valid], grams[valid]


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
    bench_texts = pa.array(
        [r[text_col] for r in benchmark.select_columns([text_col]).take_all()],
        type=pa.string())
    _, grams = _word_ngrams(bench_texts, n)
    gram_ref = ray.put(frozenset(grams.tolist()))
    _empty = pa.table({id_col: pa.array([], type=pa.int64()),
                       "n_hits": pa.array([], type=pa.int64())})

    def probe(t: pa.Table) -> pa.Table:
        gset = ray.get(gram_ref)
        row, grams = _word_ngrams(t[text_col], n)
        if not len(row):
            return _empty
        # per-group nunique over the exploded gram array: the one step with
        # no Arrow kernel — pandas sees only (row, gram) pairs, not the batch
        s = pd.Series(grams, index=row)
        hits = s[s.isin(gset)]
        if not len(hits):
            return _empty
        per_doc = hits.groupby(level=0).nunique()
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)[per_doc.index.to_numpy()]
        return pa.table({id_col: pa.array(ids, type=pa.int64()),
                         "n_hits": pa.array(per_doc.to_numpy(), type=pa.int64())})

    return docs.map_batches(probe, batch_format="pyarrow")


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

    Fully vectorized: one ``utf8_slice_codeunits`` over the surviving rows
    per window index ``k`` (the loop is over the per-batch max window count,
    not rows). Pure map, no shuffle, Arrow in/out; output rows ≈
    ``len/stride`` per doc.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    _empty = pa.table({id_col: pa.array([], type=pa.int64()),
                       "chunk_id": pa.array([], type=pa.int64()),
                       "chunk": pa.array([], type=pa.string())})

    def chunks(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t[text_col], pa.string()), "")
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        n = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        outs = []
        for k in range(int(np.ceil(n.max() / stride)) if len(n) else 0):
            alive = np.flatnonzero(n > k * stride)
            if alive.size == 0:
                break
            outs.append(pa.table({
                id_col: pa.array(ids[alive], type=pa.int64()),
                "chunk_id": pa.array(np.full(alive.size, k, dtype=np.int64)),
                "chunk": pc.utf8_slice_codeunits(
                    text.take(pa.array(alive)),
                    start=k * stride, stop=k * stride + size),
            }))
        return pa.concat_tables(outs) if outs else _empty

    return docs.map_batches(chunks, batch_format="pyarrow")


def repetition_stats(
    docs: Dataset, *, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Intra-document repetition signal: total vs duplicated word n-grams
    (``n_dup = total - distinct``), the Gopher-style "fraction of duplicate
    n-grams" quality feature. One pass, Arrow in/out, vectorized n-gram
    build (pandas touches only the exploded gram pairs for the per-group
    nunique Arrow lacks)."""

    def stats(t: pa.Table) -> pa.Table:
        row, grams = _word_ngrams(t[text_col], n)
        total = np.zeros(len(t), dtype=np.int64)
        distinct = np.zeros(len(t), dtype=np.int64)
        if len(row):
            s = pd.Series(grams, index=row)
            tot = s.groupby(level=0).size()
            dis = s.groupby(level=0).nunique()
            total[tot.index.to_numpy()] = tot.to_numpy()
            distinct[dis.index.to_numpy()] = dis.to_numpy()
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            f"n_{n}grams": pa.array(total),
            f"n_dup_{n}grams": pa.array(total - distinct),
        })

    return docs.map_batches(stats, batch_format="pyarrow")


# --------------------------------------------------------------------------
# DSIR-style importance scoring (data selection for language models)
# --------------------------------------------------------------------------


def _hashed_feature_matrix(text: pa.Array | pa.ChunkedArray, dim: int,
                           n_max: int) -> np.ndarray:
    """(len(text), dim) int64 hashed n-gram count matrix (1..n_max word
    grams), built on the shared exploded-token path (`_word_ngrams`) —
    no Python loop over rows. Bucketing uses pandas' fixed-key siphash
    (`pd.util.hash_array`), which is stable across processes, runs and
    cluster sizes (unlike Python's seeded `hash`)."""
    mat = np.zeros((len(text), dim), dtype=np.int64)
    low = pc.utf8_lower(pc.fill_null(pc.cast(text, pa.string()), ""))
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
    def hist_partial(t: pa.Table) -> pa.Table:
        mat = _hashed_feature_matrix(t[text_col], dim, n_max)
        return pa.table({"h": pa.array([mat.sum(axis=0).tolist()],
                                       type=pa.list_(pa.int64()))})

    def reduce_hist(ds: Dataset) -> np.ndarray:
        out = np.zeros(dim, dtype=np.int64)
        for row in ds.map_batches(hist_partial, batch_format="pyarrow").take_all():
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

    def score(t: pa.Table) -> pa.Table:
        rv = ray.get(rref)
        mat = _hashed_feature_matrix(t[text_col], dim, n_max)
        s = mat.astype(np.float64) @ rv
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "score_micro": pa.array(np.floor(s * 1e6 + 0.5).astype(np.int64)),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def domain_mixture(
    docs: Dataset,
    target: dict[str, float],
    frac: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> Dataset:
    """Deterministic domain-mixture resampling — the 'rebalance the corpus
    toward a target domain distribution' curation step (cf. DoReMi / Pile
    mixture weights). Keeps ≈ ``frac·N`` rows distributed per ``target``
    (weights normalized here; domains absent from ``target`` are dropped).

    Two bounded passes, no shuffle:

    1. per-domain counts — per-batch Arrow ``value_counts`` combiner + one
       O(domains)-row groupby; the per-domain keep threshold is
       ``thr_s = floor(min(1, (frac·w_s)·N / n_s) · 2^32)`` (computed with
       plain IEEE doubles in exactly this association so a SQL oracle's
       double math lands on the identical integer);
    2. one streaming filter keeping rows whose Knuth multiplicative hash
       ``(id·2654435761) mod 2^32 < thr_s`` — the same id-keyed rule the
       samplers use: content-free, stable under repartitioning and cluster
       size, exactly reproducible cross-engine.

    A domain whose target share exceeds its availability saturates at
    keep-everything (thr = 2^32) — logged, not silently capped.
    """
    import logging

    wsum = float(sum(target.values()))
    if wsum <= 0:
        raise ValueError("target weights must sum to a positive value")
    norm = {s: w / wsum for s, w in target.items()}

    def count_partial(t: pa.Table) -> pa.Table:
        vc = t[group_col].value_counts()
        return pa.table({
            group_col: vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    from ray.data.aggregate import Sum

    rows = (
        docs.select_columns([group_col])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby(group_col).aggregate(Sum("n", alias_name="n"))
        .take_all()  # bounded: one row per domain
    )
    n_total = float(sum(r["n"] for r in rows))
    thr: dict[str, int] = {}
    saturated = []
    for r in rows:
        s = r[group_col]
        if s not in norm:
            continue
        rate = min(1.0, (frac * norm[s]) * n_total / float(r["n"]))
        if rate >= 1.0:
            saturated.append(s)
        thr[s] = int(np.floor(rate * 4294967296.0))
    if saturated:
        logging.getLogger(__name__).info(
            "domain_mixture: %d domains saturated (target share exceeds "
            "availability; kept whole): %s", len(saturated), saturated[:10])
    tref = ray.put(thr)

    def keep(t: pa.Table) -> pa.Table:
        th = ray.get(tref)
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(2**32)
        src = t[group_col].to_pylist()
        lim = np.fromiter((th.get(s, 0) for s in src), dtype=np.uint64,
                          count=len(src))
        return t.filter(pa.array(h < lim))

    return docs.map_batches(keep, batch_format="pyarrow")
