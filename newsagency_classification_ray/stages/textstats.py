"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

First-class training-data-pipeline operators over a ``documents``-shaped
table. All are single-pass ``map_batches`` stages; LangID is an actor (the
stopword profiles are per-actor state, T4-style cheap state).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# BPE-ish token regex: word runs OR single non-space punctuation
TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

# tiny per-language stopword profiles (public common-word lists)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "dans", "pour"},
    "de": {"der", "die", "das", "und", "in", "ein", "eine", "mit", "für", "auf"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "en", "que", "por"},
}


class LangIdStage:
    """Heuristic language-ID: argmax stopword-hit-rate over profiles.

    Emits ``lang_pred`` (or 'und' when nothing matches) + ``lang_conf``.
    Arrow in/out, fully vectorized: the batch is tokenized once (Arrow
    ``utf8_lower`` + ``utf8_split_whitespace`` + ``list_parent_indices``
    explode — no pandas conversion of the text column), tokens hit the
    stopword vocabulary through one ``Index.get_indexer`` probe, and
    per-(doc, lang) hit counts accumulate with ``np.add.at`` over the
    (token → per-lang membership) matrix built once per actor. Ties in the
    argmax break to the lexicographically greatest language (the original
    dict-max semantics, mirrored exactly by the SQL oracle).
    """

    def __init__(self, profiles: dict[str, set[str]] | None = None):
        self.profiles = profiles or _STOPWORDS
        self.langs = sorted(self.profiles)
        vocab: dict[str, np.ndarray] = {}
        for li, lang in enumerate(self.langs):
            for w in self.profiles[lang]:
                vocab.setdefault(w, np.zeros(len(self.langs), dtype=np.int64))[li] = 1
        self.vocab_index = pd.Index(list(vocab))
        self.vocab_mat = (
            np.stack([vocab[t] for t in self.vocab_index])
            if vocab else np.zeros((0, len(self.langs)), dtype=np.int64)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(pc.cast(batch["text"], pa.string()), ""))
        split = pc.utf8_split_whitespace(low)
        row = pc.list_parent_indices(split).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tok = np.asarray(pc.list_flatten(split).to_pylist(), dtype=object)
        if tok.size:
            keep = tok != ""  # Python str.split() semantics
            tok, row = tok[keep], row[keep]
        n_docs, n_langs = len(batch), len(self.langs)
        n_toks = np.zeros(n_docs, dtype=np.int64)
        if row.size:
            np.add.at(n_toks, row, 1)
        counts = np.zeros((n_docs, n_langs), dtype=np.int64)
        if tok.size:
            vidx = self.vocab_index.get_indexer(tok)
            hit = vidx >= 0
            np.add.at(counts, row[hit], self.vocab_mat[vidx[hit]])
        scores = counts / np.maximum(n_toks, 1)[:, None]
        # argmax with ties to the LAST (lexicographically greatest) language
        best_idx = n_langs - 1 - np.argmax(scores[:, ::-1], axis=1)
        best = scores[np.arange(n_docs), best_idx]
        preds = np.where(best > 0, np.asarray(self.langs, dtype=object)[best_idx], "und")
        return batch.append_column(
            "lang_pred", pa.array(preds, type=pa.string())
        ).append_column("lang_conf", pa.array(best.astype(np.float32)))


def _ws_token_nunique(text: pa.Array | pa.ChunkedArray, n_rows: int) -> np.ndarray:
    """Distinct whitespace-token count per row: Arrow split + parent-index
    explode, pandas only for the per-group ``nunique`` Arrow lacks."""
    split = pc.utf8_split_whitespace(text)
    row = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    tok = np.asarray(pc.list_flatten(split).to_pylist(), dtype=object)
    out = np.zeros(n_rows, dtype=np.int64)
    if tok.size:
        keep = tok != ""  # Python str.split() semantics
        tok, row = tok[keep], row[keep]
    if tok.size:
        nu = pd.Series(tok, index=row).groupby(level=0).nunique()
        out[nu.index.to_numpy()] = nu.to_numpy()
    return out


def doc_stats(docs: Dataset, text_col: str = "text") -> Dataset:
    """Quality/statistics columns per document, Arrow-native (RE2 count
    kernels on the zero-copy string column; no pandas batch conversion):

    n_chars, n_tokens (BPE-ish regex), n_ws_tokens (whitespace split),
    n_punct, n_unique_ws_tokens, mean_token_len, punct_ratio.

    ``mean_token_len`` uses the identity that ``\\w+|[^\\w\\s]`` matches
    partition exactly the non-whitespace characters, so the summed token
    length is ``n_chars − n_whitespace`` — no findall/explode needed.
    """

    def stats(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t[text_col], pa.string()), "")

        def rc(pattern: str) -> np.ndarray:
            return pc.count_substring_regex(text, pattern=pattern).to_numpy(
                zero_copy_only=False).astype(np.int64)

        n_chars = pc.utf8_length(text).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_tokens = rc(TOKEN_RE.pattern)
        n_ws = rc(r"[^\s]+")
        n_punct = rc(PUNCT_RE.pattern)
        non_ws_chars = n_chars - rc(r"\s")
        n_unique = _ws_token_nunique(text, len(t))
        mean_tok = non_ws_chars / np.maximum(n_tokens, 1)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "n_ws_tokens": pa.array(n_ws),
            "n_punct": pa.array(n_punct),
            "n_unique_ws_tokens": pa.array(n_unique),
            "mean_token_len": pa.array(mean_tok, type=pa.float64()),
            "punct_ratio": pa.array(n_punct / np.maximum(n_chars, 1),
                                    type=pa.float64()),
        })

    return docs.map_batches(stats, batch_format="pyarrow")


def quality_filter(
    docs: Dataset,
    *,
    min_tokens: int = 10,
    max_punct_ratio: float = 0.3,
    min_unique_ratio: float = 0.1,
) -> Dataset:
    """Keep documents passing the standard web-corpus quality gates.
    Arrow-native: RE2 count kernels + the shared token-nunique explode."""

    def keep(t: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(t["text"], pa.string()), "")
        n_ws = pc.count_substring_regex(text, pattern=r"[^\s]+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_chars = np.maximum(pc.utf8_length(text).to_numpy(
            zero_copy_only=False).astype(np.int64), 1)
        n_punct = pc.count_substring_regex(
            text, pattern=PUNCT_RE.pattern).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_unique = _ws_token_nunique(text, len(t))
        mask = ((n_ws >= min_tokens)
                & (n_punct / n_chars <= max_punct_ratio)
                & (n_unique / np.maximum(n_ws, 1) >= min_unique_ratio))
        return t.filter(pa.array(mask))

    return docs.map_batches(keep, batch_format="pyarrow")


def fingerprints(docs: Dataset, text_col: str = "text", window: int = 8) -> Dataset:
    """Document fingerprints: md5 content hash + winnowed rolling-hash sketch.

    ``fp_md5`` — exact content fingerprint (SQL-oracle-able).
    ``fp_winnow`` — min rolling hash (Rabin-Karp base-257 over bytes) per
    window position, winnowed to the global minimum: a cheap locality sketch.
    """

    def fp(t: pa.Table) -> pa.Table:
        out_md5, out_win = [], []
        # md5 + rolling hash need the bytes row-by-row (hashlib is
        # per-object); only the text column leaves Arrow, not the batch
        for text in t[text_col].to_pylist():
            data = (text or "").encode()
            out_md5.append(hashlib.md5(data).hexdigest())
            if len(data) < window:
                out_win.append(0)
                continue
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
            nh = len(arr) - window + 1
            h = np.zeros(nh, dtype=np.uint64)
            base = np.uint64(257)
            # h[i] = Σ_j arr[i+j]·base^(window-1-j), uint64 wraparound —
            # `window` vector ops instead of a per-char Python loop
            with np.errstate(over="ignore"):
                for j in range(window):
                    h = h * base + arr[j:j + nh]
            out_win.append(int(h.min()))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "fp_md5": pa.array(out_md5, type=pa.string()),
            "fp_winnow": pa.array(out_win, type=pa.uint64()),
        })

    return docs.map_batches(fp, batch_format="pyarrow")


# --------------------------------------------------- n-gram LM quality score

_LM_FNV = np.uint64(1099511628211)


def _lm_hash_tokens(toks: list[str]) -> np.ndarray:
    """Deterministic 64-bit token hashes (siphash via pandas)."""
    if not toks:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(toks, dtype=object))


def _lm_buckets(th: np.ndarray, buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(unigram, bigram) bucket ids for one doc's token-hash array."""
    b = np.uint64(buckets)
    uni = (th % b).astype(np.int64)
    bi = ((th[:-1] * _LM_FNV + th[1:]) % b).astype(np.int64)
    return uni, bi


def _lm_offsets(tok_lists: list[list[str]]) -> tuple[np.ndarray, np.ndarray]:
    """One hash over the concatenated tokens of many docs + doc offsets."""
    th = _lm_hash_tokens([tok for tl in tok_lists for tok in tl])
    offs = np.zeros(len(tok_lists) + 1, dtype=np.int64)
    np.cumsum([len(tl) for tl in tok_lists], out=offs[1:])
    return th, offs


def _lm_count_batch(
    tok_lists: list[list[str]], uni_c: np.ndarray, bi_c: np.ndarray
) -> None:
    """Accumulate many docs' unigram/bigram bucket counts in place.

    Integer adds are order-independent, so one concatenated pass (with
    doc-crossing bigram positions masked out) is exactly the per-doc sum.
    """
    th, offs = _lm_offsets(tok_lists)
    if th.size == 0:
        return
    uni, bi = _lm_buckets(th, len(uni_c))
    np.add.at(uni_c, uni, 1)
    if bi.size:
        keep = np.ones(bi.size, dtype=bool)
        cross = offs[1:-1] - 1  # last-token-of-doc positions
        keep[cross[cross >= 0]] = False
        np.add.at(bi_c, bi[keep], 1)


def _lm_score_hashed(th: np.ndarray, uni_c: np.ndarray, bi_c: np.ndarray) -> float | None:
    """Mean add-one-smoothed bigram log-prob of ONE doc's token-hash slice.

    score = mean_i log((bi[b(w_i, w_i+1)] + 1) / (uni[b(w_i)] + B))

    Shared by the distributed stage and the pure oracle recompute; all float
    arithmetic happens on the per-doc slice, so results are independent of
    how docs were batched.
    """
    if th.size < 2:
        return None
    B = len(uni_c)
    uni, bi = _lm_buckets(th, B)
    logp = np.log((bi_c[bi] + 1.0) / (uni_c[uni[:-1]] + float(B)))
    return float(logp.mean())


def _lm_score_doc(toks: list[str], uni_c: np.ndarray, bi_c: np.ndarray) -> float | None:
    """Per-doc convenience wrapper over ``_lm_score_hashed``."""
    return _lm_score_hashed(_lm_hash_tokens(toks), uni_c, bi_c)


def ngram_lm_scores(
    docs: Dataset,
    *,
    ref_lang: str = "en",
    buckets: int = 1 << 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> Dataset:
    """CCNet-style n-gram LM quality scoring (perplexity proxy), two passes.

    Pass 1 trains a hashed-vocabulary add-one bigram model on the reference
    slice (``lang == ref_lang``): each batch emits its SPARSE nonzero bucket
    counts as (bucket, uni, bi) rows, one groupby-sum combines them, and the
    dense model — two ``buckets``-sized int64 vectors, a fixed ~1 MB
    regardless of corpus size — is broadcast once with ``ray.put``.

    Pass 2 scores every doc against the broadcast model in one vectorized
    ``map_batches`` (one token-hash call per batch, gathers + one log).
    Output: ``(doc_id, lm_m)`` with ``lm_m = round(score * 1e6)`` as int64
    (micro-log-prob units; integral so the DuckDB comparison is exact);
    docs with < 2 tokens are dropped.

    Hash collisions in the 2^16 buckets are part of the model definition
    (deterministic, same in the pure oracle recompute), as in any
    hashed-feature LM.
    """
    import ray
    import pyarrow.compute as pc

    def partial_counts(t: pa.Table) -> pa.Table:
        uni_c = np.zeros(buckets, dtype=np.int64)
        bi_c = np.zeros(buckets, dtype=np.int64)
        mask = pc.equal(t[lang_col], ref_lang)
        tok_lists = [(x or "").split()
                     for x in t.filter(mask)[text_col].to_pylist()]
        _lm_count_batch(tok_lists, uni_c, bi_c)
        nz = np.flatnonzero(uni_c | bi_c)
        return pa.table({
            "bucket": pa.array(nz, type=pa.int64()),
            "uni": pa.array(uni_c[nz]),
            "bi": pa.array(bi_c[nz]),
        })

    from ray.data.aggregate import Sum

    rows = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("uni", alias_name="uni"), Sum("bi", alias_name="bi"))
        .take_all()  # bounded: <= `buckets` rows by construction
    )
    uni_c = np.zeros(buckets, dtype=np.int64)
    bi_c = np.zeros(buckets, dtype=np.int64)
    for r in rows:
        uni_c[r["bucket"]] = r["uni"]
        bi_c[r["bucket"]] = r["bi"]
    model_ref = ray.put((uni_c, bi_c))

    def score(t: pa.Table) -> pa.Table:
        uni_c, bi_c = ray.get(model_ref)
        ids_out, scores = [], []
        ids = pc.cast(t[id_col], pa.int64()).to_pylist()
        tok_lists = [(x or "").split() for x in t[text_col].to_pylist()]
        th, offs = _lm_offsets(tok_lists)  # one hash call per batch
        for i, did in enumerate(ids):
            s = _lm_score_hashed(th[offs[i]:offs[i + 1]], uni_c, bi_c)
            if s is not None:
                ids_out.append(did)
                scores.append(int(round(s * 1e6)))
        return pa.table({
            id_col: pa.array(ids_out, type=pa.int64()),
            "lm_m": pa.array(scores, type=pa.int64()),
        })

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------- BPE learn

_BPE_PAIR_SEP = "\x1f"  # never appears in whitespace-split tokens


def _bpe_tokenize_batch(t: pa.Table):
    """Whitespace tokens as numpy object arrays (flat, parent-doc idx)."""
    lst = pc.split_pattern_regex(pc.coalesce(t["text"], pa.scalar("")),
                                 pattern=r"\s+")
    flat = pc.list_flatten(lst)
    par = pc.list_parent_indices(lst)
    keep = pc.not_equal(flat, "")
    flat, par = flat.filter(keep), par.filter(keep)
    return (np.asarray(flat.to_pylist(), dtype=object),
            np.asarray(par.to_pylist(), dtype=np.int64))


def _bpe_apply_merge(flat, par, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of adjacent (left,
    right) token pairs within each document — vectorized via the
    run-parity trick: inside a maximal run of consecutive candidate
    positions, greedy keeps exactly the even offsets."""
    if len(flat) < 2:
        return flat, par
    m = (flat[:-1] == left) & (flat[1:] == right) & (par[:-1] == par[1:])
    idx = np.flatnonzero(m)
    if len(idx) == 0:
        return flat, par
    run_head = np.concatenate(([True], np.diff(idx) != 1))
    run_start = idx[run_head][np.cumsum(run_head) - 1]
    kept = idx[(idx - run_start) % 2 == 0]
    merged = left + " " + right
    out = flat.copy()
    out[kept] = merged
    keep_mask = np.ones(len(flat), dtype=bool)
    keep_mask[kept + 1] = False
    return out[keep_mask], par[keep_mask]


def bpe_learn(docs: Dataset, n_merges: int = 4, *, cap: int = 4096) -> pa.Table:
    """Iteratively LEARN the top-``n_merges`` BPE merges over a corpus —
    the outer loop of tokenizer training (the single pair-count pass is
    ``q_docs_bpe_pairs``; this repeats it, greedily committing the most
    frequent adjacent pair each round, exactly the published BPE
    procedure at word level). Each round is one streaming pass: batches
    re-tokenize and re-apply the merges learned so far on the fly (the
    merge list is a tiny closure-captured broadcast — the corpus is never
    materialized in mutated form), then feed the certified-exact
    Misra–Gries top-1 (ops.heavy_hitters_topk — ties break
    lexicographically, making the whole procedure deterministic). Rounds
    are bounded by ``n_merges``, so the total cost is n_merges streaming
    passes — the documented iteration bound, same discipline as
    kmeans/pagerank. Returns (rank, left, right, n); stops early if no
    pair repeats."""
    from .. import ops

    merges: list[tuple[str, str]] = []
    rows = []
    for rank in range(n_merges):
        applied = list(merges)

        def pair_items(t: pa.Table, applied=applied) -> pa.Array:
            flat, par = _bpe_tokenize_batch(t)
            for lft, rgt in applied:
                flat, par = _bpe_apply_merge(flat, par, lft, rgt)
            if len(flat) < 2:
                return pa.array([], pa.string())
            same = par[:-1] == par[1:]
            lefts = flat[:-1][same]
            rights = flat[1:][same]
            return pa.array([a + _BPE_PAIR_SEP + b
                             for a, b in zip(lefts, rights)], pa.string())

        top = ops.heavy_hitters_topk(docs, pair_items, k=1, cap=cap)
        if len(top) == 0 or top["n"][0].as_py() < 2:
            break
        item = top["item"][0].as_py()
        n = int(top["n"][0].as_py())
        lft, rgt = item.split(_BPE_PAIR_SEP, 1)
        merges.append((lft, rgt))
        rows.append((rank, lft, rgt, n))
    return pa.table({
        "rank": pa.array([r[0] for r in rows], pa.int64()),
        "left": pa.array([r[1] for r in rows], pa.string()),
        "right": pa.array([r[2] for r in rows], pa.string()),
        "n": pa.array([r[3] for r in rows], pa.int64())})


def max_repeat_len(tokens: list[str] | np.ndarray) -> int:
    """Length (in tokens) of the longest token window that occurs at least
    twice within ONE document — the per-document self-repetition depth
    (contrast the corpus-level fixed-n window dedup in stages.dedup):
    0 = all tokens distinct, large = copy-pasted / boilerplate-looped doc.

    Exact, via binary search on the window length (monotone: any repeat of
    length L contains a repeat of L-1) with an ``np.unique`` check over the
    raw int-coded windows — no hashing, so no collision caveat; O(n log n)
    windows checked per probe. Shared by the Ray stage AND the DuckDB
    VALUES-oracle recompute so both engines run the identical kernel.
    """
    _, ids = np.unique(np.asarray(tokens, dtype=object), return_inverse=True)
    n = len(ids)
    if n < 2:
        return 0
    ids = ids.astype(np.int64)

    def has_repeat(length: int) -> bool:
        w = np.lib.stride_tricks.sliding_window_view(ids, length)
        w = np.ascontiguousarray(w).view([("", np.int64)] * length).ravel()
        return len(np.unique(w)) < len(w)

    lo, hi = 0, n - 1  # invariant: repeat exists at lo, none above hi
    if not has_repeat(1):
        return 0
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if has_repeat(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def mattr_nano(tokens: list[str], window: int = 25) -> int:
    """Moving-Average Type-Token Ratio (Covington & McFall) in exact
    integer nano: the mean distinct-token count over every length-
    ``window`` sliding window, divided by the window length — the
    length-robust lexical-diversity measure (plain TTR shrinks with doc
    length). Docs shorter than the window fall back to whole-doc TTR.
    Two-pointer incremental distinct maintenance: O(n), no per-window
    rescan. Shared by the Ray stage and the oracle recompute."""
    n = len(tokens)
    if n == 0:
        return 0
    if n <= window:
        return _div_nano_ts(len(set(tokens)), n)
    from collections import Counter

    cnt: Counter = Counter(tokens[:window])
    distinct_sum = len(cnt)
    for i in range(window, n):
        cnt[tokens[i]] += 1
        left = tokens[i - window]
        cnt[left] -= 1
        if cnt[left] == 0:
            del cnt[left]
        distinct_sum += len(cnt)
    return _div_nano_ts(distinct_sum, window * (n - window + 1))


def _div_nano_ts(num: int, den: int) -> int:
    """round(num * 1e9 / den) half away from zero, exact ints (local copy
    of queries._div_nano to keep the stage import-free of queries)."""
    num *= 10**9
    s = -1 if (num < 0) != (den < 0) else 1
    num, den = abs(num), abs(den)
    return s * ((2 * num + den) // (2 * den))

# ------------------------------------------------- multinomial Naive Bayes

_NB_BUCKETS = 1 << 14


def nb_buckets(tokens: list[str], buckets: int = _NB_BUCKETS) -> np.ndarray:
    """Hashed-feature bucket ids for one doc's whitespace tokens — the same
    siphash + mod discipline as the n-gram LM model (``_lm_hash_tokens``),
    so the NB model is a FIXED ``langs x buckets`` int64 matrix at any
    corpus scale. Shared by the Ray stages and the oracle recompute."""
    th = _lm_hash_tokens(tokens)
    return (th % np.uint64(buckets)).astype(np.int64)


def nb_nano_log_model(
    count_mat: np.ndarray, doc_counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Laplace-smoothed multinomial-NB scoring tables in int64 NANO-LOGS.

    ``token_nano[l, b] = round(ln(count[l, b] + 1) * 1e9)``,
    ``norm_nano[l] = round(ln(total_l + buckets) * 1e9)``,
    ``prior_nano[l] = round(ln(n_docs_l) * 1e9)``.

    Rounding happens ONCE per model cell (model-sized work), so every
    per-doc score ``prior + sum_t token[l, b_t] - n_tokens * norm[l]`` is
    an order-free exact-int64 sum — the argmax can never float-flip
    between the distributed pass and the oracle recompute."""
    token_nano = np.round(np.log(count_mat + 1.0) * 1e9).astype(np.int64)
    totals = count_mat.sum(axis=1)
    norm_nano = np.round(
        np.log(totals + count_mat.shape[1]).astype(np.float64) * 1e9
    ).astype(np.int64)
    prior_nano = np.round(
        np.log(np.maximum(doc_counts, 1)).astype(np.float64) * 1e9
    ).astype(np.int64)
    return token_nano, norm_nano, prior_nano


def nb_predict_doc(
    tokens: list[str],
    token_nano: np.ndarray,
    norm_nano: np.ndarray,
    prior_nano: np.ndarray,
) -> int:
    """Predicted lang INDEX for one doc (argmax nano-log score, ties to the
    smallest index — lang lists are always sorted). Oracle-side kernel."""
    b = nb_buckets(tokens, token_nano.shape[1])
    scores = prior_nano + token_nano[:, b].sum(axis=1) \
        - len(b) * norm_nano
    return int(np.argmax(scores))
