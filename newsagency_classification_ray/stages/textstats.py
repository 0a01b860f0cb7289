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
    Arrow in/out, fully vectorized: the batch is tokenized once
    (``Series.str.split`` + ``explode``), tokens hit the stopword vocabulary
    through one ``Index.get_indexer`` probe, and per-(doc, lang) hit counts
    accumulate with ``np.add.at`` over the (token → per-lang membership)
    matrix built once per actor. Ties in the argmax break to the
    lexicographically greatest language (the original dict-max semantics,
    mirrored exactly by the SQL oracle).
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
        texts = pd.Series(batch["text"].to_pylist()).fillna("")
        toks = texts.str.lower().str.split()
        n_toks = toks.str.len().to_numpy(dtype=np.int64)
        n_docs, n_langs = len(texts), len(self.langs)
        counts = np.zeros((n_docs, n_langs), dtype=np.int64)
        ex = toks.explode().dropna()
        if len(ex):
            vidx = self.vocab_index.get_indexer(ex.to_numpy(dtype=object))
            hit = vidx >= 0
            np.add.at(counts, ex.index.to_numpy()[hit], self.vocab_mat[vidx[hit]])
        scores = counts / np.maximum(n_toks, 1)[:, None]
        # argmax with ties to the LAST (lexicographically greatest) language
        best_idx = n_langs - 1 - np.argmax(scores[:, ::-1], axis=1)
        best = scores[np.arange(n_docs), best_idx]
        preds = np.where(best > 0, np.asarray(self.langs, dtype=object)[best_idx], "und")
        return batch.append_column(
            "lang_pred", pa.array(preds, type=pa.string())
        ).append_column("lang_conf", pa.array(best.astype(np.float32)))


def doc_stats(docs: Dataset, text_col: str = "text") -> Dataset:
    """Quality/statistics columns per document (vectorized pandas .str ops):

    n_chars, n_tokens (BPE-ish regex), n_ws_tokens (whitespace split),
    n_punct, n_unique_ws_tokens, mean_token_len, punct_ratio.
    """

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[text_col].fillna("")
        toks = text.str.findall(TOKEN_RE)
        ws = text.str.split()
        n_tokens = toks.str.len().astype("int64")
        n_ws = ws.str.len().astype("int64")
        n_chars = text.str.len().astype("int64")
        n_punct = text.str.count(PUNCT_RE.pattern).astype("int64")
        # explode + index-groupby instead of a Python set()/mean() per row
        n_unique = (
            ws.explode().groupby(level=0).nunique()
            .reindex(ws.index, fill_value=0).astype("int64")
        )
        tok_len_sum = (
            toks.explode().str.len().groupby(level=0).sum()
            .reindex(toks.index, fill_value=0).astype("float64")
        )
        mean_tok = (tok_len_sum / n_tokens.clip(lower=1)).where(n_tokens > 0, 0.0)
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_ws_tokens": n_ws,
            "n_punct": n_punct,
            "n_unique_ws_tokens": n_unique,
            "mean_token_len": mean_tok.astype("float64"),
            "punct_ratio": (n_punct / n_chars.clip(lower=1)).astype("float64"),
        })
        return out

    return docs.map_batches(stats, batch_format="pandas")


def quality_filter(
    docs: Dataset,
    *,
    min_tokens: int = 10,
    max_punct_ratio: float = 0.3,
    min_unique_ratio: float = 0.1,
) -> Dataset:
    """Keep documents passing the standard web-corpus quality gates."""

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        ws = text.str.split()
        n_ws = ws.str.len()
        n_chars = text.str.len().clip(lower=1)
        punct_ratio = text.str.count(PUNCT_RE.pattern) / n_chars
        n_unique = (
            ws.explode().groupby(level=0).nunique()
            .reindex(ws.index, fill_value=0)
        )
        uniq_ratio = n_unique / n_ws.clip(lower=1)
        mask = (n_ws >= min_tokens) & (punct_ratio <= max_punct_ratio) & (
            uniq_ratio >= min_unique_ratio
        )
        return batch[mask]

    return docs.map_batches(keep, batch_format="pandas")


def fingerprints(docs: Dataset, text_col: str = "text", window: int = 8) -> Dataset:
    """Document fingerprints: md5 content hash + winnowed rolling-hash sketch.

    ``fp_md5`` — exact content fingerprint (SQL-oracle-able).
    ``fp_winnow`` — min rolling hash (Rabin-Karp base-257 over bytes) per
    window position, winnowed to the global minimum: a cheap locality sketch.
    """

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        out_md5, out_win = [], []
        for text in batch[text_col].fillna(""):
            data = text.encode()
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
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "fp_md5": out_md5,
            "fp_winnow": pd.Series(out_win, dtype="uint64"),
        })

    return docs.map_batches(fp, batch_format="pandas")
