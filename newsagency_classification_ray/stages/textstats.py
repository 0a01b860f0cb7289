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
    """

    def __init__(self, profiles: dict[str, set[str]] | None = None):
        self.profiles = profiles or _STOPWORDS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds, confs = [], []
        for text in batch["text"].fillna(""):
            toks = text.lower().split()
            if not toks:
                preds.append("und"); confs.append(0.0)
                continue
            scores = {
                lang: sum(t in sw for t in toks) / len(toks)
                for lang, sw in self.profiles.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            preds.append(best if scores[best] > 0 else "und")
            confs.append(float(scores[best]))
        batch["lang_pred"] = preds
        batch["lang_conf"] = np.asarray(confs, dtype=np.float32)
        return batch


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
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_ws_tokens": n_ws,
            "n_punct": n_punct,
            "n_unique_ws_tokens": ws.map(lambda w: len(set(w))).astype("int64"),
            "mean_token_len": (
                toks.map(lambda ts: float(np.mean([len(t) for t in ts])) if ts else 0.0)
            ).astype("float64"),
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
        uniq_ratio = ws.map(lambda w: len(set(w)) / max(1, len(w)))
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
