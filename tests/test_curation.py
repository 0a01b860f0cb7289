"""Corpus-curation stages: PII redaction, hash split, contamination,
repetition stats — unit + brute-force property tests."""

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from newsagency_classification_ray.stages.curation import (
    PII_PATTERNS,
    _word_ngrams,
    contamination,
    pii_redact,
    repetition_stats,
    split_assign,
)


def docs_ds(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


# ---------------------------------------------------------------- PII


def test_pii_redact_all_kinds():
    out = pii_redact(docs_ds([
        "mail a.b-c_d%x+1@sub.example.org now",
        "call 555-123-4567 or visit 192.168.0.1 today",
        "clean text, nothing here",
        None,
    ])).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "text_redacted"] == "mail <EMAIL> now"
    assert out.loc[0, ["n_emails", "n_phones", "n_ipv4"]].tolist() == [1, 0, 0]
    assert out.loc[1, "text_redacted"] == "call <PHONE> or visit <IP> today"
    assert out.loc[1, ["n_emails", "n_phones", "n_ipv4"]].tolist() == [0, 1, 1]
    assert out.loc[2, "text_redacted"] == "clean text, nothing here"
    assert out.loc[3, "text_redacted"] == ""


def test_pii_boundaries():
    # \b guards: longer digit runs around a phone shape must not match
    out = pii_redact(docs_ds(["x 1555-123-45678 y", "ip 10.1.2.3.4 end"]))
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df.loc[0, "n_phones"] == 0
    # dotted-quint: the first four octets match (same in RE2 and re)
    assert df.loc[1, "n_ipv4"] == 1
    assert df.loc[1, "text_redacted"] == "ip <IP>.4 end"


# ---------------------------------------------------------------- split


def test_split_assign_matches_md5_and_is_stable():
    ds = split_assign(docs_ds(["t"] * 64, ids=list(range(64))))
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    for _, r in df.iterrows():
        h = hashlib.md5(f"split:{int(r.doc_id)}".encode()).digest()
        exp = struct.unpack("<Q", h[8:])[0] % 100
        assert r.bucket == exp
        assert r.split == ("train" if exp < 80 else "val" if exp < 90 else "test")
    # independent of partitioning
    df2 = (
        split_assign(docs_ds(["t"] * 64, ids=list(range(64))).repartition(7))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert df2[["bucket", "split"]].equals(df[["bucket", "split"]])


def test_split_assign_ratios_roughly_hold():
    df = split_assign(docs_ds(["t"] * 2000, ids=list(range(2000)))).to_pandas()
    frac = df["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85
    assert 0.05 < frac["val"] < 0.15
    assert 0.05 < frac["test"] < 0.15


# ---------------------------------------------------------------- n-grams


def brute_ngrams(text, n):
    toks = text.split()
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def test_word_ngrams_matches_brute_force():
    rng = np.random.default_rng(7)
    vocab = list("abcdefg")
    texts = [" ".join(rng.choice(vocab, size=int(k))) for k in rng.integers(0, 12, 40)]
    for n in (2, 3, 5):
        row, grams = _word_ngrams(pa.array(texts, type=pa.string()), n)
        got = {}
        for r, g in zip(row, grams):
            got.setdefault(int(r), []).append(g)
        for i, t in enumerate(texts):
            assert got.get(i, []) == brute_ngrams(t, n)


# ---------------------------------------------------------------- contamination


def test_contamination_brute_force():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(6)]
    bench_texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(5)]
    probe_texts = [" ".join(rng.choice(vocab, size=15)) for _ in range(30)]
    # plant a contaminated doc: copy an exact benchmark 4-gram
    probe_texts[3] = "zz " + " ".join(bench_texts[0].split()[2:6]) + " qq"
    n = 4
    out = contamination(
        docs_ds(probe_texts, ids=list(range(100, 130))),
        docs_ds(bench_texts), n=n,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    bench_set = set(g for t in bench_texts for g in brute_ngrams(t, n))
    exp = {}
    for i, t in enumerate(probe_texts):
        hits = {g for g in brute_ngrams(t, n) if g in bench_set}
        if hits:
            exp[100 + i] = len(hits)
    assert dict(zip(out.doc_id, out.n_hits)) == exp
    assert 103 in exp  # the planted doc was caught


def test_contamination_empty_benchmark():
    out = contamination(docs_ds(["a b c d e"]), docs_ds([]), n=3).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------- repetition


def test_repetition_stats_brute_force():
    texts = [
        "a b c a b c a b",          # repeated trigrams
        "x y z w",                  # all distinct
        "q q q q q",                # maximal repetition
        "one two",                  # shorter than n
        "",
    ]
    out = repetition_stats(docs_ds(texts), n=3).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        grams = brute_ngrams(t, 3)
        assert out.loc[i, "n_3grams"] == len(grams)
        assert out.loc[i, "n_dup_3grams"] == len(grams) - len(set(grams))


# ------------------------------------------------------------------- dsir


def test_dsir_scores_separate_target_like_docs():
    from newsagency_classification_ray.stages.curation import (
        _hashed_feature_matrix, dsir_scores,
    )

    target_texts = ["the quick brown fox jumps over the lazy dog"] * 6
    raw_texts = target_texts[:2] + ["zzz qqq xxx vvv kkk jjj www"] * 4
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(raw_texts)), type=pa.int64()),
        "text": pa.array(raw_texts, type=pa.string()),
    })).repartition(3)
    target = ray.data.from_arrow(pa.table({
        "text": pa.array(target_texts, type=pa.string())}))
    out = dsir_scores(docs, target, dim=512, n_max=2).to_pandas()
    s = dict(zip(out.doc_id, out.score_micro))
    # target-like docs strictly outscore the off-distribution ones
    assert min(s[0], s[1]) > max(s[i] for i in range(2, 6))

    # exact parity with a driver-side recompute (the oracle's contract)
    mat = _hashed_feature_matrix(pa.array(raw_texts, type=pa.string()), 512, 2)
    t_hist = _hashed_feature_matrix(
        pa.array(target_texts, type=pa.string()), 512, 2).sum(axis=0)
    w_hist = mat.sum(axis=0)
    r = np.round(np.log((t_hist + 1.0) / (t_hist.sum() + 512))
                 - np.log((w_hist + 1.0) / (w_hist.sum() + 512)), 9)
    exp = np.floor(mat.astype(np.float64) @ r * 1e6 + 0.5).astype(np.int64)
    assert [s[i] for i in range(len(raw_texts))] == exp.tolist()
