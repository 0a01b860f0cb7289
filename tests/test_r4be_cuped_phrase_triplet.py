"""CUPED, positional phrase search, triplet margin audit."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_cuped_matches_numpy():
    r = Q.QUERIES["events_cuped"](SF).to_pylist()[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "value"]).to_pandas()
    ev["day"] = ev.ts.astype("int64") // 86_400_000_000
    ev["cents"] = (ev.value * 100).round().astype(int)
    cutoff = (ev.day.min() + ev.day.max() + 1) // 2
    assert r["cutoff_day"] == cutoff
    pre = ev[ev.day < cutoff].groupby("user_id").cents.sum()
    post = ev[ev.day >= cutoff].groupby("user_id").cents.sum()
    users = sorted(set(ev.user_id))
    x = np.array([pre.get(u, 0) for u in users], float)
    y = np.array([post.get(u, 0) for u in users], float)
    assert r["n_users"] == len(users)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    assert abs(r["theta_nano"] / 1e9 - theta) < 1e-6
    rho2 = np.corrcoef(x, y)[0, 1] ** 2
    assert abs(r["var_reduction_nano"] / 1e9 - rho2) < 1e-6


def test_phrase_search_matches_string_count():
    t = Q.QUERIES["docs_phrase_search"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    phrase = " " + " ".join(Q._PHRASE_QUERY) + " "
    want = {}
    for i, s in zip(docs.doc_id, docs.text):
        c = (" " + (s or "") + " ").count(phrase)
        if c:
            want[int(i)] = c
    got = dict(zip(t.doc_id, t.n_matches))
    assert got == want
    assert len(got) > 0  # phrase present in corpus


def test_phrase_search_positions_overlap_free():
    """Positional intersection counts every adjacency, including
    back-to-back repeats — verify on a crafted doc via the kernel path."""
    toks = "hash join hash join x hash join".split(" ")
    pos_h = np.asarray([j for j, w in enumerate(toks) if w == "hash"])
    pos_j = np.asarray([j for j, w in enumerate(toks) if w == "join"]) - 1
    assert len(np.intersect1d(pos_h, pos_j)) == 3


def test_triplet_margin_sane():
    t = Q.QUERIES["embeddings_triplet_margin"](SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["label"]).to_pandas()
    assert t.n.sum() == len(emb)
    assert (t.n_hard <= t.n).all()
    # labels here are random -> geometry is uninformative: most anchors
    # should be hard (sanity that the audit detects it)
    assert t.n_hard.sum() > 0
    # mean gap consistent sign check: gap can be negative (hard labels)
    assert t.mean_gap_q.abs().max() < 10**15
