"""Retrieval ops (TF-IDF, inverted index), text chunking, and distributed
k-means — brute-force property tests."""

import math

import pytest

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from newsagency_classification_ray.stages.curation import chunk_text
from newsagency_classification_ray.stages.retrieval import (
    inverted_index,
    term_doc_frequencies,
    tfidf_topk,
)
from newsagency_classification_ray.stages.similarity import kmeans_assign


def docs_ds(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


RNG = np.random.default_rng(23)
VOCAB = ["cat", "dog", "fish", "bird", "cow"]
TEXTS = [" ".join(RNG.choice(VOCAB, size=int(k))) for k in RNG.integers(1, 25, 60)]


def test_term_doc_frequencies_brute():
    terms = ["cat", "fish", "absent"]
    df, n = term_doc_frequencies(docs_ds(TEXTS).repartition(5), terms)
    assert n == len(TEXTS)
    for j, t in enumerate(terms):
        assert df[j] == sum(1 for x in TEXTS if t in x.split())


def test_tfidf_topk_brute():
    terms = ["cat", "fish"]
    out = tfidf_topk(docs_ds(TEXTS).repartition(4), terms, k=10).to_pandas()
    n = len(TEXTS)
    idf = {t: math.log(n / sum(1 for x in TEXTS if t in x.split())) for t in terms}
    scores = {}
    for i, x in enumerate(TEXTS):
        toks = x.split()
        s = sum(toks.count(t) * idf[t] for t in terms)
        micro = int(np.floor(s * 1e6 + 0.5))
        if micro > 0:
            scores[i] = micro
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out.doc_id, out.score_micro)) == exp


def test_inverted_index_brute():
    out = inverted_index(docs_ds(TEXTS).repartition(4)).to_pandas()
    got = {r.token: (r.df, r.postings) for r in out.itertuples()}
    exp = {}
    for t in VOCAB:
        ids = sorted({i for i, x in enumerate(TEXTS) if t in x.split()})
        if ids:
            exp[t] = (len(ids), ",".join(map(str, ids)))
    assert got == exp


def test_inverted_index_max_postings():
    out = inverted_index(docs_ds(["a a", "a", "b a"]), max_postings=2).to_pandas()
    row = out[out.token == "a"].iloc[0]
    assert row.df == 3 and row.postings == "0,1"


def test_chunk_text_brute():
    texts = ["x" * 500, "y" * 150, "z" * 151, "w", ""]
    out = chunk_text(docs_ds(texts), size=200, stride=150).to_pandas()
    got = {(r.doc_id, r.chunk_id): r.chunk for r in out.itertuples()}
    exp = {}
    for i, t in enumerate(texts):
        k = 0
        while k * 150 < len(t):
            exp[(i, k)] = t[k * 150:k * 150 + 200]
            k += 1
    assert got == exp
    # every char position is covered by at least one chunk
    for i, t in enumerate(texts):
        covered = set()
        for (d, k), c in got.items():
            if d == i:
                covered.update(range(k * 150, k * 150 + len(c)))
        assert covered == set(range(len(t)))


def emb_ds(m, ids=None):
    ids = list(range(len(m))) if ids is None else ids
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([row.tolist() for row in m],
                              type=pa.list_(pa.float32())),
    }))


def brute_kmeans(ids, m, k, iters, rd=6):
    order = np.argsort(ids)
    ids, m = np.asarray(ids)[order], np.asarray(m, dtype=np.float64)[order]
    c = np.round(m[np.isin(ids, np.arange(k))], rd)

    def assign(mm, cc):
        return (-2.0 * (mm @ cc.T) + (cc * cc).sum(axis=1)).argmin(axis=1)

    for _ in range(iters):
        a = assign(m, c)
        sums = np.zeros_like(c)
        np.add.at(sums, a, m)
        counts = np.bincount(a, minlength=k)
        ne = counts > 0
        c = c.copy()
        c[ne] = np.round(sums[ne] / counts[ne, None], rd)
    return dict(zip(ids.tolist(), assign(m, c).tolist()))


def test_kmeans_matches_brute_force_and_partitioning():
    rng = np.random.default_rng(5)
    m = np.concatenate([
        rng.normal(0, 0.2, (40, 8)) + off for off in (0.0, 3.0, -3.0)
    ]).astype(np.float32)
    ids = list(range(len(m)))
    exp = brute_kmeans(ids, m, k=3, iters=4)
    for parts in (2, 9):
        for limit in (0, 200_000):  # distributed partial-sum vs driver regime
            out = kmeans_assign(emb_ds(m, ids).repartition(parts), k=3,
                                iters=4, driver_row_limit=limit)
            got = dict(zip(*[out.to_pandas()[c].tolist()
                             for c in ("vec_id", "cluster")]))
            assert got == exp
    # the three planted blobs separate
    clusters = [exp[i] for i in ids]
    assert len({tuple(sorted(set(clusters[i:i + 40]))) for i in (0, 40, 80)}) == 3
    for base in (0, 40, 80):
        assert len(set(clusters[base:base + 40])) == 1


def test_kmeans_empty_cluster_keeps_centroid():
    # two far blobs, k=3 with one seed isolated between them and no members
    m = np.array([[0.0], [0.1], [100.0], [100.1], [0.05], [99.95]], dtype=np.float32)
    out = kmeans_assign(emb_ds(m), k=3, iters=3).to_pandas()
    got = dict(zip(out.vec_id, out.cluster))
    exp = brute_kmeans(list(range(len(m))), m, k=3, iters=3)
    assert got == exp


# ---------------------------------------------------------------- pagerank

from newsagency_classification_ray.ops import pagerank


def brute_pagerank(s, d, w, damping=0.85, iters=6, rd=9):
    nodes = sorted(set(s) | set(d))
    pos = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    wdeg = np.zeros(n)
    for a, ww in zip(s, w):
        wdeg[pos[a]] += ww
    r = np.full(n, round(1.0 / n, rd))
    for _ in range(iters):
        share = np.where(wdeg > 0, r / np.where(wdeg > 0, wdeg, 1.0), 0.0)
        dangling = r[wdeg == 0].sum()
        c = np.zeros(n)
        for a, b, ww in zip(s, d, w):
            c[pos[b]] += ww * share[pos[a]]
        r = np.round((1 - damping) / n + damping * dangling / n
                     + damping * c, rd)
    return dict(zip(nodes, r.tolist()))


def edges_ds(s, d, w):
    return ray.data.from_arrow(pa.table({
        "src": pa.array(s, type=pa.int64()),
        "dst": pa.array(d, type=pa.int64()),
        "weight": pa.array(w, type=pa.float64()),
    }))


def test_pagerank_both_paths_match_brute_force():
    rng = np.random.default_rng(3)
    # nodes 18/19 never sources -> dangling mass exercised
    s = rng.integers(0, 18, 60).tolist()
    d = rng.integers(0, 20, 60).tolist()
    w = rng.uniform(0.5, 2.0, 60).round(3).tolist()
    exp = brute_pagerank(s, d, w)
    ds = edges_ds(s, d, w).repartition(4)
    driver = pagerank(ds, weight="weight", iters=6).to_pandas()
    assert dict(zip(driver.node, driver["rank"])) == exp
    fast = pagerank(ds, weight="weight", iters=6,
                    driver_edge_limit=0).to_pandas()
    assert dict(zip(fast.node, fast["rank"])) == exp
    join = pagerank(ds, weight="weight", iters=6,
                    driver_edge_limit=0, broadcast_threshold=0).to_pandas()
    assert dict(zip(join.node, join["rank"])) == exp


def test_pagerank_unweighted_and_sum_to_one():
    s, d = [0, 1, 2, 2], [1, 2, 0, 1]
    out = pagerank(edges_ds(s, d, [1.0] * 4).drop_columns(["weight"]),
                   iters=10).to_pandas()
    assert abs(out["rank"].sum() - 1.0) < 1e-6
    exp = brute_pagerank(s, d, [1.0] * 4, iters=10)
    assert dict(zip(out.node, out["rank"])) == exp


def brute_ppr(s, d, w, seeds, damping=0.85, iters=6, rd=9):
    """Mirror of ops.pagerank's driver regime with the seed teleport."""
    nodes = sorted(set(s) | set(d))
    pos = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    wdeg = np.zeros(n)
    for a, ww in zip(s, w):
        wdeg[pos[a]] += ww
    mask = np.array([v in set(seeds) for v in nodes])
    pv = np.where(mask, 1.0 / mask.sum(), 0.0)
    r = np.round(pv, rd)
    for _ in range(iters):
        share = np.where(wdeg > 0, r / np.where(wdeg > 0, wdeg, 1.0), 0.0)
        dangling = max(float(r.sum() - r[wdeg > 0].sum()), 0.0)
        c = np.zeros(n)
        for a, b, ww in zip(s, d, w):
            c[pos[b]] += ww * share[pos[a]]
        r = np.round(((1 - damping) + damping * dangling) * pv
                     + damping * c, rd)
    return dict(zip(nodes, r.tolist()))


def test_personalized_pagerank_all_regimes_match_brute_force():
    rng = np.random.default_rng(5)
    s = rng.integers(0, 18, 60).tolist()
    d = rng.integers(0, 20, 60).tolist()  # 18/19 dangling
    w = rng.uniform(0.5, 2.0, 60).round(3).tolist()
    seeds = [0, 5, 19]  # includes a dangling seed
    exp = brute_ppr(s, d, w, seeds)
    ds = edges_ds(s, d, w).repartition(4)
    for kw in [dict(), dict(driver_edge_limit=0),
               dict(driver_edge_limit=0, broadcast_threshold=0)]:
        out = pagerank(ds, weight="weight", iters=6, seeds=seeds,
                       **kw).to_pandas()
        assert dict(zip(out.node, out["rank"])) == exp, kw
    # rank mass concentrates on the seeds, and sums to ~1
    vals = pd.Series(exp)
    assert vals.sum() == pytest.approx(1.0, abs=1e-6)
    assert min(vals[i] for i in seeds) > vals.drop(seeds).max()


def test_personalized_pagerank_rejects_absent_seeds():
    ds = edges_ds([0, 1], [1, 0], [1.0, 1.0])
    with pytest.raises(ValueError, match="no seed node"):
        pagerank(ds, weight="weight", iters=2, seeds=[99])
    ds_big = edges_ds([0, 1], [1, 0], [1.0, 1.0])
    with pytest.raises(ValueError, match="no seed node"):
        pagerank(ds_big, weight="weight", iters=2, seeds=[99],
                 driver_edge_limit=0, broadcast_threshold=0)
