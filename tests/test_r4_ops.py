"""Round-4 operators: SemDeDup keep-list and domain-mixture resampling."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from newsagency_classification_ray.stages.curation import domain_mixture
from newsagency_classification_ray.stages.similarity import (
    kmeans_assign, kmeans_fit, semdedup_keep,
)


def _emb_ds(vecs: np.ndarray):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })).repartition(3)


def test_semdedup_drops_planted_duplicates(ray_session):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    # ids 30..39 duplicate ids 0..9 exactly → must be dropped (higher id)
    vecs = np.vstack([base[:30], base[:10]])
    out = semdedup_keep(_emb_ds(vecs), k=4, iters=3, tau=0.99).to_pandas()
    kept = set(out["vec_id"])
    assert kept == set(range(30))  # every original survives, every copy drops


def test_semdedup_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8))
    k, iters, tau, rd, cd = 4, 3, 0.5, 6, 6
    out = semdedup_keep(_emb_ds(vecs), k=k, iters=iters, tau=tau,
                        round_decimals=rd, cos_decimals=cd).to_pandas()
    got = sorted(map(tuple, out[["vec_id", "cluster"]].to_numpy()))

    # brute force: same rounded Lloyd + id-ordered greedy cosine dedup
    centroids = kmeans_fit(_emb_ds(vecs), k=k, iters=iters, round_decimals=rd)
    m = vecs.astype(np.float64)
    a = (-2.0 * (m @ centroids.T) + (centroids * centroids).sum(axis=1)).argmin(axis=1)
    nn = np.linalg.norm(m, axis=1, keepdims=True)
    nn[nn == 0] = 1.0
    nrm = m / nn
    exp = []
    for cl in range(k):
        idx = np.flatnonzero(a == cl)
        sims = np.round(nrm[idx] @ nrm[idx].T, cd)
        drop = np.zeros(idx.size, dtype=bool)
        for i in range(idx.size):
            if not drop[i] and np.any((sims[i, :i] >= tau) & ~drop[:i]):
                drop[i] = True
        exp.extend((int(j), cl) for j in idx[~drop])
    assert got == sorted(exp)


def test_semdedup_agrees_with_kmeans_assign_clusters(ray_session):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 8))
    ds = _emb_ds(vecs)
    keep = semdedup_keep(ds, k=4, iters=2, tau=2.0).to_pandas()  # tau>1: no drops
    clusters = kmeans_assign(ds, k=4, iters=2).to_pandas()
    assert len(keep) == 50
    a = dict(zip(keep["vec_id"], keep["cluster"]))
    b = dict(zip(clusters["vec_id"], clusters["cluster"]))
    assert a == b


def _docs_ds(n: int, sources: list[str]):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "source": pa.array([sources[i % len(sources)] for i in range(n)],
                           type=pa.string()),
    })).repartition(4)


def test_domain_mixture_matches_bruteforce(ray_session):
    n, sources = 400, ["a", "b", "c", "d"]
    target = {"a": 3.0, "b": 1.0, "c": 1.0}  # 'd' absent → dropped entirely
    frac = 0.4
    out = domain_mixture(_docs_ds(n, sources), target, frac=frac).to_pandas()
    got = sorted(out["doc_id"])

    wsum = sum(target.values())
    counts = {s: n // len(sources) for s in sources}
    exp = []
    for i in range(n):
        s = sources[i % len(sources)]
        if s not in target:
            continue
        rate = min(1.0, (frac * (target[s] / wsum)) * float(n) / counts[s])
        thr = int(np.floor(rate * 4294967296.0))
        h = (np.uint64(i) * np.uint64(2654435761)) % np.uint64(2**32)
        if int(h) < thr:
            exp.append(i)
    assert got == exp
    assert "d" not in set(out["source"])


def test_domain_mixture_saturation_keeps_whole_domain(ray_session):
    # target puts 90% weight on 'a', which holds only 25% of rows → keep all
    n, sources = 200, ["a", "b", "c", "d"]
    out = domain_mixture(_docs_ds(n, sources), {"a": 9.0, "b": 1.0},
                         frac=0.8).to_pandas()
    a_rows = out[out["source"] == "a"]
    assert len(a_rows) == n // 4  # saturated: every 'a' row kept


def test_domain_mixture_rejects_bad_weights(ray_session):
    with pytest.raises(ValueError):
        domain_mixture(_docs_ds(8, ["a"]), {"a": 0.0})
