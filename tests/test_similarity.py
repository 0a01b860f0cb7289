"""Similarity search: exact brute-force top-k, LSH variant, cosine dups."""

import numpy as np
import pyarrow as pa
import ray.data

from newsagency_classification_ray.stages.similarity import (
    brute_force_topk,
    embedding_cosine_dups,
    lsh_topk,
)


def make_embeddings(n=300, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(np.float32)
    vecs[10] = vecs[0] * 2.0          # same direction as 0 → cosine 1
    vecs[11] = vecs[0] + rng.randn(dim).astype(np.float32) * 0.01  # near-dup
    tbl = pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], type=pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(tbl), vecs


def numpy_topk(vecs, qidx, k):
    q = vecs[qidx] / np.linalg.norm(vecs[qidx])
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    scores = m @ q
    scores[qidx] = -np.inf
    order = np.lexsort((np.arange(len(vecs)), -scores))
    return order[:k].tolist()


def test_brute_force_matches_numpy():
    ds, vecs = make_embeddings()
    out = brute_force_topk(ds, vecs[[0, 5]], [0, 5], k=4).to_pandas()
    for qid in (0, 5):
        got = out[out.query_id == qid].sort_values("rank")["vec_id"].tolist()
        assert got == numpy_topk(vecs.astype(np.float64), qid, 4)
    assert out[out.query_id == 0].iloc[0]["vec_id"] == 10  # colinear vector first


def test_lsh_topk_high_recall_on_near_dups():
    ds, vecs = make_embeddings()
    out = lsh_topk(ds, vecs[[0]], [0], k=4, bits=6, dim=16).to_pandas()
    # colinear / near-dup vectors share the query's bucket with prob ~1
    assert 10 in set(out["vec_id"])


def test_embedding_cosine_dups():
    ds, vecs = make_embeddings()
    pairs = embedding_cosine_dups(ds, threshold=0.95, bits=6, dim=16).to_pandas()
    found = {tuple(r) for r in pairs[["vec_a", "vec_b"]].itertuples(index=False)}
    assert (0, 10) in found
    assert (0, 11) in found
