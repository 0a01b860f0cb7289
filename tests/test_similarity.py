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


def test_ivf_topk_recall_vs_bruteforce():
    from newsagency_classification_ray.stages.similarity import ivf_topk

    emb, vecs = make_embeddings()
    qids = [0, 5, 42]
    qvecs = vecs[qids]
    exact = brute_force_topk(emb, qvecs, qids, k=5).to_pandas()
    approx = ivf_topk(emb, qvecs, qids, k=5, n_centroids=8, n_probe=4).to_pandas()
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q]["vec_id"])
        a = set(approx[approx.query_id == q]["vec_id"])
        recalls.append(len(e & a) / max(1, len(e)))
    assert sum(recalls) / len(recalls) >= 0.6  # probing half the lists


def test_ivf_full_probe_equals_bruteforce():
    from newsagency_classification_ray.stages.similarity import ivf_topk

    emb, vecs = make_embeddings()
    qids = [0, 5, 42]
    qvecs = vecs[qids]
    exact = brute_force_topk(emb, qvecs, qids, k=5).to_pandas()
    full = ivf_topk(emb, qvecs, qids, k=5, n_centroids=8, n_probe=8).to_pandas()
    for df in (exact, full):
        df.sort_values(["query_id", "rank"], inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert (exact["vec_id"].to_numpy() == full["vec_id"].to_numpy()).all()


def test_export_gexf(tmp_path):
    import os

    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.pipelines.graph import export_gexf

    nodes = ray.data.from_arrow(pa.table({
        "node_id": pa.array(["Q1", "u1"], type=pa.string()),
        "kind": pa.array(["agency", "article"], type=pa.string()),
        "qid": pa.array(["Q1", None], type=pa.string()),
        "label": pa.array(["Havas", "u1"], type=pa.string()),
        "n_mentions": pa.array([3, 1], type=pa.int64()),
    }))
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(["u1"], type=pa.string()),
        "dst": pa.array(["Q1"], type=pa.string()),
        "predicate": pa.array(["cites_agency"], type=pa.string()),
        "year": pa.array([1950], type=pa.int32()),
        "weight": pa.array([3], type=pa.int64()),
    }))
    p = os.path.join(tmp_path, "g.gexf")
    export_gexf(nodes, edges, p)
    import networkx as nx

    g = nx.read_gexf(p)
    assert set(g.nodes) == {"Q1", "u1"}
    assert g.number_of_edges() == 1
