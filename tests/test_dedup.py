"""Dedup family: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

import numpy as np
import pyarrow as pa
import ray.data

from newsagency_classification_ray.stages.dedup import (
    MinHashStage,
    SimHashStage,
    _shingle_hashes,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_topk,
    simhash_pairs,
)

BASE = ("the quick brown fox jumps over the lazy dog and runs far away into "
        "the green forest near the old river bank every single morning")


def corpus():
    """Docs 0/1 near-dups, 2 exact dup of 0, 3/4 unrelated."""
    texts = [
        BASE,
        BASE.replace("quick", "fast"),              # near-dup of 0
        BASE,                                       # exact dup of 0
        "completely different words about machine learning pipelines and ray data",
        "yet another unrelated string with its own vocabulary entirely apart",
    ]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_exact_dedup():
    kept = set(exact_dedup(corpus()).to_pandas()["doc_id"])
    assert kept == {0, 1, 3, 4}  # doc 2 collapses into doc 0 (min id)


def test_minhash_signature_estimates_jaccard():
    st = MinHashStage(num_perm=128)
    a, b = st.signature(BASE), st.signature(BASE.replace("quick", "fast"))
    est = (a == b).mean()
    sa, sb = _shingle_hashes(BASE, 3), _shingle_hashes(BASE.replace("quick", "fast"), 3)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    true = inter / (sa.size + sb.size - inter)
    assert abs(est - true) < 0.2
    assert (st.signature(BASE) == a).all()  # deterministic


def test_minhash_lsh_finds_near_and_exact_dups():
    pairs = minhash_lsh_pairs(corpus(), jaccard_threshold=0.5).to_pandas()
    found = {tuple(r) for r in pairs[["doc_a", "doc_b"]].itertuples(index=False)}
    assert (0, 2) in found  # exact dup → jaccard 1.0
    assert (0, 1) in found or (1, 2) in found  # near-dup caught
    # unrelated docs never pair with the BASE cluster
    assert not any({a, b} & {3, 4} and {a, b} & {0, 1, 2} for a, b in found)


def test_simhash_pairs():
    pairs = simhash_pairs(corpus(), max_hamming=6).to_pandas()
    found = {tuple(r) for r in pairs[["doc_a", "doc_b"]].itertuples(index=False)}
    assert (0, 2) in found  # identical text → hamming 0
    ham = pairs.set_index(["doc_a", "doc_b"])["hamming"]
    assert ham[(0, 2)] == 0


def test_simhash_unrelated_far():
    st = SimHashStage()
    h1, h2 = st.simhash(BASE), st.simhash("machine learning ray data pipelines")
    assert bin(h1 ^ h2).count("1") > 10


def test_ngram_jaccard_topk():
    out = ngram_jaccard_topk(corpus(), query_ids=[0], k=2).to_pandas()
    assert list(out["query_id"].unique()) == [0]
    assert len(out) == 2
    assert out.iloc[0]["doc_id"] == 2 and out.iloc[0]["jaccard"] == 1.0
    assert out.iloc[1]["doc_id"] == 1  # near-dup second


def test_near_dedup_keep():
    from newsagency_classification_ray.stages.dedup import near_dedup_keep

    kept = sorted(r["doc_id"] for r in near_dedup_keep(
        corpus(), jaccard_threshold=0.5).take_all())
    # cluster {0,1,2} collapses to representative 0; 3 and 4 survive
    assert kept == [0, 3, 4]


def _uf_roots(edges, nodes):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra
    return {n: find(n) for n in nodes}


def test_connected_components_matches_union_find():
    """Distributed min-label propagation == driver union-find on random
    pair graphs (chains, stars, cliques, singleton-free random mixes)."""
    from newsagency_classification_ray.stages.dedup import connected_components

    rng = np.random.RandomState(7)
    cases = [
        [(i, i + 1) for i in range(40)],                      # one long chain
        [(0, i) for i in range(1, 30)],                       # star
        [(i, j) for i in range(8) for j in range(i + 1, 8)],  # clique
    ]
    for seed in range(3):                                     # random graphs
        rng = np.random.RandomState(seed)
        e = rng.randint(0, 60, size=(50, 2))
        cases.append([(int(a), int(b)) for a, b in e if a != b])
    for edges in cases:
        nodes = sorted({x for e in edges for x in e})
        pairs = ray.data.from_arrow(pa.table({
            "doc_a": pa.array([a for a, _ in edges], type=pa.int64()),
            "doc_b": pa.array([b for _, b in edges], type=pa.int64()),
        }))
        got = {r["node"]: r["label"]
               for r in connected_components(pairs).take_all()}
        assert got == _uf_roots(edges, nodes)


def test_near_dedup_keep_distributed_path_matches_driver_path():
    from newsagency_classification_ray.stages.dedup import near_dedup_keep

    driver = sorted(r["doc_id"] for r in near_dedup_keep(
        corpus(), jaccard_threshold=0.5).take_all())
    dist = sorted(r["doc_id"] for r in near_dedup_keep(
        corpus(), jaccard_threshold=0.5, driver_pair_threshold=0).take_all())
    dist_anti = sorted(r["doc_id"] for r in near_dedup_keep(
        corpus(), jaccard_threshold=0.5, driver_pair_threshold=0,
        broadcast_victim_threshold=0).take_all())
    assert driver == dist == dist_anti == [0, 3, 4]


def test_substring_dup_counts_matches_brute_force():
    """Randomized check of the windowed substring-dedup op vs brute force."""
    from collections import Counter

    from newsagency_classification_ray.stages.dedup import substring_dup_counts

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(40):
        nt = rng.randint(0, 25)
        texts.append(" ".join(vocab[j] for j in rng.randint(0, 30, size=nt)))
    # plant exact duplicates and a shared 8-token run
    texts[7] = texts[3]
    texts[9] = "x1 x2 " + " ".join(vocab[:8]) + " tail9"
    texts[11] = "other prefix " + " ".join(vocab[:8])
    n = 8

    def grams(s):
        toks = s.split(" ")
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    per_doc = [grams(s) for s in texts]
    owners = Counter()
    for gs in per_doc:
        owners.update(gs)
    expect = {
        i: sum(1 for g in gs if owners[g] >= 2)
        for i, gs in enumerate(per_doc)
        if any(owners[g] >= 2 for g in gs)
    }

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    got = {r["doc_id"]: r["dup_windows"]
           for r in substring_dup_counts(ds, n=n).take_all()}
    assert got == expect
    assert got[3] == got[7] and got[3] >= 1  # planted exact dup pair
    assert 9 in got and 11 in got           # planted shared 8-token run
