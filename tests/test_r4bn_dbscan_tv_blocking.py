"""DBSCAN over quantized embeddings, source TV distance, blocking audit."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def _brute_dbscan():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist(), np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    qm = Q._q6v(np.array(t["embedding"].to_pylist(), np.float64))[order]
    d2 = ((qm[:, None, :] - qm[None, :, :]) ** 2).sum(-1)
    within = d2 <= Q._DBSCAN_EPS2
    core = within.sum(1) >= Q._DBSCAN_MINPTS
    n = len(ids)
    lab = {int(v): int(v) for v in ids[core]}

    def find(x):
        while lab[x] != x:
            lab[x] = lab[lab[x]]
            x = lab[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and within[i, j]:
                ra, rb = find(int(ids[i])), find(int(ids[j]))
                if ra != rb:
                    lab[max(ra, rb)] = min(ra, rb)
    roles, clusters = [], []
    for i in range(n):
        if core[i]:
            roles.append("core")
            clusters.append(find(int(ids[i])))
        else:
            nbrs = ids[within[i] & core]
            if len(nbrs):
                roles.append("border")
                clusters.append(find(int(nbrs.min())))
            else:
                roles.append("noise")
                clusters.append(-1)
    return ids, roles, clusters


def test_dbscan_matches_bruteforce():
    t = Q.QUERIES["embeddings_dbscan"](SF).to_pandas()
    ids, roles, clusters = _brute_dbscan()
    assert list(t.vec_id) == list(ids)
    assert list(t.role) == roles
    assert list(t.cluster_id) == clusters
    # structure sanity: mix of all three roles, >1 cluster
    assert set(t.role) == {"core", "border", "noise"}
    assert t[t.role == "core"].cluster_id.nunique() > 1
    # cluster label is the min core id of its own cluster
    for cl, g in t[t.role == "core"].groupby("cluster_id"):
        assert cl == g.vec_id.min()
    # noise has cluster -1, others never
    assert (t[t.role == "noise"].cluster_id == -1).all()
    assert (t[t.role != "noise"].cluster_id >= 0).all()


def test_source_tv_matches_pandas():
    t = Q.QUERIES["docs_source_tv"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    from collections import Counter
    counts, totals = {}, {}
    for src, g in docs.groupby("source"):
        c = Counter(w for txt in g.text for w in txt.split() if w)
        counts[src] = c
        totals[src] = sum(c.values())
    srcs = sorted(totals)
    got = {(r.src_a, r.src_b): r.tv_nano for r in t.itertuples()}
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            vocab = set(counts[a]) | set(counts[b])
            num = sum(abs(counts[a][w] * totals[b]
                          - counts[b][w] * totals[a]) for w in vocab)
            assert got[(a, b)] == Q._div_nano(num, 2 * totals[a] * totals[b])
    # TV is a metric in [0, 1]
    assert all(0 <= v <= 10**9 for v in got.values())


def test_blocking_quality_invariants():
    t = Q.QUERIES["kg_blocking_quality"](SF).to_pandas() \
        .set_index("scheme")
    assert set(t.index) == set(Q._BLOCK_SCHEMES)
    full = t.n_surfaces.iloc[0] * t.n_vocab.iloc[0]
    for scheme in Q._BLOCK_SCHEMES:
        row = t.loc[scheme]
        assert 0 < row.n_candidates <= full
        assert 0 < row.n_mentions_kept <= row.n_mentions
        assert row.recall_nano == Q._div_nano(
            int(row.n_mentions_kept), int(row.n_mentions))
    # the conjunction blocks at least as hard as either conjunct
    assert t.loc["first1_len1"].n_candidates <= t.loc["first1"].n_candidates
    assert t.loc["first1_len1"].n_candidates <= t.loc["len1"].n_candidates
    assert (t.loc["first1_len1"].n_mentions_kept
            <= t.loc["first1"].n_mentions_kept)
    # prefix2 refines first1
    assert t.loc["prefix2"].n_candidates <= t.loc["first1"].n_candidates
