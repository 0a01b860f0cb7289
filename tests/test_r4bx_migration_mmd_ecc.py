"""Shard migration, kernel MMD, eccentricity."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_shard_migration_matches_bruteforce():
    t = Q.QUERIES["docs_shard_migration"](SF).to_pandas() \
        .set_index("scheme")
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"] \
        .to_numpy().astype(np.int64)
    h = ((ids % 4294967296) * 1000003 + 12345) % 4294967296
    mod_moved = int(((h % Q._MIG_OLD) != (h % Q._MIG_NEW)).sum())
    w = Q._hrw_weights(ids, Q._MIG_NEW)
    hrw_moved = int((np.argmax(w[:, :Q._MIG_OLD], 1)
                     != np.argmax(w, 1)).sum())
    assert t.loc["mod"].n_moved == mod_moved
    assert t.loc["rendezvous"].n_moved == hrw_moved
    assert (t.n_docs == len(ids)).all()
    # the whole point: rendezvous moves far fewer docs than mod-N
    assert t.loc["rendezvous"].n_moved < t.loc["mod"].n_moved
    # HRW expectation ~ (new-old)/new = 20%; allow generous slack
    frac = t.loc["rendezvous"].n_moved / len(ids)
    assert 0.05 < frac < 0.45


def test_mmd_matches_bruteforce():
    t = Q.QUERIES["embeddings_mmd"](SF).to_pandas().iloc[0]
    e = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["embedding", "label"])
    qm = Q._q3v(np.array(e["embedding"].to_pylist(), np.float64))
    lab = np.array(e["label"].to_pylist(), np.int64)
    a = qm[lab == 0].astype(object)
    b = qm[lab != 0].astype(object)
    kaa = int(((a @ a.T) ** 2).sum())
    kbb = int(((b @ b.T) ** 2).sum())
    kab = int(((a @ b.T) ** 2).sum())
    na, nb = len(a), len(b)
    rnd = lambda n_, d: (2 * n_ + d) // (2 * d)
    assert (t.n_a, t.n_b) == (na, nb)
    assert t.kaa_mean == rnd(kaa, na * na)
    assert t.kbb_mean == rnd(kbb, nb * nb)
    assert t.kab_mean == rnd(2 * kab, 2 * na * nb)
    assert t.mmd2 == t.kaa_mean + t.kbb_mean - 2 * t.kab_mean


def test_eccentricity_matches_bruteforce():
    t = Q.QUERIES["kg_eccentricity"](SF).to_pandas().set_index("qid")
    rows = (Q.kg.cooccurrence_edges(Q._mentions(SF)).map_batches(
        lambda b: b.select(["src_qid", "dst_qid"]),
        batch_format="pyarrow").take_all())
    pairs = {(r["src_qid"], r["dst_qid"]) for r in rows}
    nodes = sorted({q for p in pairs for q in p})
    nbr = {q: set() for q in nodes}
    for a, b in pairs:
        nbr[a].add(b)
        nbr[b].add(a)
    for src in nodes:
        dist = {src: 0}
        frontier = [src]
        while frontier:
            frontier = [v for u in frontier for v in nbr[u]
                        if v not in dist and not dist.update({v: dist[u] + 1})]
        row = t.loc[src]
        assert row.ecc == max(dist.values())
        assert row.comp == min(dist)
    # diameter of the graph == max eccentricity; center has min ecc
    assert t.ecc.max() >= t.ecc.min()
    # eccentricity of any node differs from the diameter by <= factor 2
    assert t.ecc.max() <= 2 * t.ecc.min() or t.comp.nunique() > 1
