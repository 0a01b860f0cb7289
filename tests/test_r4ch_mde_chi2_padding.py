"""MDE audit, cluster-label chi2, padding waste."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_mde_audit_matches_bruteforce():
    t = Q.QUERIES["events_mde_audit"](SF).to_pandas() \
        .set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["c"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        n = len(g)
        s = int(g.c.sum())
        ss = int((g.c.astype(object) ** 2).sum())
        m2 = n * ss - s * s
        row = t.loc[et]
        assert row.n == n
        assert row.mean_nano == Q._div_nano(s, n)
        assert row.var_nano == Q._div_nano(m2, n * n)
        assert row.mde2_nano == Q._div_nano(392 * m2, 25 * n**3)
    # more volume -> smaller detectable effect, all else equal
    assert (t.mde2_nano > 0).all()


def test_cluster_label_chi2_matches_bruteforce():
    t = Q.QUERIES["embeddings_cluster_label_chi2"](SF) \
        .to_pandas().iloc[0]
    assign = Q.QUERIES["embeddings_kmeans"](SF)
    import pyarrow as pa
    at = assign if isinstance(assign, pa.Table) else pa.concat_tables(
        list(assign.iter_batches(batch_format="pyarrow")))
    amap = dict(zip((int(v) for v in at["vec_id"].to_pylist()),
                    (int(v) for v in at["cluster"].to_pylist())))
    e = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "label"]).to_pandas()
    from collections import Counter
    obs = Counter((amap[int(v)], int(l))
                  for v, l in zip(e.vec_id, e.label))
    n = sum(obs.values())
    rows = Counter()
    cols = Counter()
    for (c, l), v in obs.items():
        rows[c] += v
        cols[l] += v
    chi2 = sum(Q._div_nano((n * obs.get((c, l), 0)
                            - rows[c] * cols[l]) ** 2,
                           n * rows[c] * cols[l])
               for c in rows for l in cols)
    assert t.n == n
    assert (t.k_clusters, t.n_labels) == (len(rows), len(cols))
    assert t.chi2_nano == chi2
    assert t.chi2_nano >= 0


def test_padding_waste_matches_bruteforce():
    t = Q.QUERIES["docs_padding_waste"](SF).to_pandas() \
        .set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    L = Q._PAD_L
    for src, g in docs.groupby("source"):
        toks = [len([w for w in txt.split() if w]) for txt in g.text]
        slots = sum(L * ((tk + L - 1) // L) for tk in toks)
        row = t.loc[src]
        assert row.n_docs == len(g)
        assert row.total_tokens == sum(toks)
        assert row.padded_slots == slots
        assert row.waste_nano == Q._div_nano(slots - sum(toks), slots)
    # waste is a fraction
    assert ((t.waste_nano >= 0) & (t.waste_nano < 10**9)).all()
