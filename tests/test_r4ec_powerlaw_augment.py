"""Power-law degree fit, seeded noise augmentation."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_powerlaw_fit_matches_bruteforce():
    row = Q.QUERIES["kg_degree_powerlaw"](SF).to_pandas().iloc[0]
    und = Q._kg_und_edges(SF).materialize()
    deg: dict = {}
    for r in und.take_all():
        deg[r["src_qid"]] = deg.get(r["src_qid"], 0) + 1
        deg[r["dst_qid"]] = deg.get(r["dst_qid"], 0) + 1
    n, dmin, alpha, ks = Q._powerlaw_fit(list(deg.values()))
    assert (int(row.n_nodes), int(row.d_min)) == (n, dmin)
    assert int(row.alpha_nano) == alpha
    assert int(row.ks_nano) == ks
    # sane fit: alpha > 1 (walk-sum normalizable), KS within [0, 1]
    assert alpha > 10 ** 9
    assert 0 <= ks <= 10 ** 9
    # MLE identity recheck
    s = sum(math.log(d / dmin) for d in sorted(deg.values()))
    assert alpha == int(round((1 + n / s) * 1e9))


def test_noise_augment_is_deterministic_and_bounded():
    t = Q.QUERIES["docs_noise_augment"](SF).to_pandas() \
        .set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    assert len(t) == len(docs)
    for r in docs.sample(25, random_state=7).itertuples():
        out, nd, ns = Q._augment_doc(int(r.doc_id), r.text or "")
        row = t.loc[int(r.doc_id)]
        assert int(row.n_chars) == len(r.text or "")
        assert int(row.n_deleted) == nd
        assert int(row.n_swapped) == ns
        assert row.out_md5 == hashlib.md5(out.encode()).hexdigest()
        # augmented length accounts exactly for the deletions
        assert len(out.encode()) == len((r.text or "").encode()) - nd
    # rates land near the configured probabilities over the corpus
    total = t.n_chars.sum()
    assert 0.01 < t.n_deleted.sum() / total < 0.03
    assert 0.005 < 2 * t.n_swapped.sum() / total < 0.05
    # rerun identical (bit-reproducibility)
    t2 = Q.QUERIES["docs_noise_augment"](SF).to_pandas() \
        .set_index("doc_id")
    assert (t.sort_index().out_md5 == t2.sort_index().out_md5).all()
