"""Edge semantics for the structural-similarity + sketch-recall batch."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q


def test_neighbor_jaccard_on_real_graph(ray_session):
    # sf0.001 co-occurrence graph: every emitted pair shares >=1 neighbor,
    # inter <= min degree, and the pair list is symmetric-free (a < b)
    rows = Q.q_kg_neighbor_jaccard("/root/testdata/sf0.001").take_all()
    assert rows, "sf0.001 graph should yield shared-neighbor pairs"
    for r in rows:
        assert r["qid_a"] < r["qid_b"]
        assert 1 <= r["inter"] <= min(r["deg_a"], r["deg_b"])


_T1 = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
       "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4


def _docs(tmp_path, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), tmp_path / "documents.parquet")


def test_minhash_recall_identical_docs(ray_session, tmp_path):
    # two identical docs: PPJoin emits the pair exactly; identical minhash
    # signatures guarantee the LSH candidate too -> full recovery
    _docs(tmp_path, [_T1, _T1, "something else entirely small"])
    r = Q.q_docs_minhash_recall(str(tmp_path)).take_all()[0]
    assert r["n_true"] == 1 and r["n_recovered"] == 1
    assert r["n_cand"] >= 1
    assert r["n_recovered"] <= min(r["n_true"], r["n_cand"])


def test_minhash_recall_no_dups(ray_session, tmp_path):
    _docs(tmp_path, ["first completely unique text body here",
                     "second utterly different content piece now"])
    r = Q.q_docs_minhash_recall(str(tmp_path)).take_all()[0]
    assert (r["n_true"], r["n_recovered"]) == (0, 0)
