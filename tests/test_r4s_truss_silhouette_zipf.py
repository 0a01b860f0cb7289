"""Edge semantics for the k-truss / silhouette / Zipf-mass batch."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from newsagency_classification_ray import ops
from newsagency_classification_ray import queries as Q
from newsagency_classification_ray.queries import _silhouette_nano


def _edges(pairs):
    return ray.data.from_arrow(pa.table({
        "u": pa.array([p[0] for p in pairs], pa.string()),
        "v": pa.array([p[1] for p in pairs], pa.string())}))


def test_ktruss_keeps_k4_peels_pendant_triangle(ray_session):
    # K4 on a,b,c,d (every edge in 2 triangles) + pendant triangle d,e,f
    k4 = [("a", "b"), ("a", "c"), ("a", "d"),
          ("b", "c"), ("b", "d"), ("c", "d")]
    pendant = [("d", "e"), ("d", "f"), ("e", "f")]
    out = ops.ktruss(_edges(k4 + pendant), min_support=2)
    rows = out.take_all() if hasattr(out, "take_all") else out.to_pylist()
    got = {(r["u"], r["v"]): r["support"] for r in rows}
    assert set(got) == set(k4)
    assert all(s == 2 for s in got.values())


def test_ktruss_single_triangle_empties(ray_session):
    out = ops.ktruss(_edges([("a", "b"), ("a", "c"), ("b", "c")]),
                     min_support=2)
    rows = out.take_all() if hasattr(out, "take_all") else out.to_pylist()
    assert rows == []
    # and the empty result is still typed (driver schema contract)
    if isinstance(out, pa.Table):
        assert out.schema.names == ["u", "v", "support"]


def test_ktruss_cascade_peel(ray_session):
    # two triangles sharing edge (a,b): every edge has support 1 except
    # (a,b) with 2 — peeling the support-1 edges then kills (a,b) too
    e = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"), ("b", "d")]
    out = ops.ktruss(_edges(e), min_support=2)
    rows = out.take_all() if hasattr(out, "take_all") else out.to_pylist()
    assert rows == []


def test_ktruss_regimes_identical(ray_session):
    # random-ish 18-node graph: two K5 blocks + cross edges + a tail.
    # Fixpoint keeps the K5s, so the distributed regime never drains below
    # Ray's sparse-join floor and both regimes can run the same input.
    import itertools
    k5a = list(itertools.combinations([f"a{i}" for i in range(5)], 2))
    k5b = list(itertools.combinations([f"b{i}" for i in range(5)], 2))
    extra = [("a0", "b0"), ("a1", "b1"), ("b4", "c0"), ("c0", "c1")]
    e = k5a + k5b + extra
    dist = ops.ktruss(_edges(e), min_support=2, edge_limit=0)
    drv = ops.ktruss(_edges(e), min_support=2, edge_limit=10_000)
    as_rows = lambda o: sorted(
        (r["u"], r["v"], r["support"])
        for r in (o.take_all() if hasattr(o, "take_all") else o.to_pylist()))
    assert as_rows(dist) == as_rows(drv)
    assert len(as_rows(drv)) == 20  # both K5s survive, support 3 each


def test_silhouette_kernel_values():
    m = np.array([[0.0], [10.0], [5.0]])
    c = np.array([[0.0], [10.0]])
    q = _silhouette_nano(m, c)
    # point at 0: a=0, b=10 -> sil 1; point at 10 symmetric; point at 5:
    # equidistant -> a=b -> sil 0 (assigned to cluster 0 by lowest-index)
    assert q.tolist() == [10**9, 10**9, 0]


def test_silhouette_query_counts(ray_session):
    out = Q.q_embeddings_silhouette("/root/testdata/sf0.001").take_all()
    total = sum(r["n"] for r in out)
    import pyarrow.parquet as _pq
    n_rows = _pq.read_metadata(
        "/root/testdata/sf0.001/embeddings.parquet").num_rows
    assert total == n_rows
    for r in out:
        assert abs(r["sil_sum_nano"]) <= r["n"] * 10**9


def _docs(tmp_path, rows):
    n = len(rows)
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "source": [r[0] for r in rows],
        "text": [r[1] for r in rows],
    }), tmp_path / "documents.parquet")


def test_zipf_mass_counts(ray_session, tmp_path):
    _docs(tmp_path, [("s", "a a a b b c"), ("s", "a c")])
    out = Q.q_docs_zipf_mass(str(tmp_path)).take_all()
    assert len(out) == 1
    r = out[0]
    # counts: a=4, b=2, c=2 -> ranks a:1, b:2, c:3 (tie b<c by token)
    assert r["total_tokens"] == 8
    assert r["distinct_tokens"] == 3
    assert r["head_count"] == 4
    assert r["rank_mass"] == 4 * 1 + 2 * 2 + 2 * 3
