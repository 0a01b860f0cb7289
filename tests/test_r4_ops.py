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


# --------------------------------------------------------------------------
# BPE adjacent-pair counting + ordered funnel
# --------------------------------------------------------------------------

def test_bpe_pairs_matches_bruteforce(ray_session, tmp_path):
    import collections

    import pyarrow.parquet as pq

    from newsagency_classification_ray import queries as Q

    texts = [
        "a b a b c",          # pairs: a b, b a, a b, b c
        "  a   b  ",          # leading/trailing whitespace → one pair a b
        "solo",               # no pairs
        "",                   # no pairs
        "b c b c b c",
        "x y",
    ]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        tmp_path / "documents.parquet")

    exp = collections.Counter()
    for t in texts:
        toks = [w for w in t.split() if w]
        exp.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:32]

    out = Q.q_docs_bpe_pairs(str(tmp_path))
    got = list(zip(out["item"].to_pylist(), out["n"].to_pylist()))
    assert got == want
    # no pair crosses a document boundary: "c a" (doc0→doc1) must not appear
    assert "c a" not in dict(got)


def _events_tbl(rows):
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    })


def test_events_funnel_chain_semantics(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq

    from newsagency_classification_ray import queries as Q

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # u1 completes the full chain in order
        (1, s(0), "view"), (1, s(10), "click"), (1, s(20), "purchase"),
        # u2: click BEFORE first view → stage-2 fails
        (2, s(10), "click"), (2, s(20), "view"),
        # u3: purchase before the first post-view click → stage-3 fails
        (3, s(0), "view"), (3, s(5), "purchase"), (3, s(10), "click"),
        # u4: ties are strict — click at exactly the view ts does not count
        (4, s(0), "view"), (4, s(0), "click"),
        # u5: second view earlier than first click; chain uses MIN view
        (5, s(50), "view"), (5, s(5), "view"), (5, s(30), "click"),
        (5, s(40), "purchase"),
        # u6: never views
        (6, s(0), "purchase"), (6, s(1), "click"),
    ]
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")
    out = Q.q_events_funnel(str(tmp_path))
    assert out["stage"].to_pylist() == [1, 2, 3]
    assert out["event_type"].to_pylist() == ["view", "click", "purchase"]
    # stage1: u1..u5 viewed; stage2: u1, u3, u5; stage3: u1, u5
    assert out["users"].to_pylist() == [5, 3, 2]


def test_events_funnel_short_circuits_empty_stage(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq

    from newsagency_classification_ray import queries as Q

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, "click"), (2, t0, "purchase")]  # nobody views
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")
    out = Q.q_events_funnel(str(tmp_path))
    assert out["users"].to_pylist() == [0, 0, 0]


def test_running_sum_matches_cumsum(ray_session):
    import numpy as np

    from newsagency_classification_ray import ops

    rng = np.random.default_rng(5)
    keys = rng.permutation(200).astype(np.int64)       # unique, shuffled
    w = rng.integers(0, 50, size=200).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(keys), "w": pa.array(w)})).repartition(7)
    out = ops.running_sum(ds, "k", "w", out_col="cume").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    order = np.argsort(keys)
    assert (out["k"].to_numpy() == keys[order]).all()
    assert (out["cume"].to_numpy() == np.cumsum(w[order])).all()


def test_hash_join_sized_sparse_right(ray_session):
    from newsagency_classification_ray import ops

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(range(100), pa.int64()),
        "x": pa.array(range(100), pa.int64())})).repartition(8)
    # 1-row right side: sparser than the default partition count — the
    # plain hash_join hits Ray 2.49's unfed-partition ArrowInvalid here
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([42], pa.int64()),
        "y": pa.array([7], pa.int64())})).repartition(8)
    out = ops.hash_join_sized(left, right, on=("k",), right_on=("rk",))
    assert out.take_all() == [{"k": 42, "x": 42, "y": 7}]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_events_funnel_matches_bruteforce_random(ray_session, tmp_path, seed):
    import datetime as dt

    import numpy as np
    import pyarrow.parquet as pq

    from newsagency_classification_ray import queries as Q

    rng = np.random.default_rng(seed)
    n = 400
    t0 = dt.datetime(2024, 1, 1)
    types = np.array(["view", "click", "purchase", "error"])
    rows = [(int(rng.integers(0, 25)),
             t0 + dt.timedelta(seconds=int(rng.integers(0, 500))),
             str(types[rng.integers(0, 4)]))
            for _ in range(n)]
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")

    # brute force min-ts chaining per user (duplicate timestamps included)
    by_user: dict = {}
    for u, ts_, et in rows:
        by_user.setdefault(u, []).append((ts_, et))
    want = [0, 0, 0]
    for evs in by_user.values():
        t_prev, depth = None, 0
        for i, stage in enumerate(("view", "click", "purchase")):
            cand = [ts_ for ts_, et in evs
                    if et == stage and (t_prev is None or ts_ > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            depth = i + 1
        for i in range(depth):
            want[i] += 1

    out = Q.q_events_funnel(str(tmp_path))
    assert out["users"].to_pylist() == want


def test_events_hourly_counts_null_values(ray_session, tmp_path, monkeypatch):
    """Regression (advisor r3): the per-batch combiner must count ROWS
    (count mode='all'), not non-null values — a null event value still
    contributes to n, matching the oracle's count(*)."""
    import datetime as dt

    import duckdb
    import pyarrow.parquet as pq

    from newsagency_classification_ray import queries as Q

    t0 = dt.datetime(2024, 3, 1, 10, 30)
    tbl = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([t0] * 3 + [t0 + dt.timedelta(hours=2)] * 3,
                       pa.timestamp("us")),
        "user_id": pa.array([1, 2, 3, 1, 2, 3], pa.int64()),
        "event_type": pa.array(["view"] * 6, pa.string()),
        "value": pa.array([1.5, None, None, 2.0, 3.0, None], pa.float64()),
        "props": pa.array(["{}"] * 6, pa.string()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = (Q.q_events_hourly(str(tmp_path)).to_pandas()
           .sort_values(["event_type", "hour"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    want = (con.execute(Q.O_EVENTS_HOURLY).fetchdf()
            .sort_values(["event_type", "hour"]).reset_index(drop=True))
    assert got["n"].tolist() == want["n"].tolist() == [3, 3]
    assert got["value_cents"].tolist() == want["value_cents"].tolist()


def test_actor_pool_stage_survives_worker_death(ray_session, tmp_path):
    """Fault model of a real multi-node run: an actor-pool worker dies
    mid-stream (OOM kill, node loss). Ray Data must reconstruct the actor
    and re-run the failed block with exactly-once output — no lost and no
    duplicated rows. This is the retry layer the flagship's tagger/linker
    pools (and every map_batches stage) inherit for free; the manifest
    layer (test_cli / graph resume tests) covers the driver-level rerun."""
    import os

    marker = tmp_path / "died_once"

    class Flaky:
        def __call__(self, t: pa.Table) -> pa.Table:
            if not marker.exists():
                marker.write_text("x")
                os._exit(1)  # hard process kill, not a catchable exception
            return t

    ds = ray.data.range(1000, override_num_blocks=8).map_batches(
        Flaky, concurrency=2, batch_size=100, batch_format="pyarrow")
    rows = ds.take_all()
    assert sorted(r["id"] for r in rows) == list(range(1000))
    assert marker.exists()


@pytest.mark.parametrize("seed", [0, 1])
def test_edge_common_neighbors_matches_bruteforce(ray_session, seed):
    from newsagency_classification_ray import ops

    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 30, 120
    raw = rng.integers(0, n_nodes, size=(n_edges, 2))
    ds = ray.data.from_arrow(pa.table({
        "s": pa.array(raw[:, 0], pa.int64()),
        "d": pa.array(raw[:, 1], pa.int64())})).repartition(4)
    out = ops.edge_common_neighbors(ds, src="s", dst="d").to_pandas()
    got = {(r.u, r.v): (r.common, r.uni) for r in out.itertuples()}

    # brute force over the normalized simple graph
    pairs = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    nbrs: dict = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    want = {(a, b): (len(nbrs[a] & nbrs[b]), len(nbrs[a] | nbrs[b]))
            for a, b in pairs}
    assert got == want


def test_edge_common_neighbors_triangle_free(ray_session):
    from newsagency_classification_ray import ops

    # a path graph has no triangles: every edge must report common=0
    ds = ray.data.from_arrow(pa.table({
        "s": pa.array([0, 1, 2, 3], pa.int64()),
        "d": pa.array([1, 2, 3, 4], pa.int64())}))
    out = ops.edge_common_neighbors(ds, src="s", dst="d").to_pandas()
    assert sorted(out["common"]) == [0, 0, 0, 0]
    mid = out[(out.u == 1) & (out.v == 2)].iloc[0]
    assert mid["uni"] == 4  # N(1)={0,2}, N(2)={1,3}


def test_window_running_sum_matches_pandas(ray_session):
    from newsagency_classification_ray import ops

    rng = np.random.default_rng(9)
    n = 300
    t = pa.table({
        "k": pa.array(rng.integers(0, 7, n), pa.int64()),
        "o": pa.array(rng.permutation(n), pa.int64()),
        "v": pa.array(rng.integers(-50, 50, n), pa.int64()),
    })
    out = (ops.window_running_sum(
        ray.data.from_arrow(t).repartition(5), "k", ["o"], "v")
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    import pandas as pd
    df = t.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want = df.groupby("k")["v"].cumsum()
    assert (out["running"].to_numpy() == want.to_numpy()).all()


def test_export_ntriples_round_trip(ray_session, tmp_path):
    from newsagency_classification_ray.pipelines import kg
    from newsagency_classification_ray.pipelines.graph import export_ntriples
    from newsagency_classification_ray.sources.pages import ensure_pages

    p = ensure_pages("/root/testdata/sf0.001")
    trip = kg.triples(kg.extract_mentions(kg.read_pages(p))).materialize()
    out = export_ntriples(trip, str(tmp_path / "kg.nt"))
    lines = open(out, encoding="utf-8").read().splitlines()
    assert len(lines) == trip.count() == 330
    # every line is a well-formed triple statement over our IRI scheme
    for ln in lines[:20]:
        s, pred, o, dot = ln.split(" ")
        assert s.startswith("<urn:x-page:") and pred.startswith("<urn:x-rel:")
        assert o.startswith("<urn:x-qid:Q") and dot == "."
    # IRIs are unique per (url, qid): no duplicate statements
    assert len(set(lines)) == len(lines)


def test_events_top_paths_short_streams(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq

    from newsagency_classification_ray import queries as Q

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)
    rows = [
        (1, s(0), "view"), (1, s(1), "click"), (1, s(2), "purchase"),
        (1, s(3), "view"),                       # u1: v>c>p, c>p>v
        (2, s(0), "view"), (2, s(1), "click"),   # u2: too short, no trigram
        (3, s(0), "view"), (3, s(1), "click"), (3, s(2), "purchase"),
    ]
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")
    out = Q.q_events_top_paths(str(tmp_path)).to_pandas()
    assert out.iloc[0]["path"] == "view>click>purchase"
    assert out.iloc[0]["n"] == 2
    assert set(out["path"]) == {"view>click>purchase", "click>purchase>view"}


def test_hourly_anomalies_zero_variance(ray_session, tmp_path):
    """Constant hourly counts (variance 0): nothing may be flagged — the
    integer test degenerates to 0 > 0."""
    import datetime as dt

    import pyarrow.parquet as pq

    from newsagency_classification_ray import queries as Q

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(hours=h, seconds=i), "view")
            for h in range(6) for i in range(3)]   # 3 views every hour
    pq.write_table(_events_tbl(rows), tmp_path / "events.parquet")
    out = Q.q_events_hourly_anomalies(str(tmp_path)).to_pandas()
    assert len(out) == 6
    assert not out["is_anomaly"].any()
    assert (out["n"] == 3).all()
