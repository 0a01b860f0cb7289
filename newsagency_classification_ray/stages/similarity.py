"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), every batch does one numpy matmul against it
  and emits only its *local* top-k per query (combiner), so the final shuffle
  sees ``O(num_blocks · nq · k)`` rows regardless of corpus size.
* :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets the corpus
  by signature prefix; only buckets that contain a query's signature are
  scored exactly. Recall < 1 by design; parameterize bits/probes.
* :func:`embedding_cosine_dups` — embedding-space near-duplicate pairs
  (cosine ≥ τ) via the same LSH bucketing (first-class near-dup operator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Min


def _batch_matrix(t: pa.Table, col: str = "embedding",
                  dtype=np.float32) -> np.ndarray:
    return np.asarray(t[col].to_pylist(), dtype=dtype)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    embeddings: Dataset, query_vecs: np.ndarray, query_ids: list[int], k: int = 5
) -> Dataset:
    """Exact cosine top-k: (query_id, vec_id, score, rank), rank 1-based.

    Ties broken by vec_id ascending (deterministic, matches the SQL oracle's
    ``ORDER BY score DESC, vec_id``). Self-matches (vec_id == query_id) are
    excluded. float64 scoring so ranks agree bit-stably with the DuckDB
    oracle's ``list_cosine_similarity``.
    """
    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qref = ray.put((qn, list(query_ids)))

    def local_topk(t: pa.Table) -> pa.Table:
        q, qids = ray.get(qref)
        m = _normalize(_batch_matrix(t, dtype=np.float64))
        ids = t["vec_id"].to_numpy()
        scores = m @ q.T  # (batch, nq)
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(qids):
            col = scores[:, j].copy()
            col[ids == qid] = -np.inf  # exclude self
            kk = min(k, len(ids))
            idx = np.lexsort((ids, -col))[:kk]  # score desc, vec_id asc
            idx = idx[np.isfinite(col[idx])]
            out_q.extend([qid] * len(idx))
            out_v.extend(ids[idx].tolist())
            out_s.extend(col[idx].astype(np.float64).tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        })

    local = embeddings.map_batches(local_topk, batch_format="pyarrow")
    return _reduce_topk(local, k)


def hard_negative_topk(
    embeddings: Dataset,
    query_vecs: np.ndarray,
    query_ids: list[int],
    query_labels: list[int],
    k: int = 3,
) -> Dataset:
    """Hardest-negative mining for contrastive training: for each anchor,
    the top-k most-similar vectors carrying a DIFFERENT label (plus the
    usual self-exclusion). Identical shape to :func:`brute_force_topk` —
    anchors broadcast once via ``ray.put``, one float64 matmul per batch,
    O(blocks · anchors · k) candidate rows into the bounded reduce — the
    per-batch label mask is the only difference, so the scale story is
    unchanged. ``embeddings`` must carry (vec_id, embedding, label).
    Returns (query_id, vec_id, score, rank), rank 1-based, ties by vec_id
    ascending (matches the SQL oracle's ``ORDER BY s DESC, vec_id``)."""
    qn = _normalize(np.asarray(query_vecs, dtype=np.float64))
    qref = ray.put((qn, list(query_ids), [int(x) for x in query_labels]))

    def local_topk(t: pa.Table) -> pa.Table:
        q, qids, qlabs = ray.get(qref)
        m = _normalize(_batch_matrix(t, dtype=np.float64))
        ids = t["vec_id"].to_numpy()
        labs = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        scores = m @ q.T  # (batch, nq)
        out_q, out_v, out_s = [], [], []
        for j, (qid, ql) in enumerate(zip(qids, qlabs)):
            col = scores[:, j].copy()
            col[(ids == qid) | (labs == ql)] = -np.inf
            kk = min(k, len(ids))
            idx = np.lexsort((ids, -col))[:kk]  # score desc, vec_id asc
            idx = idx[np.isfinite(col[idx])]
            out_q.extend([qid] * len(idx))
            out_v.extend(ids[idx].tolist())
            out_s.extend(col[idx].astype(np.float64).tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        })

    local = embeddings.map_batches(local_topk, batch_format="pyarrow")
    return _reduce_topk(local, k)


def _reduce_topk(local: Dataset, k: int, driver_limit: int = 5_000_000) -> Dataset:
    """Merge per-block candidate rows (query_id, vec_id, score) into the
    per-query global top-k. The candidate set is O(blocks · queries · k) —
    for any practical query batch that's a bounded DRIVER reduce (Ray's
    groupby would pay a full sort-shuffle spin-up to merge a few thousand
    rows). Past ``driver_limit`` — an enormous block count × a large query
    batch — fall back to the grouped exchange."""
    import pyarrow.compute as pc

    cand = local.materialize()
    if cand.count() > driver_limit:
        return cand.groupby("query_id").map_groups(_final_topk(k),
                                                   batch_format="pyarrow")
    t = pa.Table.from_pylist(
        cand.take_all(),
        schema=pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()),
                          ("score", pa.float64())]))
    qarr = t["query_id"].to_numpy(zero_copy_only=False)
    parts = [_final_topk(k)(t.filter(pc.equal(t["query_id"], int(qid))))
             for qid in np.unique(qarr)]
    merged = pa.concat_tables(parts) if parts else _final_topk(k)(t)
    return ray.data.from_arrow(merged)


def _final_topk(k: int):
    """Per-query global top-k with 1-based rank (Arrow in/out — pandas-format
    blocks would knock every downstream exchange off the fast sort path)."""
    def fn(g: pa.Table) -> pa.Table:
        qid = g["query_id"].to_numpy(zero_copy_only=False)
        vid = g["vec_id"].to_numpy(zero_copy_only=False)
        sc = g["score"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((vid, -sc))[: min(k, len(g))]
        return pa.table({
            "query_id": pa.array(qid[idx], type=pa.int64()),
            "vec_id": pa.array(vid[idx], type=pa.int64()),
            "score": pa.array(sc[idx], type=pa.float64()),
            "rank": pa.array(np.arange(1, len(idx) + 1, dtype=np.int64)),
        })
    return fn


class HyperplaneLSH:
    """Shared signed-random-projection signer (state built once per actor)."""

    def __init__(self, dim: int = 64, bits: int = 12, seed: int = 11):
        self.planes = np.random.RandomState(seed).randn(dim, bits).astype(np.float32)
        self.bits = bits

    def sign(self, m: np.ndarray) -> np.ndarray:
        proj = m @ self.planes > 0
        weights = (1 << np.arange(self.bits, dtype=np.int64))
        return (proj.astype(np.int64) * weights).sum(axis=1)


def lsh_topk(
    embeddings: Dataset,
    query_vecs: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    bits: int = 10,
    dim: int = 64,
) -> Dataset:
    """Approximate cosine top-k: score only vectors whose LSH bucket matches a
    query bucket. Single-probe (no multiprobe) — the documented recall trade."""
    lsh = HyperplaneLSH(dim=dim, bits=bits)
    qn = _normalize(np.asarray(query_vecs, dtype=np.float32))
    qsig = lsh.sign(qn)
    sig_to_q: dict[int, list[int]] = {}
    for j, s in enumerate(qsig.tolist()):
        sig_to_q.setdefault(s, []).append(j)
    qref = ray.put((qn, list(query_ids), sig_to_q))

    def local_topk(t: pa.Table) -> pa.Table:
        q, qids, buckets = ray.get(qref)
        m = _normalize(_batch_matrix(t))
        ids = t["vec_id"].to_numpy()
        sigs = lsh.sign(m)
        out_q, out_v, out_s = [], [], []
        for s, qjs in buckets.items():
            mask = sigs == s
            if not mask.any():
                continue
            sub_m, sub_ids = m[mask], ids[mask]
            scores = sub_m @ q[qjs].T
            kk = min(k, len(sub_ids))
            for col_idx, j in enumerate(qjs):
                col = scores[:, col_idx]
                idx = np.lexsort((sub_ids, -col))[:kk]
                out_q.extend([qids[j]] * len(idx))
                out_v.extend(sub_ids[idx].tolist())
                out_s.extend(col[idx].astype(np.float64).tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        })

    local = embeddings.map_batches(local_topk, batch_format="pyarrow")
    return _reduce_topk(local, k)


def ivf_topk(
    embeddings: Dataset,
    query_vecs: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 4,
    train_sample: int = 2048,
    seed: int = 13,
) -> Dataset:
    """IVF (inverted-file) approximate cosine top-k — the k-means scale path.

    Train: k-means centroids on a small reservoir sample (driver-side numpy,
    a few Lloyd iterations — the coarse quantizer is tiny and broadcast).
    Search: each batch assigns its vectors to nearest centroids (one matmul)
    and scores only vectors whose centroid is among a query's ``n_probe``
    closest lists, emitting local top-k (combiner) before the final per-query
    groupby. Recall grows with ``n_probe``; ``n_probe == n_centroids``
    degenerates to exact brute force.
    """
    rng = np.random.RandomState(seed)
    sample = embeddings.random_sample(1.0, seed=seed).limit(train_sample).take_all()
    # id-sort so the train matrix order (→ trained centroids) doesn't depend
    # on block arrival order; ids are file-ordered so this matches a plain
    # head-of-file read when the table fits in train_sample
    sample.sort(key=lambda r: r["vec_id"])
    train = _normalize(np.asarray([r["embedding"] for r in sample], dtype=np.float32))
    n_centroids = min(n_centroids, len(train))
    centroids = train[rng.choice(len(train), n_centroids, replace=False)]
    for _ in range(8):  # Lloyd iterations on the sample
        assign = (train @ centroids.T).argmax(axis=1)
        for c in range(n_centroids):
            members = train[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)

    qn = _normalize(np.asarray(query_vecs, dtype=np.float32))
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    cent_to_q: dict[int, list[int]] = {}
    for j in range(len(query_ids)):
        for c in probe[j]:
            cent_to_q.setdefault(int(c), []).append(j)
    qref = ray.put((qn, list(query_ids), centroids, cent_to_q))

    def local_topk(t: pa.Table) -> pa.Table:
        q, qids, cents, lists = ray.get(qref)
        m32 = _normalize(_batch_matrix(t))
        m = _normalize(_batch_matrix(t, dtype=np.float64))
        ids = t["vec_id"].to_numpy()
        assign = (m32 @ cents.T).argmax(axis=1)  # coarse quantizer in f32
        out_q, out_v, out_s = [], [], []
        for c, qjs in lists.items():
            mask = assign == c
            if not mask.any():
                continue
            sub_m, sub_ids = m[mask], ids[mask]
            # f64 scoring + self-exclusion: rank-identical to brute force
            scores = sub_m @ q[qjs].astype(np.float64).T
            kk = min(k, len(sub_ids))
            for col_idx, j in enumerate(qjs):
                col = scores[:, col_idx].copy()
                col[sub_ids == qids[j]] = -np.inf
                sel = np.lexsort((sub_ids, -col))[:kk]
                sel = sel[np.isfinite(col[sel])]
                out_q.extend([qids[j]] * len(sel))
                out_v.extend(sub_ids[sel].tolist())
                out_s.extend(col[sel].tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "score": pa.array(out_s, type=pa.float64()),
        })

    local = embeddings.map_batches(local_topk, batch_format="pyarrow")
    return _reduce_topk(local, k)


def kmeans_fit(
    embeddings: Dataset,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    init_ids: list[int] | None = None,
    round_decimals: int = 6,
    driver_row_limit: int = 200_000,
) -> "np.ndarray":
    """Fit Lloyd's k-means and return the final (k, d) centroid matrix —
    the shared training loop behind :func:`kmeans_assign` and
    :func:`semdedup_keep`. See :func:`kmeans_assign` for the regime and
    determinism contract.

    Deterministic, RNG-free init: the vectors whose ids are in ``init_ids``
    (default ``0..k-1`` — pass explicit ids when the id space isn't dense).
    Each round is ONE streaming pass: every block emits k bounded partial
    rows (per-cluster sum + count, k×(d+1) floats); the driver reduces
    ``k·num_blocks`` rows and broadcasts the next centroids — no shuffle,
    nothing corpus-sized leaves the workers. Centroids are rounded to
    ``round_decimals`` each round so the result is independent of
    partial-sum reduction order (what makes a pure-recompute oracle exact).
    Squared-Euclidean assignment, ties to the lowest cluster index; empty
    clusters keep their previous centroid. Returns the centroid matrix.
    """
    init_ids = list(range(k)) if init_ids is None else list(init_ids)
    if len(init_ids) != k:
        raise ValueError("init_ids must have length k")
    id_set = pa.array(sorted(init_ids), type=pa.int64())

    def pick_init(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=id_set))

    seed_rows = embeddings.map_batches(pick_init, batch_format="pyarrow").take_all()
    seed_rows.sort(key=lambda r: init_ids.index(int(r[id_col])))
    centroids = np.round(
        np.asarray([r["embedding"] for r in seed_rows], dtype=np.float64),
        round_decimals,
    )

    def assign_to(m: np.ndarray, c: np.ndarray) -> np.ndarray:
        # argmin ||m - c||² = argmin (-2 m·c + |c|²); ties → lowest index
        return (-2.0 * (m @ c.T) + (c * c).sum(axis=1)).argmin(axis=1)

    # Bounded-input regime: iterating Lloyd rounds as Dataset passes over a
    # table that fits on the driver is pure exchange latency (5 spin-ups to
    # reduce a few MB). Gather ONCE in canonical id order (the same order
    # the pure-recompute oracle uses) and iterate centroids locally with
    # the same rounded update rule. NOTE: this regime's partial-sum
    # DECOMPOSITION (one np.add.at over all rows) differs from the
    # per-block partials below; per-round rounding has absorbed the ulp
    # difference in every property-tested case but is not a cross-regime
    # bit-identity proof. The final per-row assignment stays distributed
    # (one streaming pass). Past the limit: the per-block partial-sum
    # regime below, nothing corpus-sized leaves the workers.
    if driver_row_limit and embeddings.count() <= driver_row_limit:
        parts = [( t[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                   _batch_matrix(t, dtype=np.float64))
                 for t in embeddings.iter_batches(batch_format="pyarrow",
                                                  batch_size=None)]
        ids_all = np.concatenate([p[0] for p in parts])
        m_all = np.vstack([p[1] for p in parts])
        order = np.argsort(ids_all)
        m_all = m_all[order]
        for _ in range(iters):
            a = assign_to(m_all, centroids)
            sums = np.zeros_like(centroids)
            np.add.at(sums, a, m_all)
            cnt = np.bincount(a, minlength=k)
            nonempty = cnt > 0
            centroids = centroids.copy()
            centroids[nonempty] = np.round(
                sums[nonempty] / cnt[nonempty, None], round_decimals)
        iters = 0  # centroids final — fall through to the assignment pass

    for _ in range(iters):
        cref = ray.put(centroids)

        def partials(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _batch_matrix(t, dtype=np.float64)
            a = assign_to(m, c)
            sums = np.zeros_like(c)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                "count": pa.array(counts),
                "sum": pa.array(sums.tolist(),
                                type=pa.list_(pa.float64())),
            })

        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        # canonical sort: take_all arrival order is nondeterministic and
        # float addition is non-associative — without a fixed reduction
        # order, partial sums landing on a rounding boundary could flip
        # batch_size=None pins one batch per BLOCK: the runtime's dynamic
        # batch bundling would otherwise vary the partial-sum DECOMPOSITION
        # (not just its order) across runs under load, and float partials
        # near a rounding boundary could flip — the canonical sort below
        # only fixes reduction order, not decomposition
        rows = embeddings.map_batches(partials, batch_size=None,
                                      batch_format="pyarrow").take_all()
        rows.sort(key=lambda r: (int(r["cluster"]), int(r["count"]),
                                 tuple(r["sum"])))
        for r in rows:
            sums[int(r["cluster"])] += np.asarray(r["sum"], dtype=np.float64)
            counts[int(r["cluster"])] += int(r["count"])
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = np.round(
            sums[nonempty] / counts[nonempty, None], round_decimals
        )

    return centroids


def _assign_to(m: np.ndarray, c: np.ndarray) -> np.ndarray:
    """argmin ||m - c||² = argmin (-2 m·c + |c|²); ties → lowest index."""
    return (-2.0 * (m @ c.T) + (c * c).sum(axis=1)).argmin(axis=1)


def kmeans_assign(
    embeddings: Dataset,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    init_ids: list[int] | None = None,
    round_decimals: int = 6,
    driver_row_limit: int = 200_000,
) -> Dataset:
    """Distributed Lloyd's k-means over the embedding column (the
    cluster-then-curate step): :func:`kmeans_fit` trains the centroids, then
    one streaming broadcast-assignment pass labels every row. Returns
    ``(id_col, cluster)``."""
    centroids = kmeans_fit(embeddings, k, iters, id_col, init_ids,
                           round_decimals, driver_row_limit)
    cref = ray.put(centroids)

    def final_assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _batch_matrix(t, dtype=np.float64)
        return pa.table({
            id_col: pa.array(t[id_col].to_numpy(zero_copy_only=False),
                             type=pa.int64()),
            "cluster": pa.array(_assign_to(m, c), type=pa.int64()),
        })

    return embeddings.map_batches(final_assign, batch_format="pyarrow")


def embedding_cosine_dups(
    embeddings: Dataset, threshold: float = 0.95, bits: int = 8, dim: int = 64
) -> Dataset:
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold).

    LSH-bucket the corpus (random hyperplanes), compare all pairs *within*
    each bucket exactly. High-cosine pairs collide with high probability at
    few bits; exact within-bucket verification keeps precision 1.0.
    """
    lsh = HyperplaneLSH(dim=dim, bits=bits)

    def sign_batch(t: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(t))
        return pa.table({
            "bucket": pa.array(lsh.sign(m), type=pa.int64()),
            "vec_id": pa.array(t["vec_id"].to_numpy(), type=pa.int64()),
            "embedding": t["embedding"],
        })

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"vec_a": pa.array([], type=pa.int64()),
                          "vec_b": pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        if len(g) < 2:
            return empty
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        keep_first = np.concatenate(([True], ids[order][1:] != ids[order][:-1]))
        sel = order[keep_first]
        if sel.size < 2:
            return empty
        m = _normalize(_batch_matrix(g, dtype=np.float32)[sel])
        ids = ids[sel]
        sim = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sim[ii, jj] >= threshold
        if not keep.any():
            return empty
        return pa.table({
            "vec_a": pa.array(ids[ii[keep]], type=pa.int64()),
            "vec_b": pa.array(ids[jj[keep]], type=pa.int64()),
            "cosine": pa.array(sim[ii[keep], jj[keep]].astype(np.float64)),
        })

    pairs = embeddings.map_batches(sign_batch, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(Min("cosine", alias_name="cosine"))


def semdedup_keep(
    embeddings: Dataset,
    k: int = 8,
    iters: int = 5,
    tau: float = 0.95,
    id_col: str = "vec_id",
    round_decimals: int = 6,
    cos_decimals: int = 6,
) -> Dataset:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): k-means-cluster the
    embedding space, then drop within-cluster semantic duplicates — a row is
    dropped when a LOWER-id row in the same cluster has cosine ≥ ``tau``.
    Returns the keep-list ``(id_col, cluster)``.

    Scale shape: :func:`kmeans_fit` trains centroids with bounded partials
    (no shuffle); ONE labeling map + ONE groupby(cluster) exchange co-locates
    each cluster's vectors (the only time embeddings move); the per-cluster
    dedup is a vectorized normalized matmul. Partitioning assumption — each
    CLUSTER fits a worker (corpus/k on average); pick ``k`` so it does, as
    SemDeDup itself prescribes (the paper runs k≈10^4-10^5 for web corpora).
    Cosines are rounded to ``cos_decimals`` before the ≥ τ test so the
    keep-set is reproducible bit-exactly by a pure driver recompute.
    """
    centroids = kmeans_fit(embeddings, k, iters, id_col=id_col,
                           round_decimals=round_decimals)
    cref = ray.put(centroids)

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _batch_matrix(t, dtype=np.float64)
        return pa.table({
            id_col: pa.array(t[id_col].to_numpy(zero_copy_only=False),
                             type=pa.int64()),
            "cluster": pa.array(_assign_to(m, c), type=pa.int64()),
            "embedding": t["embedding"],
        })

    def dedup_cluster(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        m = _normalize(_batch_matrix(g, dtype=np.float64)[order])
        # upper-triangular scan, tiled so temporaries stay bounded even on a
        # degenerate giant cluster (same discipline as the simhash verifier)
        drop = np.zeros(ids.size, dtype=bool)
        tile = 2048
        for s in range(0, ids.size, tile):
            e = min(s + tile, ids.size)
            sims = np.round(m[s:e] @ m.T, cos_decimals)
            for i in range(s, e):
                if drop[i]:
                    continue
                row = sims[i - s, :i]
                # duplicate iff some KEPT earlier row is >= tau
                if np.any((row >= tau) & ~drop[:i]):
                    drop[i] = True
        keep = ~drop
        return pa.table({
            id_col: pa.array(ids[keep], type=pa.int64()),
            "cluster": pa.array(
                np.full(int(keep.sum()), g["cluster"][0].as_py(),
                        dtype=np.int64)),
        })

    return (
        embeddings.map_batches(label, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )


def pca_fit(
    embeddings: Dataset,
    n_components: int = 2,
    id_col: str = "vec_id",
    round_decimals: int = 6,
):
    """Distributed PCA fit: one streaming pass emits per-block sufficient
    statistics (n, Σx, ΣxᵀX — ONE bounded d(d+1)-value row per block, the
    kmeans-partials layout), the driver reduces them in canonical byte
    order and rounds to ``round_decimals`` (the rounding absorbs the
    partial-sum ulp spread, same discipline as kmeans_fit/pagerank), then
    eigendecomposes the d×d covariance locally — a 64×64 eigh is driver
    noise. Eigenvector sign is fixed deterministically (the
    largest-|component| entry is made positive). Returns
    ``(mean, components)`` as rounded float64 arrays of shape (d,) and
    (n_components, d)."""
    def partial(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, dtype=np.float64)
        if len(m) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "xtx": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "n": pa.array([len(m)], pa.int64()),
            "s": pa.array([m.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "xtx": pa.array([(m.T @ m).ravel().tolist()],
                            pa.list_(pa.float64()))})

    rows = [r for r in embeddings.map_batches(
        partial, batch_format="pyarrow").take_all()]
    if not rows:
        raise ValueError("pca_fit: empty input")
    # canonical order before the float fold (arrival order is
    # nondeterministic and float addition non-associative)
    svecs = sorted(((np.asarray(r["s"], np.float64),
                     np.asarray(r["xtx"], np.float64), int(r["n"]))
                    for r in rows),
                   key=lambda x: (x[0].tobytes(), x[1].tobytes(), x[2]))
    d = len(svecs[0][0])
    s = np.zeros(d)
    xtx = np.zeros(d * d)
    n = 0
    for sv, xv, nv in svecs:
        s += sv
        xtx += xv
        n += nv
    s = np.round(s, round_decimals)
    xtx = np.round(xtx.reshape(d, d), round_decimals)
    mean = np.round(s / n, round_decimals)
    cov = np.round((xtx - n * np.outer(mean, mean)) / max(n - 1, 1),
                   round_decimals)
    w, v = np.linalg.eigh(cov)
    comp = v[:, ::-1][:, :n_components].T  # descending eigenvalue order
    # deterministic sign: make each component's largest-|entry| positive
    for i in range(comp.shape[0]):
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    return mean, np.round(comp, round_decimals)


def pca_project(
    embeddings: Dataset,
    n_components: int = 2,
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> Dataset:
    """Distributed PCA projection: fit via :func:`pca_fit`, broadcast the
    rounded (mean, components) once, then one streaming pass projects
    every row (``(x - mean) @ compᵀ``, vectorized per batch). Output
    coordinates round to ``round_decimals`` so re-runs and cluster sizes
    can never flip the value hash. Returns (id_col, pc0..pc{k-1})."""
    mean, comp = pca_fit(embeddings, n_components, id_col, round_decimals)
    ref = ray.put((mean, comp))

    def project(t: pa.Table) -> pa.Table:
        mn, cp = ray.get(ref)
        m = _batch_matrix(t, dtype=np.float64)
        proj = np.round((m - mn) @ cp.T, round_decimals)
        cols = {id_col: pa.array(
            t[id_col].to_numpy(zero_copy_only=False), pa.int64())}
        for i in range(cp.shape[0]):
            cols[f"pc{i}"] = pa.array(proj[:, i], pa.float64())
        return pa.table(cols)

    return embeddings.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory side of billion-scale ANN: store
# 8-bit codebook indices instead of floats (here 64·f32 → m_sub bytes, 32×),
# answer queries through per-query lookup tables (ADC). Jégou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011 (public method).
# ---------------------------------------------------------------------------


def _subspace_bounds(dim: int, m_sub: int) -> list[tuple[int, int]]:
    step = dim // m_sub
    return [(s * step, dim if s == m_sub - 1 else (s + 1) * step)
            for s in range(m_sub)]


def pq_fit(
    embeddings: Dataset,
    m_sub: int = 8,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    round_decimals: int = 6,
    normalize: bool = True,
) -> np.ndarray:
    """Fit per-subspace codebooks by running the deterministic
    :func:`kmeans_fit` loop once per subspace over a SLICED view of the
    vectors (normalized first when ``normalize`` — squared-L2 over unit
    vectors ranks identically to cosine, so PQ recall is measured against
    :func:`brute_force_topk`'s exact cosine sets). Returns the
    (m_sub, k, d_sub) codebook tensor, rounded like kmeans centroids so
    the pure-recompute oracle is exact. Subspaces fit sequentially —
    m_sub bounded passes; at 10⁹ vectors each pass is the same
    per-block-partials regime kmeans_fit documents."""
    dim = len(embeddings.take(1)[0]["embedding"])
    bounds = _subspace_bounds(dim, m_sub)
    cbs = []
    for lo, hi in bounds:

        def slice_sub(t: pa.Table, lo=lo, hi=hi) -> pa.Table:
            m = _batch_matrix(t, dtype=np.float64)
            if normalize:
                m = _normalize(m)
            return pa.table({
                id_col: pa.array(
                    t[id_col].to_numpy(zero_copy_only=False), pa.int64()),
                "embedding": pa.array(m[:, lo:hi].tolist(),
                                      type=pa.list_(pa.float64()))})

        sliced = embeddings.map_batches(slice_sub, batch_format="pyarrow")
        cbs.append(kmeans_fit(sliced, k=k, iters=iters, id_col=id_col,
                              round_decimals=round_decimals))
    return np.stack(cbs)


def _pq_lut_micro(qvecs: np.ndarray, codebooks: np.ndarray,
                  bounds: list[tuple[int, int]]) -> np.ndarray:
    """(nq, m_sub, k) int64 lookup table of micro-quantized squared
    distances query-subvector → codeword. Quantizing BEFORE the ADC sum
    makes every approximate distance an exact int64, so ranking can never
    differ across engines or block shapes."""
    nq, m_sub, k = len(qvecs), codebooks.shape[0], codebooks.shape[1]
    lut = np.empty((nq, m_sub, k), np.int64)
    for s, (lo, hi) in enumerate(bounds):
        d2 = ((qvecs[:, None, lo:hi] - codebooks[s][None, :, :]) ** 2) \
            .sum(axis=2)
        lut[:, s, :] = np.floor(d2 * 1e6 + 0.5).astype(np.int64)
    return lut


def pq_encode_codes(m: np.ndarray, codebooks: np.ndarray,
                    bounds: list[tuple[int, int]]) -> np.ndarray:
    """(rows, m_sub) uint8 codes: per-subspace argmin squared distance,
    ties to the lowest codeword index (numpy argmin first-hit)."""
    codes = np.empty((len(m), codebooks.shape[0]), np.uint8)
    for s, (lo, hi) in enumerate(bounds):
        d2 = ((m[:, None, lo:hi] - codebooks[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
    return codes


def pq_adc_topk(
    embeddings: Dataset,
    codebooks: np.ndarray,
    query_vecs: np.ndarray,
    query_ids: list[int],
    k_top: int = 10,
    id_col: str = "vec_id",
    normalize: bool = True,
) -> dict[int, list[int]]:
    """Asymmetric-distance (ADC) top-k per query over PQ codes: the
    codebooks + int64 LUT broadcast once, every block encodes its rows
    (vectors never leave as floats — at scale the codes would be the
    stored table) and emits its local top-k, the bounded
    O(blocks·nq·k_top) candidate set merges on the driver. Self-matches
    excluded. Returns {query_id: [vec_id…]} sorted by (adist, vec_id)."""
    dim = query_vecs.shape[1]
    bounds = _subspace_bounds(dim, codebooks.shape[0])
    qn = _normalize(np.asarray(query_vecs, np.float64)) if normalize \
        else np.asarray(query_vecs, np.float64)
    lut = _pq_lut_micro(qn, codebooks, bounds)
    ref = ray.put((codebooks, lut, list(query_ids), bounds))

    def local_topk(t: pa.Table) -> pa.Table:
        cb, lu, qids, bds = ray.get(ref)
        m = _batch_matrix(t, dtype=np.float64)
        if normalize:
            m = _normalize(m)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = pq_encode_codes(m, cb, bds)
        out_q, out_v, out_d = [], [], []
        for j, qid in enumerate(qids):
            ad = lu[j, np.arange(cb.shape[0])[None, :], codes].sum(axis=1)
            mask = ids != qid
            sid, sad = ids[mask], ad[mask]
            kk = min(k_top, len(sid))
            idx = np.lexsort((sid, sad))[:kk]
            out_q.extend([qid] * kk)
            out_v.extend(sid[idx].tolist())
            out_d.extend(sad[idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "adist": pa.array(out_d, pa.int64())})

    cand: dict[int, list[tuple[int, int]]] = {int(q): [] for q in query_ids}
    for r in embeddings.map_batches(local_topk,
                                    batch_format="pyarrow").take_all():
        cand[int(r["query_id"])].append((int(r["adist"]), int(r["vec_id"])))
    return {q: [v for _, v in sorted(c)[:k_top]] for q, c in cand.items()}
