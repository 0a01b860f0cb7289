"""Deduplication operators over a documents table (exact + near-dup family).

First-class large-scale-training-data operators (not in the reference beyond
its exact ``drop_duplicates`` D1/D2, SURVEY.md §2.7 — the near-dup family is
the standard web-corpus toolkit: MinHash+LSH, SimHash, n-gram Jaccard).

All operators follow the same scale shape:

1. *per-batch vectorized sketch* (``map_batches`` — shingles hashed with
   crc32 + a uint64 rolling polynomial, minhash/simhash in numpy; no Python
   loop over characters or n-grams),
2. *explode to tiny key rows* ((band, band_hash, doc_id) — ids only, the
   signatures themselves never ride through the band shuffle),
3. *one keyed exchange* (sort by the band key; banded keys are uniform by
   construction so no salting is needed; buckets are detected as runs in the
   sorted blocks — vectorized, no per-group Python),
4. *verify candidates exactly* by joining the candidate pairs back to the
   signature table (two hash joins over the small sketch side; Jaccard /
   Hamming computed vectorized per batch).

so the text moves never, and the signatures move only for the candidate set.
"""

from __future__ import annotations

import logging
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Min, Sum

_LOG = logging.getLogger(__name__)

_MERSENNE31 = (1 << 31) - 1
_FNV64 = np.uint64(1099511628211)


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Unique word n-gram shingle hashes, each < 2^31 (vectorized).

    Token hashes (crc32) combined with a rolling uint64 polynomial over each
    window — no per-n-gram string building. 31-bit outputs keep the
    (a·x+b) mod p minhash products inside int64 downstream.
    """
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.int64)
    if len(toks) < n:
        toks = toks + [""] * (n - len(toks))
    th = np.fromiter(
        (zlib.crc32(t.encode()) for t in toks), dtype=np.uint64, count=len(toks)
    )
    win = np.lib.stride_tricks.sliding_window_view(th, n)
    coef = np.power(_FNV64, np.arange(n, dtype=np.uint64))  # wraps mod 2^64
    h = (win * coef[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique((h >> np.uint64(33)).astype(np.int64))


def _hash_rows_u64(mat: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of each row of a 2-D integer matrix."""
    coef = np.power(_FNV64, np.arange(mat.shape[1], dtype=np.uint64))
    return (mat.astype(np.uint64) * coef[None, :]).sum(axis=1, dtype=np.uint64)


def _sig_matrix(col: pa.ChunkedArray | pa.Array, num_perm: int) -> np.ndarray:
    """binary signature column → (n, num_perm) uint32 matrix, one allocation."""
    blobs = col.to_pylist()
    if not blobs:
        return np.empty((0, num_perm), dtype=np.uint32)
    return np.frombuffer(b"".join(blobs), dtype="<u4").reshape(len(blobs), num_perm)


# ---------------------------------------------------------------- exact dedup

def exact_dedup(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Exact dedup: keep the min-id row per distinct text (D1 pattern:
    hash-partition + per-group min).

    Shuffles only (text_hash, id) pairs — the text column never moves.
    Oracle-equivalent SQL: ``SELECT min(id) FROM t GROUP BY text``.
    """
    import hashlib

    def hash_batch(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        hashes = [hashlib.sha1((s or "").encode()).hexdigest() for s in texts]
        return pa.table({
            "text_hash": pa.array(hashes, type=pa.string()),
            id_col: pc.cast(t[id_col], pa.int64()),
        })

    hashed = docs.map_batches(hash_batch, batch_format="pyarrow")
    return hashed.groupby("text_hash").aggregate(Min(id_col, alias_name=id_col))


# ------------------------------------------------------------- MinHash + LSH

class MinHashStage:
    """Actor: per-batch MinHash signatures (state = the permutation params).

    Output ``sig`` is a fixed ``4*num_perm``-byte binary blob (uint32 LE) —
    ~4× smaller than a list<int64> column and decodable with one
    ``np.frombuffer`` per batch.
    """

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE31, size=num_perm).astype(np.int64)
        self.b = rng.randint(0, _MERSENNE31, size=num_perm).astype(np.int64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_n)
        if sh.size == 0:
            return np.full(self.num_perm, _MERSENNE31, dtype=np.int64)
        # (a*x + b) mod p for all perms at once: (n_shingles, num_perm) int64
        vals = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE31
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sigs = [self.signature(s or "").astype("<u4").tobytes() for s in texts]
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "sig": pa.array(sigs, type=pa.binary()),
        })


def _pairs_from_sorted_buckets(bucket_cols: list[str]):
    """Vectorized candidate-pair emitter over a block sorted by bucket key.

    Detects key runs with a run-boundary compare (no per-group calls); only
    runs of ≥2 docs — the actual collision buckets, a tiny minority — loop.
    """
    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64())})
        n = len(t)
        if n < 2:
            return empty
        key = _hash_rows_u64(
            np.column_stack([t[c].to_numpy(zero_copy_only=False).astype(np.uint64)
                             for c in bucket_cols])
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        ends = np.append(starts[1:], n)
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run = np.unique(ids[s:e])
            if run.size < 2:
                continue
            ii, jj = np.triu_indices(run.size, k=1)
            out_a.append(run[ii])
            out_b.append(run[jj])
        if not out_a:
            return empty
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
        })
    return fn


def minhash_lsh_pairs(
    docs: Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    num_partitions: int | None = None,
) -> Dataset:
    """MinHash+LSH near-duplicate pairs with exact-signature verification.

    shingle → minhash (actor pool) → explode to (band, band_hash, doc_id)
    *ids only* → sort on the band key + vectorized run-pairing → global pair
    dedup → join the (small) signature table back on each endpoint → estimated
    Jaccard = signature agreement rate → pairs ≥ threshold, ``doc_a < doc_b``.

    The signature table is materialized once (it is the reduced sketch —
    ``4*num_perm`` bytes/doc, ~10³× smaller than the text) because two join
    consumers read it; everything text-sized stays streaming.
    """
    if num_partitions is None:
        # Ray's hash join spawns `num_partitions` aggregator actors per join;
        # two chained joins on a small-CPU session must not starve the pools.
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, min(16, cpus // 4))
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        MinHashStage, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 8), num_cpus=1,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n},
    ).materialize()

    def explode_bands(t: pa.Table) -> pa.Table:
        mat = _sig_matrix(t["sig"], num_perm)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        band_ids = np.repeat(np.arange(bands, dtype=np.int64), len(ids))
        band_hash = np.concatenate([
            _hash_rows_u64(mat[:, b * rows_per_band:(b + 1) * rows_per_band])
            .view(np.int64)
            for b in range(bands)
        ]) if len(ids) else np.empty(0, dtype=np.int64)
        return pa.table({
            "band": pa.array(band_ids, type=pa.int64()),
            "band_hash": pa.array(band_hash, type=pa.int64()),
            "doc_id": pa.array(np.tile(ids, bands), type=pa.int64()),
        })

    banded = sigs.map_batches(explode_bands, batch_format="pyarrow")
    pairs = banded.sort(["band", "band_hash"]).map_batches(
        _pairs_from_sorted_buckets(["band", "band_hash"]),
        batch_format="pyarrow", batch_size=None,
    )
    # a pair can surface from several bands → global dedup on (doc_a, doc_b)
    uniq = pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="_nb"))
    uniq = uniq.map_batches(lambda t: t.drop_columns(["_nb"]), batch_format="pyarrow")

    # Verification needs each pair's two signatures. The sketch table is
    # 4·num_perm bytes/doc (~10³× smaller than the text); when it fits a
    # broadcast (≤ ~0.5 GB at 2M docs × 64 perms) ship it ONCE via ray.put
    # and gather per batch — two whole join exchanges disappear. Past the
    # limit, fall back to the two partitioned joins (the sketch then IS
    # corpus-sized and must co-partition with the pairs).
    if sigs.count() <= 2_000_000:
        import ray as _ray

        parts = [(_sig_matrix(t["sig"], num_perm),
                  t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
                 for t in sigs.iter_batches(batch_format="pyarrow",
                                            batch_size=None)]
        ids_all = np.concatenate([p[1] for p in parts]) if parts else \
            np.empty(0, dtype=np.int64)
        mat_all = np.vstack([p[0] for p in parts]) if parts else \
            np.empty((0, num_perm), dtype=np.uint64)
        order = np.argsort(ids_all)
        ref = _ray.put((ids_all[order], mat_all[order]))

        def verify_bcast(t: pa.Table) -> pa.Table:
            ids_s, mat = _ray.get(ref)
            da = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            db = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            a = mat[np.searchsorted(ids_s, da)] if len(t) else mat[:0]
            b = mat[np.searchsorted(ids_s, db)] if len(t) else mat[:0]
            jac = (a == b).mean(axis=1) if len(t) else np.empty(0)
            out = pa.table({
                "doc_a": pa.array(da, type=pa.int64()),
                "doc_b": pa.array(db, type=pa.int64()),
                "jaccard": pa.array(jac, type=pa.float64()),
            })
            return out.filter(pc.greater_equal(out["jaccard"],
                                               jaccard_threshold))

        return uniq.map_batches(verify_bcast, batch_format="pyarrow")

    sig_a = sigs.map_batches(lambda t: t.rename_columns(["doc_a", "sig_a"]),
                             batch_format="pyarrow")
    sig_b = sigs.map_batches(lambda t: t.rename_columns(["doc_b", "sig_b"]),
                             batch_format="pyarrow")
    joined = uniq.join(sig_a, "inner", num_partitions, on=("doc_a",)).join(
        sig_b, "inner", num_partitions, on=("doc_b",)
    )

    def verify(t: pa.Table) -> pa.Table:
        a = _sig_matrix(t["sig_a"], num_perm)
        b = _sig_matrix(t["sig_b"], num_perm)
        jac = (a == b).mean(axis=1) if len(t) else np.empty(0)
        out = pa.table({
            "doc_a": pc.cast(t["doc_a"], pa.int64()),
            "doc_b": pc.cast(t["doc_b"], pa.int64()),
            "jaccard": pa.array(jac, type=pa.float64()),
        })
        return out.filter(pc.greater_equal(out["jaccard"], jaccard_threshold))

    return joined.map_batches(verify, batch_format="pyarrow")


# -------------------------------------------------------------------- SimHash

class SimHashStage:
    """Actor: 64-bit SimHash over word unigrams (stable crc32 token hashing,
    widened to 64 bits with the FNV fold used throughout this module)."""

    def __init__(self):
        self._cache: dict[str, int] = {}

    def _tok_hash(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            # Python ints with an explicit 64-bit mask: same wraparound value
            # as uint64 arithmetic without numpy's scalar-overflow warning
            c = zlib.crc32(tok.encode())
            h = ((c * 1099511628211) ^ (c << 32)) & 0xFFFFFFFFFFFFFFFF
            if len(self._cache) < 1_000_000:
                self._cache[tok] = h
        return h

    def simhash(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = np.fromiter((self._tok_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
        # (n_tokens, 64) bit matrix, vectorized
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        acc = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(s or "") for s in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "simhash": pa.array(hs, type=pa.uint64()),
        })


_HOT_RUN = 2048  # bucket-occupancy bound: larger runs refine instead of triu


def _hamming64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 XOR array."""
    x = x.copy()
    ham = np.zeros(x.size, dtype=np.int64)
    while x.any():
        ham += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return ham


def _verify_emit(ia, ib, hs, max_hamming, out):
    """Append (ia, ib, hamming) for index pairs passing full verification."""
    if ia.size == 0:
        return
    ham = _hamming64(hs[ia] ^ hs[ib])
    keep = ham <= max_hamming
    if keep.any():
        out.append((ia[keep], ib[keep], ham[keep]))


def _verify_all_pairs_tiled(idx, hs, max_hamming, out, tile=_HOT_RUN):
    """All-pairs Hamming verify over ``idx`` (ascending) in tile×tile blocks.

    Peak pair-temporary memory is O(tile²) regardless of the group size —
    the bound that makes degenerate buckets survivable; surviving pairs are
    real output and accumulate by output size only.
    """
    n = idx.size
    for s0 in range(0, n, tile):
        e0 = min(s0 + tile, n)
        ii, jj = np.triu_indices(e0 - s0, k=1)
        _verify_emit(idx[s0 + ii], idx[s0 + jj], hs, max_hamming, out)
        for s1 in range(e0, n, tile):
            e1 = min(s1 + tile, n)
            _verify_emit(np.repeat(idx[s0:e0], e1 - s1),
                         np.tile(idx[s1:e1], e0 - s0), hs, max_hamming, out)


def _hot_run_pairs(idx, hs, rem, max_hamming, out, stats,
                   hot_run=_HOT_RUN):
    """Multi-index Hamming refinement for an over-occupied simhash bucket.

    ``idx``: ascending indices into ``hs`` (one per distinct doc in the
    bucket); ``rem``: the 16-bit chunk positions NOT yet matched exactly.
    Generalized pigeonhole: with per-chunk threshold 1 over ``len(rem)``
    chunks, Σ(1+1) = 2·len(rem) > max_hamming guarantees every qualifying
    pair has some remaining chunk at Hamming ≤ 1. So for each remaining
    chunk: pairs EQUAL on it land in a subgroup (recurse on the chunks after
    it — any earlier chunk at distance 0 would have caught the pair at that
    level); pairs at distance exactly 1 are found by 16 single-bit-flip
    ``searchsorted`` probes (O(n log n) per bit, no pair materialization).
    When the pigeonhole no longer holds (final chunk / large max_hamming) or
    the group is small, fall back to the tiled verifier — temporaries stay
    O(_HOT_RUN²) on every path. Pairs may be discovered via several chunks;
    the caller dedupes.
    """
    n = idx.size
    if n < 2:
        return
    if n <= hot_run or max_hamming >= 2 * len(rem):
        if n > hot_run:
            stats["degenerate"] += 1
            stats["degenerate_max"] = max(stats["degenerate_max"], n)
        _verify_all_pairs_tiled(idx, hs, max_hamming, out,
                                tile=min(hot_run, _HOT_RUN))
        return
    stats["split"] += 1
    for pos, j in enumerate(rem):
        vj = ((hs[idx] >> np.uint64(16 * j)) & np.uint64(0xFFFF)).astype(np.int64)
        order = np.argsort(vj, kind="stable")
        sv, sidx = vj[order], idx[order]
        starts = np.flatnonzero(np.concatenate(([True], sv[1:] != sv[:-1])))
        ends = np.append(starts[1:], sv.size)
        for s, e in zip(starts, ends):
            if e - s >= 2:
                _hot_run_pairs(np.sort(sidx[s:e]), hs, rem[pos + 1:],
                               max_hamming, out, stats, hot_run)
        for b in range(16):
            w = sv ^ (1 << b)
            lo = np.searchsorted(sv, w, side="left")
            hi = np.searchsorted(sv, w, side="right")
            cnt = hi - lo
            src = np.flatnonzero(cnt > 0)
            if src.size == 0:
                continue
            reps = cnt[src]
            total = int(reps.sum())
            offs = (np.repeat(lo[src], reps)
                    + np.arange(total)
                    - np.repeat(np.cumsum(reps) - reps, reps))
            a = np.repeat(sidx[src], reps)
            bb = sidx[offs]
            sel = a < bb  # each 1-bit pair appears once per direction
            _verify_emit(a[sel], bb[sel], hs, max_hamming, out)


def simhash_pairs(docs: Dataset, max_hamming: int = 3,
                  hot_run: int = _HOT_RUN) -> Dataset:
    """SimHash near-dup pairs with Hamming verification.

    Banding: 4 16-bit chunks — any pair within Hamming distance 3 shares at
    least one exact chunk (pigeonhole), so bucketing on (chunk_idx, chunk)
    finds all such pairs without an all-pairs scan. Buckets are sorted runs
    (same vectorized pattern as MinHash); the 8-byte simhash rides along for
    in-place verification — no join needed at this payload size.

    Occupancy bound: 16-bit chunks give only 2^16 buckets per band, so a
    boilerplate-heavy corpus concentrates signatures into hot runs where the
    previous ``triu_indices(run)`` candidate generation was quadratic in
    both time and memory. Runs above ``_HOT_RUN`` distinct signatures now
    refine through ``_hot_run_pairs`` (multi-index Hamming: exact-subgroup
    recursion + single-bit searchsorted probes), keeping pair temporaries
    O(_HOT_RUN²) on every path; split/degenerate counts are logged per block
    (no silent caps).
    """
    sigs = docs.map_batches(SimHashStage, batch_format="pyarrow",
                            batch_size=1024, concurrency=(1, 8), num_cpus=1)

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        chunks = [((h >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
                  for c in range(4)]
        return pa.table({
            "chunk_idx": pa.array(np.repeat(np.arange(4, dtype=np.int64), len(ids))),
            "chunk": pa.array(np.concatenate(chunks) if len(ids) else
                              np.empty(0, dtype=np.int64)),
            "doc_id": pa.array(np.tile(ids, 4), type=pa.int64()),
            "simhash": pa.array(np.tile(h, 4), type=pa.uint64()),
        })

    def pairs_in_block(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64()),
                          "hamming": pa.array([], type=pa.int64())})
        n = len(t)
        if n < 2:
            return empty
        key = _hash_rows_u64(np.column_stack([
            t["chunk_idx"].to_numpy(zero_copy_only=False).astype(np.uint64),
            t["chunk"].to_numpy(zero_copy_only=False).astype(np.uint64),
        ]))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ci = t["chunk_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        ends = np.append(starts[1:], n)
        out_a, out_b, out_h = [], [], []
        stats = {"split": 0, "degenerate": 0, "degenerate_max": 0}
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            order = np.argsort(ids[s:e], kind="stable")
            run_ids, run_hs = ids[s:e][order], hs[s:e][order]
            keep_first = np.concatenate(([True], run_ids[1:] != run_ids[:-1]))
            run_ids, run_hs = run_ids[keep_first], run_hs[keep_first]
            if run_ids.size < 2:
                continue
            found: list = []
            if run_ids.size <= hot_run:
                ii, jj = np.triu_indices(run_ids.size, k=1)
                _verify_emit(ii, jj, run_hs, max_hamming, found)
                dedupe = False
            else:  # over-occupied bucket: bounded multi-index refinement
                rem = [j for j in range(4) if j != int(ci[s])]
                _hot_run_pairs(np.arange(run_ids.size), run_hs, rem,
                               max_hamming, found, stats, hot_run)
                dedupe = True  # a pair can surface via several chunks
            if found:
                ia = np.concatenate([f[0] for f in found])
                ib = np.concatenate([f[1] for f in found])
                hm = np.concatenate([f[2] for f in found])
                if dedupe:
                    pk = (ia.astype(np.uint64) << np.uint64(32)) \
                        | ib.astype(np.uint64)
                    _, first = np.unique(pk, return_index=True)
                    ia, ib, hm = ia[first], ib[first], hm[first]
                out_a.append(run_ids[ia])
                out_b.append(run_ids[ib])
                out_h.append(hm)
        if stats["split"]:
            _LOG.info(
                "simhash_pairs: refined %d hot runs (> %d sigs); "
                "degenerate 48-bit-equal groups: %d (max %d sigs)",
                stats["split"], hot_run, stats["degenerate"],
                stats["degenerate_max"])
        if not out_a:
            return empty
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "hamming": pa.array(np.concatenate(out_h), type=pa.int64()),
        })

    pairs = sigs.map_batches(explode, batch_format="pyarrow").sort(
        ["chunk_idx", "chunk"]
    ).map_batches(pairs_in_block, batch_format="pyarrow", batch_size=None)
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


def connected_components(
    pairs: Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    num_partitions: int | None = None,
    max_rounds: int = 64,
) -> Dataset:
    """Distributed connected components over an edge Dataset → (node, label)
    with ``label`` = the component's minimum node id.

    Iterative min-label propagation as pure Dataset ops (no driver-side
    graph): each round every node takes the min of its own label, its
    neighbours' labels, and — via *label-pointer edges* (node ↔ label) — the
    label of its current representative. The pointer edges give the
    hash-to-min contraction (O(log n) rounds on chains, vs O(diameter) for
    plain neighbour propagation); convergence is detected by the monotone
    non-increasing label sum going stable. Each round is one hash join on
    the (tiny, id-only) edge/label tables + one groupby-min — the pair set
    is duplicate-rate-sized, so nothing corpus-sized ever enters a round.

    Partitioning assumption: labels/edges co-partition by the join key each
    round (Ray's hash join); skew is bounded because a hot component's rows
    key by *member* node id, not by the component id.
    """
    import ray
    from ray.data import from_arrow

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, min(16, cpus // 4))

    def symmetrize(t: pa.Table) -> pa.Table:
        a = pc.cast(t[a_col], pa.int64())
        b = pc.cast(t[b_col], pa.int64())
        return pa.table({
            "node": pa.chunked_array([a, b]).combine_chunks(),
            "nbr": pa.chunked_array([b, a]).combine_chunks(),
        })

    def _local_min(t: pa.Table) -> pa.Table:
        # per-batch combiner before every groupby-min
        if len(t) == 0:
            return t
        g = t.group_by(["node"]).aggregate([("cand", "min")])
        return pa.table({"node": g["node"], "cand": g["cand_min"]})

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return from_arrow(pa.table({"node": pa.array([], type=pa.int64()),
                                    "label": pa.array([], type=pa.int64())}))

    # round 0: label(x) = min(x, neighbours)
    cand0 = edges.map_batches(
        lambda t: pa.table({
            "node": pa.chunked_array([t["node"], t["node"]]).combine_chunks(),
            "cand": pa.chunked_array([t["node"], t["nbr"]]).combine_chunks(),
        }),
        batch_format="pyarrow",
    ).map_batches(_local_min, batch_format="pyarrow")
    labels = cand0.groupby("node").aggregate(Min("cand", alias_name="label")).materialize()
    prev_sum = labels.sum("label")

    for _ in range(max_rounds):
        # pointer edges node↔label (the contraction step)
        lab_edges = labels.map_batches(
            lambda t: pa.table({
                "node": pa.chunked_array([t["node"], t["label"]]).combine_chunks(),
                "nbr": pa.chunked_array([t["label"], t["node"]]).combine_chunks(),
            }),
            batch_format="pyarrow",
        )
        all_edges = edges.union(lab_edges)
        nbr_lab = labels.map_batches(
            lambda t: pa.table({"nbr": t["node"], "nbr_label": t["label"]}),
            batch_format="pyarrow",
        )
        prop = all_edges.join(nbr_lab, "inner", num_partitions, on=("nbr",))
        cand = prop.map_batches(
            lambda t: pa.table({"node": t["node"], "cand": t["nbr_label"]}),
            batch_format="pyarrow",
        ).union(labels.map_batches(
            lambda t: pa.table({"node": t["node"], "cand": t["label"]}),
            batch_format="pyarrow",
        )).map_batches(_local_min, batch_format="pyarrow")
        labels = cand.groupby("node").aggregate(Min("cand", alias_name="label")).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # labels only ever decrease → stable = converged
            break
        prev_sum = cur_sum
    else:
        # exhausting max_rounds without the stable-sum break means some
        # component is still merging — returning silently would make
        # near_dedup_keep keep too many docs with no signal
        raise RuntimeError(
            f"connected_components: labels did not converge within "
            f"max_rounds={max_rounds} (pointer-edge contraction halves "
            "diameter per round; raise max_rounds)"
        )
    return labels


def near_dedup_keep(
    docs: Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.85,
    driver_pair_threshold: int = 100_000,
    broadcast_victim_threshold: int = 4_000_000,
) -> Dataset:
    """Near-duplicate *keep-list*: one representative (min doc_id) per
    near-dup cluster — the operator a training-data pipeline actually applies.

    Clusters are connected components over the verified MinHash pair graph.
    Below ``driver_pair_threshold`` pairs the union-find runs on the driver
    (collected pairs are tiny); above it :func:`connected_components` runs
    the same contraction as distributed Dataset ops, so the pair set never
    has to fit on the driver — at web dup rates it is corpus-proportional.
    Victim filtering: the victim id set is broadcast (``ray.put`` once,
    vectorized ``is_in`` per batch — the corpus itself never shuffles) while
    it fits ``broadcast_victim_threshold``; beyond that the docs take one
    hash-partitioned left-anti join on ``doc_id``.
    """
    pairs_ds = minhash_lsh_pairs(
        docs, num_perm=num_perm, bands=bands, shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
    ).materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return docs

    if n_pairs <= driver_pair_threshold:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs_ds.take_all():
            a, b = find(int(r["doc_a"])), find(int(r["doc_b"]))
            if a != b:
                if a > b:
                    a, b = b, a
                parent[b] = a  # root = min id
        victims = [x for x in parent if find(x) != x]
        if not victims:
            return docs
        return _drop_victims_broadcast(docs, pa.array(victims, type=pa.int64()))

    labels = connected_components(pairs_ds)
    victims_ds = labels.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(pc.not_equal(t["node"], t["label"]))["node"]}
        ),
        batch_format="pyarrow",
    ).materialize()
    if victims_ds.count() <= broadcast_victim_threshold:
        ids = [r["doc_id"] for r in victims_ds.take_all()]
        return _drop_victims_broadcast(docs, pa.array(ids, type=pa.int64()))
    # anti join: one hash exchange of the docs, victims co-partitioned
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nparts = max(2, min(16, cpus // 4))
    marked = victims_ds.map_batches(
        lambda t: t.append_column("_victim", pa.array([1] * len(t), type=pa.int8())),
        batch_format="pyarrow",
        # groupby/join operators emit empty blocks with a ZERO-COLUMN schema
        # (UDFs are skipped on them); a join partition fed only such blocks
        # loses the key column and acero errors. repartition coalesces them
        # away before the schema-sensitive join.
    ).repartition(nparts)
    joined = docs.join(marked, "left_outer", nparts, on=("doc_id",))
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t["_victim"])).drop_columns(["_victim"]),
        batch_format="pyarrow",
    )


def _drop_victims_broadcast(docs: Dataset, vset: pa.Array) -> Dataset:
    return docs.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(pc.cast(t["doc_id"], pa.int64()),
                                              value_set=vset))),
        batch_format="pyarrow",
    )


# ------------------------------------------------------- n-gram Jaccard (topk)

def _shingle_strings(text: str, n: int) -> np.ndarray:
    """Unique word n-gram shingles as strings (the exact, SQL-reproducible
    form — used where a DuckDB oracle must recompute the same sets; the
    hashed variant above stays the sketch input)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=object)
    if len(toks) < n:
        toks = toks + [""] * (n - len(toks))
    return np.unique([" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)])


def ngram_jaccard_topk(
    docs: Dataset, query_ids: list[int], *, shingle_n: int = 3, k: int = 3
) -> Dataset:
    """Exact n-gram-Jaccard top-k neighbours for a small query set.

    Broadcast pattern: the query shingle sets ride into every task via
    ``ray.put``; each batch scores locally (vectorized set intersection on
    sorted shingle arrays) and emits its local top-k per query; a tiny final
    groupby takes the global top-k. Shingles are exact strings (not the
    minhash sketch's hashes) so the result is oracle-checkable in SQL.
    """
    import pandas as pd
    import ray

    qids = pa.array(list(query_ids), type=pa.int64())
    qrows = docs.map_batches(
        lambda t: t.filter(pc.is_in(pc.cast(t["doc_id"], pa.int64()), value_set=qids))
        .select(["doc_id", "text"]),
        batch_format="pyarrow",
    ).take_all()
    qsh = {r["doc_id"]: _shingle_strings(r["text"] or "", shingle_n) for r in qrows}
    qref = ray.put(qsh)

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_q, out_d, out_j = [], [], []
        for did, text in zip(ids, texts):
            sh = _shingle_strings(text or "", shingle_n)
            for qid, qs in q.items():
                if qid == did:
                    continue
                inter = np.intersect1d(qs, sh, assume_unique=True).size
                u = qs.size + sh.size - inter
                out_q.append(qid); out_d.append(did)
                out_j.append(inter / u if u else 0.0)
        tl = pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                       "doc_id": pa.array(out_d, type=pa.int64()),
                       "jaccard": pa.array(out_j, type=pa.float64())})
        # local top-k per query before the shuffle (combiner)
        df = tl.to_pandas()
        df = df.sort_values(["query_id", "jaccard", "doc_id"],
                            ascending=[True, False, True]).groupby("query_id").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    local = docs.map_batches(score, batch_format="pyarrow")

    def final_topk(g: pa.Table) -> pa.Table:
        jac = g["jaccard"].to_numpy(zero_copy_only=False)
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((did, -jac))[: min(k, len(g))]
        return g.take(idx)

    return local.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


# ------------------------------------------------- exact duplicated windows

_POLY2 = np.uint64(0x9E3779B97F4A7C15)  # second independent rolling multiplier


def substring_dup_counts(
    docs: Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Per-doc count of exactly-duplicated ``n``-token windows — the
    substring-granularity dedup of the "deduplicating training data" line of
    work; finer than whole-doc exact dedup (D1), exact unlike MinHash.

    A window counts as duplicated when its exact n-token string also occurs
    in at least one OTHER document (within-doc repeats alone don't count).
    Output: ``(doc_id, dup_windows)`` for docs with >= 1 duplicated window.

    Scale shape: the text never moves. Each doc emits its DISTINCT window
    keys as two independent 64-bit rolling polynomials over siphashed tokens
    (128 key bits total — collision-free in practice; the exchange carries
    (w1, w2, doc_id) only, ~24 bytes/window). One groupby on w1 — uniform by
    construction, no salting needed; within a group the w2 refinement and the
    distinct-doc test are a vectorized run-length scan; a final (doc_id) sum
    combines per-group partial counts, so no stage ever holds more than one
    w1 bucket.

    Tokenization is single-space split (``text.split(' ')``) to match the
    SQL oracle's ``string_split(text, ' ')`` byte-for-byte.
    """
    import pandas as pd

    coef1 = np.power(_FNV64, np.arange(n, dtype=np.uint64))
    coef2 = np.power(_POLY2, np.arange(n, dtype=np.uint64))

    def windows(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        w1_out, w2_out, id_out = [], [], []
        for did, text in zip(ids, texts):
            toks = (text or "").split(" ")
            if len(toks) < n:
                continue
            th = pd.util.hash_array(np.asarray(toks, dtype=object))
            win = np.lib.stride_tricks.sliding_window_view(th, n)
            w1 = (win * coef1[None, :]).sum(axis=1, dtype=np.uint64)
            w2 = (win * coef2[None, :]).sum(axis=1, dtype=np.uint64)
            order = np.lexsort((w2, w1))  # distinct windows per doc
            w1s, w2s = w1[order], w2[order]
            keep = np.ones(len(w1s), dtype=bool)
            keep[1:] = (w1s[1:] != w1s[:-1]) | (w2s[1:] != w2s[:-1])
            w1_out.append(w1s[keep])
            w2_out.append(w2s[keep])
            id_out.append(np.full(int(keep.sum()), did, dtype=np.int64))
        if not w1_out:
            return pa.table({
                "w1": pa.array([], type=pa.int64()),
                "w2": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
            })
        return pa.table({
            "w1": pa.array(np.concatenate(w1_out).view(np.int64)),
            "w2": pa.array(np.concatenate(w2_out).view(np.int64)),
            id_col: pa.array(np.concatenate(id_out)),
        })

    keyed = docs.map_batches(windows, batch_format="pyarrow")

    def count_shared(g: pa.Table) -> pa.Table:
        w2 = g["w2"].to_numpy(zero_copy_only=False)
        did = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, w2))
        w2s, dids = w2[order], did[order]
        starts = np.flatnonzero(np.r_[True, w2s[1:] != w2s[:-1]])
        lens = np.diff(np.r_[starts, len(w2s)])
        # (w1, w2, doc) rows are globally unique (per-doc distinct emission),
        # so a run's length IS its distinct-doc count.
        shared = np.repeat(lens >= 2, lens)
        if not shared.any():
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "dup_windows": pa.array([], type=pa.int64())})
        u, c = np.unique(dids[shared], return_counts=True)
        return pa.table({id_col: pa.array(u, type=pa.int64()),
                         "dup_windows": pa.array(c.astype(np.int64))})

    partial = keyed.groupby("w1").map_groups(count_shared, batch_format="pyarrow")
    return partial.groupby(id_col).aggregate(
        Sum("dup_windows", alias_name="dup_windows")
    )


def ppjoin_pairs(
    docs: Dataset,
    *,
    threshold_num: int = 1,
    threshold_den: int = 2,
    shingle_n: int = 3,
) -> Dataset:
    """EXACT set-similarity self-join: all document pairs whose shingle-set
    Jaccard ≥ threshold_num/threshold_den — the deterministic complement
    to minhash_lsh_pairs (which is probabilistic) built on the PPJoin
    prefix-filter principle (Xiao et al., WWW'08, public).

    Blocking: each doc's shingle hashes sort in a FIXED universal order
    (the hash value itself); two sets can only reach Jaccard ≥ τ if their
    first ``n - ceil(τ·n) + 1`` elements share at least one value, so only
    that prefix emits (shingle, doc, size) blocking rows. The classic
    df-ascending order is a pruning OPTIMIZATION requiring a global
    vocabulary pass + broadcast; the hash order is correctness-equivalent
    (any consistent total order works), costs zero global state, and keeps
    prefix buckets df-bounded. Candidate pairs form inside per-shingle
    groups (size-filtered: τ·|a| ≤ |b|), dedupe via distinct, and verify
    EXACTLY with two distributed joins against the full (doc, shingle)
    table — intersection sizes come from a combiner + groupby, never from
    carrying sets around. Integer threshold compare throughout
    (``inter·den ≥ union·num``). Returns (doc_a, doc_b, inter, uni).
    Assumes prefix buckets stay small (shingle dfs; boilerplate-heavy
    corpora should pre-dedupe exactly first — same caveat as simhash)."""
    import ray.data

    from .. import ops

    num, den = threshold_num, threshold_den

    def shingle_rows(prefix_only: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids, shs, sizes = [], [], []
            for did, txt in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
                sh = np.sort(_shingle_hashes(txt or "", shingle_n))
                n = len(sh)
                if n == 0:
                    continue
                take = n - (-(-(num * n) // den)) + 1 if prefix_only else n
                take = max(0, min(take, n))
                ids.extend([did] * take)
                shs.extend(sh[:take].tolist())
                if prefix_only:
                    sizes.extend([n] * take)
            out = {"doc_id": pa.array(ids, pa.int64()),
                   "sh": pa.array(shs, pa.int64())}
            if prefix_only:
                out["n"] = pa.array(sizes, pa.int64())
            return pa.table(out)
        return fn

    full = docs.map_batches(shingle_rows(False), batch_format="pyarrow")
    prefix = docs.map_batches(shingle_rows(True), batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ns = t["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, ns = ids[order], ns[order]
        ai, bi = np.triu_indices(len(ids), k=1)
        # size filter: with na ≤ nb (a sorted first), Jaccard ≤ na/nb, so
        # require na·den ≥ nb·num (integer τ cross-multiply)
        keep = (ids[ai] != ids[bi]) & (ns[ai] * den >= ns[bi] * num) & \
               (ns[bi] * den >= ns[ai] * num)
        return pa.table({"a": pa.array(ids[ai][keep], pa.int64()),
                         "b": pa.array(ids[bi][keep], pa.int64())})

    cand = ops.distinct(
        prefix.groupby("sh").map_groups(bucket_pairs,
                                        batch_format="pyarrow"),
        ["a", "b"]).materialize()
    if cand.count() == 0:
        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "uni": pa.array([], pa.int64())}))

    sizes = full.map_batches(
        lambda t: (lambda g: pa.table({
            "doc_id": g["doc_id"],
            "sz": pc.cast(g["doc_id_count"], pa.int64())}))(
                t.group_by(["doc_id"]).aggregate([("doc_id", "count")])),
        batch_format="pyarrow").groupby("doc_id").aggregate(
        Sum("sz", alias_name="sz"))

    j1 = ops.hash_join_sized(full, ops._compact(cand), on=("doc_id",),
                             right_on=("a",))
    # j1 rows: (doc_id==a, sh, b); match b's shingles exactly
    j2 = ops.hash_join(
        j1.map_batches(lambda t: pa.table({
            "a": t["doc_id"], "b": t["b"], "sh": t["sh"]}),
            batch_format="pyarrow"),
        full.map_batches(lambda t: pa.table({
            "b2": t["doc_id"], "sh": t["sh"]}), batch_format="pyarrow"),
        on=("b", "sh"), right_on=("b2", "sh"))

    inter = (j2.map_batches(
        lambda t: (lambda g: pa.table({
            "a": g["a"], "b": g["b"],
            "i": pc.cast(g["a_count"], pa.int64())}))(
            t.group_by(["a", "b"]).aggregate([("a", "count")])),
        batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Sum("i", alias_name="inter")))

    wa = ops.hash_join_sized(ops._compact(inter), ops._compact(sizes),
                             on=("a",), right_on=("doc_id",))
    wa = wa.map_batches(lambda t: pa.table({
        "a": t["a"], "b": t["b"], "inter": t["inter"], "na": t["sz"]}),
        batch_format="pyarrow")
    wb = ops.hash_join_sized(wa, ops._compact(sizes), on=("b",),
                             right_on=("doc_id",))

    def finish(t: pa.Table) -> pa.Table:
        uni = pc.subtract(pc.add(t["na"], t["sz"]), t["inter"])
        keep = pc.greater_equal(pc.multiply(t["inter"],
                                            pa.scalar(den, pa.int64())),
                                pc.multiply(uni, pa.scalar(num, pa.int64())))
        t = pa.table({"doc_a": t["a"], "doc_b": t["b"],
                      "inter": t["inter"], "uni": uni}).filter(keep)
        return t

    return wb.map_batches(finish, batch_format="pyarrow")
