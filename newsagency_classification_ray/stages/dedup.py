"""Deduplication operators over a documents table (exact + near-dup family).

First-class large-scale-training-data operators (not in the reference beyond
its exact ``drop_duplicates`` D1/D2, SURVEY.md §2.7 — the near-dup family is
the standard web-corpus toolkit: MinHash+LSH, SimHash, n-gram Jaccard).

All operators follow the same scale shape:

1. *per-batch vectorized sketch* (``map_batches`` — shingles/minhash/simhash
   computed with numpy, no Python loop over characters),
2. *explode to small key rows* ((band_id, band_hash, doc_id) — tiny vs text),
3. *groupby on the band key* (the only shuffle; banded keys are uniform by
   construction, so no salting needed),
4. *verify candidates exactly* inside ``map_groups`` (Jaccard / Hamming).

so the text itself never moves through a shuffle — only fingerprints do.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Min

_MERSENNE31 = (1 << 31) - 1


def _token_ngrams(text: str, n: int) -> set[int]:
    """Word n-gram shingle set, hashed to 32-bit ints (stable md5 basis).

    32-bit shingle ids keep the (a·x+b) mod p minhash products inside int64 —
    fully vectorizable in numpy without object-dtype bignums.
    """
    toks = text.split()
    if len(toks) < n:
        toks = toks + [""] * (n - len(toks))
    out = set()
    for i in range(len(toks) - n + 1):
        h = hashlib.md5(" ".join(toks[i:i + n]).encode()).digest()[:4]
        out.add(int.from_bytes(h, "little"))
    return out


# ---------------------------------------------------------------- exact dedup

def exact_dedup(docs: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Exact dedup: keep the min-id row per distinct text (D1 pattern:
    hash-partition + per-group min).

    Shuffles only (text_hash, id) pairs — the text column never moves.
    Oracle-equivalent SQL: ``SELECT min(id) FROM t GROUP BY text``.
    """
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
    """Actor: per-batch MinHash signatures (state = the permutation params)."""

    def __init__(self, num_perm: int = 64, shingle_n: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE31, size=num_perm).astype(np.int64)
        self.b = rng.randint(0, _MERSENNE31, size=num_perm).astype(np.int64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        sh = _token_ngrams(text, self.shingle_n)
        if not sh:
            return np.full(self.num_perm, _MERSENNE31, dtype=np.int64)
        x = np.fromiter(sh, dtype=np.int64, count=len(sh))
        # (a*x + b) mod p, all perms at once: (len(sh), num_perm); fits int64
        vals = (x[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE31
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sigs = [self.signature(s or "") for s in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.int64())),
        })


def minhash_lsh_pairs(
    docs: Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> Dataset:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    shingle → minhash (actor pool) → explode to (band, band_hash, doc_id) →
    band groupby → candidate pairs → verify estimated Jaccard from full
    signatures (signature agreement rate — unbiased estimator) → pairs with
    ``jaccard >= threshold``, canonical ``doc_a < doc_b``.
    """
    rows_per_band = num_perm // bands
    sigs = docs.map_batches(
        MinHashStage, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4), num_cpus=1,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n},
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        sig = np.asarray(t["sig"].to_pylist(), dtype=np.int64)
        band_ids, band_hashes, doc_ids, sig_rows = [], [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            hs = [hashlib.md5(c.tobytes()).hexdigest()[:16] for c in chunk]
            band_ids.extend([b] * len(ids))
            band_hashes.extend(hs)
            doc_ids.extend(ids.tolist())
            sig_rows.extend(sig.tolist())
        return pa.table({
            "band": pa.array(band_ids, type=pa.int32()),
            "band_hash": pa.array(band_hashes, type=pa.string()),
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "sig": pa.array(sig_rows, type=pa.list_(pa.int64())),
        })

    banded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "jaccard": pd.Series([], dtype="float64")})
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        sig = np.asarray(g["sig"].tolist(), dtype=np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        jac = (sig[ii] == sig[jj]).mean(axis=1)
        return pd.DataFrame({"doc_a": ids[ii], "doc_b": ids[jj], "jaccard": jac})

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # a pair can surface from several bands → dedup with a (doc_a, doc_b) groupby
    verified = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("jaccard", alias_name="jaccard")
    )
    return verified.map_batches(
        lambda t, th=jaccard_threshold: t.filter(pc.greater_equal(t["jaccard"], th)),
        batch_format="pyarrow",
    )


# -------------------------------------------------------------------- SimHash

class SimHashStage:
    """Actor: 64-bit SimHash over word unigrams (stable md5 token hashing)."""

    def __init__(self):
        self._cache: dict[str, int] = {}

    def _tok_hash(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
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
        ids = batch["doc_id"].to_pylist()
        hs = [self.simhash(s or "") for s in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "simhash": pa.array(hs, type=pa.uint64()),
        })


def simhash_pairs(docs: Dataset, max_hamming: int = 3) -> Dataset:
    """SimHash near-dup candidate pairs with Hamming verification.

    Banding: 4 16-bit chunks — any pair within Hamming distance 3 shares at
    least one exact chunk (pigeonhole), so bucket-groupby on (chunk_idx,
    chunk_value) finds all such pairs without an all-pairs scan.
    """
    sigs = docs.map_batches(SimHashStage, batch_format="pyarrow",
                            batch_size=1024, concurrency=(1, 4), num_cpus=1)

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = t["simhash"].to_numpy().astype(np.uint64)
        out_idx, out_chunk, out_id, out_h = [], [], [], []
        for c in range(4):
            chunk = (h >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            out_idx.extend([c] * len(ids))
            out_chunk.extend(chunk.tolist())
            out_id.extend(ids.tolist())
            out_h.extend(h.tolist())
        return pa.table({
            "chunk_idx": pa.array(out_idx, type=pa.int32()),
            "chunk": pa.array(out_chunk, type=pa.int64()),
            "doc_id": pa.array(out_id, type=pa.int64()),
            "simhash": pa.array(out_h, type=pa.uint64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                              "doc_b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
        if len(g) < 2:
            return empty
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        h = g["simhash"].to_numpy().astype(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        x = h[ii] ^ h[jj]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        return pd.DataFrame({"doc_a": ids[ii][keep], "doc_b": ids[jj][keep],
                             "hamming": ham[keep]})

    pairs = sigs.map_batches(explode, batch_format="pyarrow").groupby(
        ["chunk_idx", "chunk"]
    ).map_groups(bucket_pairs, batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ------------------------------------------------------- n-gram Jaccard (topk)

def ngram_jaccard_topk(
    docs: Dataset, query_ids: list[int], *, shingle_n: int = 3, k: int = 3
) -> Dataset:
    """Exact n-gram-Jaccard top-k neighbours for a small query set.

    Broadcast pattern: the query shingle sets ride into every task via the fn
    closure (``ray.put`` under the hood); each batch scores locally and emits
    its local top-k per query; a tiny final groupby takes the global top-k.
    """
    import ray

    qids = pa.array(list(query_ids), type=pa.int64())
    qrows = docs.map_batches(
        lambda t: t.filter(pc.is_in(pc.cast(t["doc_id"], pa.int64()), value_set=qids))
        .select(["doc_id", "text"]),
        batch_format="pyarrow",
    ).take_all()
    qsh = {r["doc_id"]: _token_ngrams(r["text"] or "", shingle_n) for r in qrows}
    qref = ray.put(qsh)

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_q, out_d, out_j = [], [], []
        for did, text in zip(ids, texts):
            sh = _token_ngrams(text or "", shingle_n)
            for qid, qs in q.items():
                if qid == did:
                    continue
                u = len(qs | sh)
                j = (len(qs & sh) / u) if u else 0.0
                out_q.append(qid); out_d.append(did); out_j.append(j)
        tl = pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                       "doc_id": pa.array(out_d, type=pa.int64()),
                       "jaccard": pa.array(out_j, type=pa.float64())})
        # local top-k per query before the shuffle (combiner)
        df = tl.to_pandas()
        df = df.sort_values(["query_id", "jaccard", "doc_id"],
                            ascending=[True, False, True]).groupby("query_id").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    local = docs.map_batches(score, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["jaccard", "doc_id"], ascending=[False, True]).head(k)

    return local.groupby("query_id").map_groups(final_topk, batch_format="pandas")
