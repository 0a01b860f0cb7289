"""Round-3 operators: heavy hitters, exact quantiles, keyword search,
token-budget packing — each property-tested against a driver brute force."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from newsagency_classification_ray.ops import (
    exact_quantiles,
    heavy_hitters_topk,
    keyword_topk,
    pack_by_token_budget,
)


def _tokens_fn(col: str):
    def fn(t: pa.Table) -> pa.Array:
        flat = pc.list_flatten(pc.split_pattern_regex(t[col], pattern=r"\s+"))
        return flat.filter(pc.not_equal(flat, ""))
    return fn


def _brute_topk(texts: list[str], k: int):
    from collections import Counter
    import re

    c = Counter()
    for s in texts:
        c.update(tok for tok in re.split(r"\s+", s) if tok)
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_heavy_hitters_small_vocab_exact(ray_session):
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=30, p=None)) for _ in range(200)]
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(8)
    got = heavy_hitters_topk(ds, _tokens_fn("text"), k=10, cap=1024)
    want = _brute_topk(texts, 10)
    assert list(zip(got["item"].to_pylist(), got["n"].to_pylist())) == want


def test_heavy_hitters_zipf_with_decrements(ray_session):
    # distinct >> cap per batch forces nonzero Misra-Gries decrements; the
    # skewed head must still come back exact and certified
    rng = np.random.RandomState(11)
    zipf = np.clip(rng.zipf(1.3, size=40_000), 1, 50_000)
    texts = [" ".join(f"t{v}" for v in zipf[i:i + 40]) for i in range(0, 40_000, 40)]
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(16)
    got = heavy_hitters_topk(ds, _tokens_fn("text"), k=8, cap=512)
    want = _brute_topk(texts, 8)
    assert list(zip(got["item"].to_pylist(), got["n"].to_pylist())) == want


def test_heavy_hitters_uncertifiable_raises(ray_session):
    # near-uniform frequencies with cap << distinct: kth count <= err bound
    # must raise rather than return an unverified answer
    texts = [" ".join(f"u{i * 97 + j}" for j in range(50)) for i in range(200)]
    ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(2)
    with pytest.raises(ValueError, match="certify"):
        heavy_hitters_topk(ds, _tokens_fn("text"), k=5, cap=16)


def test_exact_quantiles_matches_numpy(ray_session):
    rng = np.random.RandomState(7)
    vals = np.round(rng.randn(5_000) * 100, 2)
    vals[::7] = vals[0]  # heavy ties
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    qs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    got = exact_quantiles(ds, "v", qs)
    s = np.sort(vals)
    want = [float(s[int(q * (len(s) - 1))]) for q in qs]
    assert got["q"].to_pylist() == qs
    assert got["value"].to_pylist() == want


def test_keyword_topk_matches_bruteforce(ray_session):
    rng = np.random.RandomState(13)
    texts = ["x" + "ab" * int(rng.randint(0, 20)) + "y" for _ in range(500)]
    ids = list(range(500))
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts})).repartition(8)
    got = keyword_topk(ds, "text", "doc_id", term="ab", k=12)
    scores = [(i, t.count("ab")) for i, t in zip(ids, texts) if t.count("ab") > 0]
    want = sorted(scores, key=lambda p: (-p[1], p[0]))[:12]
    assert list(zip(got["doc_id"].to_pylist(), got["score"].to_pylist())) == want


def test_pack_by_token_budget_matches_prefix_sum(ray_session):
    rng = np.random.RandomState(17)
    n = 3_000
    ids = rng.permutation(n).astype(np.int64)  # arrives unsorted
    w = rng.randint(1, 500, size=n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "w": w})).repartition(16)
    got = pack_by_token_budget(ds, "doc_id", "w", capacity=2_000).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    order = np.argsort(ids)
    excl = np.cumsum(w[order]) - w[order]
    want = excl // 2_000
    assert got["doc_id"].tolist() == sorted(ids.tolist())
    assert got["shard_id"].to_numpy().tolist() == want.tolist()
    # shards are contiguous in id order and non-decreasing
    assert (np.diff(got["shard_id"].to_numpy()) >= 0).all()


def test_pack_by_token_budget_rejects_bad_capacity(ray_session):
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "w": [1]}))
    with pytest.raises(ValueError, match="capacity"):
        pack_by_token_budget(ds, "doc_id", "w", capacity=0)
