"""CCNet perplexity buckets, BPE fertility, Hilbert layout."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.ops as ops
import newsagency_classification_ray.queries as Q
import newsagency_classification_ray.stages.textstats as ts

SF = "/root/testdata/sf0.001"


def _hilbert_scalar(x: int, y: int) -> int:
    """Reference scalar xy->d walk (Wikipedia formulation)."""
    rx, ry, d = 0, 0, 0
    s = 1 << 15
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert16_matches_scalar_reference():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 16, size=500).astype(np.int64)
    y = rng.integers(0, 1 << 16, size=500).astype(np.int64)
    d = ops.hilbert16(x, y)
    for xi, yi, di in zip(x, y, d):
        assert int(di) == _hilbert_scalar(int(xi), int(yi))


def test_hilbert16_adjacency_and_bijectivity():
    # on an 8x8 sub-grid scaled into the high bits: consecutive d values
    # along the curve restricted to a full 2^4 x 2^4 grid are unit steps
    n = 16
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)
    d = ops.hilbert16(xs, ys)
    # the 16x16 grid occupies the FIRST 256 curve positions (prefix
    # property of the Hilbert walk only holds for the full square when
    # the grid is the low corner after rotations — check bijectivity
    # over the visited set instead, plus neighbor-step distance 1 when
    # sorting by d restricted to this set)
    assert len(set(d.tolist())) == n * n  # injective
    order = np.argsort(d)
    dx = np.abs(np.diff(xs[order]))
    dy = np.abs(np.diff(ys[order]))
    # consecutive visited cells by curve order are grid-adjacent whenever
    # their d values are consecutive integers
    consec = np.diff(np.sort(d)) == 1
    assert ((dx + dy)[consec] == 1).all()


def test_lineitem_hilbert_totals():
    t = Q.QUERIES["lineitem_hilbert"](SF)
    import pyarrow as pa
    if hasattr(t, "take_all"):
        t = pa.Table.from_pylist(t.take_all()).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey"]).to_pandas()
    assert t.n.sum() == len(li)
    assert (t.h_min <= t.h_max).all()


def test_ccnet_buckets_partition_and_order():
    t = Q.QUERIES["docs_ccnet_buckets"](SF).to_pandas() \
        .set_index("ppl_bucket")
    assert set(t.index) == {"head", "middle", "tail"}
    # quartile split: head ~ top 25%, middle ~ 50%, tail ~ 25%
    n = t.n_docs.sum()
    assert t.loc["head"].n_docs >= n // 4  # ties can only grow the head
    # score ordering between buckets is strict
    assert t.loc["head"].lm_m_min >= t.loc["middle"].lm_m_max
    assert t.loc["middle"].lm_m_min >= t.loc["tail"].lm_m_max
    # every scored doc is bucketed
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    scored = sum(1 for x in docs.text if len((x or "").split()) >= 2)
    assert n == scored


def test_bpe_fertility_invariants():
    t = Q.QUERIES["docs_bpe_fertility"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "text"]).to_pandas()
    want_docs = docs.groupby("lang").size()
    got = t.set_index("lang")
    assert (got.n_docs.sort_index() == want_docs.sort_index()).all()
    # merges only ever reduce token counts
    assert (t.toks_after <= t.toks_before).all()
    assert (t.compression_nano <= 10**9).all()
    # before-counts match a direct whitespace tokenization
    toks = docs.text.fillna("").str.split().str.len().groupby(
        docs.lang).sum()
    assert (got.toks_before.sort_index() == toks.sort_index()).all()
