"""Huffman cost, median polish, file-clustering audit."""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.ops import huffman_total_bits
from newsagency_classification_ray.queries import _median_polish

SF = "/root/testdata/sf0.001"


def test_huffman_cost_bounds():
    """Shannon lower bound <= huffman <= fixed-width upper bound, and the
    kernel equals a reference DP on dyadic cases."""
    t = Q.QUERIES["docs_huffman_cost"](SF).to_pandas()
    for _, r in t.iterrows():
        assert r.huffman_bits <= r.fixed_bits
    # entropy lower bound (float, tolerance): H * n <= huffman bits
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    grp = docs[docs.source == t.source.iloc[0]]
    cnt: dict[str, int] = {}
    for s in grp.text:
        for w in (s or "").split():
            cnt[w] = cnt.get(w, 0) + 1
    n = sum(cnt.values())
    h = -sum(c / n * np.log2(c / n) for c in cnt.values())
    row = t[t.source == t.source.iloc[0]].iloc[0]
    assert row.huffman_bits >= h * n - 1e-6
    assert row.huffman_bits == huffman_total_bits(list(cnt.values()))


def test_huffman_kernel_dyadic_exact():
    # dyadic distribution: huffman == entropy exactly
    counts = [1, 1, 2, 4, 8]
    bits = huffman_total_bits(counts)
    assert bits == 1 * 4 + 1 * 4 + 2 * 3 + 4 * 2 + 8 * 1


def test_median_polish_reconstructs_cells():
    """grand + row + col + residual == original cell value, exactly."""
    cells = {("a", "x"): Fraction(3), ("a", "y"): Fraction(7),
             ("b", "x"): Fraction(2), ("b", "y"): Fraction(10),
             ("c", "x"): Fraction(5), ("c", "y"): Fraction(6)}
    grand, re_, ce, r = _median_polish(cells)
    for (x, y), v in cells.items():
        assert grand + re_[x] + ce[y] + r[(x, y)] == v
    # polish invariant after sweeps: row medians of residuals are 0
    for x in {"a", "b", "c"}:
        vals = sorted(r[(x, y)] for y in ("x", "y"))
        assert vals[0] <= 0 <= vals[1]


def test_median_polish_query_reconstruction():
    t = Q.QUERIES["lineitem_median_polish"](SF).to_pandas()
    grand = t[t.component == "grand"].value_nano.iloc[0]
    rows = t[t.component == "row"].set_index("l_returnflag").value_nano
    cols = t[t.component == "col"].set_index("l_linestatus").value_nano
    res = t[t.component == "residual"]
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_returnflag", "l_linestatus",
                                "l_quantity"]).to_pandas()
    for _, r in res.iterrows():
        grp = sorted(li[(li.l_returnflag == r.l_returnflag)
                        & (li.l_linestatus == r.l_linestatus)]
                     .l_quantity.astype(int))
        n = len(grp)
        med = (grp[(n + 1) // 2 - 1] + grp[n // 2]) / 2
        got = (grand + rows[r.l_returnflag] + cols[r.l_linestatus]
               + r.value_nano) / 1e9
        assert abs(got - med) < 2e-9  # four nano roundings


def test_file_clustering_shards_are_time_shuffled():
    """The generator writes pages in index order with random timestamps,
    so shard files must NOT be time-sorted (sortedness well below 1)."""
    t = Q.QUERIES["pages_file_clustering"](SF).to_pandas()
    assert len(t) == 16
    assert (t.n_rows.sum()) == 2000
    assert (t.sortedness_nano < 900_000_000).all()
    # recompute one file by hand
    import glob

    f = sorted(glob.glob(f"{Q.pages_src.ensure_pages(SF)}/*.parquet"))[0]
    ts = pq.read_table(f, columns=["warc_ts"])["warc_ts"] \
        .to_numpy(zero_copy_only=False).astype("datetime64[us]") \
        .astype(np.int64)
    desc = int((np.diff(ts) < 0).sum())
    row = t[t.file == f.split("/")[-1]].iloc[0]
    assert row.n_desc == desc and row.n_rows == len(ts)
