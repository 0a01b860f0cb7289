"""Arrow IPC roundtrip, bitmap index, Merkle anti-entropy digests."""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.state.manifest import (
    merkle_diff, merkle_tree, write_manifest)

SF = "/root/testdata/sf0.001"


def test_ipc_roundtrip_preserves_census():
    t = Q.QUERIES["docs_ipc_roundtrip"](SF).to_pandas() \
        .set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "n_chars"]).to_pandas()
    g = docs.groupby("source").n_chars.agg(["count", "sum"])
    assert set(t.index) == set(g.index)
    for s, row in g.iterrows():
        assert int(t.loc[s].n_docs) == int(row["count"])
        assert int(t.loc[s].chars_sum) == int(row["sum"])
    # the sink really produced multiple IPC shards
    idir = Q._ipc_docs_dir(SF)
    assert len(glob.glob(os.path.join(idir, "*.arrow"))) >= 1


def test_bitmap_index_matches_bruteforce():
    t = Q.QUERIES["orders_bitmap_index"](SF).to_pandas() \
        .set_index("status")
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_orderstatus",
                               "o_orderpriority"]).to_pandas() \
        .sort_values("o_orderkey")
    st = o.o_orderstatus.to_numpy()
    pr = o.o_orderpriority.to_numpy()
    for s in np.unique(st):
        bits = st == s
        row = t.loc[s]
        assert int(row.n_bits) == len(bits)
        assert int(row.n_set) == int(bits.sum())
        assert int(row.n_runs) == 1 + int((bits[1:] != bits[:-1]).sum())
        assert int(row.and_urgent_n) == int(
            (bits & (pr == "1-URGENT")).sum())
    # bitmaps partition the domain: set bits sum to n
    assert int(t.n_set.sum()) == len(o)


def test_merkle_tree_and_diff(tmp_path):
    a = str(tmp_path / "a")
    for k, (h, n) in [("part=0", (11, 5)), ("part=1", (22, 7)),
                      ("part=2", (33, 9))]:
        os.makedirs(os.path.join(a, k))
        write_manifest(os.path.join(a, k), k, n, h)
    b = str(tmp_path / "b")
    shutil.copytree(a, b)

    ta, tb = merkle_tree(a), merkle_tree(b)
    assert ta["root"] == tb["root"]
    assert merkle_diff(ta, tb) == {"only_a": [], "only_b": [],
                                   "changed": []}

    # tamper one partition's hash → diff pinpoints exactly it
    mpath = os.path.join(b, "part=1", "_manifest.json")
    doc = json.load(open(mpath))
    doc["content_hash"] = 999
    json.dump(doc, open(mpath, "w"))
    tb2 = merkle_tree(b)
    assert tb2["root"] != ta["root"]
    d = merkle_diff(ta, tb2)
    assert d["changed"] == ["part=1"] and not d["only_a"] \
        and not d["only_b"]

    # add a partition only to b
    os.makedirs(os.path.join(b, "part=3"))
    write_manifest(os.path.join(b, "part=3"), "part=3", 1, 44)
    d2 = merkle_diff(ta, merkle_tree(b))
    assert d2["only_b"] == ["part=3"] and d2["changed"] == ["part=1"]


def test_merkle_on_real_graph_output(ray_session):
    from newsagency_classification_ray.pipelines import kg
    from newsagency_classification_ray.sources.pages import ensure_pages

    pages = ensure_pages(SF)
    wd = "/tmp/nacr_merkle_graph"
    shutil.rmtree(wd, ignore_errors=True)
    kg.flagship_resumable(pages, wd, num_partitions=4)
    ndir = os.path.join(wd, "graph", "nodes")
    t1 = merkle_tree(ndir)
    assert len(t1["leaves"]) == 4
    # a rerun (no-op by manifests) leaves the digest identical
    kg.flagship_resumable(pages, wd, num_partitions=4)
    assert merkle_tree(ndir)["root"] == t1["root"]
