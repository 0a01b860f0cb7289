"""Filtered ANN, lineage-keyed result cache."""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.state.result_cache import (
    cached_result, evict_stale, input_fingerprint)

SF = "/root/testdata/sf0.001"


def test_filtered_ann_matches_bruteforce_and_respects_filter():
    t = Q.QUERIES["embeddings_filtered_ann"](SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    lab = emb.set_index("vec_id").label
    # every returned vector satisfies the predicate
    assert (lab.loc[t.vec_id].to_numpy() == Q._FANN_LABEL).all()
    # exact per-query check against numpy
    mat = np.asarray(list(emb.embedding), dtype=np.float64)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb.vec_id.to_numpy()
    keep = emb.label.to_numpy() == Q._FANN_LABEL
    for qid in Q._ANN_QUERY_IDS:
        q = norm[ids == qid][0]
        col = norm[keep] @ q
        sub_ids = ids[keep]
        col[sub_ids == qid] = -np.inf
        order = np.lexsort((sub_ids, -col))[:Q._ANN_K]
        order = order[np.isfinite(col[order])]
        got = t[t.query_id == qid].sort_values("rank").vec_id.tolist()
        assert got == [int(sub_ids[x]) for x in order]
    # the filter genuinely constrains: differs from unfiltered top-k
    full = Q.QUERIES["ann_topk"](SF).to_pandas()
    assert set(map(tuple, t[["query_id", "vec_id"]].values)) != \
        set(map(tuple, full[["query_id", "vec_id"]].values))


def test_result_cache_hit_miss_and_eviction(tmp_path):
    root = str(tmp_path / "cache")
    inp = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({"a": [1, 2, 3]}), inp)
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return pa.table({"s": [6]})

    t1, hit1 = cached_result(root, "sum_a", [inp], compute)
    assert not hit1 and calls["n"] == 1 and t1["s"][0].as_py() == 6
    t2, hit2 = cached_result(root, "sum_a", [inp], compute)
    assert hit2 and calls["n"] == 1  # memoized: compute not re-invoked
    assert t2.equals(t1)

    # touching the input changes the fingerprint → miss, then old entry
    # is evictable
    fp_old = input_fingerprint([inp])
    time.sleep(0.01)
    pq.write_table(pa.table({"a": [1, 2, 3, 4]}), inp)
    assert input_fingerprint([inp]) != fp_old
    _, hit3 = cached_result(root, "sum_a", [inp], compute)
    assert not hit3 and calls["n"] == 2
    removed = evict_stale(root, "sum_a", [inp])
    assert removed == [f"{fp_old}.parquet"]
    assert sorted(os.listdir(os.path.join(root, "sum_a"))) == \
        [f"{input_fingerprint([inp])}.parquet"]
