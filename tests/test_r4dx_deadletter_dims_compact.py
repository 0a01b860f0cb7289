"""Dead-letter split, dimension-truncation sweep, partition compaction."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.state.manifest import (
    batch_content_hash, compact_partition, read_manifest)

SF = "/root/testdata/sf0.001"


def test_deadletter_split_matches_bruteforce():
    t = Q.QUERIES["events_deadletter_split"](SF).to_pandas() \
        .set_index("route")
    ids = pq.read_table(f"{SF}/events.parquet",
                        columns=["event_id"]).to_pandas() \
        .event_id.astype(np.int64).to_numpy()
    dup_ids = ids[ids % 97 == 0]
    n_dup = len(dup_ids)
    assert int(t.loc["quarantine"].n_distinct_ids) == n_dup
    assert int(t.loc["quarantine"].n_rows) == 2 * n_dup
    assert int(t.loc["clean"].n_distinct_ids) == len(ids) - n_dup
    assert int(t.loc["clean"].n_rows) == len(ids) - n_dup
    # conservation: every feed row routed exactly once
    assert int(t.n_rows.sum()) == len(ids) + n_dup
    assert n_dup > 0  # the simulated redelivery actually fires


def test_dim_sweep_recall_monotone_and_exact_at_full_width():
    t = Q.QUERIES["embeddings_dim_sweep"](SF).to_pandas() \
        .sort_values("n_dims")
    r = t.recall_nano.to_numpy()
    assert (np.diff(r) >= 0).all()  # more dims never hurt, on average
    assert r[-1] == 10 ** 9        # full width reproduces truth exactly
    assert (t.n_hits <= t.n_truth).all()
    d = len(pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["embedding"])["embedding"][0])
    assert list(t.n_dims) == sorted({max(1, d // f)
                                     for f in Q._DIM_SWEEP_FRACS})


def test_compact_partition_preserves_content(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from newsagency_classification_ray.state.manifest import (
        combine_hashes, write_manifest)

    pdir = str(tmp_path / "part=0")
    os.makedirs(pdir)
    t1 = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    t2 = pa.table({"a": [4, 5], "b": ["u", "v"]})
    pqw.write_table(t1, os.path.join(pdir, "f1.parquet"))
    pqw.write_table(t2, os.path.join(pdir, "f2.parquet"))
    h = combine_hashes([batch_content_hash(t1), batch_content_hash(t2)])
    write_manifest(pdir, "part=0", 5, h)

    s = compact_partition(pdir)
    assert s == {"files_before": 2, "files_after": 1, "row_count": 5}
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    assert len(files) == 1
    back = pqw.read_table(files[0])
    assert batch_content_hash(back) == h and len(back) == 5
    m = read_manifest(pdir)
    assert m["content_hash"] == h and m["compacted_from"] == 2
    # idempotent: second call is a no-op
    assert compact_partition(pdir)["files_after"] == 1

    # a corrupted partition is refused
    bad = str(tmp_path / "part=1")
    os.makedirs(bad)
    pqw.write_table(t1, os.path.join(bad, "f1.parquet"))
    pqw.write_table(t2, os.path.join(bad, "f2.parquet"))
    write_manifest(bad, "part=1", 5, h + 1)  # wrong hash
    with pytest.raises(ValueError, match="does not match"):
        compact_partition(bad)
