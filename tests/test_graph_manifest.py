"""Partitioned graph materialize: manifests, resume-skip, idempotence."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from newsagency_classification_ray.pipelines.graph import write_partitioned
from newsagency_classification_ray.state.manifest import (
    MANIFEST_NAME,
    incomplete_partitions,
    read_manifest,
)


def make_ds(n=200):
    return ray.data.from_arrow(pa.table({
        "node_id": pa.array([f"node-{i:04d}" for i in range(n)], type=pa.string()),
        "value": pa.array(list(range(n)), type=pa.int64()),
    }))


def read_all(out_dir):
    return pq.read_table(out_dir).sort_by("node_id")


def test_write_partitioned_manifests(tmp_path):
    out = str(tmp_path / "nodes")
    summary = write_partitioned(make_ds(), out, "node_id", num_partitions=4,
                                sort_by=["node_id"])
    assert len(summary["written"]) == 4 and not summary["skipped"]
    total = 0
    for k in range(4):
        m = read_manifest(os.path.join(out, f"part={k}"))
        assert m is not None and m["row_count"] > 0
        total += m["row_count"]
    assert total == 200


def test_resume_skips_complete_partitions(tmp_path):
    out = str(tmp_path / "nodes")
    write_partitioned(make_ds(), out, "node_id", num_partitions=4)
    before = read_all(out)

    # simulate a crash on part=2: drop its manifest (data possibly stale)
    os.remove(os.path.join(out, "part=2", MANIFEST_NAME))
    assert incomplete_partitions(out, [f"part={k}" for k in range(4)]) == ["part=2"]

    summary = write_partitioned(make_ds(), out, "node_id", num_partitions=4)
    assert summary["written"] == ["part=2"]
    assert sorted(summary["skipped"]) == ["part=0", "part=1", "part=3"]
    after = read_all(out)
    assert before.equals(after)  # idempotent rerun


def test_rerun_noop_when_complete(tmp_path):
    out = str(tmp_path / "nodes")
    write_partitioned(make_ds(), out, "node_id", num_partitions=4)
    summary = write_partitioned(make_ds(), out, "node_id", num_partitions=4)
    assert summary["written"] == [] and len(summary["skipped"]) == 4


def test_stale_partials_scrubbed(tmp_path):
    out = str(tmp_path / "nodes")
    write_partitioned(make_ds(), out, "node_id", num_partitions=4)
    pdir = os.path.join(out, "part=1")
    os.remove(os.path.join(pdir, MANIFEST_NAME))
    # plant a stale extra file from the "crashed" run
    shutil.copy(
        next(os.path.join(pdir, f) for f in os.listdir(pdir) if f.endswith(".parquet")),
        os.path.join(pdir, "stale_partial.parquet"),
    )
    write_partitioned(make_ds(), out, "node_id", num_partitions=4)
    assert not os.path.exists(os.path.join(pdir, "stale_partial.parquet"))
    m = read_manifest(pdir)
    total = sum(read_manifest(os.path.join(out, f"part={k}"))["row_count"]
                for k in range(4))
    assert total == 200 and m is not None


def test_content_hash_stable_across_runs(tmp_path):
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    write_partitioned(make_ds(), out_a, "node_id", num_partitions=2)
    write_partitioned(make_ds(), out_b, "node_id", num_partitions=2)
    for k in range(2):
        ma = read_manifest(os.path.join(out_a, f"part={k}"))
        mb = read_manifest(os.path.join(out_b, f"part={k}"))
        assert ma["content_hash"] == mb["content_hash"]


def test_written_partitions_are_sorted_and_complete(tmp_path):
    """North-rule 'sorted graph materialize': every part file holds rows
    sorted by the sort key, and reading all parts back reproduces the
    dataset exactly."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from newsagency_classification_ray.pipelines.graph import write_partitioned

    tbl = pa.table({
        "node_id": pa.array([f"n{i:03d}" for i in range(200)][::-1]),  # reversed
        "weight": pa.array(list(range(200)), type=pa.int64()),
    })
    # multiple input blocks → multiple files per partition dir; sortedness
    # must survive the file split (sorted blocks write in name order)
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = os.path.join(tmp_path, "nodes")
    s = write_partitioned(ds, out, "node_id", num_partitions=4, sort_by=["node_id"])
    assert s["row_count"] == 200

    seen = []
    for k in range(4):
        part = pq.read_table(os.path.join(out, f"part={k}"))
        ids = part["node_id"].to_pylist()
        assert ids == sorted(ids)  # sorted within the partition
        seen.extend(ids)
    assert sorted(seen) == sorted(tbl["node_id"].to_pylist())  # complete, no dups
