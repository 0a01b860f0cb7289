"""Sorted, partitioned graph materialization with per-partition lineage.

Implements the north_rule's "sorted graph materialize into partitioned Parquet
node/edge tables with per-partition lineage manifests and checkpointed
resume" (reference analogue: GEXF export ``network_analysis.ipynb`` cells
59-60, replaced by Parquet tables per SURVEY.md §2.1 S10).

Layout::

    out_root/
      nodes/part=<k>/*.parquet + _manifest.json     # k = hash(node_id) % P
      edges/part=<k>/*.parquet + _manifest.json     # k = hash(src) % P
      mentions/part=<k>/*.parquet + _manifest.json  # k = hash(url) % P

Each partition is written only when absent (manifest check) → a rerun after a
crash recomputes only missing partitions; manifests carry row counts +
order-insensitive content hashes so idempotence is verifiable.
"""

from __future__ import annotations

import os
import time
import zlib

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..state.manifest import (
    batch_content_hash,
    combine_hashes,
    incomplete_partitions,
    write_manifest,
)


def _crc_bucket_col(col: pa.ChunkedArray | pa.Array, buckets: int) -> pa.Array:
    return pa.array(
        [zlib.crc32(str(v).encode()) % buckets for v in col.to_pylist()], type=pa.int32()
    )


def write_partitioned(
    ds: Dataset,
    out_dir: str,
    key_col: str,
    *,
    num_partitions: int = 8,
    sort_by: list[str] | None = None,
    input_fragments: list[str] | None = None,
) -> dict:
    """Sort + hash-partition + write with manifests; skip complete partitions.

    Returns summary {written: [...], skipped: [...], row_count}.
    The partition column is a deterministic crc32 bucket of ``key_col`` so a
    resumed run maps every row to the same partition. Sorting happens *within*
    the written files via the global ``ds.sort`` before the partitioned write.
    """
    t0 = time.time()
    keys = [f"part={k}" for k in range(num_partitions)]
    todo = set(incomplete_partitions(out_dir, keys))
    skipped = sorted(set(keys) - todo)
    if not todo:
        return {"written": [], "skipped": skipped, "row_count": 0}
    # scrub stale partials from a crashed run (no manifest ⇒ not published)
    import shutil

    for k in todo:
        pdir = os.path.join(out_dir, k)
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column("part", _crc_bucket_col(t[key_col], num_partitions))

    parted = ds.map_batches(add_part, batch_format="pyarrow")
    todo_ids = [int(k.split("=")[1]) for k in todo]
    parted = parted.map_batches(
        lambda t, ids=tuple(todo_ids): t.filter(
            pc.is_in(t["part"], value_set=pa.array(ids, type=pa.int32()))
        ),
        batch_format="pyarrow",
    )
    if sort_by:
        parted = parted.sort(sort_by)
    parted.write_parquet(out_dir, partition_cols=["part"])

    # manifest pass: small per-partition aggregate (row count + content hash)
    written = []
    total = 0
    for k in sorted(todo_ids):
        pdir = os.path.join(out_dir, f"part={k}")
        if not os.path.isdir(pdir):
            os.makedirs(pdir, exist_ok=True)
            write_manifest(pdir, f"part={k}", 0, 0, input_fragments, time.time() - t0)
            written.append(f"part={k}")
            continue
        import pyarrow.parquet as pq

        tbl = pq.read_table(pdir)
        h = combine_hashes([batch_content_hash(tbl)])
        write_manifest(pdir, f"part={k}", len(tbl), h, input_fragments, time.time() - t0)
        written.append(f"part={k}")
        total += len(tbl)
    return {"written": written, "skipped": skipped, "row_count": total}


def materialize_graph(
    nodes: Dataset,
    edges: Dataset,
    mentions: Dataset | None,
    out_root: str,
    *,
    num_partitions: int = 8,
    input_fragments: list[str] | None = None,
) -> dict:
    """Write the full graph (nodes sorted by node_id, edges by (src,dst))."""
    summary = {}
    summary["nodes"] = write_partitioned(
        nodes, os.path.join(out_root, "nodes"), "node_id",
        num_partitions=num_partitions, sort_by=["node_id"],
        input_fragments=input_fragments,
    )
    summary["edges"] = write_partitioned(
        edges, os.path.join(out_root, "edges"), "src",
        num_partitions=num_partitions, sort_by=["src", "dst", "year"],
        input_fragments=input_fragments,
    )
    if mentions is not None:
        summary["mentions"] = write_partitioned(
            mentions, os.path.join(out_root, "mentions"), "url",
            num_partitions=num_partitions, sort_by=None,
            input_fragments=input_fragments,
        )
    return summary
