"""Thin generic relational-operator surface over Ray Data.

Filter / project / groupby-agg / sort-limit / distinct / broadcast-join —
the operator vocabulary the reference's analysis notebooks use via pandas
(SURVEY.md §2.2/§2.4/§2.5), re-expressed as streaming Dataset transforms.
Exercised end-to-end by the driver oracle via ``queries.py``.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> Dataset:
    """Read one /root/testdata table, pruning columns at the read (S1)."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def broadcast_join(
    ds: Dataset,
    small: pd.DataFrame,
    on: str,
    how: str = "inner",
    small_cols: list[str] | None = None,
) -> Dataset:
    """Broadcast hash join: the small side is ``ray.put`` once and merged into
    every batch with a pandas hash merge — no shuffle (J1/J2 pattern)."""
    if small_cols:
        small = small[[c for c in {on, *small_cols}]]
    ref = ray.put(small)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(join, batch_format="pandas")


def semi_join_filter(ds: Dataset, col: str, values: list) -> Dataset:
    """Semi-join against a broadcast key set (J3): vectorized is_in mask."""
    vset = pa.array(values)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[col], value_set=vset))

    return ds.map_batches(keep, batch_format="pyarrow")


def anti_join_filter(ds: Dataset, col: str, values: list) -> Dataset:
    """Anti-join against a broadcast key set (D3 sample-exclusion pattern)."""
    vset = pa.array(values)

    def drop(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t[col], value_set=vset)))

    return ds.map_batches(drop, batch_format="pyarrow")


def top_k(ds: Dataset, key: str, k: int, descending: bool = True) -> Dataset:
    """Global top-k (O3): ``sort + limit`` — Ray's sort is a sample-based
    range shuffle; for tiny k over huge inputs prefer a per-batch local top-k
    combiner first (see similarity.brute_force_topk for that pattern)."""
    return ds.sort(key, descending=descending).limit(k)


def distinct(ds: Dataset, cols: list[str]) -> Dataset:
    """Distinct rows over ``cols`` (A8): per-batch local dedup (combiner)
    then a groupby-count reduced back to the key columns."""
    def local(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols).aggregate([])

    from ray.data.aggregate import Count

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(cols)
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda t: t.drop_columns(["_c"]), batch_format="pyarrow")
    )


def floor_to_hour(ts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Tumbling-window key: timestamp floored to the hour (streaming-table
    analogue; oracle: ``date_trunc('hour', ts)``)."""
    return pc.floor_temporal(ts, multiple=1, unit="hour")
