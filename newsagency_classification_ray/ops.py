"""Thin generic relational-operator surface over Ray Data.

Filter / project / groupby-agg / sort-limit / distinct / broadcast-join —
the operator vocabulary the reference's analysis notebooks use via pandas
(SURVEY.md §2.2/§2.4/§2.5), re-expressed as streaming Dataset transforms.
Exercised end-to-end by the driver oracle via ``queries.py``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data import Dataset


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               filter: "pc.Expression | None" = None) -> Dataset:
    """Read one /root/testdata table, pruning columns at the read (S1).
    ``filter`` (a ``pyarrow.compute`` field expression) rides into the
    parquet fragment scanner so non-matching row groups never leave
    storage — row pruning at the read, the S1 discipline extended to rows."""
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=columns, filter=filter)


def broadcast_join(
    ds: Dataset,
    small: "pd.DataFrame | pa.Table",
    on: str,
    how: str = "inner",
    small_cols: list[str] | None = None,
) -> Dataset:
    """Broadcast hash join: the small side is ``ray.put`` once and gathered
    into every batch — no shuffle (J1/J2 pattern). Arrow-native when the
    small side's keys are UNIQUE (the dimension-table case): one
    ``pc.index_in`` probe + one ``take`` per payload column, zero
    pandas round-trip. Duplicate small-side keys (one-to-many) fall back to
    a per-batch pandas merge. ``how`` is 'inner' or 'left'."""
    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join: how must be 'inner'|'left', got {how!r}")
    small_t = pa.Table.from_pandas(small, preserve_index=False) \
        if isinstance(small, pd.DataFrame) else small
    if small_cols:
        small_t = small_t.select([c for c in dict.fromkeys([on, *small_cols])])
    keys = small_t[on].combine_chunks()
    unique_keys = pc.count_distinct(keys).as_py() == len(small_t)
    ref = ray.put(small_t)

    if not unique_keys:
        # one-to-many small side: Acero's in-memory hash join, still
        # Arrow-native (no pandas round-trip). Two determinism guards:
        # Acero's multi-threaded hash join does NOT preserve left-row
        # order, so run it single-threaded (per-batch tables are small
        # enough that this costs nothing and keeps output deterministic);
        # and Acero ERRORS on overlapping non-key column names where the
        # old pandas merge silently suffixed — fail fast with a clear
        # message instead.
        pa_how = "inner" if how == "inner" else "left outer"
        small_names = set(small_t.column_names) - {on}

        def join_arrow(batch: pa.Table) -> pa.Table:
            overlap = small_names & set(batch.column_names)
            if overlap:  # checked per batch to avoid a driver-side schema fetch
                raise ValueError(
                    f"broadcast_join: non-key columns {sorted(overlap)} exist "
                    f"on both sides; rename or pass small_cols= to project "
                    f"them out")
            return batch.join(ray.get(ref), keys=on, join_type=pa_how,
                              use_threads=False)

        return ds.map_batches(join_arrow, batch_format="pyarrow")

    payload = [c for c in small_t.column_names if c != on]

    def join(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        idx = pc.index_in(t[on], value_set=s[on].combine_chunks())
        if how == "inner":
            hit = pc.is_valid(idx)
            if not pc.all(hit).as_py():
                t = t.filter(hit)
                idx = idx.filter(hit)
        cols = {c: t[c] for c in t.column_names}
        for c in payload:  # null idx (left-join miss) gathers as null
            cols[c] = s[c].take(idx)
        return pa.table(cols)

    return ds.map_batches(join, batch_format="pyarrow")


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


def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_col: str | None = None,
    bucket_us: int | None = None,
    hot_key_limit: int = 5_000_000,
    direction: str = "backward",
) -> Dataset:
    """As-of join (an operator Ray Data lacks): for every left row, attach
    the right row with the greatest ``right_ts <= left_ts`` within the same
    key; unmatched left rows keep nulls. Ties on ``right_ts`` break to the
    greatest ``tie_col`` (default: first of ``right_cols``) so the result is
    deterministic — the oracle encodes the same rule with ``row_number()
    OVER (ORDER BY ts DESC, tie DESC)``.

    ``direction`` selects the match rule: ``"backward"`` (default, above),
    ``"forward"`` (smallest ``right_ts >= left_ts``; ties on ``right_ts``
    still break to the greatest ``tie_col``), or ``"nearest"`` (whichever
    of the backward/forward candidates has the smaller ``|right_ts -
    left_ts|``; an exact distance tie prefers the BACKWARD side, mirroring
    ``ORDER BY abs(dt), right_ts <= left_ts DESC, tie DESC``). The
    range-partitioned hot-key merge (``bucket_us``) carries only the
    latest-earlier boundary row and is therefore backward-only; forward /
    nearest with ``bucket_us`` raises.

    Null semantics: a left row with a null timestamp is emitted unmatched
    (null right columns); right rows with null timestamps never match —
    mirroring SQL, where ``NULL <= NULL`` is not true. Keys are cast to
    int64 (integer entity ids required — hash a string key to int64 first);
    null keys group together and match each other, unlike SQL.

    Shape: both sides project to a common null-padded schema, union, and
    shuffle ONCE on the key; each key group does one in-group sort of the
    right side + one vectorized ``np.searchsorted`` sweep over the left
    timestamps — no per-row Python in the match. Salting does NOT apply
    (as-of needs every right row of the key visible), so a pathologically
    hot key is handled by a RANGE-PARTITIONED merge instead: pass
    ``bucket_us`` to shuffle on ``(key, ts // bucket_us)`` — each right
    row lands in its own time bucket, a per-(key, bucket) "latest right
    row" boundary table is reduced first (one row per non-empty bucket),
    and the latest boundary row STRICTLY BEFORE each left bucket is carried
    in as a sentinel candidate, so every group holds only one bucket's rows
    plus at most one carry row. Without ``bucket_us``, a key group larger
    than ``hot_key_limit`` raises (enforced, not assumed) with instructions
    to re-run bucketed.
    """
    import numpy as np

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if direction != "backward" and bucket_us is not None:
        raise ValueError(
            "asof_join: bucket_us (range-partitioned hot-key merge) carries "
            "only the latest-EARLIER boundary row per bucket and is "
            "backward-only; run forward/nearest unbucketed or mirror the "
            "carry for the other direction")

    NAT = np.iinfo(np.int64).min
    tie_col = tie_col or right_cols[0]
    l_schema = left.schema()
    l_names = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_schema = right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    out_right = [c for c in right_cols]

    def _ts_i64(ts: pa.ChunkedArray | pa.Array) -> "np.ndarray":
        return ts.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)

    def _bkt_arr(ts_i: "np.ndarray") -> pa.Array:
        # null ts (NAT sentinel) -> bucket 0; those rows never match anyway
        return pa.array(np.where(ts_i == NAT, 0, ts_i // bucket_us), type=pa.int64())

    def proj_left(t: pa.Table) -> pa.Table:
        n = len(t)
        ts = pc.cast(t[left_ts], pa.timestamp("us"))
        cols = {
            "_key": pc.cast(t[left_key], pa.int64()),
            "_ts": ts,
            "_side": pa.array([0] * n, type=pa.int8()),
        }
        if bucket_us is not None:
            cols["_bkt"] = _bkt_arr(_ts_i64(ts))
        for c in l_names:
            cols["l_" + c] = t[c]
        for c in out_right:
            cols["r_" + c] = pa.nulls(n, type=r_types[c])
        return pa.table(cols)

    def proj_right(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[right_ts], pa.timestamp("us"))
        valid = pc.is_valid(ts)
        if not pc.all(valid).as_py():  # null right ts never matches (SQL NULL<=NULL)
            t = t.filter(valid)
            ts = pc.cast(t[right_ts], pa.timestamp("us"))
        n = len(t)
        cols = {
            "_key": pc.cast(t[right_key], pa.int64()),
            "_ts": ts,
            "_side": pa.array([1] * n, type=pa.int8()),
        }
        if bucket_us is not None:
            cols["_bkt"] = _bkt_arr(_ts_i64(ts))
        for c in l_names:
            cols["l_" + c] = pa.nulls(n, type=l_types[c])
        for c in out_right:
            cols["r_" + c] = t[c]
        return pa.table(cols)

    def match(g: pa.Table) -> pa.Table:
        if bucket_us is None and len(g) > hot_key_limit:
            raise ValueError(
                f"asof_join: a key group holds {len(g)} rows "
                f"(> hot_key_limit={hot_key_limit}); re-run with bucket_us=... "
                "to use the range-partitioned merge for hot keys"
            )
        side = g["_side"].to_numpy(zero_copy_only=False)
        ts = _ts_i64(g["_ts"])
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side == 1)
        out = {("l_" + c): g["l_" + c].take(pa.array(l_idx)) for c in l_names}
        if r_idx.size == 0:
            for c in out_right:
                out["r_" + c] = pa.nulls(l_idx.size, type=r_types[c])
        else:
            tie = g["r_" + tie_col].take(pa.array(r_idx)).to_numpy(zero_copy_only=False)
            order = np.lexsort((tie, ts[r_idx]))  # ts asc, tie asc
            r_sorted = r_idx[order]
            r_ts = ts[r_sorted]
            l_ts = ts[l_idx]
            lok = l_ts != NAT  # null left ts -> unmatched

            def _back() -> "np.ndarray":
                pos = np.searchsorted(r_ts, l_ts, side="right") - 1
                return np.where((pos >= 0) & lok, pos, -1)

            def _fwd() -> "np.ndarray":
                j = np.searchsorted(r_ts, l_ts, side="left")
                ok = (j < r_ts.size) & lok
                jc = np.clip(j, 0, r_ts.size - 1)
                # the sort above put the greatest tie LAST within an
                # equal-ts run, so jump to the run's last index
                j_last = np.searchsorted(r_ts, r_ts[jc], side="right") - 1
                return np.where(ok, j_last, -1)

            if direction == "backward":
                pos = _back()
            elif direction == "forward":
                pos = _fwd()
            else:  # nearest: smaller |dt| wins, exact tie -> backward
                pb, pf = _back(), _fwd()
                big = np.iinfo(np.int64).max
                db = np.where(pb >= 0, l_ts - r_ts[np.clip(pb, 0, None)], big)
                df = np.where(pf >= 0, r_ts[np.clip(pf, 0, None)] - l_ts, big)
                pos = np.where((pb < 0) & (pf < 0), -1,
                               np.where(db <= df, pb, pf))
            matched = pos >= 0
            take = np.where(matched, r_sorted[np.clip(pos, 0, None)], -1)
            take_arr = pa.array([int(x) if x >= 0 else None for x in take],
                                type=pa.int64())
            for c in out_right:
                out["r_" + c] = g["r_" + c].take(take_arr)
        return pa.table(out).rename_columns(l_names + out_right)

    l_proj = left.map_batches(proj_left, batch_format="pyarrow")
    r_proj = right.map_batches(proj_right, batch_format="pyarrow")

    if bucket_us is None:
        return l_proj.union(r_proj).groupby("_key").map_groups(
            match, batch_format="pyarrow")

    # ---- range-partitioned merge: shuffle on (key, ts bucket) -------------
    # Rows in a later bucket have strictly greater ts than every row in an
    # earlier bucket, so the as-of candidate for a left row is either an
    # in-bucket right row or the (ts, tie)-argmax row of the LATEST earlier
    # non-empty bucket — reduce that boundary table first, then carry it in.

    def local_latest(t: pa.Table) -> pa.Table:
        # per-batch combiner: keep the (ts, tie)-argmax row per (key, bkt)
        if len(t) == 0:
            return t
        k = t["_key"].to_numpy(zero_copy_only=False)
        b = t["_bkt"].to_numpy(zero_copy_only=False)
        ts = _ts_i64(t["_ts"])
        tie = t["r_" + tie_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tie, ts, b, k))
        kk, bb = k[order], b[order]
        is_last = np.concatenate([(kk[1:] != kk[:-1]) | (bb[1:] != bb[:-1]), [True]])
        return t.take(pa.array(order[np.flatnonzero(is_last)]))

    bounds = r_proj.map_batches(local_latest, batch_format="pyarrow").groupby(
        ["_key", "_bkt"]
    ).map_groups(local_latest, batch_format="pyarrow")

    def mark(t: pa.Table) -> pa.Table:
        # distinct left (key, bucket) as null-padded side-0 marker rows so
        # they can union with the boundary rows for the per-key carry scan
        n = len(t)
        cols = {
            "_key": t["_key"],
            "_ts": pa.nulls(n, type=pa.timestamp("us")),
            "_side": pa.array([0] * n, type=pa.int8()),
            "_bkt": t["_bkt"],
        }
        for c in l_names:
            cols["l_" + c] = pa.nulls(n, type=l_types[c])
        for c in out_right:
            cols["r_" + c] = pa.nulls(n, type=r_types[c])
        return pa.table(cols)

    lbkts = distinct(l_proj, ["_key", "_bkt"]).map_batches(
        mark, batch_format="pyarrow")

    def assign_carry(g: pa.Table) -> pa.Table:
        # per key: for each left bucket, re-emit the latest boundary row
        # with a STRICTLY smaller bucket, retargeted to that left bucket
        side = g["_side"].to_numpy(zero_copy_only=False)
        bkt = g["_bkt"].to_numpy(zero_copy_only=False)
        lb = np.unique(bkt[side == 0])
        ri = np.flatnonzero(side == 1)
        if ri.size == 0 or lb.size == 0:
            return g.slice(0, 0)
        order = np.argsort(bkt[ri], kind="stable")
        ri_sorted = ri[order]
        pos = np.searchsorted(bkt[ri_sorted], lb, side="left") - 1
        ok = pos >= 0
        if not ok.any():
            return g.slice(0, 0)
        out = g.take(pa.array(ri_sorted[pos[ok]]))
        i = out.schema.get_field_index("_bkt")
        return out.set_column(i, "_bkt", pa.array(lb[ok], type=pa.int64()))

    carry = bounds.union(lbkts).groupby("_key").map_groups(
        assign_carry, batch_format="pyarrow")
    return l_proj.union(r_proj).union(carry).groupby(["_key", "_bkt"]).map_groups(
        match, batch_format="pyarrow")


def range_join_pairs(
    left: Dataset,
    right: Dataset,
    *,
    left_id: str,
    right_id: str,
    left_ts: str,
    right_ts: str,
    max_dt_us: int,
) -> Dataset:
    """Pure range join (no equi key): all (left_id, right_id) pairs with
    ``|left_ts - right_ts| <= max_dt_us`` — the time-proximity join Ray Data
    lacks. Bucket width = the radius: every RIGHT row lands in exactly one
    time bucket; every LEFT row is replicated to its own and both adjacent
    buckets, so each qualifying pair meets in exactly ONE group (the right
    row's bucket) — no post-dedup shuffle. Within a group the right side is
    sorted by timestamp once and each left row's matches are located with
    two ``np.searchsorted`` bounds, emitted via ``np.repeat`` + vectorized
    range-concatenation — memory is O(group) + O(output pairs), never the
    dense |L|×|R| candidate square (which at dense streams would be a
    10^8+-cell temporary per group). Replication factor is a constant 3 on
    the left side only, and bucket keys are time-uniform, so the exchange
    is skew-free by construction. Bucketing uses int64 floor division, which
    rounds toward -inf on BOTH sides consistently, so pre-epoch (negative)
    timestamps bucket correctly too.
    """
    import numpy as np

    if max_dt_us <= 0:
        raise ValueError(f"range_join_pairs: max_dt_us must be > 0, got {max_dt_us}")

    def proj(ds: Dataset, id_col: str, ts_col: str, side: int) -> Dataset:
        def fn(t: pa.Table) -> pa.Table:
            ts = pc.cast(t[ts_col], pa.timestamp("us"))
            ts_i = ts.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            bucket = ts_i // max_dt_us
            ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
            if side == 0:  # left: replicate to bucket-1, bucket, bucket+1
                b = np.concatenate([bucket - 1, bucket, bucket + 1])
                i = np.tile(ids, 3)
                tvals = np.tile(ts_i, 3)
            else:
                b, i, tvals = bucket, ids, ts_i
            return pa.table({
                "bucket": pa.array(b, type=pa.int64()),
                "id": pa.array(i, type=pa.int64()),
                "ts_us": pa.array(tvals, type=pa.int64()),
                "side": pa.array(np.full(len(i), side, dtype=np.int8)),
            })
        return ds.map_batches(fn, batch_format="pyarrow")

    both = proj(left, left_id, left_ts, 0).union(proj(right, right_id, right_ts, 1))

    out_l = left_id
    out_r = right_id if right_id != left_id else right_id + "_right"

    def pairs(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        li, ri = np.flatnonzero(side == 0), np.flatnonzero(side == 1)
        empty = pa.table({out_l: pa.array([], type=pa.int64()),
                          out_r: pa.array([], type=pa.int64())})
        if li.size == 0 or ri.size == 0:
            return empty
        # sorted window sweep: right side sorted by ts, each left row's
        # match range found with two binary searches, ranges materialized
        # with repeat + cumsum arithmetic — no |L|x|R| temporary
        r_order = np.argsort(ts[ri], kind="stable")
        r_ids = ids[ri][r_order]
        r_ts = ts[ri][r_order]
        l_ts = ts[li]
        lo = np.searchsorted(r_ts, l_ts - max_dt_us, side="left")
        hi = np.searchsorted(r_ts, l_ts + max_dt_us, side="right")
        cnt = hi - lo
        keep = cnt > 0
        if not keep.any():
            return empty
        l_ids_k = ids[li][keep]
        lo_k = lo[keep]
        cnt_k = cnt[keep]
        total = int(cnt_k.sum())
        left_out = np.repeat(l_ids_k, cnt_k)
        # right index for pair j within left row i: lo_k[i] + (j - row_start)
        row_start = np.repeat(np.cumsum(cnt_k) - cnt_k, cnt_k)
        right_out = r_ids[np.repeat(lo_k, cnt_k) + (np.arange(total) - row_start)]
        return pa.table({out_l: pa.array(left_out, type=pa.int64()),
                         out_r: pa.array(right_out, type=pa.int64())})

    return both.groupby("bucket").map_groups(pairs, batch_format="pyarrow")


def group_top_k(
    ds: Dataset,
    group_col: str,
    value_col: str,
    k: int,
    *,
    id_col: str,
    descending: bool = True,
) -> Dataset:
    """Top-k rows per group by ``value_col`` (ties broken by ``id_col``
    ascending — deterministic, mirrors ``row_number() OVER (PARTITION BY g
    ORDER BY v DESC, id)``). Per-batch local top-k (combiner) keeps the
    group shuffle at O(blocks·k) rows per group instead of the full table.
    """
    import numpy as np

    def local(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        i = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, -v if descending else v, g))
        gs = g[order]
        starts = np.flatnonzero(np.concatenate(([True], gs[1:] != gs[:-1])))
        ends = np.append(starts[1:], len(gs))
        keep = np.concatenate([order[s:min(s + k, e)] for s, e in zip(starts, ends)])
        return t.take(keep)

    def final(grp: pa.Table) -> pa.Table:
        v = grp[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        i = grp[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, -v if descending else v))[: min(k, len(grp))]
        return grp.take(order)

    return ds.map_batches(local, batch_format="pyarrow").groupby(
        group_col
    ).map_groups(final, batch_format="pyarrow")


def uniform_group_sample(
    ds: Dataset, group_col: str, n: int, id_col: str = "doc_id"
) -> Dataset:
    """O5: standalone deterministic uniform n-per-group sampler (reference
    ``sampling.ipynb`` cells 78-79 ``groupby().sample(n)``, made
    cross-engine-stable): rank rows inside each group by a multiplicative
    hash of the id (Knuth 2654435761 mod 2^32, uniform wrt any natural row
    order) with the id as total-order tie-break, keep the n smallest.
    Oracle-equivalent: ``row_number() OVER (PARTITION BY g ORDER BY
    (id*2654435761)%4294967296, id) <= n``.
    """
    import numpy as np

    def sample(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # hash in uint64: int64 silently wraps (with warnings) for
        # ids >= ~3.5e9 while the oracle's BIGINT math does not; since
        # 2^32 | 2^64 the uint64 product mod 2^32 is exact for all ids
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        order = np.lexsort((ids, h))[: min(n, len(ids))]
        return g.take(order)

    return ds.groupby(group_col).map_groups(sample, batch_format="pyarrow")


def floor_to_hour(ts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Tumbling-window key: timestamp floored to the hour (streaming-table
    analogue; oracle: ``date_trunc('hour', ts)``)."""
    return pc.floor_temporal(ts, multiple=1, unit="hour")


def _join_parts() -> int:
    """Partition count for joins/compaction, adapted to the CPU budget."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(16, cpus // 4))


def _compact(ds: Dataset, parts: int | None = None) -> Dataset:
    """Re-slice a table into TYPED blocks before feeding it to a join.

    Ray's hash-aggregate/join operators emit SCHEMA-LESS empty blocks for
    unoccupied hash partitions; when such a block leads a downstream join's
    schema broadcast, that join's empty partitions build zero-column tables
    and pyarrow fails with 'No match for FieldRef.Name(...)'. Repartition
    re-slices rows out of typed tables, so every resulting block — empty or
    not — carries the schema. Needed on any join input that descends from a
    groupby/join with fewer occupied keys than partitions (the node-scale
    iterables inside the graph ops); one local split/merge, no keyed
    shuffle.
    """
    return ds.repartition(parts or _join_parts())


def hash_join(
    left: Dataset,
    right: Dataset,
    on: tuple[str, ...],
    how: str = "inner",
    num_partitions: int | None = None,
    right_on: tuple[str, ...] | None = None,
) -> Dataset:
    """Distributed hash join (both sides large — contrast
    :func:`broadcast_join` for small dimension tables). Partition count
    adapts to the session CPU budget: Ray's join spawns that many aggregator
    actors per join, and over-provisioning starves small sessions.

    Known Ray limitation (2.49): if an input side delivers ZERO blocks, the
    aggregator builds zero-column partition tables and Acero raises
    ArrowInvalid ('No match ... FieldRef'). Callers whose sides can
    legitimately drain (iterative frontiers, filtered candidate sets) must
    materialize + early-exit on empty first — see :func:`k_hop`."""
    if num_partitions is None:
        # measured sweet spot at this scale: ~cpus/4 (more partitions just
        # spin up more aggregator actors than the data feeds)
        num_partitions = _join_parts()
    return left.join(right, how, num_partitions, on=on, right_on=right_on)


def hash_join_sized(
    left: Dataset,
    right: Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    how: str = "inner",
) -> Dataset:
    """:func:`hash_join` with the partition count clamped to the RIGHT
    side's (materialized) cardinality. Second known Ray 2.49 hash-join
    limitation, sibling of the zero-block one above: a side SPARSER than
    the partition count (rows < partitions) can leave a partition with no
    schema-carrying bundle, and the aggregator's finalize then joins
    against a zero-column table (ArrowInvalid 'No match ... FieldRef').
    Clamping to ceil(rows/4) keeps every partition fed at small scale and
    leaves the CPU-adaptive default untouched at real scale (any right
    side with ≥ 4×cpus/4 rows). Use when the right side can be filtered
    near-empty (e.g. a region-restricted dimension probe); the right side
    must still be non-empty, per the zero-block caveat above — EXCEPT on
    the tiny-side broadcast path below, which handles empty right sides
    gracefully (anti keeps everything, inner/semi keep nothing).

    Tiny-side broadcast path: clamping alone is NOT sufficient — at ~20
    rows over 5 partitions the key hash can still leave a partition with
    zero rows and finalize dies the same way (observed: q5's region-filtered
    supplier side at sf0.01). When the materialized right side is small
    enough that a shuffle buys nothing (< 32 rows per would-be partition),
    single-key inner joins reroute through :func:`broadcast_join` (Acero /
    index_in probe inside ``map_batches`` — no partitioning to go wrong)
    and anti/semi joins become a vectorized ``is_in`` filter. Above the
    threshold — i.e. at real scale — the distributed Ray join runs
    unchanged. Falls back to the Ray join when the sides share non-key
    column names (the broadcast probe would need a suffixing rule the
    callers don't rely on)."""
    right = right.materialize()
    n = right.count()
    rk = (right_on or on)[0]
    lk = on[0]
    if (len(on) == 1 and n <= 32 * _join_parts()
            and how in ("inner", "left_anti", "left_semi", "left_outer")):
        bt = [b for b in right.iter_batches(batch_format="pyarrow") if len(b)]
        small_t = pa.concat_tables(bt, promote_options="default") if bt else None
        if how in ("left_anti", "left_semi"):
            if small_t is None:
                return left if how == "left_anti" else left.map_batches(
                    lambda t: t.slice(0, 0), batch_format="pyarrow")
            keys = pc.unique(small_t[rk].combine_chunks())

            def filt(t: pa.Table) -> pa.Table:
                hit = pc.is_in(t[lk], value_set=keys)
                return t.filter(
                    pc.invert(hit) if how == "left_anti" else hit)

            return left.map_batches(filt, batch_format="pyarrow")
        if small_t is None:
            if how == "inner":
                return left.map_batches(lambda t: t.slice(0, 0),
                                        batch_format="pyarrow")
            # left_outer against an empty right: keep every left row with
            # null right columns — synthesize a typed empty small side so
            # the broadcast probe below emits the nulls (needs the right
            # schema; Ray drops it on all-empty datasets, so fall through
            # to the distributed join if it is gone).
            sch = getattr(right.schema(), "base_schema", None)
            if sch is None:
                parts = max(1, min(_join_parts(), (n + 3) // 4))
                return hash_join(left, right, on, how, parts, right_on)
            small_t = sch.empty_table()
        overlap = (set(small_t.column_names) - {rk}) & set(left.schema().names)
        if not overlap:
            if rk != lk:
                small_t = small_t.rename_columns(
                    [lk if c == rk else c for c in small_t.column_names])
            return broadcast_join(
                left, small_t, on=lk,
                how="inner" if how == "inner" else "left")
    parts = max(1, min(_join_parts(), (n + 3) // 4))
    return hash_join(left, right, on, how, parts, right_on)


# --------------------------------------------------------------------------
# HyperLogLog approximate distinct-count (sketch aggregate)
# --------------------------------------------------------------------------

class HyperLogLog:
    """Fixed-width HLL sketch (2^p registers, numpy-vectorized updates).

    The sketch shape every approximate aggregate in this engine follows:
    per-batch vectorized accumulate → tiny fixed-size state through the
    merge → driver-side finalize. Standard HLL with the small-range linear
    counting correction; ~1.04/sqrt(m) relative error (p=12 → ~1.6 %).
    """

    def __init__(self, p: int = 12):
        import numpy as np

        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self._np = np

    def add_hashes(self, h: "np.ndarray") -> None:  # noqa: F821
        np = self._np
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1, vectorized via log2
        fl = np.floor(np.log2(rest.astype(np.float64) + 1.0))
        rank = (64 - fl).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        self._np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        np = self._np
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.power(2.0, -self.registers.astype(np.float64)).sum()
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting, small range
        return float(est)


def ktruss(edges: Dataset, *, src: str = "u", dst: str = "v",
           min_support: int = 2, max_rounds: int = 64,
           edge_limit: int = 4096) -> Dataset | pa.Table:
    """k-truss (k = min_support + 2) of an undirected simple graph by
    iterative support peeling: drop every edge contained in fewer than
    ``min_support`` triangles of the CURRENT subgraph, repeat to fixpoint.
    Each round is one distributed degree-oriented wedge pass
    (:func:`edge_common_neighbors`); the driver holds only per-round edge
    counts, never the graph, and the round count is bounded by the peel
    depth (≤ max support), so even a 10⁹-edge graph stays O(depth)
    streaming passes. Input must be deduplicated ``src < dst`` pairs.

    Two regimes (the engine's standard bounded-input split): once the
    surviving edge set fits ``edge_limit`` the peel finishes driver-side
    in one gather — peeling only shrinks the set, and the distributed
    wedge path's internal joins hit the Ray 2.49 sparse-side limitation
    (see :func:`hash_join`) on near-drained frontiers. Both regimes are
    pure integer math, so their outputs are identical by construction
    (property-tested). Returns surviving (u, v, support); a typed empty
    Arrow table when the truss is empty (Ray drops schemas on all-empty
    Datasets)."""
    cur = edges.map_batches(
        lambda t: pa.table({"u": t[src], "v": t[dst]}),
        batch_format="pyarrow").materialize()
    empty = pa.table({"u": pa.array([], pa.string()),
                      "v": pa.array([], pa.string()),
                      "support": pa.array([], pa.int64())})
    for _ in range(max_rounds):
        n_cur = cur.count()
        if n_cur == 0:
            return empty
        if n_cur <= edge_limit:  # bounded-input driver regime
            es = {(r["u"], r["v"]) for r in cur.take_all()}
            sup: dict = {}
            while True:
                adj: dict = {}
                for a, b in es:
                    adj.setdefault(a, set()).add(b)
                    adj.setdefault(b, set()).add(a)
                sup = {e2: len(adj[e2[0]] & adj[e2[1]]) for e2 in es}
                keep_s = {e2 for e2, s in sup.items() if s >= min_support}
                if keep_s == es:
                    break
                es = keep_s
            if not es:
                return empty
            pairs = sorted(es)
            return pa.table({
                "u": pa.array([p[0] for p in pairs], pa.string()),
                "v": pa.array([p[1] for p in pairs], pa.string()),
                "support": pa.array([sup[p] for p in pairs], pa.int64())})
        supd = edge_common_neighbors(cur, src="u", dst="v").materialize()
        keep = supd.filter(
            expr=f"common >= {int(min_support)}").materialize()
        if keep.count() == n_cur:
            out = keep.map_batches(
                lambda t: pa.table({"u": t["u"], "v": t["v"],
                                    "support": pc.cast(t["common"],
                                                       pa.int64())}),
                batch_format="pyarrow").materialize()
            return out if out.count() else empty
        cur = keep.map_batches(lambda t: t.select(["u", "v"]),
                               batch_format="pyarrow").materialize()
    raise RuntimeError(f"k-truss did not converge in {max_rounds} rounds")


class CountMinSketch:
    """Fixed-size Count–Min sketch (d hash rows × w counters, int64).

    The frequency-estimation counterpart of :class:`HyperLogLog`, following
    the same distributed shape: per-batch vectorized accumulate (bincount
    into the d×w grid), O(blocks) fixed-size partial rows through the
    exchange, elementwise-sum merge, driver-side point queries. Estimates
    are one-sided: ``estimate(k) >= true count`` always, with overshoot
    ~ N·e/w at failure probability e^-d. Hashing is the engine-standard
    splitmix64 over per-row fixed seeds — deterministic, no RNG.
    """

    # fixed odd 64-bit row seeds (digits of pi / e — nothing up the sleeve)
    _SEEDS = (0x243F6A8885A308D3, 0x13198A2E03707345,
              0xA4093822299F31D1, 0x082EFA98EC4E6C89)

    def __init__(self, d: int = 4, w: int = 4096):
        import numpy as np

        if d > len(self._SEEDS):
            raise ValueError(f"d <= {len(self._SEEDS)} supported")
        self.d, self.w = d, w
        self.counts = np.zeros((d, w), dtype=np.int64)
        self._np = np

    def _idx(self, keys: "np.ndarray", j: int) -> "np.ndarray":  # noqa: F821
        np = self._np
        h = _splitmix64(keys.astype(np.uint64) ^ np.uint64(self._SEEDS[j]))
        return (h % np.uint64(self.w)).astype(np.int64)

    def add(self, keys: "np.ndarray") -> None:  # noqa: F821
        np = self._np
        for j in range(self.d):
            self.counts[j] += np.bincount(self._idx(keys, j),
                                          minlength=self.w)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.counts += other.counts
        return self

    def estimate(self, keys: "np.ndarray") -> "np.ndarray":  # noqa: F821
        np = self._np
        est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
        k = np.asarray(keys, dtype=np.int64)
        for j in range(self.d):
            np.minimum(est, self.counts[j][self._idx(k, j)], out=est)
        return est

    def inner_product(self, other: "CountMinSketch") -> int:
        """One-sided join-size estimate (AGMS/CM inner product): for key
        frequency vectors f, g the true equi-join size is Σ_k f(k)·g(k),
        and min_j Σ_w counts_j[w]·other_j[w] ≥ that sum always (each row's
        dot product adds only non-negative collision cross-terms). Both
        sketches must share (d, w) and the seed table."""
        np = self._np
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError("inner_product requires identical (d, w)")
        dots = (self.counts.astype(np.object_) * other.counts).sum(axis=1)
        return int(min(dots))


def countmin_sketch(ds: Dataset, col: str, *, d: int = 4,
                    w: int = 4096) -> CountMinSketch:
    """Merged Count–Min sketch of an int64 column: each block emits ONE
    flattened d×w partial row (fixed 32·d·w bytes regardless of block
    size), the driver sums the O(blocks) partials. The column itself never
    re-enters the exchange — the same bounded-driver-reduce contract as
    the HLL register merge."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        cms = CountMinSketch(d=d, w=w)
        cms.add(t[col].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"part": pa.array([cms.counts.ravel()],
                                          pa.list_(pa.int64()))})

    merged = CountMinSketch(d=d, w=w)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged.counts += np.asarray(row["part"],
                                    dtype=np.int64).reshape(d, w)
    return merged


def heavy_hitters_topk(
    ds: Dataset,
    list_col_fn,
    k: int,
    *,
    cap: int = 1024,
) -> pa.Table:
    """Certified-exact global top-k frequent items via a Misra–Gries-style
    candidate sketch + one exact recount pass — the two-pass heavy-hitters
    layout that replaces a full-vocabulary ``groupby`` (at 100 TB the token
    vocabulary is billions of rows; the candidate exchange here is
    O(blocks × cap) and the recount groupby is O(|candidates|)).

    ``list_col_fn(batch: pa.Table) -> pa.Array`` extracts the flat item
    array from a batch (e.g. split a text column). Two passes over ``ds``:

    1. **Sketch**: per-batch exact ``value_counts``, then Misra–Gries
       decrement — keep the top ``cap`` items with weight reduced by the
       (cap+1)-th count ``d``, record ``d`` as that batch's error bound.
       Summed over batches: any item's true count ≤ its summed sketch
       weight + err_total, and an item absent from every sketch has true
       count ≤ err_total.
    2. **Recount**: candidates whose upper bound (w + err_total) reaches the
       k-th candidate's lower bound get an EXACT count via a broadcast
       semi-join + small groupby over ``ds`` again.

    Certification: if the k-th exact count > err_total, no non-candidate can
    belong to the top-k and the result is provably exact (ties broken by
    item ascending). Otherwise raises — increase ``cap`` (the guarantee
    needs count_k > N_items/cap, i.e. genuinely skewed frequencies).

    Returns an Arrow table (item, n) sorted by n desc, item asc, length k.
    """
    import numpy as np

    def sketch(t: pa.Table) -> pa.Table:
        items = list_col_fn(t)
        if len(items) == 0:
            return pa.table({"item": pa.array([], type=pa.string()),
                             "w": pa.array([], type=pa.int64())})
        vc = items.value_counts()  # StructArray<values, counts> — exact per batch
        vals = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        if len(vals) <= cap:
            d = 0
            keep = np.arange(len(vals))
        else:
            order = np.argsort(-counts, kind="stable")
            d = int(counts[order[cap]])
            keep = order[:cap]
        return pa.table({
            "item": vals.take(pa.array(keep)),
            "w": pa.array(counts[keep] - d, type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    cand = (
        ds.map_batches(sketch, batch_format="pyarrow")
        .groupby("item")
        .aggregate(Sum("w", alias_name="w"))
    )
    # err_total = sum over BATCHES of each batch's decrement d (per-item
    # sketch rows can't recover it — d is a batch property), so a dedicated
    # O(1)-per-batch pass emits exactly one d row per batch
    errs = ds.map_batches(
        lambda t: pa.table({"d": pa.array(
            [_mg_batch_decrement(list_col_fn(t), cap)], type=pa.int64())}),
        batch_format="pyarrow",
    ).sum("d")
    err_total = int(errs) if errs is not None else 0

    ct = cand.select_columns(["item", "w"]).to_pandas()
    ct = ct.sort_values(["w", "item"], ascending=[False, True], kind="stable")
    if len(ct) > k:
        kth_lower = int(ct["w"].iloc[k - 1]) if len(ct) >= k else 0
        ct = ct[ct["w"] + err_total >= kth_lower]
    cand_items = ct["item"].tolist()

    def recount(t: pa.Table) -> pa.Table:
        items = list_col_fn(t)
        items = items.filter(pc.is_in(items, value_set=pa.array(cand_items)))
        vc = items.value_counts()
        return pa.table({"item": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("item").aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "item"], ascending=[False, True], kind="stable")
        .head(k)
    )
    if len(exact) >= k and int(exact["n"].iloc[k - 1]) <= err_total:
        raise ValueError(
            f"heavy_hitters_topk: cannot certify exactness — k-th count "
            f"{int(exact['n'].iloc[k - 1])} <= sketch error bound {err_total}; "
            f"increase cap (= {cap})"
        )
    return pa.Table.from_pandas(exact.reset_index(drop=True), preserve_index=False)


def _mg_batch_decrement(items: pa.Array, cap: int) -> int:
    """The Misra–Gries decrement d this batch's sketch applied (0 if the
    batch had ≤ cap distinct items)."""
    import numpy as np

    if len(items) == 0:
        return 0
    counts = items.value_counts().field("counts").to_numpy(zero_copy_only=False)
    if len(counts) <= cap:
        return 0
    return int(-np.partition(-counts, cap)[cap])


def exact_quantiles(ds: Dataset, col: str, qs: list[float]) -> pa.Table:
    """Exact distributed quantiles (lower / ``quantile_disc`` semantics:
    value at global index ``floor(q·(N−1))`` of the sorted column).

    One range-shuffle sort is the only exchange; selection afterwards is
    metadata-only — ``split_at_indices`` computes block offsets from cached
    row counts and each probe reads one row of one block, so no
    post-sort materialization of the data path. Returns (q, value).
    """
    s = ds.select_columns([col]).sort(col).materialize()
    n = s.count()
    if n == 0:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    idxs = [int(q * (n - 1)) for q in qs]
    uniq = sorted(set(idxs))
    splits = s.split_at_indices(uniq)
    # split_at_indices([i_0..i_m]) -> m+1 pieces with piece j+1 starting at
    # global index i_j (piece 0 is [0, i_0), empty when i_0 == 0), so the
    # value at index i_j is the first row of piece j+1
    val_at = {i: piece.take(1)[0][col] for i, piece in zip(uniq, splits[1:])}
    return pa.table({
        "q": pa.array(qs, type=pa.float64()),
        "value": pa.array([val_at[i] for i in idxs], type=pa.float64()),
    })


def quantiles_histogram(
    ds: Dataset,
    col: str,
    qs: list[float],
    num_buckets: int = 4096,
    max_candidates: int = 2_000_000,
    interpolation: str = "lower",
) -> pa.Table:
    """EXACT quantiles WITHOUT the global range sort — the 100-TB path: a
    sort is an all-to-all exchange of the whole column; this is two
    streaming passes with bounded driver state. ``interpolation="lower"``
    gives ``quantile_disc`` semantics (same result as
    :func:`exact_quantiles`); ``"linear"`` gives ``percentile_cont``
    (value interpolated between the two bracketing order statistics —
    the same two-pass machinery just fetches both ranks).

    Pass 1 reduces each block to per-bucket (count, min, max) partial rows
    over a fixed value grid between the column min/max (one extra
    bounds+count aggregate first); the driver cumsums bucket counts to
    locate the bucket holding each target rank ``floor(q·(N−1))``. A bucket
    whose min == max answers its ranks immediately (heavy duplicate values
    never need gathering). Pass 2 fetches ONLY rows in the still-needed
    buckets (expected N/num_buckets each) and selects the order statistics
    in memory; if the candidate fetch would exceed ``max_candidates`` the
    op raises with advice to raise ``num_buckets``. Bucket assignment is
    one IEEE expression per row, independent of block layout, so the result
    is deterministic at any cluster size. Returns ``(q, value)``.
    """
    import numpy as np

    from ray.data.aggregate import Count, Max, Min, Sum

    if interpolation not in ("lower", "linear"):
        raise ValueError(f"interpolation must be 'lower'|'linear', got "
                         f"{interpolation!r}")
    qs = list(qs)
    bounds = ds.select_columns([col]).aggregate(
        Min(col, alias_name="lo"), Max(col, alias_name="hi"),
        Count(alias_name="n"))
    lo, hi, n = float(bounds["lo"]), float(bounds["hi"]), int(bounds["n"])
    if n == 0:
        return pa.table({"q": pa.array([], type=pa.float64()),
                         "value": pa.array([], type=pa.float64())})
    width = (hi - lo) / num_buckets or 1.0

    def bidx(v: "np.ndarray") -> "np.ndarray":
        return np.minimum(((v - lo) / width).astype(np.int64), num_buckets - 1)

    def hist(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        part = pa.table({
            "b": pa.array(bidx(v), type=pa.int64()),
            "v": pa.array(v, type=pa.float64()),
        }).group_by("b").aggregate([("v", "count"), ("v", "min"), ("v", "max")])
        return part.rename_columns(["b", "cnt", "bmin", "bmax"])

    buckets = (
        ds.select_columns([col]).map_batches(hist, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("cnt", alias_name="cnt"),
                   Min("bmin", alias_name="bmin"),
                   Max("bmax", alias_name="bmax"))
        .to_pandas().sort_values("b").reset_index(drop=True)
    )
    cum = buckets["cnt"].cumsum().to_numpy()
    pos = [q * (n - 1) for q in qs]  # fractional rank (exact when 'lower')
    if interpolation == "lower":
        ranks = sorted({int(p) for p in pos})
    else:
        ranks = sorted({r for p in pos for r in (int(np.floor(p)),
                                                 int(np.ceil(p)))})
    # bucket index (row in `buckets`) holding each rank; offset within it
    rows = np.searchsorted(cum, np.asarray(ranks), side="right")
    offs = [r - (int(cum[i - 1]) if i > 0 else 0) for r, i in zip(ranks, rows)]

    vals: dict[int, float] = {}
    need: dict[int, list[tuple[int, int]]] = {}  # bucket id -> [(rank, off)]
    for r, i, off in zip(ranks, rows, offs):
        bid = int(buckets["b"].iloc[i])
        if buckets["bmin"].iloc[i] == buckets["bmax"].iloc[i]:
            vals[r] = float(buckets["bmin"].iloc[i])
        else:
            need.setdefault(bid, []).append((r, off))
    if need:
        fetch = int(buckets.set_index("b").loc[list(need), "cnt"].sum())
        if fetch > max_candidates:
            raise ValueError(
                f"quantiles_histogram: candidate fetch of {fetch} rows exceeds "
                f"max_candidates={max_candidates}; raise num_buckets "
                f"(={num_buckets})")
        want = pa.array(sorted(need), type=pa.int64())

        def pick(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            m = pc.is_in(pa.array(bidx(v), type=pa.int64()), value_set=want)
            return pa.table({col: t[col].filter(m)})

        cand = np.asarray([r[col] for r in ds.select_columns([col]).map_batches(
            pick, batch_format="pyarrow").take_all()], dtype=np.float64)
        cb = bidx(cand)
        for bid, targets in need.items():
            sv = np.sort(cand[cb == bid])
            for r, off in targets:
                vals[r] = float(sv[off])
    if interpolation == "lower":
        out = [vals[int(p)] for p in pos]
    else:
        # percentile_cont: vlo + (pos - floor(pos)) * (vhi - vlo), the same
        # IEEE expression the SQL oracle spells out from the two order stats
        out = [round(vals[int(np.floor(p))]
                     + (p - np.floor(p))
                     * (vals[int(np.ceil(p))] - vals[int(np.floor(p))]), 6)
               for p in pos]
    return pa.table({
        "q": pa.array(qs, type=pa.float64()),
        "value": pa.array(out, type=pa.float64()),
    })


def skew_join(
    left: Dataset,
    right: Dataset,
    on: str,
    *,
    salt: int = 8,
    hot_top: int = 64,
    hot_threshold: int = 100_000,
) -> Dataset:
    """Inner hash join with SALTED hot keys — the skew armor a plain
    partitioned join lacks: a Zipf-head key (one entity in half the corpus)
    lands its entire group on one aggregator and that task becomes the job.

    Detection is a bounded pre-pass: each left block emits its top
    ``hot_top`` key counts plus one floor row carrying the largest TRUNCATED
    count (0 if nothing was truncated). Summing the per-key partials alone
    UNDER-estimates keys that miss some blocks' top lists, so the driver
    also sums the floors into ``D`` — a global bound on how much any key's
    count can be under-reported — and flags keys with
    ``est > hot_threshold - D``. That restores the over-detect-only
    guarantee (a key counted hot routes through the salted path, which is
    correct for any key; a diffuse-but-hot key can no longer slip under the
    threshold). If ``D`` swallows the whole threshold the armor degrades to
    salting every observed candidate key, which is still correct.
    Keys whose adjusted estimate exceeds the threshold get salted: hot
    LEFT rows take salt ``i mod salt`` (any assignment is correct — results
    don't depend on which replica matched), hot RIGHT rows REPLICATE to all
    ``salt`` buckets, and the join key becomes (key, salt) so the hot
    group splits across ``salt`` aggregators. Cold keys take salt 0 on both
    sides (no replication). One union, ONE join — same exchange count as
    the unsalted path. Result == ``hash_join(left, right, on)`` exactly.
    """
    import numpy as np

    def top_counts(t: pa.Table) -> pa.Table:
        vc = t[on].value_counts()
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        order = np.argsort(-counts, kind="stable")
        keep = order[:hot_top]
        # floor row: largest truncated count in this block (0 if none) —
        # bounds how far the per-key sums can under-report a diffuse key
        floor = int(counts[order[hot_top]]) if len(order) > hot_top else 0
        kt = pa.table({"k": vc.field("values").take(pa.array(keep)),
                       "c": pa.array(counts[keep], type=pa.int64())})
        d = [floor] + [0] * (len(kt) - 1) if len(kt) else []
        return kt.append_column("d", pa.array(d, type=pa.int64()))

    from ray.data.aggregate import Sum

    partials = (
        left.select_columns([on])
        .map_batches(top_counts, batch_format="pyarrow")
        .materialize()  # bounded: O(blocks × hot_top) rows, read twice below
    )
    d_total = int(partials.sum("d") or 0)
    est = partials.groupby("k").aggregate(Sum("c", alias_name="c"))
    eff_threshold = max(hot_threshold - d_total, 0)
    hot = [r["k"] for r in est.filter(
        expr=f"c > {int(eff_threshold)}").take_all()]
    if not hot:
        return hash_join(left, right, on=(on,))
    hot_set = pa.array(hot)
    href = ray.put(hot_set)

    def salt_left(t: pa.Table) -> pa.Table:
        is_hot = pc.is_in(t[on], value_set=ray.get(href)).to_numpy(
            zero_copy_only=False)
        s = np.zeros(len(t), dtype=np.int64)
        s[is_hot] = np.arange(int(is_hot.sum())) % salt
        return t.append_column("_salt", pa.array(s, type=pa.int64()))

    def salt_right(t: pa.Table) -> pa.Table:
        is_hot_arr = pc.is_in(t[on], value_set=ray.get(href))
        cold = t.filter(pc.invert(is_hot_arr))
        cold = cold.append_column(
            "_salt", pa.array(np.zeros(len(cold), dtype=np.int64)))
        hot_rows = t.filter(is_hot_arr)
        reps = [hot_rows.append_column(
            "_salt", pa.array(np.full(len(hot_rows), s_i, dtype=np.int64)))
            for s_i in range(salt)]
        return pa.concat_tables([cold, *reps])

    l_s = left.map_batches(salt_left, batch_format="pyarrow")
    r_s = right.map_batches(salt_right, batch_format="pyarrow")
    out = hash_join(l_s, r_s, on=(on, "_salt"))
    return out.drop_columns(["_salt"])


def keyword_topk(
    ds: Dataset, text_col: str, id_col: str, term: str, k: int
) -> pa.Table:
    """Top-k documents by (non-overlapping) occurrence count of ``term`` —
    the brute-force text-search primitive. Per-batch Arrow
    ``count_substring`` + local top-k combiner; only O(blocks·k) candidate
    rows reach the driver. Ties break to ``id_col`` ascending. Returns
    (id_col, score) with score int64, length ≤ k (zero-score rows dropped).
    """
    import numpy as np

    def local(t: pa.Table) -> pa.Table:
        score = pc.count_substring(t[text_col], pattern=term)
        s = score.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        nz = np.flatnonzero(s > 0)
        if nz.size > k:
            order = nz[np.lexsort((ids[nz], -s[nz]))[:k]]
        else:
            order = nz
        return pa.table({id_col: pa.array(ids[order], type=pa.int64()),
                         "score": pa.array(s[order], type=pa.int64())})

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["score", id_col], ascending=[False, True],
                            kind="stable").head(k)
    return pa.Table.from_pandas(cand.reset_index(drop=True), preserve_index=False)


def pack_by_token_budget(
    ds: Dataset, id_col: str, weight_col: str, capacity: int
) -> Dataset:
    """Contiguous token-budgeted sharding (training-shard packing): rows in
    ``id_col`` order are assigned ``shard_id = floor(exclusive_prefix_sum(
    weight) / capacity)`` — the deterministic "pack documents into ~capacity-
    token shards" operator a pre-training data pipeline runs last.

    Distributed prefix sum in two passes over the SAME materialized sorted
    blocks (``batch_size=None`` ⇒ one batch per block, and Ray's range sort
    gives totally ordered blocks): pass 1 reduces each block to (first_id,
    weight_sum) — O(blocks) driver state; the driver computes per-block
    exclusive offsets; pass 2 adds the broadcast block offset to the
    in-block cumulative sum. No all-to-all beyond the one sort.

    Oracle-equivalent: ``floor(coalesce(sum(w) OVER (ORDER BY id ROWS
    BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / capacity)``.

    Requires UNIQUE ``id_col`` values (document ids): the range sort may
    split equal keys across block boundaries, which would make the
    first-id→offset map ambiguous.
    """
    import numpy as np

    if capacity <= 0:
        raise ValueError(f"pack_by_token_budget: capacity must be > 0, got {capacity}")

    s = ds.select_columns([id_col, weight_col]).sort(id_col).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"first_id": pa.array([], type=pa.int64()),
                             "wsum": pa.array([], type=pa.int64())})
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"first_id": pa.array([t[id_col][0].as_py()], type=pa.int64()),
                         "wsum": pa.array([int(w.sum())], type=pa.int64())})

    stats = s.map_batches(block_stat, batch_size=None,
                          batch_format="pyarrow").to_pandas()
    stats = stats.sort_values("first_id", kind="stable")
    offsets = stats["wsum"].cumsum().shift(fill_value=0)
    off_by_first = dict(zip(stats["first_id"].astype(np.int64),
                            offsets.astype(np.int64)))
    if len(off_by_first) != len(stats):
        # unique-id contract violated across a block boundary: a silent dict
        # collision would shift every downstream shard offset
        raise ValueError(
            "pack_by_token_budget requires unique id values; duplicate ids "
            "crossed a block boundary")
    ref = ray.put(off_by_first)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "shard_id": pa.array([], type=pa.int64())})
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ray.get(ref)[int(t[id_col][0].as_py())]
        excl = base + np.cumsum(w) - w
        return pa.table({
            id_col: pc.cast(t[id_col], pa.int64()),
            "shard_id": pa.array(excl // capacity, type=pa.int64()),
        })

    return s.map_batches(assign, batch_size=None, batch_format="pyarrow")


def running_sum(
    ds: Dataset, key_col: str, weight_col: str, out_col: str = "running"
) -> Dataset:
    """Inclusive running total of ``weight_col`` in ``key_col`` order — the
    ``sum(w) OVER (ORDER BY key)`` window as a distributed two-pass prefix
    sum (same layout as :func:`pack_by_token_budget`): one range sort, then
    pass 1 reduces each block to (first_key, weight_sum) — O(blocks) driver
    state — and pass 2 adds the broadcast per-block exclusive offset to the
    in-block cumulative sum. No all-to-all beyond the sort, and the full
    column never leaves its blocks.

    Requires UNIQUE ``key_col`` values (the range sort may split equal keys
    across block boundaries, making the first-key→offset map ambiguous);
    callers with duplicate keys must pre-aggregate per key first (which is
    also what makes the driver state O(blocks), not O(rows)).
    """
    import numpy as np

    s = ds.select_columns([key_col, weight_col]).sort(key_col).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"first_key": pa.array([], type=pa.int64()),
                             "wsum": pa.array([], type=pa.int64())})
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "first_key": pa.array([_key_as_i64(t[key_col][0])], type=pa.int64()),
            "wsum": pa.array([int(w.sum())], type=pa.int64())})

    stats = s.map_batches(block_stat, batch_size=None,
                          batch_format="pyarrow").to_pandas()
    stats = stats.sort_values("first_key", kind="stable")
    offsets = stats["wsum"].cumsum().shift(fill_value=0)
    off_by_first = dict(zip(stats["first_key"].astype(np.int64),
                            offsets.astype(np.int64)))
    if len(off_by_first) != len(stats):
        # two blocks started with the same key ⇒ the unique-key contract is
        # violated; a silent dict collision here would corrupt every offset
        raise ValueError(
            "running_sum requires unique key values; duplicate keys crossed "
            "a block boundary — pre-aggregate per key first")
    ref = ray.put(off_by_first)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({key_col: t[key_col], weight_col: t[weight_col],
                             out_col: pa.array([], type=pa.int64())})
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ray.get(ref)[_key_as_i64(t[key_col][0])]
        return t.append_column(
            out_col, pa.array(base + np.cumsum(w), type=pa.int64()))

    return s.map_batches(assign, batch_size=None, batch_format="pyarrow")


def _key_as_i64(scalar: pa.Scalar) -> int:
    """Sort-key scalar → canonical int64 (timestamps hash by their epoch
    micros so a timestamp key column works as a prefix-sum block key)."""
    v = scalar.as_py()
    if hasattr(v, "timestamp"):
        return int(pa.scalar(v, type=pa.timestamp("us")).cast(pa.int64()).as_py())
    return int(v)


def approx_distinct(ds: Dataset, col: str, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col) via per-batch HLL sketches reduced on
    the driver — one pass, O(2^p) state, no shuffle at all (contrast:
    ``distinct()`` is exact but pays a full exchange)."""
    import hashlib

    import numpy as np

    def sketch_batch(t: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        vals = t[col].to_pylist()
        if vals:
            h = np.fromiter(
                (int.from_bytes(
                    hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                    "little") for v in vals),
                dtype=np.uint64, count=len(vals),
            )
            hll.add_hashes(h)
        return pa.table({"registers": pa.array([hll.registers.tobytes()],
                                               type=pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        other = HyperLogLog(p)
        import numpy as np

        other.registers = np.frombuffer(row["registers"], dtype=np.uint8).copy()
        merged.merge(other)
    return int(round(merged.estimate()))


def _splitmix64(x: "np.ndarray") -> "np.ndarray":  # noqa: F821
    """Vectorized splitmix64 finalizer over int64/uint64 values — the
    engine's standard integer hash (shared with the Bloom probe)."""
    import numpy as np

    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def grouped_approx_distinct(
    ds: Dataset, key_col: str, val_col: str, p: int = 12
) -> Dataset:
    """Approximate ``COUNT(DISTINCT val) GROUP BY key`` via per-group HLL
    sketches: each batch emits one (key, registers) row per key it sees
    (vectorized splitmix64 hash + register update, int64 values only), the
    groupby merges registers with a bytewise max, and the estimate
    finalizes per group — the exchange carries O(blocks × keys) fixed
    2^p-byte rows, never the value column. Deterministic (hash, not RNG),
    so a pure driver recompute with the same functions is an exact oracle.
    Returns ``(key_col, approx_n)``."""
    import numpy as np

    def sketch(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        vals = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_k, out_r = [], []
        for k in pd.unique(keys):
            hll = HyperLogLog(p)
            hll.add_hashes(_splitmix64(vals[keys == k]))
            out_k.append(k)
            out_r.append(hll.registers.tobytes())
        return pa.table({key_col: pa.array(out_k, type=t[key_col].type),
                         "registers": pa.array(out_r, type=pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        for r in g["registers"].to_pylist():
            hll.registers = np.maximum(
                hll.registers, np.frombuffer(r, dtype=np.uint8))
        return pa.table({
            key_col: g[key_col].slice(0, 1),
            "approx_n": pa.array([int(round(hll.estimate()))], type=pa.int64()),
        })

    return (
        ds.map_batches(sketch, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# PageRank (iterative distributed graph analytics over the constructed KG)
# --------------------------------------------------------------------------


def pagerank(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iters: int = 10,
    round_decimals: int = 9,
    broadcast_threshold: int = 65536,
    driver_edge_limit: int = 500_000,
    seeds: list | None = None,
) -> Dataset:
    """Weighted PageRank over a directed edge list. Two regimes, same
    result after per-iteration rounding in every observed/property-tested
    case; the regimes necessarily differ in float partial-sum DECOMPOSITION
    (per-block partials vs one dense pass), so a rank sitting exactly on a
    rounding boundary could in principle flip an ulp across regimes —
    rounding makes re-RUNS of the same regime bit-stable, not a
    cross-regime proof:

    * node count ≤ ``broadcast_threshold`` (e.g. an entity/agency graph):
      the rank vector lives on the driver; each iteration is ONE streaming
      pass where every edge block emits a dense partial contribution vector
      (kmeans-style bounded partials, no shuffle at all).
    * larger graphs: formulated entirely as Dataset joins/groupbys so the
      node table never has to fit anywhere — per iteration
      ``share = rank ⋈ out-weight``, ``contrib = edges ⋈ share →
      groupby(dst).sum``, ``rank = nodes ⟕ contrib``. Only node-scale
      tables materialize (to cut per-iteration lineage); edge blocks stream
      through each join.

    rank = (1-d)/N + d·(dangling/N) + d·Σ_in w·rank[src]/wdeg[src]; dangling
    mass (nodes with no out-edges) is redistributed uniformly; parallel
    edges contribute independently (pre-aggregate if undesired). Ranks are
    rounded to ``round_decimals`` each iteration, which makes the result
    independent of partial-sum reduction ORDER within a regime — re-runs
    are bit-stable across cluster sizes and a pure driver-side recompute
    serves as the oracle for the regime it mirrors. Returns
    ``(node, rank)``.

    ``seeds`` switches to PERSONALIZED PageRank: the teleport vector (and
    the dangling-mass sink) becomes uniform over the seed nodes present in
    the graph instead of uniform over all nodes —
    ``rank = ((1-d) + d·dangling)·p + d·Σ_in w·rank[src]/wdeg[src]`` with
    ``p[v] = 1/|seeds∩V|`` on seeds, 0 elsewhere; raises ``ValueError``
    when no seed appears in the graph. The seed set is a bounded small
    side (captured in the batch fns / ``pc.is_in`` probes — never a
    shuffle). The ``seeds=None`` code paths are byte-identical to the
    uniform formulas above (the algebraically-equal factored form would
    reorder float ops and could flip a rounded rank).
    """
    import numpy as np

    from ray.data.aggregate import Sum

    seed_set = set(seeds) if seeds is not None else None

    def _pvec(node_list) -> "np.ndarray":
        mask = np.fromiter((v in seed_set for v in node_list), dtype=bool,
                           count=len(node_list))
        ns = int(mask.sum())
        if ns == 0:
            raise ValueError(
                "personalized pagerank: no seed node appears in the graph")
        return np.where(mask, 1.0 / ns, 0.0)

    w_expr = (lambda t: pc.cast(t[weight], pa.float64())) if weight else (
        lambda t: pa.array(np.ones(len(t)), type=pa.float64()))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[src], "dst": t[dst], "w": w_expr(t)})

    # _compact: edges/nodes may descend from groupbys (schema-less empty
    # blocks for unoccupied partitions) and every table below feeds a join
    e = _compact(edges.map_batches(project, batch_format="pyarrow")).materialize()

    # Third regime: a BOUNDED edge table (a constructed KG is typically
    # ~10^6× smaller than its corpus) iterates on the driver — ten Dataset
    # passes over a few thousand rows are pure exchange latency. Identical
    # math and per-iteration rounding; edges sorted canonically so the
    # float accumulation order is fixed.
    n_edges = e.count()
    if 0 < n_edges <= driver_edge_limit:
        rows = sorted(((r["src"], r["dst"], float(r["w"])) for r in e.take_all()))
        nodes_l = sorted({a for a, _, _ in rows} | {b for _, b, _ in rows})
        pos = {v: i for i, v in enumerate(nodes_l)}
        nn = len(nodes_l)
        si = np.asarray([pos[a] for a, _, _ in rows], dtype=np.int64)
        di = np.asarray([pos[b] for _, b, _ in rows], dtype=np.int64)
        wv = np.asarray([x for _, _, x in rows], dtype=np.float64)
        wdeg_v = np.zeros(nn)
        np.add.at(wdeg_v, si, wv)
        pv = _pvec(nodes_l) if seed_set is not None else None
        r = (np.round(pv, round_decimals) if pv is not None
             else np.full(nn, round(1.0 / nn, round_decimals)))
        for _ in range(iters):
            share = np.where(wdeg_v > 0, r / np.where(wdeg_v > 0, wdeg_v, 1.0),
                             0.0)
            # same decomposition as the dense-broadcast regime (total minus
            # non-dangling), so the two bounded regimes share accumulation
            # order for this term
            dangling = max(float(r.sum() - r[wdeg_v > 0].sum()), 0.0)
            c = np.zeros(nn)
            np.add.at(c, di, wv * share[si])
            if pv is not None:
                r = np.round(((1.0 - damping) + damping * dangling) * pv
                             + damping * c, round_decimals)
            else:
                r = np.round((1.0 - damping) / nn + damping * dangling / nn
                             + damping * c, round_decimals)
        node_type = e.schema().base_schema.field("src").type
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes_l, type=node_type),
            "rank": pa.array(r, type=pa.float64()),
        }))
    wdeg = _compact(
        e.groupby("src").aggregate(Sum("w", alias_name="wdeg"))
        .map_batches(lambda t: t.rename_columns(["node", "wdeg"]),
                     batch_format="pyarrow")
    )
    nodes = _compact(distinct(
        e.map_batches(lambda t: pa.table({"node": t["src"]}),
                      batch_format="pyarrow")
        .union(e.map_batches(lambda t: pa.table({"node": t["dst"]}),
                             batch_format="pyarrow")),
        ["node"],
    )).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda t: t.append_column("rank", pa.array([], type=pa.float64())),
            batch_format="pyarrow",
        )
    r0 = round(1.0 / n, round_decimals)

    if n <= broadcast_threshold:
        node_type = nodes.schema().base_schema.field("node").type
        node_vals = sorted(r["node"] for r in nodes.take_all())
        iref = ray.put(node_vals)

        def dense_partial(col_share):
            """One row per block: dense wdeg (share=None) or contribution
            (share broadcast) vector over the bounded node index."""
            def fn(t: pa.Table) -> pa.Table:
                vals = ray.get(iref)
                idx = pd.Index(vals)
                si = idx.get_indexer(t["src"].to_pylist())
                v = np.zeros(len(vals))
                w_arr = t["w"].to_numpy(zero_copy_only=False)
                if col_share is None:
                    np.add.at(v, si, w_arr)
                else:
                    sh = ray.get(col_share)
                    di = idx.get_indexer(t["dst"].to_pylist())
                    np.add.at(v, di, w_arr * sh[si])
                return pa.table({"v": pa.array([v.tolist()],
                                               type=pa.list_(pa.float64()))})
            return fn

        def reduce_vec(ds: Dataset) -> np.ndarray:
            # canonical sort before reducing: arrival order is
            # nondeterministic and float addition non-associative
            vecs = [np.asarray(row["v"], dtype=np.float64)
                    for row in ds.take_all()]
            vecs.sort(key=lambda a: a.tobytes())
            out = np.zeros(n)
            for v in vecs:
                out += v
            return out

        wdeg_v = reduce_vec(e.map_batches(dense_partial(None),
                                          batch_format="pyarrow"))
        pv = _pvec(node_vals) if seed_set is not None else None
        r = np.round(pv, round_decimals) if pv is not None else np.full(n, r0)
        for _ in range(iters):
            share = np.where(wdeg_v > 0, r / np.where(wdeg_v > 0, wdeg_v, 1.0), 0.0)
            dangling = float(r.sum() - r[wdeg_v > 0].sum())
            dangling = max(dangling, 0.0)
            sref = ray.put(share)
            c = reduce_vec(e.map_batches(dense_partial(sref),
                                         batch_format="pyarrow"))
            if pv is not None:
                r = np.round(((1.0 - damping) + damping * dangling) * pv
                             + damping * c, round_decimals)
            else:
                r = np.round((1.0 - damping) / n + damping * dangling / n
                             + damping * c, round_decimals)
        return ray.data.from_arrow(pa.table({
            "node": pa.array(node_vals, type=node_type),
            "rank": pa.array(r, type=pa.float64()),
        }))

    if seed_set is not None:
        seed_arr = pa.array(sorted(seed_set))
        n_seed = int(nodes.map_batches(
            lambda t: pa.table({"ns": pa.array(
                [int(pc.sum(pc.is_in(t["node"], value_set=seed_arr)).as_py()
                     or 0)], type=pa.int64())}),
            batch_format="pyarrow").sum("ns") or 0)
        if n_seed == 0:
            raise ValueError(
                "personalized pagerank: no seed node appears in the graph")
        p_seed = 1.0 / n_seed

        def init_rank(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t["node"], value_set=seed_arr) \
                .to_numpy(zero_copy_only=False)
            return t.append_column("rank", pa.array(
                np.round(np.where(mask, p_seed, 0.0), round_decimals),
                type=pa.float64()))

        rank = nodes.map_batches(init_rank, batch_format="pyarrow") \
            .materialize()
    else:
        rank = nodes.map_batches(
            lambda t: t.append_column(
                "rank", pa.array(np.full(len(t), r0), type=pa.float64())),
            batch_format="pyarrow",
        ).materialize()  # nodes already compacted -> typed blocks

    for _ in range(iters):
        share = _compact(hash_join(rank, wdeg, on=("node",)).map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "share": pc.divide(t["rank"], t["wdeg"]),
                "rank": t["rank"],
            }),
            batch_format="pyarrow",
        )).materialize()
        total = rank.sum("rank")
        non_dangling = share.sum("rank") if share.count() else 0.0
        dangling = max(total - non_dangling, 0.0)
        contrib = (
            hash_join(e, share.drop_columns(["rank"]),
                      on=("src",), right_on=("node",))
            .map_batches(
                lambda t: pa.table({
                    "dst": t["dst"],
                    "c": pc.multiply(t["w"], t["share"]),
                }),
                batch_format="pyarrow",
            )
            .groupby("dst").aggregate(Sum("c", alias_name="c"))
        )
        contrib = _compact(contrib)
        if seed_set is not None:
            coef = (1.0 - damping) + damping * dangling

            def renew(t: pa.Table, coef=coef) -> pa.Table:
                c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
                c = np.nan_to_num(c, nan=0.0)
                mask = pc.is_in(t["node"], value_set=seed_arr) \
                    .to_numpy(zero_copy_only=False)
                new = np.round(coef * np.where(mask, p_seed, 0.0)
                               + damping * c, round_decimals)
                return pa.table({"node": t["node"],
                                 "rank": pa.array(new, type=pa.float64())})
        else:
            base = (1.0 - damping) / n + damping * dangling / n

            def renew(t: pa.Table, base=base) -> pa.Table:
                c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
                c = np.nan_to_num(c, nan=0.0)
                new = np.round(base + damping * c, round_decimals)
                return pa.table({"node": t["node"],
                                 "rank": pa.array(new, type=pa.float64())})

        rank = _compact(hash_join(nodes, contrib, on=("node",),
                                  right_on=("dst",),
                                  how="left_outer").map_batches(
            renew, batch_format="pyarrow"
        )).materialize()

    return rank


# --------------------------------------------------------------------------
# Window functions / ordered group analytics
# --------------------------------------------------------------------------


def window_lag_lead(
    ds: Dataset,
    part_col: str,
    order_cols: list[str],
    value_col: str,
) -> Dataset:
    """Per-partition window functions — ``row_number() / lag(value) /
    lead(value) OVER (PARTITION BY part_col ORDER BY order_cols)``.

    ONE shuffle on the partition key, then each group is sorted in memory —
    the right shape when partitions are natural stream keys (user/session/
    entity) whose per-key row counts are bounded; a hot key that exceeds a
    group block is the documented skew limit (same assumption as
    :func:`asof_join`'s grouped path). Include a unique id in
    ``order_cols`` for a total order, otherwise lag/lead of tied rows is
    engine-dependent. lag/lead are COPIES of stored values (no arithmetic),
    so results hash-match any SQL engine bit-for-bit.
    """
    import numpy as np

    def fn(g: pa.Table) -> pa.Table:
        keys = [g[c].to_numpy(zero_copy_only=False) for c in reversed(order_cols)]
        g = g.take(np.lexsort(keys))
        v = g[value_col].combine_chunks()
        n = len(g)
        null1 = pa.nulls(1, type=v.type)
        cols = {c: g[c] for c in g.column_names}
        cols["rn"] = pa.array(np.arange(1, n + 1), type=pa.int64())
        cols[f"lag_{value_col}"] = pa.concat_arrays([null1, v.slice(0, n - 1)])
        cols[f"lead_{value_col}"] = pa.concat_arrays([v.slice(1), null1])
        return pa.table(cols)

    return ds.groupby(part_col).map_groups(fn, batch_format="pyarrow")


def window_running_sum(
    ds: Dataset,
    part_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
) -> Dataset:
    """Per-partition running total — ``sum(v) OVER (PARTITION BY part_col
    ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``. Same single-shuffle
    grouped-sort shape (and hot-key caveat) as :func:`window_lag_lead`;
    contrast :func:`running_sum`, the GLOBAL-order prefix sum.

    ``value_col`` must be int64 and non-null (callers pre-scale money to
    cents and coalesce nulls): the cumsum is then sequential integer math,
    so results hash-match any SQL engine bit-for-bit — a float cumsum would
    be at the mercy of the other engine's window accumulation order.
    """
    import numpy as np

    def fn(g: pa.Table) -> pa.Table:
        keys = [g[c].to_numpy(zero_copy_only=False) for c in reversed(order_cols)]
        g = g.take(np.lexsort(keys))
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {c: g[c] for c in g.column_names}
        cols[out_col] = pa.array(np.cumsum(v), type=pa.int64())
        return pa.table(cols)

    return ds.groupby(part_col).map_groups(fn, batch_format="pyarrow")


def grouped_sequence(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    val_col: str,
    sep: str = ",",
) -> Dataset:
    """Ordered per-key sequence assembly (``string_agg(val, sep ORDER BY
    order_cols)``): the training-data step that turns an event log into one
    chronological sequence row per user/session. Same single-shuffle
    grouped-sort shape (and hot-key caveat) as :func:`window_lag_lead`.
    Returns ``(key, seq, n)``."""
    import numpy as np

    def fn(g: pa.Table) -> pa.Table:
        keys = [g[c].to_numpy(zero_copy_only=False) for c in reversed(order_cols)]
        order = np.lexsort(keys)
        vals = g[val_col].take(pa.array(order)).to_pylist()
        return pa.table({
            key: g[key].slice(0, 1),
            "seq": pa.array([sep.join("" if v is None else str(v) for v in vals)],
                            type=pa.string()),
            "n": pa.array([len(vals)], type=pa.int64()),
        })

    return ds.groupby(key).map_groups(fn, batch_format="pyarrow")


def grouping_sets_sum(
    ds: Dataset,
    keys: list[str],
    sets: list[tuple[str, ...]],
    value_col: str,
    alias: str,
    fill: str = "ALL",
) -> Dataset:
    """``GROUP BY GROUPING SETS(...)`` over a sum: one row set per requested
    key subset, aggregated-out key columns filled with ``fill`` (a sentinel
    rather than NULL keeps cross-engine comparisons unambiguous).

    The input is scanned ONCE: the finest level (all ``keys``) is computed
    and pinned, and every requested subset re-aggregates those
    already-reduced rows — each extra set costs a shuffle of
    group-cardinality rows, not another pass over the data.
    :func:`rollup_sum` (prefix sets) and :func:`cube_sum` (all subsets) are
    the two standard instantiations."""
    from ray.data.aggregate import Sum

    sets = [tuple(s) for s in sets]
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} not a subset of keys {keys}")
    lvl = (
        ds.groupby(keys).aggregate(Sum(value_col, alias_name=alias))
        # normalize to Arrow blocks so downstream unions/fills see one
        # schema regardless of the input block format
        .map_batches(lambda t: t, batch_format="pyarrow")
        .materialize()
    )
    base = lvl.schema().base_schema
    key_types = {f.name: f.type for f in base}
    bad = [c for c in keys if not pa.types.is_string(key_types[c])
           and not pa.types.is_large_string(key_types[c])]
    if bad:
        raise ValueError(
            f"grouping_sets_sum: key columns must be strings (the '{fill}' "
            f"sentinel marks aggregated-out levels); cast {bad} to string first")

    def with_fill(missing: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for c in keys:
                cols[c] = (pa.array([fill] * len(t), type=key_types[c])
                           if c in missing else t[c])
            cols[alias] = t[alias]
            return pa.table(cols)
        return fn

    out = None
    for s in sets:
        missing = [c for c in keys if c not in s]
        if not missing:
            part = lvl.map_batches(with_fill([]), batch_format="pyarrow")
        elif s:
            part = (
                lvl.groupby(list(s)).aggregate(Sum(alias, alias_name=alias))
                .map_batches(with_fill(missing), batch_format="pyarrow")
            )
        else:
            part = ray.data.from_arrow(pa.table({
                **{c: pa.array([fill], type=key_types[c]) for c in keys},
                alias: pa.array([lvl.sum(alias)], type=key_types[alias]),
            }))
        out = part if out is None else out.union(part)
    return out


def rollup_sum(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    alias: str,
    fill: str = "ALL",
) -> Dataset:
    """``GROUP BY ROLLUP(keys)``: the prefix grouping sets
    ((k1..kn), (k1..kn-1), …, ())."""
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets_sum(ds, keys, sets, value_col, alias, fill)


def cube_sum(
    ds: Dataset,
    keys: list[str],
    value_col: str,
    alias: str,
    fill: str = "ALL",
) -> Dataset:
    """``GROUP BY CUBE(keys)``: all 2^n key subsets, each re-aggregated from
    the one pinned finest level."""
    from itertools import combinations

    sets = [c for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_sum(ds, keys, sets, value_col, alias, fill)


# --------------------------------------------------------------------------
# Bloom-filter semi-join (broadcast-prefilter scale path for big key sets)
# --------------------------------------------------------------------------


def _bloom_hashes(x, m_bits: int, k: int):
    """k probe positions per key via double hashing of a splitmix64 mix."""
    import numpy as np

    x = x.astype(np.uint64)
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    h1 = z % np.uint64(m_bits)
    h2 = (z >> np.uint64(32)) | np.uint64(1)
    return [(h1 + np.uint64(i) * h2) % np.uint64(m_bits) for i in range(k)]


def bloom_semi_join(
    left: Dataset,
    right: Dataset,
    left_key: str,
    right_key: str,
    m_bits: int = 1 << 20,
    k: int = 4,
    exact_broadcast_limit: int = 4_000_000,
) -> Dataset:
    """EXACT semi-join (left rows whose key appears on the right) with a
    broadcast Bloom prefilter — the 100-TB pattern when the right key set is
    too large to broadcast exactly but the probe side is far larger still.

    Build: each right block emits ONE fixed-size partial bitmap
    (``m_bits/8`` bytes); the driver ORs them (bitwise OR is commutative and
    idempotent — reduction-order independent, unlike float sums). Probe: the
    bitmap is ``ray.put`` once and every left block drops rows that
    definitely don't match BEFORE any shuffle. The survivors (true matches +
    false positives, rate ≈ (1-e^{-kn/m})^k) then run an exact distributed
    semi-join, so the result is exact for ANY m/k — the Bloom only cuts
    shuffle volume. Integer keys only (documented, like :func:`asof_join`).
    """
    import numpy as np

    nbytes = m_bits // 8

    def build(t: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        keys = t[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
        for pos in _bloom_hashes(keys, m_bits, k):
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    bitmap = np.zeros(nbytes, dtype=np.uint8)
    for row in right.select_columns([right_key]).map_batches(
            build, batch_format="pyarrow").take_all():
        bitmap |= np.frombuffer(row["bits"], dtype=np.uint8)
    bref = ray.put(bitmap)

    def probe(t: pa.Table) -> pa.Table:
        bits = ray.get(bref)
        keys = t[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.ones(len(t), dtype=bool)
        for pos in _bloom_hashes(keys, m_bits, k):
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
            mask &= bit.astype(bool)
        return t.filter(pa.array(mask))

    candidates = left.map_batches(probe, batch_format="pyarrow")
    rkeys = _compact(distinct(right.select_columns([right_key]),
                              [right_key])).materialize()
    # exact verify: when the DISTINCT key set fits a broadcast (it is far
    # smaller than the raw right side), a ray.put set + is_in filter beats
    # the shuffle join outright — the join path remains for key sets that
    # genuinely don't fit anywhere
    if rkeys.count() <= exact_broadcast_limit:
        vals = pa.array([r[right_key] for r in rkeys.take_all()])
        vref = ray.put(vals)

        def verify(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t[left_key], value_set=ray.get(vref)))

        return candidates.map_batches(verify, batch_format="pyarrow")
    joined = hash_join(candidates, rkeys, on=(left_key,), right_on=(right_key,))
    if right_key != left_key and right_key in joined.schema().base_schema.names:
        joined = joined.drop_columns([right_key])
    return joined


# --------------------------------------------------------------------------
# Triangle enumeration (degree-oriented) — graph analytics over the KG
# --------------------------------------------------------------------------


def triangles(edges: Dataset, src: str = "src", dst: str = "dst") -> Dataset:
    """Triangle enumeration by DEGREE ORIENTATION (forward counting). Input:
    unique undirected pairs (one row per {a,b}, any per-row order). Output:
    ``(a, b, c)`` with a < b < c by node id, each triangle exactly once.

    Orient every edge from its (degree, id)-smaller endpoint to the larger;
    each triangle then has exactly one pivot with two out-edges, so the
    wedge self-join (u→v ⋈ u→w) probed against the oriented edge set finds
    it once. Post-orientation out-degree is O(√m), which bounds the wedge
    count even on power-law graphs — the property that makes this the
    standard distributed algorithm (vs naive enumeration, which explodes on
    hub nodes). Everything is joins/groupbys: degree count, two orientation
    lookups, wedge join, closing-edge join — no driver-side graph. The wedge
    set is pinned before the closing join (it is the algorithm's intrinsic
    O(Σ out-deg²) intermediate either way — the join shuffle would hold it
    too; pinning also lets the all-empty case short-circuit, since Ray's
    join cannot take a zero-block side).
    """
    import numpy as np

    from ray.data.aggregate import Count

    e = _compact(edges.map_batches(
        lambda t: pa.table({"a": t[src], "b": t[dst]}), batch_format="pyarrow"
    )).materialize()

    node_type = e.schema().base_schema.field("a").type

    def _empty() -> Dataset:
        return ray.data.from_arrow(pa.table({
            c: pa.array([], type=node_type) for c in ("a", "b", "c")}))

    if e.count() == 0:
        return _empty()
    deg = _compact(
        e.map_batches(lambda t: pa.table({"node": t["a"]}), batch_format="pyarrow")
        .union(e.map_batches(lambda t: pa.table({"node": t["b"]}),
                             batch_format="pyarrow"))
        .groupby("node").aggregate(Count(alias_name="deg"))
    )
    withdeg = hash_join(
        hash_join(e, deg, on=("a",), right_on=("node",)).map_batches(
            lambda t: pa.table({"a": t["a"], "b": t["b"], "deg_a": t["deg"]}),
            batch_format="pyarrow"),
        deg, on=("b",), right_on=("node",),
    )

    def orient(t: pa.Table) -> pa.Table:
        a_first = pc.or_(
            pc.less(t["deg_a"], t["deg"]),
            pc.and_(pc.equal(t["deg_a"], t["deg"]), pc.less(t["a"], t["b"])),
        )
        return pa.table({
            "u": pc.if_else(a_first, t["a"], t["b"]),
            "v": pc.if_else(a_first, t["b"], t["a"]),
        })

    o = _compact(withdeg.map_batches(orient, batch_format="pyarrow")).materialize()
    wedges = hash_join(
        o.map_batches(lambda t: pa.table({"p": t["u"], "x": t["v"]}),
                      batch_format="pyarrow"),
        o.map_batches(lambda t: pa.table({"p2": t["u"], "y": t["v"]}),
                      batch_format="pyarrow"),
        on=("p",), right_on=("p2",),
    ).map_batches(
        lambda t: pa.table({"p": t["p"], "x": t["x"], "y": t["y"]}).filter(
            pc.not_equal(t["x"], t["y"])),
        batch_format="pyarrow",
    )
    wedges = _compact(wedges, parts=max(_join_parts(), 8)).materialize()
    if wedges.count() == 0:  # e.g. a star graph orients to zero wedges
        return _empty()
    tri = hash_join(
        wedges,
        o.map_batches(lambda t: pa.table({"wx": t["u"], "wy": t["v"]}),
                      batch_format="pyarrow"),
        on=("x", "y"), right_on=("wx", "wy"),
    )

    def canonical(t: pa.Table) -> pa.Table:
        m = np.stack([t[c].to_numpy(zero_copy_only=False) for c in ("p", "x", "y")],
                     axis=1)
        m.sort(axis=1)
        typ = t["p"].type
        return pa.table({"a": pa.array(m[:, 0], type=typ),
                         "b": pa.array(m[:, 1], type=typ),
                         "c": pa.array(m[:, 2], type=typ)})

    return tri.map_batches(canonical, batch_format="pyarrow")


def edge_common_neighbors(
    edges: Dataset, src: str = "src", dst: str = "dst"
) -> Dataset:
    """Per-edge link-prediction features over an undirected simple graph:
    for every edge {u, v} (output normalized u < v), ``common`` =
    |N(u) ∩ N(v)| and ``uni`` = |N(u) ∪ N(v)| — the exact-integer
    sufficient statistics for neighborhood Jaccard / common-neighbor /
    Adamic-Adar-style scores (kept as integers so cross-engine float
    rounding can never diverge; Jaccard = common/uni downstream).

    Scale shape: ``common(u,v)`` for an EXISTING edge equals the number of
    triangles containing it, so the count rides :func:`triangles`' degree
    orientation — the wedge intermediate stays O(Σ out-deg²) with out-deg
    O(√m) even on power-law graphs, instead of the naive adjacency
    self-join's O(Σ deg²) hub blow-up. Degrees and the per-edge triangle
    tally are joins/groupbys; the triangle side can legitimately drain
    (triangle-free graphs) → materialize + short-circuit per the join
    caveat, and the sized join keeps sparse sides finalizable.
    """
    import numpy as np

    from ray.data.aggregate import Count, Sum

    def norm(t: pa.Table) -> pa.Table:
        m = np.stack([t[src].to_numpy(zero_copy_only=False),
                      t[dst].to_numpy(zero_copy_only=False)], axis=1)
        m.sort(axis=1)
        typ = t[src].type
        keep = m[:, 0] != m[:, 1]  # drop self-loops
        return pa.table({"u": pa.array(m[keep, 0], type=typ),
                         "v": pa.array(m[keep, 1], type=typ)})

    e = distinct(edges.map_batches(norm, batch_format="pyarrow"),
                 ["u", "v"]).materialize()

    deg = _compact(
        e.map_batches(lambda t: pa.table({"node": t["u"]}),
                      batch_format="pyarrow")
        .union(e.map_batches(lambda t: pa.table({"node": t["v"]}),
                             batch_format="pyarrow"))
        .groupby("node").aggregate(Count(alias_name="deg"))
    )

    tri = triangles(e, src="u", dst="v")

    def tri_edges(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"u": t["a"], "v": t["b"]}),
            pa.table({"u": t["a"], "v": t["c"]}),
            pa.table({"u": t["b"], "v": t["c"]}),
        ])

    def partial_cnt(t: pa.Table) -> pa.Table:
        t2 = t.append_column("one", pa.array(np.ones(len(t), dtype=np.int64)))
        g = t2.group_by(["u", "v"]).aggregate([("one", "sum")])
        return pa.table({"u": g["u"], "v": g["v"],
                         "n": pc.cast(g["one_sum"], pa.int64())})

    common = (tri.map_batches(tri_edges, batch_format="pyarrow")
              .map_batches(partial_cnt, batch_format="pyarrow")
              .groupby(["u", "v"]).aggregate(Sum("n", alias_name="common"))
              ).materialize()

    if common.count() > 0:
        ec = hash_join_sized(e, common, on=("u", "v"), how="left_outer")
    else:  # triangle-free graph: every edge has zero common neighbors
        ec = e.map_batches(
            lambda t: t.append_column(
                "common", pa.nulls(len(t), pa.int64())),
            batch_format="pyarrow")

    withdeg = hash_join_sized(
        hash_join_sized(ec, deg, on=("u",), right_on=("node",)).map_batches(
            lambda t: pa.table({"u": t["u"], "v": t["v"],
                                "common": t["common"], "deg_u": t["deg"]}),
            batch_format="pyarrow"),
        deg, on=("v",), right_on=("node",))

    def finish(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.coalesce(t["common"], 0), pa.int64())
        uni = pc.subtract(
            pc.add(pc.cast(t["deg_u"], pa.int64()),
                   pc.cast(t["deg"], pa.int64())), c)
        return pa.table({"u": t["u"], "v": t["v"], "common": c, "uni": uni})

    return withdeg.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Label propagation (community detection) — pure Dataset formulation
# --------------------------------------------------------------------------


def label_propagation(
    edges: Dataset,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 5,
) -> Dataset:
    """Synchronous weighted label propagation over a SYMMETRIZED edge list
    (pass both directions for an undirected graph): labels init to each
    node's own id; every round, each node adopts the label with the maximal
    incoming weight sum (ties → smallest label). Fixed synchronous rounds →
    fully deterministic.

    Weights are cast to int64 (pre-scale fractional weights) so partial
    sums are EXACT and commutative — unlike float, the result cannot depend
    on reduction order, which is what lets a pure driver-side recompute
    serve as a bit-exact oracle. Each round is two node/edge-scale
    hash-joins + one (dst, label) groupby; nothing is driver-resident, so
    the node table never has to fit anywhere. Returns ``(node, label)``.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    w_fn = (lambda t: pc.cast(t[weight], pa.int64())) if weight else (
        lambda t: pa.array(np.ones(len(t), dtype=np.int64)))
    e = _compact(edges.map_batches(
        lambda t: pa.table({"src": t[src], "dst": t[dst], "w": w_fn(t)}),
        batch_format="pyarrow",
    )).materialize()
    nodes = distinct(
        e.map_batches(lambda t: pa.table({"node": t["src"]}), batch_format="pyarrow")
        .union(e.map_batches(lambda t: pa.table({"node": t["dst"]}),
                             batch_format="pyarrow")),
        ["node"],
    )
    nodes = _compact(nodes).materialize()
    labels = nodes.map_batches(
        lambda t: pa.table({"node": t["node"], "label": t["node"]}),
        batch_format="pyarrow",
    ).materialize()

    def pick(g: pa.Table) -> pa.Table:
        lab = g["label"].to_pylist()
        w = g["w"].to_numpy(zero_copy_only=False)
        # max weight, ties → smallest label (groups are per-node label
        # tallies — degree-bounded, so a Python min over them is not hot)
        best = min(range(len(lab)), key=lambda i: (-int(w[i]), lab[i]))
        return pa.table({"node": g["dst"].slice(0, 1),
                         "label": g["label"].slice(best, 1)})

    for _ in range(iters):
        contrib = hash_join(
            e, labels, on=("src",), right_on=("node",)
        ).map_batches(
            lambda t: pa.table({"dst": t["dst"], "label": t["label"], "w": t["w"]}),
            batch_format="pyarrow",
        ).groupby(["dst", "label"]).aggregate(Sum("w", alias_name="w"))
        new = _compact(contrib.groupby("dst").map_groups(pick, batch_format="pyarrow"))
        # symmetrized input ⇒ every node has in-edges; left-join keeps any
        # isolated node (defensive) at its current label
        labels = hash_join(labels.map_batches(
            lambda t: pa.table({"node": t["node"], "old": t["label"]}),
            batch_format="pyarrow",
        ), new, on=("node",), how="left_outer").map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "label": pc.coalesce(t["label"], t["old"]),
            }),
            batch_format="pyarrow",
        )
        labels = _compact(labels).materialize()
    return labels


def group_quantiles(
    ds: Dataset, group_col: str, col: str, qs: list[float]
) -> Dataset:
    """Per-group exact quantiles, lower-index / ``quantile_disc`` semantics
    (value at in-group index ``floor(q·(n−1))`` of the sorted column) — the
    grouped complement of :func:`exact_quantiles`.

    ONE shuffle on the group key, then each group sorts only its own column
    in memory. Group size is the skew bound (the same grouped-path
    assumption as :func:`window_lag_lead`); for one corpus-scale group use
    :func:`exact_quantiles`'s global range-sort instead. Returns
    ``(group_col, q, value)``.
    """
    import numpy as np

    qs = list(qs)

    def fn(g: pa.Table) -> pa.Table:
        v = np.sort(g[col].to_numpy(zero_copy_only=False))
        idx = [int(q * (len(v) - 1)) for q in qs]
        return pa.table({
            group_col: pa.concat_arrays(
                [g[group_col].combine_chunks().slice(0, 1)] * len(qs)),
            "q": pa.array(qs, type=pa.float64()),
            "value": pa.array(v[idx], type=pa.float64()),
        })

    return ds.groupby(group_col).map_groups(fn, batch_format="pyarrow")


def _lev_rows(A, B, la, lb, k: int):
    """Levenshtein distances for n (a, b) string pairs SIMULTANEOUSLY,
    capped at ``k + 1``. ``A``/``B`` are (n, L) uint32 codepoint matrices
    (zero-padded), ``la``/``lb`` the true lengths.

    Standard row DP, but the per-row sequential insertion recurrence
    ``c[i] = min(best[i], c[i-1] + 1)`` is the min-plus prefix scan
    ``c[i] = i + runmin_{m≤i}(b[m] − m)`` — so every DP step is a handful
    of whole-(n, L)-array numpy ops and nothing iterates over pairs.
    """
    import numpy as np

    n, L = A.shape
    idx = np.arange(L + 1, dtype=np.int32)
    prev = np.broadcast_to(idx, (n, L + 1)).copy()
    res = np.where(lb == 0, la, 0).astype(np.int32)
    for j in range(1, L + 1):
        bj = B[:, j - 1:j]
        sub = prev[:, :-1] + (A != bj)           # substitution
        dele = prev[:, 1:] + 1                   # deletion from a
        best = np.minimum(sub, dele)             # everything but insertion
        # insertion chain as min-plus scan: t[0]=j (c[0]), t[m]=best[m-1]-m
        t = np.empty((n, L + 1), dtype=np.int32)
        t[:, 0] = j
        t[:, 1:] = best - idx[1:]
        cur = np.minimum.accumulate(t, axis=1) + idx
        hit = lb == j                            # pairs whose b ends here
        if hit.any():
            res[hit] = cur[hit, la[hit]]
        prev = cur
    return np.minimum(res, k + 1)


def fuzzy_pairs(
    ds: Dataset,
    block_col: str,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
) -> Dataset:
    """Blocked fuzzy self-join (entity-resolution candidate matching):
    within each blocking-key group, emit every unordered pair of rows whose
    banded Levenshtein distance is ≤ ``max_dist``.

    Blocking IS the scale contract (classic ER blocking): pairs are only
    compared inside a block, so the per-block row count bounds the quadratic
    candidate set — made explicit here because the in-group work is
    O(n_block²). A vectorized length-difference prefilter
    (``|len(a)−len(b)| > max_dist ⇒ dist > max_dist``) kills candidate
    pairs first; the survivors run a Levenshtein DP VECTORIZED ACROSS ALL
    PAIRS at once (each DP row's sequential insertion chain collapses to a
    min-plus prefix scan: ``c[i] = i + runmin_{m≤i}(b[m]−m)``) — no Python
    loop over pairs. Null text compares as "". Returns
    ``(block_col, id_a, id_b, dist)`` with ``id_a < id_b``.
    """
    import numpy as np

    def fn(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)  # ascending ids → deterministic id_a < id_b
        ids = ids[order]
        texts = ["" if x is None else x
                 for x in g[text_col].take(pa.array(order)).to_pylist()]
        lens = np.asarray([len(x) for x in texts], dtype=np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        ok = np.abs(lens[ii] - lens[jj]) <= max_dist
        ii, jj = ii[ok], jj[ok]
        if len(ii):
            L = int(lens.max())
            # one codepoint matrix per ROW (not per pair), gathered later
            M = np.zeros((len(texts), L), dtype=np.uint32)
            for i, s in enumerate(texts):
                if s:
                    M[i, :len(s)] = np.frombuffer(
                        s.encode("utf-32-le"), dtype=np.uint32)
            # bucketed bag-of-chars lower bound (bag ≤ Levenshtein, and
            # bucket-merging only weakens it): kills the bulk of the
            # length-compatible candidates before any DP runs
            H = np.zeros((len(texts), 64), dtype=np.int16)
            nz = M != 0
            rows = np.broadcast_to(np.arange(len(texts))[:, None], M.shape)
            np.add.at(H, (rows[nz], (M[nz] % 64).astype(np.int64)), 1)
            diff = H[ii].astype(np.int32) - H[jj]
            bound = np.maximum(np.clip(diff, 0, None).sum(axis=1),
                               np.clip(-diff, 0, None).sum(axis=1))
            cand = bound <= max_dist
            ii, jj = ii[cand], jj[cand]
            d = _lev_rows(M[ii], M[jj], lens[ii], lens[jj], max_dist)
            keep = d <= max_dist
            out_a, out_b, out_d = (ii[keep].tolist(), jj[keep].tolist(),
                                   d[keep].tolist())
        else:
            out_a, out_b, out_d = [], [], []
        id_arr = g[id_col].combine_chunks().take(pa.array(order, type=pa.int64()))
        return pa.table({
            block_col: pa.concat_arrays(
                [g[block_col].combine_chunks().slice(0, 1)] * len(out_a))
            if out_a else g[block_col].combine_chunks().slice(0, 0),
            "id_a": id_arr.take(pa.array(out_a, type=pa.int64())),
            "id_b": id_arr.take(pa.array(out_b, type=pa.int64())),
            "dist": pa.array(out_d, type=pa.int64()),
        })

    return ds.groupby(block_col).map_groups(fn, batch_format="pyarrow")


def latest_by_key(
    ds: Dataset, key_cols: list[str], order_cols: list[str]
) -> Dataset:
    """Latest-wins upsert resolution (SCD/CDC compaction: 'merge snapshots,
    keep each key's newest row'): per key, the row with the lexicographically
    greatest ``order_cols`` tuple. Include a unique id as the last order
    column for a total order; key columns must be non-null.

    Per-batch COMBINER first — each block keeps one row per key it sees
    (Arrow ``sort_by`` + vectorized run-boundary mask, no Python rows) — so
    the one groupby exchange carries at most ``blocks × keys-per-block``
    rows, never the full history. The same kernel then reduces each group.
    """
    cols = key_cols + order_cols

    def last_per_key(t: pa.Table) -> pa.Table:
        if len(t) <= 1:
            return t
        t = t.sort_by([(c, "ascending") for c in cols])
        n = len(t)
        boundary = None  # row i is the LAST of its key-run
        for c in key_cols:
            col = t[c].combine_chunks()
            ne = pc.not_equal(col.slice(0, n - 1), col.slice(1))
            boundary = ne if boundary is None else pc.or_(boundary, ne)
        mask = pa.concat_arrays([
            boundary.combine_chunks() if isinstance(boundary, pa.ChunkedArray)
            else boundary,
            pa.array([True]),
        ])
        return t.filter(mask)

    return (
        ds.map_batches(last_per_key, batch_format="pyarrow")
        .groupby(key_cols)
        .map_groups(last_per_key, batch_format="pyarrow")
    )


def except_distinct(left: Dataset, right: Dataset, cols: list[str]) -> Dataset:
    """``SELECT DISTINCT cols FROM left EXCEPT SELECT DISTINCT cols FROM
    right`` — set difference over key tuples. Both sides run the
    :func:`distinct` combiner first (per-batch local dedup), so the anti-join
    exchange carries unique keys only, never raw rows; the join itself is
    Ray's partitioned ``left_anti``."""
    l_d = _compact(distinct(left.select_columns(cols), cols)).materialize()
    r_d = _compact(distinct(right.select_columns(cols), cols)).materialize()
    if r_d.count() == 0:
        return l_d
    if l_d.count() == 0:
        return l_d
    return hash_join(l_d, r_d, on=tuple(cols), how="left_anti")


def intersect_distinct(left: Dataset, right: Dataset, cols: list[str]) -> Dataset:
    """``INTERSECT`` over distinct key tuples — same reduced-sides shape as
    :func:`except_distinct`, with Ray's partitioned ``left_semi`` join."""
    l_d = _compact(distinct(left.select_columns(cols), cols)).materialize()
    r_d = _compact(distinct(right.select_columns(cols), cols)).materialize()
    if l_d.count() == 0 or r_d.count() == 0:
        return l_d.limit(0)
    return hash_join(l_d, r_d, on=tuple(cols), how="left_semi")


def weighted_sample_topk(
    ds: Dataset,
    id_col: str,
    weight_col: str,
    k: int,
    keep_cols: list[str] | None = None,
) -> pa.Table:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row gets key ``u^(1/w)`` where ``u ∈ (0,1)`` is a
    fixed multiplicative hash of the id (Knuth 2654435761 mod 2^32) and
    ``w = max(weight, 1)``; the k largest keys are the sample. Heavier rows
    hash to larger keys in expectation, so inclusion probability is
    proportional to weight — and the hash (not an RNG) makes the draw
    reproducible across engines and cluster sizes.

    Distribution shape: per-batch local top-k combiner (sort only the block),
    then one O(blocks·k)-row driver reduce — the corpus never shuffles.
    Oracle-equivalent: ``ORDER BY pow(u, 1.0/w) DESC, id LIMIT k``.
    Ties break to ``id_col`` ascending. Returns an Arrow table with
    ``id_col`` + ``keep_cols``, sample-key order.
    """
    import numpy as np

    keep_cols = keep_cols or []

    def local(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.maximum(w, 1.0)
        # uint64 hash (no int64 wrap/warnings for large ids; exact mod 2^32)
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        u = (h.astype(np.float64) + 1) / 4294967297.0
        key = u ** (1.0 / w)
        order = np.lexsort((ids, -key))[: min(k, len(ids))]
        out = t.select([id_col, *keep_cols]).take(pa.array(order))
        return out.append_column("_key", pa.array(key[order], type=pa.float64()))

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["_key", id_col], ascending=[False, True],
                            kind="stable").head(k)
    return pa.Table.from_pandas(
        cand.drop(columns=["_key"]).reset_index(drop=True), preserve_index=False)


def histogram_fixed(ds: Dataset, col: str, width: int) -> Dataset:
    """Fixed-width histogram over an integer column: one row per occupied
    bucket ``floor(col / width)`` with count / min / max. The entire
    reduction is a per-batch Arrow ``group_by`` combiner followed by a
    bucket-cardinality groupby — the exchange moves O(blocks × buckets)
    rows, so a 100-TB scan reduces to a few-KB result with no full shuffle.
    Returns ``(bucket, n, min_v, max_v)``."""
    from ray.data.aggregate import Max, Min, Sum

    if width <= 0:
        raise ValueError(f"histogram_fixed: width must be > 0, got {width}")

    def local(t: pa.Table) -> pa.Table:
        v = pc.cast(t[col], pa.int64())
        part = pa.table({
            "bucket": pc.if_else(
                pc.less(v, 0),
                # floor toward -inf for negatives (Arrow divide truncates)
                pc.divide(pc.subtract(v, width - 1), width),
                pc.divide(v, width)),
            "v": v,
        }).group_by("bucket").aggregate([("v", "count"), ("v", "min"),
                                         ("v", "max")])
        return part.rename_columns(["bucket", "n", "min_v", "max_v"])

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"),
                   Min("min_v", alias_name="min_v"),
                   Max("max_v", alias_name="max_v"))
    )


def pivot_counts(
    ds: Dataset, key_col: str, cat_col: str, categories: list[str]
) -> Dataset:
    """Pivot a categorical column into per-category count columns (``count(*)
    FILTER (WHERE cat = c)`` per category): one row per key with ``n_<c>``
    int64 columns. Per-batch combiner first — each block reduces to one
    partial row per key it sees — then one groupby over partials; rows that
    match no listed category still count toward the key's presence (a key
    row with all-zero counts), mirroring SQL's FILTER semantics."""
    from ray.data.aggregate import Sum

    names = [f"n_{c}" for c in categories]

    def local(t: pa.Table) -> pa.Table:
        cols = {key_col: t[key_col]}
        for c, name in zip(categories, names):
            cols[name] = pc.cast(pc.equal(t[cat_col], c), pa.int64())
        part = pa.table(cols).group_by(key_col).aggregate(
            [(n, "sum") for n in names])
        return part.rename_columns([key_col, *names])

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(*[Sum(n, alias_name=n) for n in names])
    )


def grouped_moments(
    ds: Dataset, key_col: str, x_col: str, y_col: str
) -> Dataset:
    """Per-group second-moment sufficient statistics over two INT64 columns:
    ``(key, n, sx, sy, sxx, syy, sxy)`` — everything mean / variance /
    stddev / covariance / correlation derive from, reduced EXACTLY.

    Integer sums are associative and commutative, so unlike float
    accumulation the result is independent of block order and reduction
    tree — the caller can finalize (divide / sqrt on the exact sums) with
    bit-identical results on any engine. Caller pre-scales fractional
    inputs to int64 (e.g. cents); int64 holds Σx² to ~10^18, so scale so
    that ``max(x)² · rows`` stays below that (document the bound at the
    call site). Per-batch Arrow group_by combiner → one partial row per
    (block, key) through the exchange."""
    from ray.data.aggregate import Sum

    stat_names = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def local(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col], pa.int64())
        y = pc.cast(t[y_col], pa.int64())
        part = pa.table({
            key_col: t[key_col],
            "n": pa.array([1] * len(t), type=pa.int64()),
            "sx": x, "sy": y,
            "sxx": pc.multiply(x, x), "syy": pc.multiply(y, y),
            "sxy": pc.multiply(x, y),
        }).group_by(key_col).aggregate([(n, "sum") for n in stat_names])
        return part.rename_columns([key_col, *stat_names])

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(*[Sum(n, alias_name=n) for n in stat_names])
    )


def k_hop(
    edges: Dataset,
    seeds: list,
    k: int,
    src: str = "src",
    dst: str = "dst",
) -> Dataset:
    """BFS ``k``-hop neighborhood with hop labels over a directed edge list
    (pass both directions for undirected graphs). Seeds are hop 0; ``hop``
    is the BFS level (shortest distance ≤ k).

    Each round is one frontier⋈edges hash join plus one anti-join against
    the visited set (left-outer join + null filter) — frontier and visited
    stay node-scale Datasets end to end, nothing driver-resident, so the
    reachable set never has to fit anywhere. Early-exits when a frontier
    drains. Returns ``(node, hop)``.
    """
    e = _compact(edges.map_batches(
        lambda t: pa.table({"src": t[src], "dst": t[dst]}), batch_format="pyarrow"
    )).materialize()
    node_type = e.schema().base_schema.field("src").type
    visited = ray.data.from_arrow(pa.table({
        "node": pa.array(sorted(set(seeds)), type=node_type),
        "hop": pa.array([0] * len(set(seeds)), type=pa.int64()),
    })).materialize()
    frontier = visited

    for lvl in range(1, k + 1):
        nbrs = _compact(distinct(
            hash_join(
                e,
                frontier.map_batches(lambda t: pa.table({"node": t["node"]}),
                                     batch_format="pyarrow"),
                on=("src",), right_on=("node",),
            ).map_batches(lambda t: pa.table({"node": t["dst"]}),
                          batch_format="pyarrow"),
            ["node"],
        )).materialize()  # node-scale; also needed for the empty check below
        # Ray's hash-shuffle join raises ArrowInvalid (zero-column partition
        # tables) when an input side delivers zero blocks — which is exactly
        # what a drained neighbor set produces (e.g. a seed with no
        # out-edges). An empty frontier also just means BFS is done, so
        # early-exit BEFORE the anti-join instead of after it.
        if nbrs.count() == 0:
            break
        seen = visited.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "_m": pa.array([1] * len(t), type=pa.int8())}),
            batch_format="pyarrow",
        )
        new = _compact(
            hash_join(nbrs, seen, on=("node",), how="left_outer").map_batches(
                lambda t, lvl=lvl: pa.table({
                    "node": t["node"],
                    "hop": pa.array([lvl] * len(t), type=pa.int64()),
                }).filter(pc.is_null(t["_m"])),
                batch_format="pyarrow",
            )).materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new
    return visited


def grouped_ntile_stats(
    ds: Dataset,
    group_col: str,
    order_col: str,
    id_col: str,
    k: int,
) -> Dataset:
    """SQL ``NTILE(k)`` bucket statistics per group: ``(group, tile, n,
    min_v, max_v)`` of ``order_col``, ordering rows by ``(order_col,
    id_col)`` so ties are broken deterministically — mirrors
    ``ntile(k) OVER (PARTITION BY g ORDER BY v, id)`` followed by a
    per-(g, tile) count/min/max rollup.

    Standard SQL tile sizing: with n rows the first ``n % k`` tiles hold
    ``ceil(n/k)`` rows and the rest ``floor(n/k)``; when ``n < k`` the
    trailing tiles are empty and (like the SQL rollup) emit no row.

    ONE shuffle on the group key, then each group sorts its own rows in
    memory — the same skew bound as :func:`group_quantiles` (a group must
    fit a worker). For a single corpus-scale group, derive tile BOUNDARIES
    from :func:`exact_quantiles`'s two-pass histogram instead and bucket by
    value; rank-exact NTILE fundamentally needs the group's total order.
    min/max are picked from the sorted values (no float arithmetic), so the
    result hash-matches the SQL engine exactly.
    """
    import numpy as np

    if k <= 0:
        raise ValueError("grouped_ntile_stats: k must be >= 1")

    def fn(g: pa.Table) -> pa.Table:
        v = g[order_col].to_numpy(zero_copy_only=False)
        i = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, v))
        vs = v[order]
        n = len(vs)
        base, rem = divmod(n, k)
        sizes = np.full(k, base, dtype=np.int64)
        sizes[:rem] += 1
        nz = sizes > 0
        ends = np.cumsum(sizes)
        starts = ends - sizes
        m = int(nz.sum())
        return pa.table({
            group_col: pa.concat_arrays(
                [g[group_col].combine_chunks().slice(0, 1)] * m),
            "tile": pa.array((np.arange(k) + 1)[nz], type=pa.int64()),
            "n": pa.array(sizes[nz], type=pa.int64()),
            "min_v": pa.array(vs[starts[nz]], type=pa.float64()),
            "max_v": pa.array(vs[ends[nz] - 1], type=pa.float64()),
        })

    return ds.groupby(group_col).map_groups(fn, batch_format="pyarrow")


def grouped_mode(ds: Dataset, group_col: str, value_col: str) -> Dataset:
    """Most frequent ``value_col`` per group (ties → smallest value) —
    ``row_number() OVER (PARTITION BY g ORDER BY cnt DESC, v) = 1`` over the
    grouped counts, as ONE shuffle.

    Per-batch Arrow ``group_by`` combiner collapses each block to one
    partial-count row per (group, value) BEFORE the exchange; the group-key
    shuffle then carries O(distinct values × blocks) rows per group, never
    raw rows, and the per-group finalize merges partials and takes the
    argmax. Skew bound: a group's distinct-value count, not its row count.
    """
    import numpy as np

    def local(t: pa.Table) -> pa.Table:
        part = pa.table({
            group_col: t[group_col],
            value_col: t[value_col],
            "n": pa.array(np.ones(len(t), dtype=np.int64)),
        }).group_by([group_col, value_col]).aggregate([("n", "sum")])
        return part.rename_columns([group_col, value_col, "n"])

    def pick(g: pa.Table) -> pa.Table:
        merged = g.group_by(value_col).aggregate([("n", "sum")])
        n = merged["n_sum"].to_numpy(zero_copy_only=False)
        vals = merged[value_col].to_pylist()
        best = min(range(len(vals)), key=lambda j: (-int(n[j]), vals[j]))
        return pa.table({
            group_col: g[group_col].combine_chunks().slice(0, 1),
            "top_value": pa.array([vals[best]], type=merged[value_col].type),
            "n": pa.array([int(n[best])], type=pa.int64()),
        })

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(pick, batch_format="pyarrow")
    )


def kcore(
    und_edges: Dataset,
    k: int,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 60,
) -> "pa.Table | Dataset":
    """k-core decomposition by iterative peeling over DISTINCT undirected
    edges (each pair present once, either orientation): every round computes
    node degrees (per-batch combiner + node-bounded groupby), drops nodes
    with degree < k, and SEMI-joins the survivor set back onto both
    endpoints (:func:`hash_join_sized` — broadcast probe at small scale,
    distributed join above its threshold). Edge/node tables shrink
    monotonically; a round that drops nothing terminates. The iteration cap
    RAISES instead of silently truncating (no-silent-caps rule): peel depth
    is bounded by the graph's degeneracy ordering length, pathological only
    for adversarial chain constructions.

    Returns a Dataset of (node, core_deg) — each surviving node with its
    within-core degree — sorted by node, or an empty Arrow table when the
    k-core is empty.
    """
    from ray.data.aggregate import Sum

    sym = und_edges.union(und_edges.map_batches(
        lambda t: pa.table({src: t[dst], dst: t[src]}),
        batch_format="pyarrow")).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by([src]).aggregate([(src, "count")])
        return pa.table({src: g[src],
                         "d": pc.cast(g[f"{src}_count"], pa.int64())})

    for _ in range(max_iters):
        deg = (sym.map_batches(deg_partial, batch_format="pyarrow")
               .groupby(src).aggregate(Sum("d", alias_name="degree"))
               ).materialize()
        alive = deg.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t["degree"], pa.scalar(k, pa.int64()))).select([src]),
            batch_format="pyarrow").materialize()
        n_alive, n_nodes = alive.count(), deg.count()
        if n_alive == 0:
            return pa.table({"node": pa.array([], pa.string()),
                             "core_deg": pa.array([], pa.int64())})
        if n_alive == n_nodes:  # converged: nothing dropped this round
            out = deg.map_batches(
                lambda t: pa.table({"node": t[src],
                                    "core_deg": pc.cast(t["degree"],
                                                        pa.int64())}),
                batch_format="pyarrow")
            return out.sort("node")
        alive_c = _compact(alive)
        sym = hash_join_sized(sym, alive_c, on=(src,), how="left_semi")
        sym = hash_join_sized(
            sym, alive_c.map_batches(
                lambda t: pa.table({dst: t[src]}), batch_format="pyarrow"),
            on=(dst,), how="left_semi").materialize()
    raise RuntimeError(
        f"kcore: no convergence in {max_iters} peel rounds — raise "
        f"max_iters (adversarial peel depth)")


def hits(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 8,
    round_decimals: int = 9,
    driver_edge_limit: int = 500_000,
) -> Dataset:
    """HITS hubs-and-authorities over a directed weighted edge list —
    the dual-score companion to :func:`pagerank` (reference: the repo's
    graph analysis stops at notebook networkx calls; this is the
    Ray-native iterative formulation). Two regimes with identical math:

    * ``edges <= driver_edge_limit`` (a constructed KG is ~10^6x smaller
      than its corpus): canonical-sorted edges iterate on the driver —
      each of the ``iters`` rounds is two dense ``np.add.at`` passes.
    * larger graphs: each half-step is ``edges ⋈ score → per-batch
      partial → groupby(node).sum`` with only node-scale tables ever
      materialized; edge blocks stream through every join.

    Per half-step discipline (what makes re-runs bit-stable and the
    driver regime a faithful oracle mirror): raw sums round to
    ``round_decimals``; the L1 norm is then the EXACT integer sum of the
    rounded values scaled by ``10^round_decimals`` — an order-independent
    fold, unlike a float total — and the normalized scores round again.
    As with :func:`pagerank`, the two regimes differ in float partial-sum
    decomposition, so a value exactly on a rounding boundary could in
    principle flip an ulp across regimes; rounding guarantees bit-stable
    re-runs WITHIN a regime.

    update: ``auth[v] = Σ_{u→v} w·hub[u]`` then L1-normalize;
    ``hub[u] = Σ_{u→v} w·auth[v]`` then L1-normalize. Nodes appearing
    only as sources carry auth 0 (and vice versa). Returns
    ``(node, hub, auth)`` float64 rounded to ``round_decimals``.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    scale = 10 ** round_decimals
    w_expr = (lambda t: pc.cast(t[weight], pa.float64())) if weight else (
        lambda t: pa.array(np.ones(len(t)), type=pa.float64()))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[src], "dst": t[dst], "w": w_expr(t)})

    e = _compact(edges.map_batches(project, batch_format="pyarrow")).materialize()
    n_edges = e.count()

    if n_edges == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "hub": pa.array([], pa.float64()),
            "auth": pa.array([], pa.float64())}))

    if n_edges <= driver_edge_limit:
        rows = sorted(((r["src"], r["dst"], float(r["w"]))
                       for r in e.take_all()))
        nodes_l = sorted({a for a, _, _ in rows} | {b for _, b, _ in rows})
        pos = {v: i for i, v in enumerate(nodes_l)}
        nn = len(nodes_l)
        si = np.asarray([pos[a] for a, _, _ in rows], dtype=np.int64)
        di = np.asarray([pos[b] for _, b, _ in rows], dtype=np.int64)
        wv = np.asarray([x for _, _, x in rows], dtype=np.float64)

        def l1_norm(raw: "np.ndarray") -> "np.ndarray":
            v = np.round(raw, round_decimals)
            s_int = int(np.round(v * scale).astype(np.int64).sum())
            if s_int <= 0:
                return v
            return np.round(v * scale / s_int, round_decimals)

        h = np.full(nn, round(1.0 / nn, round_decimals))
        a = np.zeros(nn)
        for _ in range(iters):
            a_raw = np.zeros(nn)
            np.add.at(a_raw, di, wv * h[si])
            a = l1_norm(a_raw)
            h_raw = np.zeros(nn)
            np.add.at(h_raw, si, wv * a[di])
            h = l1_norm(h_raw)
        node_type = e.schema().base_schema.field("src").type
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes_l, type=node_type),
            "hub": pa.array(h, pa.float64()),
            "auth": pa.array(a, pa.float64())}))

    # distributed regime: node-keyed score tables, edge blocks stream
    nodes = _compact(distinct(
        e.map_batches(lambda t: pa.table({"node": t["src"]}),
                      batch_format="pyarrow")
        .union(e.map_batches(lambda t: pa.table({"node": t["dst"]}),
                             batch_format="pyarrow")),
        ["node"])).materialize()
    n = nodes.count()
    r0 = round(1.0 / n, round_decimals)
    hub = nodes.map_batches(
        lambda t: t.append_column("s", pa.array(
            np.full(len(t), r0), pa.float64())),
        batch_format="pyarrow").materialize()

    def _half_step(score: Dataset, key_in: str, key_out: str) -> Dataset:
        """edges ⋈ score(key_in) → Σ w·s per key_out, rounded + exact-int
        L1-normalized node scores (nodes absent from the sum get 0)."""
        j = hash_join(
            e, _compact(score.map_batches(
                lambda t: t.rename_columns([key_in, "s"]),
                batch_format="pyarrow")),
            on=(key_in,))

        def partial(t: pa.Table) -> pa.Table:
            g = pa.table({
                "node": t[key_out],
                "c": pc.multiply(t["w"], t["s"])}).group_by(
                ["node"]).aggregate([("c", "sum")])
            return pa.table({"node": g["node"], "c": g["c_sum"]})

        raw = _compact(j.map_batches(partial, batch_format="pyarrow")
                       .groupby("node").aggregate(Sum("c", alias_name="c")))
        rounded = raw.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "v": pc.round(t["c"], ndigits=round_decimals)}),
            batch_format="pyarrow").materialize()
        s_int = 0
        for b in rounded.map_batches(
                lambda t: pa.table({"si": pa.array(
                    [int(pc.sum(pc.cast(pc.round(pc.multiply(t["v"], scale)),
                                        pa.int64())).as_py() or 0)],
                    pa.int64())}),
                batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
            s_int += sum(b["si"].to_pylist())
        joined = hash_join_sized(nodes, _compact(rounded), on=("node",),
                                 how="left_outer")
        if s_int <= 0:
            return joined.map_batches(
                lambda t: pa.table({
                    "node": t["node"],
                    "s": pc.coalesce(t["v"], pa.scalar(0.0, pa.float64()))}),
                batch_format="pyarrow").materialize()
        return joined.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "s": pc.round(pc.divide(pc.multiply(
                    pc.coalesce(t["v"], pa.scalar(0.0, pa.float64())),
                    pa.scalar(float(scale), pa.float64())),
                    pa.scalar(float(s_int), pa.float64())),
                    ndigits=round_decimals)}),
            batch_format="pyarrow").materialize()

    auth = None
    for _ in range(iters):
        auth = _half_step(hub, "src", "dst")
        hub = _half_step(auth, "dst", "src")
    out = hash_join(hub.map_batches(
        lambda t: t.rename_columns(["node", "hub"]),
        batch_format="pyarrow"),
        auth.map_batches(lambda t: t.rename_columns(["node", "auth"]),
                         batch_format="pyarrow"),
        on=("node",))
    return out.map_batches(
        lambda t: t.select(["node", "hub", "auth"]), batch_format="pyarrow")


def skyline2d(
    ds: Dataset,
    x: str,
    y: str,
    *,
    candidate_limit: int = 4_000_000,
) -> Dataset:
    """2-D skyline (Pareto frontier, both dimensions MINIMIZED): rows not
    dominated by any other row, where ``b`` dominates ``a`` iff
    ``b.x <= a.x AND b.y <= a.y`` with strict inequality in at least one
    dimension. Duplicate frontier points all survive (neither dominates).

    Distributed shape: every block reduces to its LOCAL skyline first (a
    vectorized lexsort + running-strict-min scan — dominance is
    transitive, so the union of local skylines is a superset of the
    global one), then ONE single-partition pass over the O(blocks ·
    local-frontier) candidates finishes the job — no shuffle, no driver
    loop. Partitioning assumption (documented like grouped_ntile's group
    bound): the candidate union must fit one worker; real-data frontiers
    are tiny, but fully anti-correlated dimensions degenerate to O(n) —
    the ``candidate_limit`` guard raises rather than silently truncating
    (no-silent-caps rule). Numeric (int/float) dimensions only.
    """
    import numpy as np

    def local(t: pa.Table) -> pa.Table:
        if len(t) <= 1:
            return t
        xs0 = t[x].to_numpy(zero_copy_only=False)
        ys0 = t[y].to_numpy(zero_copy_only=False)
        order = np.lexsort((ys0, xs0))
        xs, ys = xs0[order], ys0[order]
        first = np.concatenate(([True], xs[1:] != xs[:-1]))
        grp_min = ys[first]  # per-x-group minimal y (sorted scan)
        run_prev = np.concatenate(
            ([np.inf], np.minimum.accumulate(grp_min)[:-1]))
        keep_group = grp_min < run_prev
        gid = np.cumsum(first) - 1
        keep = keep_group[gid] & (ys == grp_min[gid])
        return t.take(pa.array(order[keep], pa.int64()))

    cand = ds.map_batches(local, batch_format="pyarrow").materialize()
    n_cand = cand.count()
    if n_cand > candidate_limit:
        raise ValueError(
            f"skyline2d: {n_cand} local-frontier candidates exceed "
            f"candidate_limit={candidate_limit} — the dimensions are "
            "near-anti-correlated; pre-bucket one dimension or raise the "
            "limit if one worker can hold the union")
    # batch_size=None → one batch per block; after repartition(1) the
    # single block IS the candidate union, so `local` is global here
    return cand.repartition(1).map_batches(local, batch_size=None,
                                           batch_format="pyarrow")


def sssp(
    edges: Dataset,
    seeds: list,
    *,
    src: str = "src",
    dst: str = "dst",
    cost: str = "cost",
    max_iters: int = 30,
    driver_edge_limit: int = 500_000,
) -> Dataset:
    """Single-source(s) shortest paths over a directed edge list with
    INTEGER edge costs — weighted Bellman-Ford, the cost-aware sibling of
    :func:`k_hop` (which is the cost==1 special case). Integer costs make
    every distance exact: there is no float accumulation anywhere, so both
    regimes and any reduction order agree bit-for-bit.

    * ``edges <= driver_edge_limit``: canonical-sorted edges relax in a
      numpy loop on the driver (a constructed KG's edge table is tiny).
    * larger graphs: the distance table stays a node-scale Dataset; each
      round is one edges⋈dist hash join → per-batch (dst, min) combiner →
      groupby(dst).min, then a full-outer min-merge with the current
      distances. Early-exits when a round improves nothing (bounded
      O(blocks) driver fold of per-block improvement counts); edge blocks
      stream through every join.

    Negative costs are rejected (raise) — with non-negative costs
    ``max_iters`` rounds bound the reachable diameter and the early-exit
    fires first on real graphs. Returns ``(node, dist)`` for REACHED nodes
    only (seeds at dist 0); unreachable nodes are absent.
    """
    import numpy as np

    from ray.data.aggregate import Min, Sum

    def project(t: pa.Table) -> pa.Table:
        c = pc.cast(t[cost], pa.int64())
        if len(t) and (pc.min(c).as_py() or 0) < 0:
            raise ValueError("sssp: negative edge cost")
        return pa.table({"src": t[src], "dst": t[dst], "cost": c})

    e = _compact(edges.map_batches(project, batch_format="pyarrow")).materialize()
    node_type = e.schema().base_schema.field("src").type
    seed_l = sorted(set(seeds))
    n_edges = e.count()

    if n_edges <= driver_edge_limit:
        rows = sorted((r["src"], r["dst"], int(r["cost"]))
                      for r in e.take_all())
        nodes_l = sorted({a for a, _, _ in rows} | {b for _, b, _ in rows}
                         | set(seed_l))
        pos = {v: i for i, v in enumerate(nodes_l)}
        INF = np.iinfo(np.int64).max
        d = np.full(len(nodes_l), INF, dtype=np.int64)
        for s_ in seed_l:
            d[pos[s_]] = 0
        si = np.asarray([pos[a] for a, _, _ in rows], dtype=np.int64)
        di = np.asarray([pos[b] for _, b, _ in rows], dtype=np.int64)
        cv = np.asarray([c for _, _, c in rows], dtype=np.int64)
        for _ in range(max_iters):
            reach = d[si] != INF
            cand = np.where(reach, d[si] + np.where(reach, cv, 0), INF)
            new = d.copy()
            np.minimum.at(new, di, cand)
            if np.array_equal(new, d):
                break
            d = new
        keep = d != INF
        return ray.data.from_arrow(pa.table({
            "node": pa.array([v for v, k in zip(nodes_l, keep) if k],
                             type=node_type),
            "dist": pa.array(d[keep], pa.int64())}))

    dist = ray.data.from_arrow(pa.table({
        "node": pa.array(seed_l, type=node_type),
        "dist": pa.array([0] * len(seed_l), pa.int64()),
    })).materialize()

    for _ in range(max_iters):
        # dist starts seed-sized (possibly 1 row): size-adaptive join is
        # mandatory (Ray 2.49 sparse-side partition crash — see
        # hash_join_sized)
        j = hash_join_sized(e, _compact(dist), on=("src",),
                            right_on=("node",))

        def relax(t: pa.Table) -> pa.Table:
            g = pa.table({"node": t["dst"],
                          "d": pc.add(t["dist"], t["cost"])}).group_by(
                ["node"]).aggregate([("d", "min")])
            return pa.table({"node": g["node"], "d": g["d_min"]})

        cand = _compact(j.map_batches(relax, batch_format="pyarrow")
                        .groupby("node").aggregate(Min("d", alias_name="d")))
        cand = cand.materialize()
        if cand.count() == 0:
            break
        merged = hash_join_sized(cand, _compact(dist), on=("node",),
                                 how="full_outer").map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "dist": pc.min_element_wise(
                    pc.coalesce(t["d"], pa.scalar(2**62, pa.int64())),
                    pc.coalesce(t["dist"], pa.scalar(2**62, pa.int64()))),
                "improved": pc.cast(pc.and_(
                    pc.is_valid(t["d"]),
                    pc.or_(pc.is_null(t["dist"]),
                           pc.less(pc.coalesce(t["d"],
                                               pa.scalar(2**62, pa.int64())),
                                   pc.coalesce(t["dist"],
                                               pa.scalar(2**62,
                                                         pa.int64()))))),
                    pa.int64())}),
            batch_format="pyarrow").materialize()
        improved = 0
        for b in merged.map_batches(
                lambda t: pa.table({"i": pa.array(
                    [int(pc.sum(t["improved"]).as_py() or 0)], pa.int64())}),
                batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
            improved += sum(b["i"].to_pylist())
        dist = merged.map_batches(
            lambda t: t.select(["node", "dist"]),
            batch_format="pyarrow").materialize()
        if improved == 0:
            break
    return dist


def random_walks(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    walk_len: int = 4,
    walks_per_node: int = 2,
    salt: str = "w",
) -> Dataset:
    """Deterministic random-walk corpus generation over a directed edge
    list — the graph-embedding training-data step (DeepWalk/node2vec
    input): ``walks_per_node`` walks of up to ``walk_len`` steps from
    EVERY node. "Random" choices are salted crc32 draws keyed by
    (start, walk#, step, current), so the corpus is bit-reproducible
    across runs, engines and cluster sizes — the same auditability
    property as the negative sampler. Parallel edges act as sampling
    weights (each occurrence is a slot).

    Distributed shape: the adjacency ranks once (per-src sorted neighbor
    slots via one groupby — group size = out-degree), then each step is
    two hash joins (state ⋈ degree → salted slot pick, state ⋈ adjacency
    on (node, slot) → next hop); the walk state stays a bounded
    (nodes × walks_per_node)-row Dataset and dead ends simply drop out of
    the inner join. walk_len is the documented iteration bound. Returns
    ``(node, w, step, visited)`` — step 0 is the start itself.
    """
    import zlib

    from ray.data.aggregate import Sum

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[src], "dst": t[dst]})

    e = _compact(edges.map_batches(project, batch_format="pyarrow")).materialize()

    def rank_group(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t["dst"])
        return pa.table({
            "a_src": t["src"].take(order),
            "a_dst": t["dst"].take(order),
            "slot": pa.array(range(len(t)), pa.int64())})

    adj = e.groupby("src").map_groups(rank_group,
                                      batch_format="pyarrow").materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([("src", "count")])
        return pa.table({"node": g["src"],
                         "deg": pc.cast(g["src_count"], pa.int64())})

    deg = _compact(e.map_batches(deg_partial, batch_format="pyarrow")
                   .groupby("node").aggregate(Sum("deg", alias_name="deg"))) \
        .materialize()

    nodes = _compact(distinct(
        e.map_batches(lambda t: pa.table({"n": t["src"]}),
                      batch_format="pyarrow")
        .union(e.map_batches(lambda t: pa.table({"n": t["dst"]}),
                             batch_format="pyarrow")), ["n"])).materialize()

    def init_state(t: pa.Table) -> pa.Table:
        reps = pa.concat_tables([t] * walks_per_node) \
            if walks_per_node > 1 else t
        w = pa.array([i for i in range(walks_per_node)
                      for _ in range(len(t))], pa.int64())
        return pa.table({"node": reps["n"], "w": w, "cur": reps["n"],
                         "step": pa.array([0] * len(reps), pa.int64())})

    state = nodes.map_batches(init_state, batch_format="pyarrow") \
        .materialize()
    emitted = [state.map_batches(
        lambda t: pa.table({"node": t["node"], "w": t["w"],
                            "step": t["step"], "visited": t["cur"]}),
        batch_format="pyarrow")]

    for step in range(1, walk_len + 1):
        st = hash_join_sized(_compact(state), deg, on=("cur",),
                             right_on=("node",))
        # Ray's join may suffix/drop the duplicate right key col; keep ours
        def pick(t: pa.Table, step=step) -> pa.Table:
            slots = []
            for nd, w_, cur, dg in zip(t["node"].to_pylist(),
                                       t["w"].to_pylist(),
                                       t["cur"].to_pylist(),
                                       t["deg"].to_pylist()):
                h = zlib.crc32(f"{salt}|{nd}|{w_}|{step}|{cur}".encode())
                slots.append(h % dg)
            return pa.table({"node": t["node"], "w": t["w"],
                             "cur": t["cur"],
                             "slot": pa.array(slots, pa.int64())})

        stp = st.map_batches(pick, batch_format="pyarrow")
        nxt = hash_join_sized(_compact(stp), adj, on=("cur", "slot"),
                              right_on=("a_src", "slot")).materialize()
        if nxt.count() == 0:
            break
        state = nxt.map_batches(
            lambda t, step=step: pa.table({
                "node": t["node"], "w": t["w"], "cur": t["a_dst"],
                "step": pa.array([step] * len(t), pa.int64())}),
            batch_format="pyarrow").materialize()
        emitted.append(state.map_batches(
            lambda t: pa.table({"node": t["node"], "w": t["w"],
                                "step": t["step"], "visited": t["cur"]}),
            batch_format="pyarrow"))

    out = emitted[0]
    for e_ in emitted[1:]:
        out = out.union(e_)
    return out


def profile_table(ds: Dataset, cols: list[str]) -> Dataset:
    """Column-profile a table in ONE streaming pass + one bounded groupby —
    the data-quality report a 100-TB ingest job runs before anything else:
    per column, row count, null count, EXACT distinct count, and
    lexicographic min/max of the string form. Per block, every column
    reduces to one (col, n, n_null, min_s, max_s) stats row plus its
    distinct (col, sval) set — so the distinct exchange carries each
    column's per-block value SET, not its rows. Exact distincts are the
    right call for dimension-scale profiling; swap the distinct leg for
    :func:`approx_distinct` (HLL) when a column is unique-key-scale and
    ±2 % suffices. Values compare as strings on both engines (ints and
    strings only — float→string formatting is engine-specific)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def stats_partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs = [], [], [], [], []
        for c in cols:
            a = t[c]
            sv = pc.cast(a, pa.string())
            valid = pc.drop_null(sv)
            names.append(c)
            ns.append(len(a))
            nulls.append(len(a) - len(valid))
            mins.append(pc.min(valid).as_py() if len(valid) else None)
            maxs.append(pc.max(valid).as_py() if len(valid) else None)
        return pa.table({"col": pa.array(names, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "n_null": pa.array(nulls, pa.int64()),
                         "min_s": pa.array(mins, pa.string()),
                         "max_s": pa.array(maxs, pa.string())})

    stats = (ds.map_batches(stats_partial, batch_format="pyarrow")
             .groupby("col").aggregate(
                 Sum("n", alias_name="n"),
                 Sum("n_null", alias_name="n_null"),
                 Min("min_s", alias_name="min_val"),
                 Max("max_s", alias_name="max_val")))

    def distinct_partial(t: pa.Table) -> pa.Table:
        cs, vs = [], []
        for c in cols:
            u = pc.unique(pc.drop_null(pc.cast(t[c], pa.string())))
            cs.extend([c] * len(u))
            vs.extend(u.to_pylist())
        return pa.table({"col": pa.array(cs, pa.string()),
                         "sval": pa.array(vs, pa.string())})

    dist = distinct(ds.map_batches(distinct_partial,
                                   batch_format="pyarrow"),
                    ["col", "sval"])

    def dcount_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["col"]).aggregate([("sval", "count")])
        return pa.table({"col": g["col"],
                         "nd": pc.cast(g["sval_count"], pa.int64())})

    ndist = (dist.map_batches(dcount_partial, batch_format="pyarrow")
             .groupby("col").aggregate(Sum("nd", alias_name="n_distinct")))

    out = hash_join_sized(_compact(stats), _compact(ndist), on=("col",))
    return out.map_batches(
        lambda t: pa.table({
            "col": t["col"],
            "n": pc.cast(t["n"], pa.int64()),
            "n_null": pc.cast(t["n_null"], pa.int64()),
            "n_distinct": pc.cast(t["n_distinct"], pa.int64()),
            "min_val": t["min_val"], "max_val": t["max_val"]}),
        batch_format="pyarrow")


def table_diff(
    left: Dataset,
    right: Dataset,
    key: str,
    cols: list[str],
) -> Dataset:
    """Row-level diff between two keyed table versions — the third leg of
    the migration-validation toolkit (with the order-independent checksum
    and the column profiler): classify every key as ``same`` / ``changed``
    (any compared column differs) / ``removed`` (left only) / ``added``
    (right only) and return the per-status counts. One distributed
    full-outer join on the key; the comparison and the per-batch status
    count combiner are vectorized, so the driver folds O(blocks × 4)
    rows. Compared columns must be join-safe scalars; nulls compare equal
    to nulls (IS DISTINCT FROM semantics)."""
    from ray.data.aggregate import Sum

    # Ray's full_outer join COALESCES the key columns into one, so side
    # presence cannot be read off key validity; each side carries an
    # explicit never-null marker instead (null marker after the join ⇔
    # the row was absent from that side — correct even when every
    # compared column is legitimately null).
    lp = left.map_batches(
        lambda t: pa.table({key: t[key],
                            "_lm": pa.array([1] * len(t), pa.int8()),
                            **{f"l_{c}": t[c] for c in cols}}),
        batch_format="pyarrow")
    rp = right.map_batches(
        lambda t: pa.table({f"r_{key}": t[key],
                            "_rm": pa.array([1] * len(t), pa.int8()),
                            **{f"r_{c}": t[c] for c in cols}}),
        batch_format="pyarrow")
    j = hash_join(lp, rp, on=(key,), right_on=(f"r_{key}",),
                  how="full_outer")

    def classify(t: pa.Table) -> pa.Table:
        import numpy as np

        l_present = pc.is_valid(t["_lm"]).to_numpy(zero_copy_only=False)
        r_present = pc.is_valid(t["_rm"]).to_numpy(zero_copy_only=False)
        changed = np.zeros(len(t), dtype=bool)
        for c in cols:
            lv, rv = t[f"l_{c}"], t[f"r_{c}"]
            neq = pc.fill_null(pc.not_equal(lv, rv), False) \
                .to_numpy(zero_copy_only=False)
            null_mismatch = (pc.is_null(lv).to_numpy(zero_copy_only=False)
                             != pc.is_null(rv).to_numpy(
                                 zero_copy_only=False))
            changed |= neq | null_mismatch
        status = np.where(~l_present, "added",
                          np.where(~r_present, "removed",
                                   np.where(changed, "changed", "same")))
        g = pa.table({"status": pa.array(status.tolist(), pa.string()),
                      "one": pa.array([1] * len(t), pa.int64())}) \
            .group_by(["status"]).aggregate([("one", "sum")])
        return pa.table({"status": g["status"], "n": g["one_sum"]})

    out = (j.map_batches(classify, batch_format="pyarrow")
           .groupby("status").aggregate(Sum("n", alias_name="n")))
    return out.map_batches(
        lambda t: pa.table({"status": t["status"],
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow")


def unpivot(
    ds: Dataset,
    key_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> Dataset:
    """UNPIVOT / melt — the inverse of :func:`pivot_counts`: each input
    row emits one output row per value column (wide → long). A pure
    vectorized map (per value column, one column-slice + constant label —
    no shuffle, no row loop); output is ``len(value_cols)×`` the rows but
    the same cells."""
    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            parts.append(pa.table({
                **{k: t[k] for k in key_cols},
                var_name: pa.array([vc] * len(t), pa.string()),
                value_name: t[vc]}))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def hll_overlap(
    left: Dataset,
    left_col: str,
    right: Dataset,
    right_col: str,
    p: int = 12,
) -> pa.Table:
    """Sketch ALGEBRA: approximate key-overlap between two tables —
    |A|, |B|, |A∪B| from mergeable HLLs plus inclusion–exclusion
    |A∩B| ≈ |A|+|B|−|A∪B| — the join-cardinality estimate a planner
    wants BEFORE paying for the join, in two shuffle-free passes with
    O(2^p) state (the union sketch is the registerwise max of the two
    side sketches: merging, not re-scanning, is the whole point of the
    sketch). Deterministic (splitmix64 over int64 keys, no RNG), so a
    pure driver recompute is an exact oracle. Returns one row
    (est_left, est_right, est_union, est_inter)."""
    import numpy as np

    def side_sketch(ds: Dataset, col: str) -> "HyperLogLog":
        def sk(t: pa.Table) -> pa.Table:
            hll = HyperLogLog(p)
            v = pc.cast(t[col], pa.int64()).to_numpy(zero_copy_only=False)
            if len(v):
                hll.add_hashes(_splitmix64(v))
            return pa.table({"registers": pa.array(
                [hll.registers.tobytes()], pa.binary())})

        merged = HyperLogLog(p)
        for row in ds.map_batches(sk, batch_format="pyarrow").take_all():
            other = HyperLogLog(p)
            other.registers = np.frombuffer(row["registers"],
                                            dtype=np.uint8).copy()
            merged.merge(other)
        return merged

    a = side_sketch(left, left_col)
    b = side_sketch(right, right_col)
    ea, eb = int(round(a.estimate())), int(round(b.estimate()))
    u = HyperLogLog(p)
    u.merge(a)
    u.merge(b)
    eu = int(round(u.estimate()))
    return pa.table({
        "est_left": pa.array([ea], pa.int64()),
        "est_right": pa.array([eb], pa.int64()),
        "est_union": pa.array([eu], pa.int64()),
        "est_inter": pa.array([max(0, ea + eb - eu)], pa.int64())})


# --------------------------------------------------------------------------
# Z-order (Morton) curve codes — data-layout clustering for multi-column
# range pruning (the reference has no layout optimizer; this is one of the
# engine-side extras a 100-TB lakehouse write path needs: sort/partition by
# the curve position so row-group min/max stats prune on BOTH keys).
# --------------------------------------------------------------------------

_ZM = [np.int64(m) for m in
       (0x0000FFFF, 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555)]


def zspread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of ``x`` onto the even bit positions of a
    32-bit lane (vectorized magic-mask doubling; int64 throughout so the
    SQL oracle's BIGINT ``&``/``<<`` math is bit-identical)."""
    x = x.astype(np.int64) & _ZM[0]
    x = (x | (x << 8)) & _ZM[1]
    x = (x | (x << 4)) & _ZM[2]
    x = (x | (x << 2)) & _ZM[3]
    x = (x | (x << 1)) & _ZM[4]
    return x


def zorder16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Morton code interleaving two 16-bit keys (x on even bits)."""
    return zspread16(x) | (zspread16(y) << np.int64(1))


def hilbert16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """32-bit Hilbert-curve index of two 16-bit keys (the classic xy→d
    walk, vectorized: 16 levels, pure int64 numpy per level — mirrored
    bit-for-bit by the SQL oracle's unrolled 16-CTE chain). Hilbert keeps
    ALL curve steps adjacent in the plane (Morton's Z jumps diagonally at
    every power-of-two boundary), so min/max zone maps over Hilbert-
    clustered files prune strictly better on box predicates."""
    x = x.astype(np.int64) & np.int64(0xFFFF)
    y = y.astype(np.int64) & np.int64(0xFFFF)
    d = np.zeros(len(x), np.int64)
    s = np.int64(1 << 15)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant: when ry == 0, reflect (if rx) then swap
        refl = ry == 0
        xr = np.where(rx == 1, s - 1 - x, x)
        yr = np.where(rx == 1, s - 1 - y, y)
        x_new = np.where(refl, yr, x)
        y_new = np.where(refl, xr, y)
        x, y = x_new, y_new
        s >>= 1
    return d


# --------------------------------------------------------------------------
# Distributed rank analytics — row_number / NTILE assignment / percent_rank
# over a GLOBAL order, without ever holding the ordered column on one
# worker: Ray's range sort gives totally ordered blocks, each block reduces
# to (first-key, row-count) — O(blocks) driver state — and a broadcast
# per-block exclusive offset turns in-block positions into global ranks.
# Same two-pass layout as pack_by_token_budget / running_sum above, but
# keyed by the composite sort tuple so float / timestamp keys work.
# --------------------------------------------------------------------------


def row_number_by(ds: Dataset, sort_cols: list[str], out_col: str = "rn") -> Dataset:
    """``row_number() OVER (ORDER BY sort_cols)`` as a distributed two-pass
    prefix count. Requires the composite sort key to be UNIQUE per row and
    non-null (append a unique id column as the last sort col to guarantee
    it — exactly what the SQL tie-break does); duplicates that cross a
    block boundary or sit adjacent within a block raise rather than
    silently assigning nondeterministic ranks."""
    s = ds.sort(sort_cols).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        head = t.slice(0, 1 if len(t) else 0).select(sort_cols)
        return head.append_column(
            "_cnt", pa.array([len(t)] if len(t) else [], pa.int64()))

    stats = s.map_batches(block_stat, batch_size=None,
                          batch_format="pyarrow").take_all()  # O(blocks)
    stats.sort(key=lambda r: tuple(r[c] for c in sort_cols))
    offsets: dict[tuple, int] = {}
    off = 0
    for r in stats:
        k = tuple(r[c] for c in sort_cols)
        if k in offsets:
            raise ValueError(
                "row_number_by requires globally unique sort keys; two "
                f"blocks both start at {k!r} — add a unique id tie-break "
                "column")
        offsets[k] = off
        off += r["_cnt"]
    ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        dup = None
        for c in sort_cols:  # adjacent-equal rows ⇒ duplicate composite key
            eq = pc.equal(t[c].slice(1), t[c].slice(0, len(t) - 1))
            dup = eq if dup is None else pc.and_kleene(dup, eq)
        if len(t) > 1 and pc.any(dup).as_py():
            raise ValueError(
                "row_number_by requires globally unique sort keys; found "
                "duplicate composite keys within a block — add a unique id "
                "tie-break column")
        base = ray.get(ref)[tuple(t[c][0].as_py() for c in sort_cols)]
        return t.append_column(
            out_col, pa.array(base + np.arange(1, len(t) + 1), pa.int64()))

    return s.map_batches(assign, batch_size=None, batch_format="pyarrow")


def ntile_from_rn(rn: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL ``NTILE(k)`` tile id from a 1-based row_number over ``n`` rows
    (vectorized): the first ``n % k`` tiles hold ``ceil(n/k)`` rows, the
    rest ``floor(n/k)`` — bit-identical to the engines' integer math."""
    q, r = divmod(n, k)
    rn = rn.astype(np.int64)
    if q == 0:  # n < k: tile == rn
        return rn
    boundary = r * (q + 1)
    big = (rn - 1) // (q + 1) + 1
    small = r + (rn - boundary - 1) // q + 1
    return np.where(rn <= boundary, big, small)


def value_rank_counts(ds: Dataset, val_col: str) -> Dataset:
    """Per DISTINCT value of ``val_col``: ``(val, _cnt, _lt, _le)`` where
    ``_lt`` / ``_le`` count rows strictly below / at-or-below the value in
    the GLOBAL order — the sufficient statistics for every rank-family
    window (``rank = _lt + 1``, ``percent_rank = _lt / (n-1)``,
    ``cume_dist = _le / n``, dense_rank = value position). Exchange rows
    are (value, count) pairs — a per-batch Arrow combiner collapses each
    block before the ONE value-key groupby — and the sorted distinct
    values prefix-sum with O(blocks) driver state, so no worker ever holds
    the ordered column. Join the result back on the value (use the
    float64 bit pattern as an int64 equi-key for doubles)."""
    from ray.data.aggregate import Sum

    def local(t: pa.Table) -> pa.Table:
        g = t.select([val_col]).group_by([val_col]).aggregate(
            [([], "count_all")])
        return g.rename_columns([val_col, "_cnt"])

    counts = (ds.map_batches(local, batch_format="pyarrow")
              .groupby(val_col).aggregate(Sum("_cnt", alias_name="_cnt")))
    s = counts.sort(val_col).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        head = t.slice(0, 1 if len(t) else 0).select([val_col])
        w = t["_cnt"].to_numpy(zero_copy_only=False)
        return head.append_column(
            "_wsum", pa.array([int(w.sum())] if len(t) else [], pa.int64()))

    stats = s.map_batches(block_stat, batch_size=None,
                          batch_format="pyarrow").take_all()
    stats.sort(key=lambda r: r[val_col])
    offsets: dict = {}
    off = 0
    for r in stats:
        if r[val_col] in offsets:  # distinct by construction; defensive
            raise ValueError("value_rank_counts: duplicate first-value "
                             "across blocks after distinct groupby")
        offsets[r[val_col]] = off
        off += r["_wsum"]
    ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("_lt", pa.array([], pa.int64())) \
                    .append_column("_le", pa.array([], pa.int64()))
        c = t["_cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ray.get(ref)[t[val_col][0].as_py()]
        le = base + np.cumsum(c)
        return t.append_column("_lt", pa.array(le - c, pa.int64())) \
                .append_column("_le", pa.array(le, pa.int64()))

    return s.map_batches(assign, batch_size=None, batch_format="pyarrow")


def grouped_prefix_counts(
    ds: Dataset, val_col: str, count_cols: list[str]
) -> Dataset:
    """Per DISTINCT ``val_col`` value: the summed ``count_cols`` plus their
    INCLUSIVE running totals in value order (``cum_<c>`` columns) — the
    multi-cohort generalization of :func:`value_rank_counts`, and the
    sufficient statistics for two-sample rank tests (Mann-Whitney U needs
    the combined-cohort rank prefix, Kolmogorov-Smirnov needs each
    cohort's ECDF numerator). Same exchange shape: a per-batch Arrow
    combiner collapses blocks to (value, counts) partials, ONE value-key
    groupby merges them, and the sorted distinct values prefix-sum with
    O(blocks) driver state per cohort column."""
    from ray.data.aggregate import Sum

    def local(t: pa.Table) -> pa.Table:
        g = t.group_by([val_col]).aggregate([(c, "sum") for c in count_cols])
        return g.rename_columns([val_col] + list(count_cols))

    agg = (ds.map_batches(local, batch_format="pyarrow")
           .groupby(val_col)
           .aggregate(*[Sum(c, alias_name=c) for c in count_cols]))
    s = agg.sort(val_col).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        head = t.slice(0, 1 if len(t) else 0).select([val_col])
        for c in count_cols:
            w = t[c].to_numpy(zero_copy_only=False)
            head = head.append_column(
                "_s_" + c,
                pa.array([int(w.sum())] if len(t) else [], pa.int64()))
        return head

    stats = s.map_batches(block_stat, batch_size=None,
                          batch_format="pyarrow").take_all()  # O(blocks)
    stats.sort(key=lambda r: r[val_col])
    offsets: dict = {}
    run = {c: 0 for c in count_cols}
    for r in stats:
        if r[val_col] in offsets:  # distinct by construction; defensive
            raise ValueError("grouped_prefix_counts: duplicate first-value "
                             "across blocks after distinct groupby")
        offsets[r[val_col]] = dict(run)
        for c in count_cols:
            run[c] += r["_s_" + c]
    ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        out = t
        if len(t) == 0:
            for c in count_cols:
                out = out.append_column("cum_" + c, pa.array([], pa.int64()))
            return out
        base = ray.get(ref)[t[val_col][0].as_py()]
        for c in count_cols:
            w = t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            out = out.append_column(
                "cum_" + c, pa.array(base[c] + np.cumsum(w), pa.int64()))
        return out

    return s.map_batches(assign, batch_size=None, batch_format="pyarrow")


def _jaro_winkler_pairs(
    M1: np.ndarray, M2: np.ndarray, l1: np.ndarray, l2: np.ndarray
) -> np.ndarray:
    """Jaro-Winkler similarity for P codepoint-matrix pairs at once
    (rows of ``M1``/``M2``, zero-padded; lengths ``l1``/``l2``) —
    bit-identical to DuckDB's ``jaro_winkler_similarity`` (rapidfuzz
    semantics: both-empty → 0, winkler prefix boost of 0.1·min(prefix,4)
    applied only when jaro > 0.7), verified exact on 6k random cases.

    The greedy window matching is vectorized ACROSS PAIRS: the scan runs
    position-by-position over s1 (ascending j within the per-pair window
    preserves the greedy first-available rule), so the Python loop is
    O(maxlen × window), never O(pairs)."""
    P, L1 = M1.shape
    L2 = M2.shape[1]
    if P == 0:
        return np.zeros(0, np.float64)
    d = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)
    dmax = int(d.max()) if P else 0
    m1 = np.zeros((P, L1), dtype=bool)
    m2 = np.zeros((P, L2), dtype=bool)
    for i in range(int(l1.max()) if P else 0):
        c = M1[:, i]
        found = c == 0  # inactive rows are "already found"
        lo = np.maximum(0, i - d)
        hi = np.minimum(l2, i + d + 1)
        for j in range(max(0, i - dmax), min(L2, i + dmax + 1)):
            if found.all():
                break
            elig = (~found) & (j >= lo) & (j < hi) & (~m2[:, j]) \
                & (M2[:, j] == c)
            if elig.any():
                m1[elig, i] = True
                m2[elig, j] = True
                found |= elig
    m = m1.sum(axis=1).astype(np.int64)
    # transpositions: the k-th matched char of s1 aligns with the k-th
    # matched char of s2; np.nonzero orders by (pair, position), and the
    # per-pair counts are equal, so the two gathers align elementwise
    pi, pos1 = np.nonzero(m1)
    pj, pos2 = np.nonzero(m2)
    neq = (M1[pi, pos1] != M2[pj, pos2]).astype(np.int64)
    t = np.bincount(pi, weights=neq, minlength=P).astype(np.int64) // 2
    mf = m.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (mf / l1 + mf / l2 + (mf - t) / mf) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)
    # winkler prefix boost (>0.7 threshold), common prefix capped at 4
    k = min(4, L1, L2)
    if k > 0:
        eq = (M1[:, :k] == M2[:, :k]) & (M1[:, :k] != 0)
        pl = np.cumprod(eq, axis=1).sum(axis=1).astype(np.float64)
    else:
        pl = np.zeros(P, np.float64)
    boosted = jaro + pl * 0.1 * (1.0 - jaro)
    return np.where(jaro > 0.7, boosted, jaro)


def jw_pairs(
    ds: Dataset,
    block_col: str,
    id_col: str,
    text_col: str,
    min_sim: float = 0.9,
) -> Dataset:
    """Blocked Jaro-Winkler fuzzy self-join — the record-linkage scorer
    for NAME fields (contrast :func:`fuzzy_pairs`' edit distance, which
    over-penalizes transposed name tokens). Within each blocking-key
    group, emit unordered pairs with similarity ≥ ``min_sim``. Blocking
    is the same scale contract as fuzzy_pairs (in-group work is
    O(n_block²)); a vectorized length-RATIO prefilter kills pairs whose
    best-case similarity (every char of the shorter matching, no
    transpositions, max prefix boost) cannot reach the threshold.
    Returns ``(block_col, id_a, id_b, jw)`` with ``id_a < id_b`` and
    ``jw`` bit-identical to the SQL engine's double."""

    def fn(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids = ids[order]
        texts = ["" if x is None else x
                 for x in g[text_col].take(pa.array(order)).to_pylist()]
        lens = np.asarray([len(x) for x in texts], dtype=np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        # best-case jaro for lengths (a ≤ b): m = a → (1 + a/b + 1)/3,
        # then the maximal winkler boost; below min_sim ⇒ prune
        a = np.minimum(lens[ii], lens[jj]).astype(np.float64)
        b = np.maximum(lens[ii], lens[jj]).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            best_j = (2.0 + a / b) / 3.0
        best = np.where(a > 0, best_j + 0.4 * (1.0 - best_j), 0.0)
        ok = best >= min_sim
        ii, jj = ii[ok], jj[ok]
        if len(ii):
            L = max(int(lens.max()), 1)
            M = np.zeros((len(texts), L), dtype=np.uint32)
            for i, s in enumerate(texts):
                if s:
                    M[i, :len(s)] = np.frombuffer(
                        s.encode("utf-32-le"), dtype=np.uint32)
            sim = _jaro_winkler_pairs(M[ii], M[jj], lens[ii], lens[jj])
            keep = sim >= min_sim
            out_a, out_b, out_s = ii[keep], jj[keep], sim[keep]
        else:
            out_a, out_b = np.zeros(0, np.int64), np.zeros(0, np.int64)
            out_s = np.zeros(0, np.float64)
        id_arr = g[id_col].combine_chunks().take(
            pa.array(order, type=pa.int64()))
        return pa.table({
            block_col: pa.concat_arrays(
                [g[block_col].combine_chunks().slice(0, 1)] * len(out_a))
            if len(out_a) else g[block_col].combine_chunks().slice(0, 0),
            "id_a": id_arr.take(pa.array(out_a, type=pa.int64())),
            "id_b": id_arr.take(pa.array(out_b, type=pa.int64())),
            "jw": pa.array(out_s, type=pa.float64()),
        })

    return ds.groupby(block_col).map_groups(fn, batch_format="pyarrow")


def late_arrival_stats(
    ds: Dataset,
    order_col: str,
    ts_col: str,
    group_col: str,
) -> Dataset:
    """Running-max late-arrival accounting: order the stream by the unique
    arrival key ``order_col`` (commit/sequence order), track the running
    maximum of the event-time column ``ts_col`` over everything that
    arrived EARLIER, and call a row late when its event time is below that
    watermark — the out-of-orderness audit every event-time windowing
    stage needs before choosing its allowed lateness.

    Distributed shape (the engine's standard two-pass prefix pattern, same
    contract as :func:`row_number_by`): one range-shuffle sort on the
    arrival key, an O(blocks) driver reduce of per-block (first key,
    max event-time) stats to compute each block's carry-in watermark,
    then one vectorized per-block pass (``np.maximum.accumulate`` shifted
    by one, seeded with the carry) that emits per-group PARTIAL counters —
    only ``groups × blocks`` rows reach the final groupby, never the
    stream. Arrival keys must be globally unique (the same SQL tie-break
    contract as ``row_number``); duplicates raise.

    Output per group: ``n_events``, ``n_late``, ``max_late_us``,
    ``sum_late_us`` (microsecond lateness vs the watermark, 0 when none).
    """
    s = ds.sort(order_col).materialize()
    i64min = np.iinfo(np.int64).min

    def block_stat(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"_k": pa.array([], pa.int64()),
                             "_mx": pa.array([], pa.int64())})
        mx = pc.max(pc.cast(t[ts_col], pa.int64())).as_py()
        return pa.table({"_k": t[order_col].slice(0, 1),
                         "_mx": pa.array([mx], pa.int64())})

    stats = s.map_batches(block_stat, batch_size=None,
                          batch_format="pyarrow").take_all()  # O(blocks)
    stats.sort(key=lambda r: r["_k"])
    carries: dict[int, int] = {}
    run = i64min
    for r in stats:
        if r["_k"] in carries:
            raise ValueError(
                "late_arrival_stats requires globally unique arrival keys; "
                f"two blocks both start at {r['_k']!r}")
        carries[r["_k"]] = run
        run = max(run, r["_mx"])
    ref = ray.put(carries)

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n_events": pa.array([], pa.int64()),
                             "n_late": pa.array([], pa.int64()),
                             "max_late_us": pa.array([], pa.int64()),
                             "sum_late_us": pa.array([], pa.int64())})
        keys = t[order_col].to_numpy(zero_copy_only=False)
        if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
            raise ValueError(
                "late_arrival_stats requires globally unique arrival keys; "
                "found duplicates within a block")
        carry = ray.get(ref)[int(keys[0])]
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        before = np.empty(len(ts), dtype=np.int64)
        before[0] = carry
        np.maximum.accumulate(ts[:-1], out=before[1:])
        np.maximum(before[1:], carry, out=before[1:])
        late = ts < before
        lateness = np.where(late, before - ts, 0)
        d = pa.table({group_col: t[group_col],
                      "_one": pa.array(np.ones(len(ts), np.int64)),
                      "_late": pa.array(late.astype(np.int64)),
                      "_lat": pa.array(lateness, pa.int64())})
        g = d.group_by(group_col).aggregate(
            [("_one", "sum"), ("_late", "sum"), ("_lat", "max"),
             ("_lat", "sum")])
        return g.rename_columns([group_col, "n_events", "n_late",
                                 "max_late_us", "sum_late_us"])

    from ray.data.aggregate import Max, Sum

    out = (s.map_batches(partial, batch_size=None, batch_format="pyarrow")
           .groupby(group_col)
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("n_late", alias_name="n_late"),
                      Max("max_late_us", alias_name="max_late_us"),
                      Sum("sum_late_us", alias_name="sum_late_us")))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({group_col: t[group_col],
                         "n_events": pc.cast(t["n_events"], pa.int64()),
                         "n_late": pc.cast(t["n_late"], pa.int64()),
                         "max_late_us": pc.cast(t["max_late_us"], pa.int64()),
                         "sum_late_us": pc.cast(t["sum_late_us"], pa.int64())})

    return out.map_batches(fin, batch_format="pyarrow")


def mis_priority(node: str) -> str:
    """Deterministic total-order MIS priority for a string node id: 16 hex
    digits of md5 (uniform, so the parallel rounds converge in O(log n)
    expected like Luby's algorithm with random priorities) with the node
    id appended as the uniqueness tie-break. Shared verbatim by both
    regimes and the pure-Python oracle recompute."""
    import hashlib

    return hashlib.md5(node.encode("utf-8")).hexdigest()[:16] + "|" + node


def _mis_greedy(edges: set[tuple[str, str]]) -> list[str]:
    """Pure-Python parallel-greedy MIS (the driver regime and the oracle's
    recompute): with UNIQUE priorities, round-synchronous 'join if you
    beat every undecided neighbor' computes exactly the sequential greedy
    MIS in priority order — the classic Luby equivalence."""
    adj: dict[str, set[str]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    prio = {n: mis_priority(n) for n in adj}
    und = set(adj)
    mis: list[str] = []
    while und:
        winners = {n for n in und
                   if all(prio[n] < prio[m] for m in adj[n] if m in und)}
        mis.extend(winners)
        losers = {m for n in winners for m in adj[n]}
        und -= winners | losers
    return sorted(mis)


def maximal_independent_set(
    edges: Dataset,
    *,
    src: str = "u",
    dst: str = "v",
    edge_limit: int = 100_000,
    max_rounds: int = 64,
) -> Dataset | pa.Table:
    """Deterministic maximal independent set of an undirected simple graph
    — the canonical conflict-free scheduling / seed-selection primitive
    (e.g. pick a set of near-duplicate cluster representatives no two of
    which conflict). Luby-style round-synchronous greedy under the fixed
    hash priority :func:`mis_priority`: each round, every undecided node
    whose priority beats all undecided neighbors joins the MIS and its
    neighbors drop out; unique priorities make the result identical to
    the sequential greedy in priority order, so the output is a pure
    function of the edge set (no RNG, no round-count dependence).

    Two regimes (the engine's standard bounded-input split): at or below
    ``edge_limit`` edges the fixpoint runs driver-side in one gather
    (:func:`_mis_greedy`); above it, each round is distributed — two
    :func:`hash_join_sized` probes attach undecided-status+priority to
    both edge endpoints, one groupby-min finds each node's best undecided
    neighbor, a left join picks winners, and winners' neighborhoods are
    anti-joined out. Per round the exchange moves only the shrinking
    undecided subgraph; expected O(log n) rounds (uniform md5
    priorities). Both regimes are exact string comparisons, so outputs
    are identical by construction (property-tested). Returns a sorted
    one-column ``node`` table/Dataset; typed empty when the graph is.
    """
    from ray.data.aggregate import Min

    e = edges.map_batches(
        lambda t: pa.table({"a": t[src], "b": t[dst]}),
        batch_format="pyarrow").materialize()
    empty = pa.table({"node": pa.array([], pa.string())})
    n_e = e.count()
    if n_e == 0:
        return empty
    if n_e <= edge_limit:
        rows = e.take_all()
        mis = _mis_greedy({(r["a"], r["b"]) for r in rows})
        return pa.table({"node": pa.array(mis, pa.string())})

    # distributed regime: symmetric edge list + undecided-status dataset
    def sym(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": pa.concat_arrays([t["a"].combine_chunks(),
                                   t["b"].combine_chunks()]),
            "b": pa.concat_arrays([t["b"].combine_chunks(),
                                   t["a"].combine_chunks()])})

    cur = e.map_batches(sym, batch_format="pyarrow").materialize()

    def node_prio(t: pa.Table) -> pa.Table:
        nodes = t["a"].to_pylist()
        return pa.table({"node": t["a"],
                         "prio": pa.array([mis_priority(n) for n in nodes],
                                          pa.string())})

    from ray.data.aggregate import Count

    und = (cur.groupby("a").aggregate(Count(alias_name="_c"))
           .map_batches(lambda t: t.select(["a"]), batch_format="pyarrow")
           .map_batches(node_prio, batch_format="pyarrow").materialize())
    mis_parts: list[Dataset] = []
    for _ in range(max_rounds):
        if und.count() == 0:
            if not mis_parts:
                return empty
            out = mis_parts[0]
            for p in mis_parts[1:]:
                out = out.union(p)
            return out.sort("node")
        # attach undecided priorities to both endpoints (inner joins drop
        # edges touching decided nodes — the undecided subgraph)
        ea = hash_join_sized(
            cur, und.map_batches(
                lambda t: t.rename_columns(["a", "prio_a"]),
                batch_format="pyarrow"),
            on=("a",)).materialize()
        euu = hash_join_sized(
            ea, und.map_batches(
                lambda t: t.rename_columns(["b", "prio_b"]),
                batch_format="pyarrow"),
            on=("b",)).materialize()
        # the undecided subgraph is all any later round can need — shrink
        cur = euu.map_batches(lambda t: t.select(["a", "b"]),
                              batch_format="pyarrow").materialize()
        # a node wins iff NO undecided neighbor outranks it: anti-join the
        # 'beaten' endpoint set (only inner/semi/anti joins in the loop —
        # they have the tiny-frontier broadcast fallback; left_outer does
        # not and dies on Ray 2.49's sparse-partition finalize)
        beaten = euu.map_batches(
            lambda t: pa.table(
                {"node": t.filter(pc.less(t["prio_b"], t["prio_a"]))["a"]}),
            batch_format="pyarrow").materialize()
        winners = hash_join_sized(
            und, beaten, on=("node",), how="left_anti").map_batches(
            lambda t: pa.table({"node": t["node"]}),
            batch_format="pyarrow").materialize()
        if winners.count():
            mis_parts.append(winners)
        # losers: undecided neighbors of winners; then shrink the frontier
        losers = hash_join_sized(
            euu.map_batches(lambda t: pa.table({"a": t["a"], "node": t["b"]}),
                            batch_format="pyarrow"),
            winners.map_batches(lambda t: t.rename_columns(["a"]),
                                batch_format="pyarrow"),
            on=("a",), how="left_semi").map_batches(
            lambda t: pa.table({"node": t["node"]}), batch_format="pyarrow")
        decided = winners.union(losers).groupby("node").aggregate(
            Count(alias_name="_c")).map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow")
        und = hash_join_sized(
            und, decided, on=("node",), how="left_anti").materialize()
    raise RuntimeError(f"MIS did not converge in {max_rounds} rounds")


def group_row_number(
    ds: Dataset,
    group_col: str,
    sort_cols: list[str],
    out_col: str = "rn",
    return_sizes: bool = False,
):
    """``row_number() OVER (PARTITION BY group ORDER BY sort_cols)`` as a
    distributed two-pass prefix count — the partitioned sibling of
    :func:`row_number_by`. One range-shuffle sort on (group, *sort_cols),
    an O(blocks·groups-per-block) driver reduce of per-block per-group
    run counts (sorted order makes a group's rows contiguous, so only a
    block's FIRST run can continue a previous block), then one vectorized
    per-block pass assigning 1-based ranks. The composite
    (group, *sort_cols) key must be unique per row (same row_number
    tie-break contract); cross-block duplicate first-keys raise. With
    ``return_sizes`` also returns the driver-known {group: cardinality}
    dict (a free by-product of the prefix reduce — bounded by the number
    of groups)."""
    keys = [group_col] + list(sort_cols)
    s = ds.sort(keys).materialize()

    def block_stat(t: pa.Table) -> pa.Table:
        head = t.slice(0, 1 if len(t) else 0).select(keys)
        if len(t) == 0:
            return (head.append_column(
                "_groups", pa.array([], pa.list_(pa.string())))
                .append_column("_counts", pa.array([], pa.list_(pa.int64()))))
        g = np.asarray(t[group_col].to_pylist(), dtype=object)
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        ends = np.append(starts[1:], len(g))
        return (head.append_column(
            "_groups", pa.array([[str(x) for x in g[starts]]],
                                pa.list_(pa.string())))
            .append_column("_counts",
                           pa.array([(ends - starts).tolist()],
                                    pa.list_(pa.int64()))))

    stats = s.map_batches(block_stat, batch_size=None,
                          batch_format="pyarrow").take_all()  # O(blocks)
    stats.sort(key=lambda r: tuple(r[c] for c in keys))
    running: dict[str, int] = {}
    carries: dict[tuple, int] = {}
    for r in stats:
        k = tuple(r[c] for c in keys)
        if k in carries:
            raise ValueError(
                "group_row_number requires a globally unique composite "
                f"(group, sort) key; two blocks both start at {k!r}")
        carries[k] = running.get(r["_groups"][0], 0)
        for grp, cnt in zip(r["_groups"], r["_counts"]):
            running[grp] = running.get(grp, 0) + int(cnt)
    sizes = dict(running)  # final per-group cardinalities, driver-known
    ref = ray.put(carries)

    def assign(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        if len(t) > 1:  # adjacent-equal rows ⇒ duplicate composite key
            dup = None
            for c in keys:
                eq = pc.equal(t[c].slice(1), t[c].slice(0, len(t) - 1))
                dup = eq if dup is None else pc.and_kleene(dup, eq)
            if pc.any(dup).as_py():
                raise ValueError(
                    "group_row_number requires a globally unique composite "
                    "(group, sort) key; found duplicates within a block")
        g = np.asarray(t[group_col].to_pylist(), dtype=object)
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        lens = np.diff(np.append(starts, len(g)))
        local = np.arange(len(g), dtype=np.int64) - np.repeat(starts, lens)
        k = tuple(t[c][0].as_py() for c in keys)
        carry = ray.get(ref)[k]
        rn = local + 1
        rn[: lens[0]] += carry  # only the first run continues a prior block
        return t.append_column(out_col, pa.array(rn, pa.int64()))

    out = s.map_batches(assign, batch_size=None, batch_format="pyarrow")
    return (out, sizes) if return_sizes else out


# Poisson(1) inverse-CDF fences for the bootstrap: P(K > 12) < 1e-13, so
# capping at 12 is deterministic noise far below any replicate's variance.
_POIS1_CDF = None


def _poisson1_weights(u: "np.ndarray") -> "np.ndarray":  # noqa: F821
    global _POIS1_CDF
    if _POIS1_CDF is None:
        import math

        p, cdf, acc = 1.0 / math.e, [], 0.0
        for k in range(13):
            acc += p
            cdf.append(acc)
            p /= (k + 1)
        _POIS1_CDF = np.array(cdf, dtype=np.float64)
    return np.searchsorted(_POIS1_CDF, u, side="right").astype(np.int64)


_BOOT_SEED = 0x9E3779B97F4A7C15


def poisson_bootstrap_sums(
    ds: Dataset,
    id_col: str,
    value_col: str,
    *,
    n_replicates: int = 32,
    cents: bool = True,
) -> pa.Table:
    """Deterministic Poisson bootstrap of a total: replicate b resamples
    each row Poisson(1)-many times with the multiplicity a pure function
    of (row id, b) — splitmix64(id XOR seed_b) mapped through the
    Poisson(1) inverse CDF — so the replicate totals are exactly
    reproducible on any partitioning, cluster size or engine (the classic
    streaming bootstrap: at 100 TB you cannot resample-with-replacement,
    but Poissonized multiplicities need only one pass). Per block:
    one vectorized n×B weight draw and B partial (count, sum) pairs —
    fixed O(B) rows per block through the reduce, values in exact int64
    cents so summation order can never flip a hash. Returns B rows
    (replicate, n_rows, total_cents) for downstream CI fences."""
    def partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cv = np.round(v * 100).astype(np.int64) if cents else v.astype(
            np.int64)
        reps, ns, sums = [], [], []
        for b in range(n_replicates):
            seed = _splitmix64(np.array([_BOOT_SEED + b],
                                        dtype=np.uint64))[0]
            h = _splitmix64(ids.astype(np.uint64) ^ seed)
            u = h.astype(np.float64) / float(2**64)
            w = _poisson1_weights(u)
            reps.append(b)
            ns.append(int(w.sum()))
            sums.append(int((w * cv).sum()))
        return pa.table({"replicate": pa.array(reps, pa.int64()),
                         "n_rows": pa.array(ns, pa.int64()),
                         "total_cents": pa.array(sums, pa.int64())})

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("replicate")
           .aggregate(Sum("n_rows", alias_name="n_rows"),
                      Sum("total_cents", alias_name="total_cents")))
    t = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")],
        promote_options="default")
    t = t.sort_by("replicate")
    return pa.table({
        "replicate": pc.cast(t["replicate"], pa.int64()),
        "n_rows": pc.cast(t["n_rows"], pa.int64()),
        "total_cents": pc.cast(t["total_cents"], pa.int64())})


def _tarjan_scc(edges: set[tuple[str, str]]) -> dict[str, str]:
    """Iterative Tarjan over the gathered edge set (driver regime of
    :func:`scc`). Returns {node: scc_id} with scc_id = lexicographic min
    member, so the labeling is a pure function of the edge set."""
    adj: dict[str, list[str]] = {}
    nodes: set[str] = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
        adj.setdefault(a, []).append(b)
    for k in adj:
        adj[k].sort()  # deterministic visit order (not that it matters)
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    out: dict[str, str] = {}
    counter = 0
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            while pi < len(nbrs):
                w = nbrs[pi]
                pi += 1
                if w not in index:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if pi == len(nbrs):
                work.pop()
                if work:
                    u = work[-1][0]
                    low[u] = min(low[u], low[v])
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    cid = min(comp)
                    for w in comp:
                        out[w] = cid
    return out


def scc(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    edge_limit: int = 500_000,
    max_rounds: int = 64,
) -> Dataset | pa.Table:
    """Strongly connected components of a directed graph, labeled by the
    lexicographic min member — the cycle-structure primitive (mutual
    reachability in link graphs, feedback sets in event-transition
    graphs) that undirected components (:func:`..stages.dedup`
    contraction) cannot express.

    Two regimes (the engine's standard bounded-input split):

    * ``edges <= edge_limit`` (after the distinct): one gather + iterative
      Tarjan on the driver (:func:`_tarjan_scc`) — the right call for
      type/vocabulary-bounded graphs.
    * larger graphs: round-synchronous **trim + forward-backward peeling**
      (Fleischer/Hendrickson/Pinar's FW-BW). Each round first TRIMS —
      any live node missing either an in- or an out-edge inside the live
      subgraph cannot sit on a cycle, so all such nodes are emitted as
      singleton SCCs at once (this is what kills the long singleton tail
      that would otherwise cost one round each) — then peels the SCC of
      the lexicographic-min pivot as reach_fwd(pivot) ∩ reach_bwd(pivot)
      (two :func:`sssp` sweeps + one semi join), anti-joins it out and
      repeats. Rounds consumed = trim passes + number of NON-trivial
      SCCs; real link graphs are one giant SCC plus tendrils, which this
      handles in a handful of rounds. Exchanges move only the shrinking
      live subgraph; every set operation is a hash join, never a gather.

    Both regimes are exact set computations on the same distinct edge
    set, so outputs are identical by construction (property-tested).
    Returns ``(node, scc_id)`` sorted by node; typed empty for an empty
    edge set. Self-loops are fine (they never merge components).
    """
    from ray.data.aggregate import Count

    e = (edges.map_batches(
        lambda t: pa.table({"s": pc.cast(t[src], pa.string()),
                            "d": pc.cast(t[dst], pa.string())}),
        batch_format="pyarrow")
        .groupby(["s", "d"]).aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["s", "d"]),
                     batch_format="pyarrow").materialize())
    empty = pa.table({"node": pa.array([], pa.string()),
                      "scc_id": pa.array([], pa.string())})
    n_e = e.count()
    if n_e == 0:
        return empty
    if n_e <= edge_limit:
        lab = _tarjan_scc({(r["s"], r["d"]) for r in e.take_all()})
        ks = sorted(lab)
        return pa.table({"node": pa.array(ks, pa.string()),
                         "scc_id": pa.array([lab[k] for k in ks],
                                            pa.string())})

    def _nodes_of(col: str):
        return (e.groupby(col).aggregate(Count(alias_name="_c"))
                .map_batches(lambda t, c=col: pa.table(
                    {"node": t[c]}), batch_format="pyarrow"))

    live = (_nodes_of("s").union(_nodes_of("d"))
            .groupby("node").aggregate(Count(alias_name="_c"))
            .map_batches(lambda t: t.select(["node"]),
                         batch_format="pyarrow").materialize())
    parts: list[Dataset] = []

    def _filter_edges(ee: Dataset, keep: Dataset) -> Dataset:
        ee = hash_join_sized(ee, keep.map_batches(
            lambda t: t.rename_columns(["s"]), batch_format="pyarrow"),
            on=("s",), how="left_semi")
        ee = hash_join_sized(ee, keep.map_batches(
            lambda t: t.rename_columns(["d"]), batch_format="pyarrow"),
            on=("d",), how="left_semi")
        return ee.materialize()

    for _ in range(max_rounds):
        if live.count() == 0:
            out = parts[0]
            for p in parts[1:]:
                out = out.union(p)
            return out.sort("node")
        # trim: live nodes with BOTH an out- and an in-edge in the live
        # subgraph survive; everything else is a singleton SCC
        core = hash_join_sized(
            hash_join_sized(live, _nodes_of("s"), on=("node",),
                            how="left_semi"),
            _nodes_of("d"), on=("node",), how="left_semi").materialize()
        singles = hash_join_sized(
            live, core, on=("node",), how="left_anti").materialize()
        if singles.count() > 0:
            parts.append(singles.map_batches(
                lambda t: pa.table({"node": t["node"],
                                    "scc_id": t["node"]}),
                batch_format="pyarrow").materialize())
            live = core
            e = _filter_edges(e, live)
            continue
        # FW-BW peel of the lexicographic-min pivot's SCC
        mins = live.map_batches(
            lambda t: pa.table({"m": pa.array(
                [pc.min(t["node"]).as_py()] if len(t) else [],
                pa.string())}), batch_format="pyarrow").take_all()
        pivot = min(r["m"] for r in mins)
        ones = e.map_batches(
            lambda t: t.append_column(
                "w", pa.array(np.ones(len(t), np.int64))),
            batch_format="pyarrow")
        fwd = sssp(ones, [pivot], src="s", dst="d", cost="w",
                   max_iters=max(30, max_rounds))
        rev = ones.map_batches(
            lambda t: pa.table({"s": t["d"], "d": t["s"], "w": t["w"]}),
            batch_format="pyarrow")
        bwd = sssp(rev, [pivot], src="s", dst="d", cost="w",
                   max_iters=max(30, max_rounds))
        comp = hash_join_sized(
            fwd.map_batches(lambda t: pa.table({"node": t["node"]}),
                            batch_format="pyarrow"),
            bwd.map_batches(lambda t: pa.table({"node": t["node"]}),
                            batch_format="pyarrow"),
            on=("node",), how="left_semi").materialize()
        parts.append(comp.map_batches(
            lambda t, p=pivot: pa.table(
                {"node": t["node"],
                 "scc_id": pa.array([p] * len(t), pa.string())}),
            batch_format="pyarrow").materialize())
        live = hash_join_sized(
            live, comp, on=("node",), how="left_anti").materialize()
        e = _filter_edges(e, live)
    raise RuntimeError(f"scc did not converge in {max_rounds} rounds")


def kendall_tau_b(
    ds: Dataset,
    x_col: str,
    y_col: str,
    *,
    cell_limit: int = 200_000,
) -> pa.Table:
    """Exact Kendall tau-b between two BOUNDED-CARDINALITY integer
    columns via the contingency-table identity — the rank-correlation
    complement of :func:`..queries` OLS/moments: concordant/discordant
    pair counts come from suffix/prefix sums over the |X|×|Y| cell
    matrix, never from the O(n²) pair space, so a 10^12-row input costs
    one (x, y) groupby (the per-batch combiner keeps the exchange at
    cells-per-block rows) plus an O(cells) driver reduce. All pair
    arithmetic is exact int64 (counts and C/D/tie terms are integers);
    only the final normalization touches floats, and those are
    correctly-rounded sqrt/divide over exactly-representable integers,
    so the quantized nano-units are engine-independent. Raises when the
    joint domain exceeds ``cell_limit`` — the bounded-domain assumption
    made explicit (same contract as NTILE's group bound). Returns one
    row: (n_rows, concordant, discordant, tau_b_nano)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"x": pc.cast(t[x_col], pa.int64()),
                      "y": pc.cast(t[y_col], pa.int64())}) \
            .group_by(["x", "y"]).aggregate([([], "count_all")])
        return pa.table({"x": g["x"], "y": g["y"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["x", "y"]).aggregate(Sum("n", alias_name="n"))
             .take_all())
    if len(cells) > cell_limit:
        raise ValueError(
            f"kendall_tau_b: joint domain has {len(cells)} cells "
            f"(> {cell_limit}); this operator assumes bounded-cardinality "
            "ordinal columns — bucket the inputs first")
    if not cells:
        return pa.table({"n_rows": pa.array([], pa.int64()),
                         "concordant": pa.array([], pa.int64()),
                         "discordant": pa.array([], pa.int64()),
                         "tau_b_nano": pa.array([], pa.int64())})
    xs = sorted({r["x"] for r in cells})
    ys = sorted({r["y"] for r in cells})
    xi = {v: i for i, v in enumerate(xs)}
    yi = {v: i for i, v in enumerate(ys)}
    m = np.zeros((len(xs), len(ys)), dtype=np.int64)
    for r in cells:
        m[xi[r["x"]], yi[r["y"]]] = r["n"]
    # strict suffix sum: SE[i, j] = sum of m over x' > i AND y' > j
    suf = np.cumsum(np.cumsum(m[::-1, ::-1], axis=0), axis=1)[::-1, ::-1]
    se = np.zeros_like(m)
    se[:-1, :-1] = suf[1:, 1:]
    conc = int((m * se).sum())
    # strict (x' > i, y' < j) sum for discordant
    sufx = np.cumsum(m[::-1, :], axis=0)[::-1, :]
    down = np.zeros_like(m)
    down[:-1, :] = sufx[1:, :]
    dl = np.cumsum(down, axis=1)
    dd = np.zeros_like(m)
    dd[:, 1:] = dl[:, :-1]
    disc = int((m * dd).sum())
    n = int(m.sum())
    n0 = n * (n - 1) // 2
    nx = m.sum(axis=1)
    ny = m.sum(axis=0)
    tx = int((nx * (nx - 1) // 2).sum())
    ty = int((ny * (ny - 1) // 2).sum())
    denom = float(n0 - tx) * float(n0 - ty)
    if denom <= 0:
        nano = 0
    else:
        val = float(conc - disc) / np.sqrt(denom) * 1e9
        nano = int(np.sign(val) * np.floor(np.abs(val) + 0.5))
    return pa.table({"n_rows": pa.array([n], pa.int64()),
                     "concordant": pa.array([conc], pa.int64()),
                     "discordant": pa.array([disc], pa.int64()),
                     "tau_b_nano": pa.array([nano], pa.int64())})


def spearman_rho(
    ds: Dataset,
    x_col: str,
    y_col: str,
    *,
    cell_limit: int = 200_000,
) -> pa.Table:
    """Exact Spearman rank correlation between two BOUNDED-CARDINALITY
    integer columns — the monotone-association complement of
    :func:`kendall_tau_b`, built on the same contingency identity: ranks
    are a function of the MARGINAL histograms alone (average rank of
    value v = rows below v + (ties(v)+1)/2), so the O(n log n) global
    rank sort collapses to one (x, y) groupby with per-batch combiners
    plus an O(cells) driver reduce. Average ranks are carried DOUBLED
    (2·rank is always an integer, and scaling both variables by 2 leaves
    the correlation untouched), so every cross-moment is exact
    arbitrary-precision integer arithmetic; only the final
    Pearson-over-ranks normalization touches floats — a correctly-rounded
    sqrt/divide over exactly-representable integers, identical to what
    the DuckDB oracle's HUGEINT→DOUBLE pipeline computes, so the
    nano-quantized rho matches any engine bit-for-bit. Raises when the
    joint domain exceeds ``cell_limit`` (the bounded-domain contract,
    same as kendall's). Returns one row: (n_rows, rho_s_nano)."""
    import math

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"x": pc.cast(t[x_col], pa.int64()),
                      "y": pc.cast(t[y_col], pa.int64())}) \
            .group_by(["x", "y"]).aggregate([([], "count_all")])
        return pa.table({"x": g["x"], "y": g["y"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["x", "y"]).aggregate(Sum("n", alias_name="n"))
             .take_all())
    if len(cells) > cell_limit:
        raise ValueError(
            f"spearman_rho: joint domain has {len(cells)} cells "
            f"(> {cell_limit}); this operator assumes bounded-cardinality "
            "ordinal columns — bucket the inputs first")
    if not cells:
        return pa.table({"n_rows": pa.array([], pa.int64()),
                         "rho_s_nano": pa.array([], pa.int64())})

    def doubled_ranks(axis: str) -> dict:
        marg: dict = {}
        for r in cells:
            marg[r[axis]] = marg.get(r[axis], 0) + int(r["n"])
        out: dict = {}
        below = 0
        for v in sorted(marg):
            out[v] = 2 * below + marg[v] + 1  # 2 × average rank
            below += marg[v]
        return out

    r2x = doubled_ranks("x")
    r2y = doubled_ranks("y")
    n = sx = sy = sxx = syy = sxy = 0  # exact Python ints throughout
    for r in cells:
        c, rx, ry = int(r["n"]), r2x[r["x"]], r2y[r["y"]]
        n += c
        sx += c * rx
        sy += c * ry
        sxx += c * rx * rx
        syy += c * ry * ry
        sxy += c * rx * ry
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    if dx <= 0 or dy <= 0:
        nano = 0
    else:
        val = float(num) / math.sqrt(float(dx) * float(dy)) * 1e9
        nano = int(math.floor(val + 0.5)) if val >= 0 \
            else -int(math.floor(-val + 0.5))
    return pa.table({"n_rows": pa.array([n], pa.int64()),
                     "rho_s_nano": pa.array([nano], pa.int64())})


def frequent_triples(
    ds: Dataset,
    basket_col: str,
    item_col: str,
    *,
    support: int = 2,
    pair_limit: int = 2_000_000,
    basket_cap: int = 512,
) -> pa.Table | Dataset:
    """Apriori frequent 3-itemsets over (basket, item) rows — the market-
    basket primitive one level past pairwise lift. The whole point at
    scale is CANDIDATE PRUNING, and that is what this implements: level 1
    keeps items with support ≥ threshold, level 2 counts pairs only among
    frequent items, and level 3 generates a triple candidate ONLY when all
    three of its sub-pairs are frequent (the Apriori downward-closure
    property), so the combinatorial (n over 3) space never exists. The
    frequent-pair set is a bounded broadcast (``ray.put`` once, read per
    group; raises past ``pair_limit`` — the explicit bounded-dictionary
    assumption) and each per-basket group touches only its own ≤ dozens
    of items; exchanges carry ids, never payloads. Baskets with more than
    ``basket_cap`` frequent-pair-active items raise rather than silently
    exploding the candidate space (cap such domains upstream). Returns
    (p1, p2, p3, support) with p1 < p2 < p3, sorted."""
    from itertools import combinations

    from ray.data.aggregate import Count

    bi = (ds.map_batches(
        lambda t: pa.table({"b": pc.cast(t[basket_col], pa.int64()),
                            "i": pc.cast(t[item_col], pa.int64())}),
        batch_format="pyarrow")
        .groupby(["b", "i"]).aggregate(Count(alias_name="_n"))
        .map_batches(lambda t: t.select(["b", "i"]),
                     batch_format="pyarrow").materialize())

    def _freq_items() -> set:
        cnt = (bi.groupby("i").aggregate(Count(alias_name="n"))
               .map_batches(lambda t: t.filter(
                   pc.greater_equal(t["n"], support)),
                   batch_format="pyarrow"))
        return {r["i"] for r in cnt.take_all()}

    f1 = _freq_items()
    if not f1:
        return pa.table({"p1": pa.array([], pa.int64()),
                         "p2": pa.array([], pa.int64()),
                         "p3": pa.array([], pa.int64()),
                         "support": pa.array([], pa.int64())})
    f1_ref = ray.put(f1)

    def pairs(g: pa.Table) -> pa.Table:
        keep = ray.get(f1_ref)
        items = sorted(v for v in set(g["i"].to_pylist()) if v in keep)
        ps = list(combinations(items, 2))
        return pa.table({"p1": pa.array([p[0] for p in ps], pa.int64()),
                         "p2": pa.array([p[1] for p in ps], pa.int64())})

    f2_ds = (bi.groupby("b").map_groups(pairs, batch_format="pyarrow")
             .groupby(["p1", "p2"]).aggregate(Count(alias_name="n"))
             .map_batches(lambda t: t.filter(
                 pc.greater_equal(t["n"], support)).select(["p1", "p2"]),
                 batch_format="pyarrow").materialize())
    n_f2 = f2_ds.count()
    if n_f2 > pair_limit:
        raise ValueError(
            f"frequent_triples: {n_f2} frequent pairs exceed the broadcast "
            f"bound ({pair_limit}); raise the support threshold")
    f2 = {(r["p1"], r["p2"]) for r in f2_ds.take_all()}
    if not f2:
        return pa.table({"p1": pa.array([], pa.int64()),
                         "p2": pa.array([], pa.int64()),
                         "p3": pa.array([], pa.int64()),
                         "support": pa.array([], pa.int64())})
    f2_ref = ray.put(f2)

    def triples(g: pa.Table) -> pa.Table:
        fp = ray.get(f2_ref)
        active = {v for p in fp for v in p}
        items = sorted(v for v in set(g["i"].to_pylist()) if v in active)
        if len(items) > basket_cap:
            raise ValueError(
                f"frequent_triples: basket with {len(items)} frequent-pair-"
                f"active items exceeds basket_cap={basket_cap}")
        # Apriori candidate generation: every sub-pair must be frequent
        ts = [(a, b, c) for a, b, c in combinations(items, 3)
              if (a, b) in fp and (a, c) in fp and (b, c) in fp]
        return pa.table({"p1": pa.array([t[0] for t in ts], pa.int64()),
                         "p2": pa.array([t[1] for t in ts], pa.int64()),
                         "p3": pa.array([t[2] for t in ts], pa.int64())})

    out = (bi.groupby("b").map_groups(triples, batch_format="pyarrow")
           .groupby(["p1", "p2", "p3"]).aggregate(Count(alias_name="support"))
           .map_batches(lambda t: pa.table({
               "p1": pc.cast(t["p1"], pa.int64()),
               "p2": pc.cast(t["p2"], pa.int64()),
               "p3": pc.cast(t["p3"], pa.int64()),
               "support": pc.cast(t["support"], pa.int64())})
               .filter(pc.greater_equal(pc.cast(t["support"], pa.int64()),
                                        support)),
               batch_format="pyarrow").materialize())
    if out.count() == 0:
        return pa.table({"p1": pa.array([], pa.int64()),
                         "p2": pa.array([], pa.int64()),
                         "p3": pa.array([], pa.int64()),
                         "support": pa.array([], pa.int64())})
    return out.sort(["p1", "p2", "p3"])


def brandes_sweep_nano(adj: dict, s: str) -> dict:
    """One Brandes single-source dependency sweep over an unweighted
    adjacency dict (neighbors PRE-SORTED): BFS shortest-path counts, then
    the reverse-order accumulation δ(v) = Σ_w σ(v)/σ(w) · (1 + δ(w)).
    The per-node dependency is quantized half-away-from-zero to 1e-9
    units BEFORE any cross-seed summation, so the total is an
    order-independent integer sum and the query and its oracle recompute
    (which both call THIS function) agree bit-for-bit."""
    from collections import deque

    sigma = {s: 1}
    dist = {s: 0}
    order: list = []
    q = deque([s])
    while q:
        v = q.popleft()
        order.append(v)
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                sigma[w] = 0
                q.append(w)
            if dist[w] == dist[v] + 1:
                sigma[w] += sigma[v]
    delta = {v: 0.0 for v in order}
    for w in reversed(order):
        for v in adj.get(w, ()):
            if dist.get(v, -2) == dist[w] - 1:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
    out = {}
    for v in order:
        if v == s:
            continue
        x = delta[v] * 1e9
        out[v] = int(np.sign(x) * np.floor(np.abs(x) + 0.5))
    return out


def betweenness(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    k_seeds: int | None = None,
    edge_limit: int = 5_000_000,
) -> pa.Table:
    """Betweenness centrality of an undirected graph by SEED-PARALLEL
    Brandes: the edge list is aggregated once (distinct, symmetrized),
    broadcast via ``ray.put``, and each task runs exact single-source
    sweeps (:func:`brandes_sweep_nano`) for its batch of seeds — the
    classic k-source approximation (Brandes–Pich): with ``k_seeds=None``
    every node is a source and the result is EXACT (each unordered pair
    contributes from both endpoints — values are 2× the textbook
    normalization; integer nano-units are reported unnormalized).
    Per-seed dependencies are nano-quantized before the groupby-sum, so
    the reduction is an order-independent integer aggregate. The graph
    itself must be bounded (``edge_limit`` raises otherwise) — this is
    the vocabulary-bounded-graph regime, same contract as the dense
    PageRank broadcast; the data-scale side is whatever upstream
    aggregation DERIVED the edge list."""
    from ray.data.aggregate import Count, Sum

    e = (edges.map_batches(
        lambda t: pa.table({"a": pc.cast(t[src], pa.string()),
                            "b": pc.cast(t[dst], pa.string())}),
        batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Count(alias_name="_n"))
        .materialize())
    if e.count() > edge_limit:
        raise ValueError(
            f"betweenness: {e.count()} edges exceed the broadcast bound "
            f"({edge_limit}); this operator targets vocabulary-bounded "
            "graphs — contract the graph first")
    adj: dict = {}
    for r in e.take_all():
        if r["a"] == r["b"]:
            continue
        adj.setdefault(r["a"], set()).add(r["b"])
        adj.setdefault(r["b"], set()).add(r["a"])
    nodes = sorted(adj)
    if not nodes:
        return pa.table({"node": pa.array([], pa.string()),
                         "bw_nano": pa.array([], pa.int64())})
    adj = {k: sorted(v) for k, v in adj.items()}
    seeds = nodes if k_seeds is None else nodes[:k_seeds]
    adj_ref = ray.put(adj)

    def sweep(t: pa.Table) -> pa.Table:
        a = ray.get(adj_ref)
        ns, vs = [], []
        for s in t["seed"].to_pylist():
            for v, nano in brandes_sweep_nano(a, s).items():
                ns.append(v)
                vs.append(nano)
        return pa.table({"node": pa.array(ns, pa.string()),
                         "bw_nano": pa.array(vs, pa.int64())})

    part = (ray.data.from_arrow(pa.table({"seed": pa.array(seeds)}))
            .repartition(max(1, min(len(seeds), 16)))
            .map_batches(sweep, batch_format="pyarrow")
            .groupby("node").aggregate(Sum("bw_nano", alias_name="bw_nano")))
    got = {r["node"]: r["bw_nano"] for r in part.take_all()}
    return pa.table({
        "node": pa.array(nodes, pa.string()),
        "bw_nano": pa.array([int(got.get(n, 0)) for n in nodes],
                            pa.int64())})


def fs_pattern_counts(
    ds: Dataset,
    block_col: str,
    id_col: str,
    name_col: str,
    type_col: str,
    cents_col: str,
    *,
    jw_threshold: float = 0.9,
    cents_tol: int = 100,
) -> Dataset:
    """Fellegi–Sunter agreement-pattern counting over blocked candidate
    pairs — the sufficient statistics of probabilistic record linkage.
    Within each blocking group every unordered pair is scored on three
    binary comparators (name Jaro-Winkler ≥ threshold, exact type match,
    price within ``cents_tol``) and only the 8-cell pattern histogram
    leaves the group (a bounded combiner: the pair space never hits the
    exchange). The JW comparator reuses :func:`_jaro_winkler_pairs` with
    the same best-case length-ratio prefilter as :func:`jw_pairs` —
    pairs pruned by the prefilter provably score below the threshold, so
    their agreement bit is 0 without computing anything. Returns
    (pattern, n) with pattern = a_name·4 + a_type·2 + a_price."""
    def fn(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        texts = ["" if x is None else x
                 for x in g[name_col].take(pa.array(order)).to_pylist()]
        types = np.asarray(g[type_col].take(pa.array(order)).to_pylist(),
                           dtype=object)
        cents = pc.cast(g[cents_col], pa.int64()).to_numpy(
            zero_copy_only=False)[order]
        lens = np.asarray([len(x) for x in texts], dtype=np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        if len(ii) == 0:
            return pa.table({"pattern": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        a1 = np.zeros(len(ii), dtype=bool)
        a = np.minimum(lens[ii], lens[jj]).astype(np.float64)
        b = np.maximum(lens[ii], lens[jj]).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            best_j = (2.0 + a / b) / 3.0
        best = np.where(a > 0, best_j + 0.4 * (1.0 - best_j), 0.0)
        cand = np.flatnonzero(best >= jw_threshold)
        if len(cand):
            L = max(int(lens.max()), 1)
            M = np.zeros((len(texts), L), dtype=np.uint32)
            for i, s in enumerate(texts):
                if s:
                    M[i, :len(s)] = np.frombuffer(
                        s.encode("utf-32-le"), dtype=np.uint32)
            sim = _jaro_winkler_pairs(M[ii[cand]], M[jj[cand]],
                                      lens[ii[cand]], lens[jj[cand]])
            a1[cand] = sim >= jw_threshold
        a2 = types[ii] == types[jj]
        a3 = np.abs(cents[ii] - cents[jj]) <= cents_tol
        pat = (a1.astype(np.int64) * 4 + a2.astype(np.int64) * 2
               + a3.astype(np.int64))
        u, c = np.unique(pat, return_counts=True)
        return pa.table({"pattern": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum

    return (ds.groupby(block_col).map_groups(fn, batch_format="pyarrow")
            .groupby("pattern").aggregate(Sum("n", alias_name="n")))


def max_spanning_forest(
    ds: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    driver_edge_limit: int = 500_000,
    max_rounds: int = 40,
) -> Dataset:
    """Maximum-weight spanning forest of an undirected weighted graph —
    the association-backbone extraction a KG pipeline runs to thin a
    dense co-occurrence graph down to its strongest tree of links.

    Determinism: edges are ranked under the TOTAL order
    ``(weight DESC, u ASC, v ASC)`` with ``(u, v) = (min(src,dst),
    max(src,dst))``; a total order means effective weights are distinct,
    so the maximum spanning forest is UNIQUE and every regime / execution
    order / cluster size emits the identical edge set. Weights must be
    integers (cast to int64; exactness end to end). The caller supplies
    one row per undirected pair (pre-aggregate parallel edges first);
    self-loops are dropped.

    * ``edges <= driver_edge_limit``: Kruskal with union-find on the
      driver (a canonicalized KG backbone is node-scale tiny).
    * larger graphs: textbook distributed Boruvka — each round every
      component picks its best incident cross edge (per-batch lexsort
      combiner, then one groupby(component) reduce), the picked edges
      join the forest, and components contract by parent-pointer
      jumping (2-cycles from mutual picks root at the smaller label;
      each jump is one node-scale hash join, O(log n) jumps). Rounds
      halve the component count, so O(log n) rounds total; only
      node-scale label tables and the edge list ever enter a join, and
      edge blocks stream through every round.

    Returns ``(src, dst, weight)`` with ``src < dst``, one row per
    forest edge.
    """
    def norm(t: pa.Table) -> pa.Table:
        u = pc.min_element_wise(t[src], t[dst])
        v = pc.max_element_wise(t[src], t[dst])
        w = pc.cast(t[weight], pa.int64())
        keep = pc.invert(pc.equal(u, v))
        return pa.table({"u": u, "v": v, "w": w}).filter(keep)

    e = _compact(ds.map_batches(norm, batch_format="pyarrow")).materialize()
    # Ray drops the schema on all-empty datasets — fall back to the input's
    # schema (from_arrow of a typed empty table keeps it), else string ids.
    sch = e.schema() or ds.schema()
    base = getattr(sch, "base_schema", None) if sch is not None else None
    if base is not None and "u" in base.names:
        node_type = base.field("u").type
    elif base is not None and src in base.names:
        node_type = base.field(src).type
    else:
        node_type = pa.string()
    empty = pa.table({"src": pa.array([], node_type),
                      "dst": pa.array([], node_type),
                      "weight": pa.array([], pa.int64())})
    if e.count() == 0:
        return ray.data.from_arrow(empty)

    if e.count() <= driver_edge_limit:
        rows = sorted(((-int(r["w"]), r["u"], r["v"]) for r in e.take_all()))
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        out = []
        for nw, u, v in rows:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
                out.append((u, v, -nw))
        out.sort()
        return ray.data.from_arrow(pa.table({
            "src": pa.array([a for a, _, _ in out], node_type),
            "dst": pa.array([b for _, b, _ in out], node_type),
            "weight": pa.array([w for _, _, w in out], pa.int64())}))

    # ---- distributed Boruvka ----
    def uv_nodes(t: pa.Table) -> pa.Table:
        n = pa.chunked_array([t["u"].combine_chunks(),
                              t["v"].combine_chunks()]).combine_chunks()
        return pa.table({"node": n})

    labels = distinct(e.map_batches(uv_nodes, batch_format="pyarrow"),
                      ["node"]).map_batches(
        lambda t: pa.table({"node": t["node"], "lab": t["node"]}),
        batch_format="pyarrow").materialize()
    forest = ray.data.from_arrow(empty)

    def _best_local(t: pa.Table) -> pa.Table:
        # per-batch combiner: keep the best (w DESC, u, v) row per comp
        if len(t) == 0:
            return t
        c = np.asarray(t["c"].to_pylist(), dtype=object)
        w = t["w"].to_numpy(zero_copy_only=False)
        u = np.asarray(t["u"].to_pylist(), dtype=object)
        v = np.asarray(t["v"].to_pylist(), dtype=object)
        order = np.lexsort((v, u, -w, c))
        first = np.ones(len(order), dtype=bool)
        cs = c[order]
        first[1:] = cs[1:] != cs[:-1]
        idx = pa.array(order[first].astype(np.int64))
        return t.take(idx)

    for _ in range(max_rounds):
        lu = hash_join_sized(
            e, labels.map_batches(
                lambda t: pa.table({"u": t["node"], "lu": t["lab"]}),
                batch_format="pyarrow"), on=("u",))
        both = hash_join_sized(
            lu, labels.map_batches(
                lambda t: pa.table({"v": t["node"], "lv": t["lab"]}),
                batch_format="pyarrow"), on=("v",))
        cross = both.filter(
            lambda r: r["lu"] != r["lv"]).materialize()
        if cross.count() == 0:
            break

        def emit2(t: pa.Table) -> pa.Table:
            base = {"u": t["u"], "v": t["v"], "w": t["w"]}
            t1 = pa.table({**base, "c": t["lu"], "o": t["lv"]})
            t2 = pa.table({**base, "c": t["lv"], "o": t["lu"]})
            return pa.concat_tables([t1, t2])

        picks = (cross.map_batches(emit2, batch_format="pyarrow")
                 .map_batches(_best_local, batch_format="pyarrow")
                 .groupby("c").map_groups(_best_local,
                                          batch_format="pyarrow")
                 ).materialize()
        selected = distinct(picks, ["u", "v", "w"])
        forest = forest.union(selected.map_batches(
            lambda t: pa.table({"src": t["u"], "dst": t["v"],
                                "weight": t["w"]}),
            batch_format="pyarrow")).materialize()

        # contraction: parent pointers with 2-cycle break, then jumping
        par = picks.map_batches(
            lambda t: pa.table({"c": t["c"], "p": t["o"]}),
            batch_format="pyarrow")
        mutual = hash_join_sized(
            par, par.map_batches(
                lambda t: pa.table({"p": t["c"], "pp": t["p"]}),
                batch_format="pyarrow"), on=("p",))
        par = mutual.map_batches(
            lambda t: pa.table({"c": t["c"], "p": pc.if_else(
                pc.equal(t["pp"], t["c"]),
                pc.min_element_wise(t["c"], t["p"]), t["p"])}),
            batch_format="pyarrow").materialize()
        for _ in range(max_rounds):
            j = hash_join_sized(
                par, par.map_batches(
                    lambda t: pa.table({"p": t["c"], "pp": t["p"]}),
                    batch_format="pyarrow"), on=("p",), how="left_outer")
            j = j.map_batches(
                lambda t: pa.table({
                    "c": t["c"], "p": pc.coalesce(t["pp"], t["p"]),
                    "chg": pc.cast(pc.and_(
                        pc.is_valid(t["pp"]),
                        pc.invert(pc.equal(t["pp"], t["p"]))), pa.int64())}),
                batch_format="pyarrow").materialize()
            changed = sum(
                int(b["m"][0].as_py() or 0) for b in j.map_batches(
                    lambda t: pa.table({"m": pa.array(
                        [int(pc.sum(t["chg"]).as_py() or 0)], pa.int64())}),
                    batch_format="pyarrow").iter_batches(
                        batch_format="pyarrow"))
            par = j.select_columns(["c", "p"])
            if changed == 0:
                break
        labels = hash_join_sized(
            labels, par.map_batches(
                lambda t: pa.table({"lab": t["c"], "root": t["p"]}),
                batch_format="pyarrow"), on=("lab",),
            how="left_outer").map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "lab": pc.coalesce(t["root"], t["lab"])}),
            batch_format="pyarrow").materialize()
    return forest


def adamic_adar_topk(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    k: int = 10,
    degree_cap: int = 100_000,
) -> pa.Table:
    """Adamic–Adar link prediction: for every NON-edge node pair at
    distance 2, the score Σ over common neighbors w of 1/ln(deg w) —
    quantized PER CENTER to integer nano-units (floor(1e9/ln(deg)+0.5))
    before summing, so the aggregate is exact integer arithmetic and no
    float-summation-order question can split engines; the one float per
    center (a divide + ln over a small-int degree) is the identical
    expression the SQL oracle evaluates. Returns the top-``k`` candidate
    pairs by (score DESC, u ASC, v ASC) as (u, v, aa_nano).

    Shape: edge normalization (u < v, dedup), adjacency emit both
    directions, one groupby(center) whose groups are DEGREE-bounded
    (``degree_cap`` raises — per-center pair generation is quadratic in
    degree, the same explicit contract as NTILE's group bound; salt/cap
    hub nodes upstream if a web-scale graph trips it), one (u, v) groupby
    to sum the quantized weights, an anti-join against the edge set on a
    composite key, and a k-row sort+limit."""
    import math

    def norm(t: pa.Table) -> pa.Table:
        u = pc.min_element_wise(t[src], t[dst])
        v = pc.max_element_wise(t[src], t[dst])
        keep = pc.invert(pc.equal(u, v))
        return pa.table({"u": u, "v": v}).filter(keep)

    e = distinct(_compact(edges.map_batches(norm, batch_format="pyarrow")),
                 ["u", "v"]).materialize()
    node_type = pa.string()
    sch = e.schema()
    base = getattr(sch, "base_schema", None) if sch is not None else None
    if base is not None and "u" in base.names:
        node_type = base.field("u").type
    empty = pa.table({"u": pa.array([], node_type),
                      "v": pa.array([], node_type),
                      "aa_nano": pa.array([], pa.int64())})
    if e.count() == 0:
        return empty

    def adj(t: pa.Table) -> pa.Table:
        return pa.table({
            "x": pa.chunked_array([t["u"].combine_chunks(),
                                   t["v"].combine_chunks()]).combine_chunks(),
            "n": pa.chunked_array([t["v"].combine_chunks(),
                                   t["u"].combine_chunks()]).combine_chunks()})

    def center_pairs(g: pa.Table) -> pa.Table:
        nb = sorted(set(g["n"].to_pylist()))
        deg = len(nb)
        if deg > degree_cap:
            raise ValueError(
                f"adamic_adar_topk: node degree {deg} > {degree_cap}; "
                "cap or salt hub nodes before link prediction")
        if deg < 2:
            return pa.table({"u": pa.array([], node_type),
                             "v": pa.array([], node_type),
                             "w": pa.array([], pa.int64())})
        wn = int(math.floor(1e9 / math.log(float(deg)) + 0.5))
        arr = np.asarray(nb, dtype=object)
        iu, ju = np.triu_indices(deg, k=1)
        return pa.table({"u": pa.array(arr[iu].tolist(), node_type),
                         "v": pa.array(arr[ju].tolist(), node_type),
                         "w": pa.array([wn] * len(iu), pa.int64())})

    from ray.data.aggregate import Sum

    scored = (e.map_batches(adj, batch_format="pyarrow")
              .groupby("x").map_groups(center_pairs, batch_format="pyarrow")
              .groupby(["u", "v"]).aggregate(Sum("w", alias_name="aa_nano")))

    sep = pa.scalar("\x1f")

    def keyed(t: pa.Table) -> pa.Table:
        kk = pc.binary_join_element_wise(
            pc.cast(t["u"], pa.string()), pc.cast(t["v"], pa.string()), sep)
        return t.append_column("pairkey", kk)

    cand = hash_join_sized(
        scored.map_batches(keyed, batch_format="pyarrow"),
        e.map_batches(lambda t: keyed(t).select(["pairkey"]),
                      batch_format="pyarrow"),
        on=("pairkey",), how="left_anti")
    out = (cand.select_columns(["u", "v", "aa_nano"])
           .sort(["aa_nano", "u", "v"], descending=[True, False, False])
           .limit(k).materialize())
    if out.count() == 0:
        return empty
    return pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow") if len(b)],
        promote_options="default")


def gazetteer_counts(
    docs: Dataset,
    phrases: list[str],
    *,
    text_col: str = "text",
) -> Dataset:
    """Dictionary / gazetteer phrase spotting — the surface-form
    frequency audit a KG pipeline runs before committing an alias list
    (cf. the reference's newsagency alias vocabulary): for every phrase,
    the corpus-wide document frequency and total (non-overlapping,
    case-sensitive) hit count.

    Bounded-inventory contract: the phrase list is the small side — it is
    captured in the task closure once (Ray ships it per task, not per
    batch) and each batch runs ONE vectorized ``pc.count_substring``
    kernel per phrase, so per-batch work is O(len(phrases) · bytes) with
    no Python row loop. Raises if the inventory exceeds 10k entries —
    beyond that an Aho-Corasick actor stage is the right tool, not a
    per-phrase kernel sweep. Per-batch partial (phrase, n_docs, n_hits)
    rows → one bounded groupby; the text column never enters the
    exchange. Returns (phrase, n_docs, n_hits)."""
    from ray.data.aggregate import Sum

    if len(phrases) > 10_000:
        raise ValueError(
            "gazetteer_counts: phrase inventory > 10k; use an automaton "
            "actor stage instead of the per-phrase kernel sweep")
    ph = sorted(set(phrases))

    def partial(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        nd, nh = [], []
        for p in ph:
            c = pc.count_substring(txt, pattern=p)
            nh.append(int(pc.sum(c).as_py() or 0))
            nd.append(int(pc.sum(pc.cast(pc.greater(
                c, pa.scalar(0, pa.int32())), pa.int64())).as_py() or 0))
        return pa.table({"phrase": pa.array(ph, pa.string()),
                         "n_docs": pa.array(nd, pa.int64()),
                         "n_hits": pa.array(nh, pa.int64())})

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("phrase").aggregate(Sum("n_docs", alias_name="n_docs"),
                                         Sum("n_hits", alias_name="n_hits")))


class AhoCorasickAutomaton:
    """Classic Aho–Corasick multi-pattern matcher with NON-OVERLAPPING
    per-phrase counting — the exact left-to-right restart-after-match
    semantics of ``pc.count_substring`` / SQL ``replace()``-length
    counting, so it is drop-in interchangeable with the per-phrase
    kernel sweep (property-tested equal). Build cost is O(Σ|phrase|)
    once; matching is O(|text| + matches) regardless of inventory size —
    the property that makes 100k-phrase gazetteers linear where the
    kernel sweep is O(phrases · bytes)."""

    def __init__(self, phrases: list[str]):
        from collections import deque

        self.phrases = sorted(set(phrases))
        if any(not p for p in self.phrases):
            raise ValueError("empty phrase in gazetteer inventory")
        self.goto: list[dict] = [{}]
        self.out: list[list[int]] = [[]]
        for idx, p in enumerate(self.phrases):
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s].append(idx)
        self.fail = [0] * len(self.goto)
        dq = deque(self.goto[0].values())
        while dq:
            r = dq.popleft()
            for ch, s in self.goto[r].items():
                dq.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0)
                if self.fail[s] == s:
                    self.fail[s] = 0
                self.out[s] = self.out[s] + self.out[self.fail[s]]
        self.plens = [len(p) for p in self.phrases]

    def count(self, text: str) -> list[int]:
        counts = [0] * len(self.phrases)
        last_end = [-1] * len(self.phrases)
        s = 0
        goto, fail, out, plens = self.goto, self.fail, self.out, self.plens
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            for idx in out[s]:
                if i - plens[idx] + 1 > last_end[idx]:
                    counts[idx] += 1
                    last_end[idx] = i
        return counts


class GazetteerAutomatonStage:
    """Actor-pool phrase spotter — the declared scale path past
    :func:`gazetteer_counts`'s 10k-phrase kernel-sweep bound: the
    automaton is built ONCE per actor in ``__init__`` (the T1/T5
    stateful-stage contract — never per batch), each ``__call__``
    streams a batch's texts through it and emits one bounded
    (phrase, n_docs, n_hits) partial table. Matching is
    O(bytes + matches) per batch independent of inventory size."""

    def __init__(self, phrases: list[str], text_col: str = "text"):
        self.ac = AhoCorasickAutomaton(phrases)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ph = self.ac.phrases
        nd = np.zeros(len(ph), dtype=np.int64)
        nh = np.zeros(len(ph), dtype=np.int64)
        for s in t[self.text_col].to_pylist():
            c = np.asarray(self.ac.count(s or ""), dtype=np.int64)
            nh += c
            nd += c > 0
        return pa.table({"phrase": pa.array(ph, pa.string()),
                         "n_docs": pa.array(nd, pa.int64()),
                         "n_hits": pa.array(nh, pa.int64())})


def gazetteer_counts_automaton(
    docs: Dataset,
    phrases: list[str],
    *,
    text_col: str = "text",
    concurrency: tuple[int, int] = (1, 8),
) -> Dataset:
    """Automaton-backed gazetteer counts: identical output contract to
    :func:`gazetteer_counts` ((phrase, n_docs, n_hits), non-overlapping
    case-sensitive hits) with no inventory-size ceiling — the phrase
    list ships once per ACTOR (constructor args), not per task or per
    batch, and the per-batch partial → one bounded groupby layout is
    unchanged, so the text column never enters the exchange."""
    from ray.data.aggregate import Sum

    return (docs.map_batches(
        GazetteerAutomatonStage,
        fn_constructor_args=(phrases, text_col),
        concurrency=concurrency, batch_format="pyarrow")
        .groupby("phrase").aggregate(Sum("n_docs", alias_name="n_docs"),
                                     Sum("n_hits", alias_name="n_hits")))


def rle_run_stats(
    ds: Dataset,
    part_col: str,
    key_col: str,
    bucket_bits: int = 16,
) -> Dataset:
    """Distributed gaps-and-islands: per ``part_col`` value, the number of
    rows and of maximal CONSECUTIVE-``key_col`` runs (islands) — the
    run-length statistic that sizes RLE/roaring bitmap indexes and
    clustered-write layouts.

    Scale shape: the classic ``key - row_number()`` window needs a total
    sort per partition value (a giant group per part). Instead each key
    decides "am I a run start?" LOCALLY inside a hash bucket of the key
    space (bucket = key >> bucket_bits): a key k starts a run iff k-1 is
    absent, and k-1 lives in the same bucket unless k sits on a bucket
    boundary — so boundary keys also emit a GHOST row carrying k into the
    bucket of k+1, making every membership test bucket-local. One
    (part, bucket)-keyed exchange of (key, cnt, is_real) triples, ghost
    rows ≤ one per boundary key; no per-part giant group, no global sort.
    Duplicate keys within a part count toward n but never open a run.
    Returns (part_col, n, n_runs).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        p = t[part_col]
        k = pc.cast(t[key_col], pa.int64()).to_numpy(zero_copy_only=False)
        b = k >> bucket_bits
        bn = (k + 1) >> bucket_bits
        cross = bn != b
        d = pa.table({
            part_col: pa.concat_arrays(
                [p.combine_chunks(), p.filter(pa.array(cross)).combine_chunks()]),
            "bucket": pa.array(np.concatenate([b, bn[cross]]), pa.int64()),
            "key": pa.array(np.concatenate([k, k[cross]]), pa.int64()),
            "real": pa.array(np.concatenate(
                [np.ones(len(k), np.int64), np.zeros(int(cross.sum()),
                                                     np.int64)]), pa.int64()),
        })
        # block-level combiner: collapse duplicate (part, bucket, key)
        g = d.group_by([part_col, "bucket", "key"]).aggregate(
            [("real", "sum")])
        return g.rename_columns([part_col, "bucket", "key", "cnt_real"])

    def count_runs(g: pa.Table) -> pa.Table:
        part = g[part_col][0].as_py()
        k = g["key"].to_numpy(zero_copy_only=False)
        cr = g["cnt_real"].to_numpy(zero_copy_only=False)
        # merge duplicates across blocks
        uk, inv = np.unique(k, return_inverse=True)
        creal = np.zeros(len(uk), np.int64)
        np.add.at(creal, inv, cr)
        real = creal > 0
        present = set(uk.tolist())
        starts = int(sum(1 for key in uk[real].tolist()
                         if key - 1 not in present))
        return pa.table({part_col: pa.array([part]),
                         "n": pa.array([int(creal.sum())], pa.int64()),
                         "n_runs": pa.array([starts], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([part_col, "bucket"])
            .map_groups(count_runs, batch_format="pyarrow")
            .groupby(part_col).aggregate(Sum("n", alias_name="n"),
                                         Sum("n_runs", alias_name="n_runs")))


def merge_join(
    left: Dataset,
    right: Dataset,
    on: str,
    right_on: str | None = None,
    num_partitions: int | None = None,
    num_buckets: int = 4096,
) -> Dataset:
    """Range-partitioned sort-merge INNER join over a NUMERIC key — the
    hash join's (ops.hash_join) classical alternative, kept because its
    output arrives CLUSTERED by join-key range (downstream key-ordered
    stages — island scans, range writes, further merge joins — get their
    clustering for free, which a hash join destroys).

    Scale shape: one histogram-partial pass over the LEFT key (per-block
    bucket counts over the key range — the bounded-driver-state trick of
    quantiles_histogram) picks ~equi-depth range cut points; both sides
    map to a partition id by one vectorized searchsorted against the
    broadcast cuts; a tagged UNION co-groups the two sides in ONE
    exchange keyed on the partition id; inside each group both sides
    sort by key and a fully vectorized searchsorted/repeat/cumsum merge
    expands the matches (no per-row Python anywhere). Each range
    partition must fit a worker (the documented NTILE-style bound);
    equi-depth cuts on the left make left-side skew a non-event, while a
    single hot KEY still lands in one partition (use skew_join when a
    hot probe key is possible). Non-key column names must be disjoint.
    """
    from ray.data.aggregate import Max, Min, Sum

    right_on = right_on or on
    ls_, rs_ = left.schema(), right.schema()
    lcols, rcols = list(ls_.names), list(rs_.names)
    overlap = (set(lcols) - {on}) & (set(rcols) - {right_on})
    if overlap:
        raise ValueError(f"merge_join: overlapping non-key columns {overlap}")
    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(np.dtype(t))
        except (TypeError, pa.ArrowNotImplementedError):
            return pa.string()  # pandas object columns

    types: dict[str, pa.DataType] = {}
    for nme, typ in zip(ls_.names, ls_.types):
        types[nme] = _pa_type(typ)
    for nme, typ in zip(rs_.names, rs_.types):
        types[nme] = _pa_type(typ)
    all_cols = lcols + [c for c in rcols if c not in lcols]
    out_cols = list(all_cols)
    if num_partitions is None:
        num_partitions = _join_parts()

    b = left.select_columns([on]).aggregate(
        Min(on, alias_name="lo"), Max(on, alias_name="hi"))
    if b["lo"] is None:
        return ray.data.from_arrow(
            pa.table({c: pa.array([], type=types[c]) for c in out_cols}))
    lo, hi = float(b["lo"]), float(b["hi"])
    width = (hi - lo) / num_buckets or 1.0

    def hist(t: pa.Table) -> pa.Table:
        v = t[on].to_numpy(zero_copy_only=False).astype(np.float64)
        bi = np.minimum(((v - lo) / width).astype(np.int64), num_buckets - 1)
        g = pa.table({"b": pa.array(np.maximum(bi, 0), pa.int64())}) \
            .group_by("b").aggregate([([], "count_all")])
        return g.rename_columns(["b", "cnt"])

    hb = (left.map_batches(hist, batch_format="pyarrow")
          .groupby("b").aggregate(Sum("cnt", alias_name="cnt"))
          .take_all())  # ≤ num_buckets rows — bounded driver state
    counts = np.zeros(num_buckets, np.int64)
    for r in hb:
        counts[int(r["b"])] = int(r["cnt"])
    cum = counts.cumsum()
    n = int(cum[-1])
    targets = [n * j // num_partitions for j in range(1, num_partitions)]
    cut_buckets = sorted({int(np.searchsorted(cum, t, side="right"))
                          for t in targets} - {num_buckets})
    cuts = np.array([lo + (bi + 1) * width for bi in cut_buckets],
                    np.float64)

    def tag(src_cols: list[str], key: str, side: int):
        def fn(t: pa.Table) -> pa.Table:
            v = t[key].to_numpy(zero_copy_only=False).astype(np.float64)
            part = np.searchsorted(cuts, v, side="right")
            cols = {c: t[c] for c in src_cols}
            for c in all_cols:
                if c not in cols:
                    cols[c] = pa.nulls(len(t), type=types[c])
            cols["_mj_part"] = pa.array(part, pa.int64())
            cols["_mj_side"] = pa.array(
                np.full(len(t), side, np.int8), pa.int8())
            return pa.table(cols).select(all_cols + ["_mj_part", "_mj_side"])
        return fn

    tagged = left.map_batches(tag(lcols, on, 0),
                              batch_format="pyarrow").union(
        right.map_batches(tag(rcols, right_on, 1), batch_format="pyarrow"))

    def merge(g: pa.Table) -> pa.Table:
        side = g["_mj_side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0)).select(lcols)
        rt = g.filter(pa.array(side == 1)).select(rcols)
        if len(lt) == 0 or len(rt) == 0:
            return pa.table({c: pa.array([], type=types[c])
                             for c in out_cols})
        lk = lt[on].to_numpy(zero_copy_only=False)
        rk = rt[right_on].to_numpy(zero_copy_only=False)
        lo_i = np.argsort(lk, kind="stable")
        ro_i = np.argsort(rk, kind="stable")
        lt, rt = lt.take(lo_i), rt.take(ro_i)
        lk, rk = lk[lo_i], rk[ro_i]
        a = np.searchsorted(rk, lk, side="left")
        bnd = np.searchsorted(rk, lk, side="right")
        cnt = bnd - a
        li = np.repeat(np.arange(len(lk)), cnt)
        total = int(cnt.sum())
        starts = np.repeat(a, cnt)
        offs = np.arange(total) - np.repeat(cnt.cumsum() - cnt, cnt)
        ri = starts + offs
        lj, rj = lt.take(li), rt.take(ri)
        cols = {c: lj[c] for c in lcols}
        for c in rcols:
            if c not in cols:
                cols[c] = rj[c]
        return pa.table(cols).select(out_cols)

    return tagged.groupby("_mj_part").map_groups(
        merge, batch_format="pyarrow")


def snm_pairs(
    ds: Dataset,
    sort_cols: list[str],
    id_col: str,
    text_col: str,
    window: int = 5,
    min_sim: float = 0.9,
    bucket: int = 512,
) -> Dataset:
    """Sorted-neighborhood record linkage (SNM): globally sort by the
    blocking key, slide a ``window``-row neighborhood down the sorted
    order, and score each in-window pair with the vectorized Jaro-Winkler
    kernel (bit-identical to the SQL engine's double). The complement to
    :func:`jw_pairs`' hash blocking: SNM catches near-matches whose
    blocking keys differ (typo in the key) as long as they SORT nearby,
    and its candidate count is exactly ``n x (window-1)`` — no quadratic
    hot-block risk.

    Distributed shape: :func:`row_number_by` assigns dense global ranks
    (one range-shuffle sort + O(blocks) driver offsets), then each row is
    bucketed by ``rank // bucket`` with the first ``window-1`` rows of
    each bucket ALSO ghost-copied to the previous bucket, so every
    neighborhood is complete inside exactly one group and each pair is
    generated once (by the bucket where its lower-rank row is native).
    In-group work is O(bucket x window) — ranks are dense, so the
    neighborhood is a positional slice, never a search.

    Returns ``(id_a, id_b, jw)`` where ``id_a`` is the lower-RANK row's
    id — the same orientation as the SQL ``b.rn - a.rn BETWEEN 1 AND
    window-1`` self-join.
    """
    if window < 2 or window > bucket:
        raise ValueError("need 2 <= window <= bucket")
    ranked = row_number_by(ds, sort_cols + [id_col])
    w1 = window - 1

    def to_buckets(t: pa.Table) -> pa.Table:
        rn = t["rn"].to_numpy(zero_copy_only=False)
        b = (rn - 1) // bucket
        ghost_mask = ((rn - 1) % bucket < w1) & (b > 0)
        idx = np.concatenate([np.arange(len(rn)), np.flatnonzero(ghost_mask)])
        bkt = np.concatenate([b, b[ghost_mask] - 1])
        native = np.concatenate([np.ones(len(rn), bool),
                                 np.zeros(int(ghost_mask.sum()), bool)])
        taken = t.select([id_col, text_col, "rn"]).take(
            pa.array(idx, pa.int64()))
        return taken.append_column("_bkt", pa.array(bkt, pa.int64())) \
                    .append_column("_native", pa.array(native, pa.bool_()))

    def pairs(g: pa.Table) -> pa.Table:
        order = np.argsort(g["rn"].to_numpy(zero_copy_only=False))
        g = g.take(pa.array(order, pa.int64()))
        rn = g["rn"].to_numpy(zero_copy_only=False)
        native = g["_native"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        texts = ["" if x is None else x for x in g[text_col].to_pylist()]
        lens = np.asarray([len(x) for x in texts], dtype=np.int64)
        n = len(rn)
        ii, jj = [], []
        for d in range(1, w1 + 1):
            i = np.arange(0, n - d)
            keep = native[i]  # ranks dense ⇒ position offset == rank offset
            ii.append(i[keep])
            jj.append(i[keep] + d)
        ii = np.concatenate(ii) if ii else np.zeros(0, np.int64)
        jj = np.concatenate(jj) if jj else np.zeros(0, np.int64)
        if len(ii):
            L = max(int(lens.max()), 1)
            M = np.zeros((n, L), dtype=np.uint32)
            for i, s in enumerate(texts):
                if s:
                    M[i, :len(s)] = np.frombuffer(
                        s.encode("utf-32-le"), dtype=np.uint32)
            sim = _jaro_winkler_pairs(M[ii], M[jj], lens[ii], lens[jj])
            keep = sim >= min_sim
            ii, jj, sim = ii[keep], jj[keep], sim[keep]
        else:
            sim = np.zeros(0, np.float64)
        return pa.table({
            "id_a": pa.array(ids[ii], pa.int64()),
            "id_b": pa.array(ids[jj], pa.int64()),
            "jw": pa.array(sim, pa.float64())})

    return (ranked.map_batches(to_buckets, batch_format="pyarrow")
            .groupby("_bkt").map_groups(pairs, batch_format="pyarrow"))


def quantile_sketch_samples(
    ds: Dataset,
    value_col: str,
    key_col: str,
    eps: float = 0.02,
    nblocks: int = 64,
) -> list[tuple[int, int]]:
    """Mergeable deterministic quantile sketch: partition rows into
    ``nblocks`` LOGICAL blocks by a hash of ``key_col`` (so the summary is
    independent of physical block boundaries — the determinism contract
    every oracle-checked sketch here follows), sort each block once, and
    keep every ``k_b``-th order statistic (k_b = max(1, floor(2 eps n_b)))
    plus the block max, each carrying the weight = number of rows it
    covers. The merged weighted sample has O(nblocks / eps) entries and
    its cumulative weight at a kept value equals that value's EXACT rank
    within its block — so a quantile read off the merged summary has rank
    error at most sum_b (k_b - 1) <= 2 eps n. Returns the merged,
    value-sorted (value, weight) list (driver-side, bounded)."""

    def per_block(g: pa.Table) -> pa.Table:
        v = np.sort(g[value_col].to_numpy(zero_copy_only=False))
        n_b = len(v)
        k_b = max(1, int(2 * eps * n_b))
        idx = np.arange(k_b - 1, n_b, k_b)
        if len(idx) == 0 or idx[-1] != n_b - 1:
            idx = np.append(idx, n_b - 1)
        w = np.diff(np.concatenate([[-1], idx]))
        return pa.table({"v": pa.array(v[idx], pa.int64()),
                         "w": pa.array(w, pa.int64())})

    def assign(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((keys * np.uint64(2654435761)) % np.uint64(2**32)) \
            % np.uint64(nblocks)
        return pa.table({"_qb": pa.array(b.astype(np.int64), pa.int64()),
                         value_col: t[value_col]})

    rows = (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("_qb").map_groups(per_block, batch_format="pyarrow")
            .take_all())  # bounded: O(nblocks / eps) samples
    merged: dict[int, int] = {}
    for r in rows:
        merged[int(r["v"])] = merged.get(int(r["v"]), 0) + int(r["w"])
    return sorted(merged.items())


def quantile_from_samples(samples: list[tuple[int, int]], rank: int) -> int:
    """Smallest sample value whose cumulative weight reaches ``rank``."""
    acc = 0
    for v, w in samples:
        acc += w
        if acc >= rank:
            return v
    return samples[-1][0] if samples else 0


def huffman_total_bits(counts: list[int]) -> int:
    """Total encoded size (bits) of an optimal prefix (Huffman) code for
    the given symbol counts — sum(w_i * depth_i). Every optimal tree has
    the SAME total cost, so the result is deterministic regardless of
    tie-breaking (the property that makes it oracle-checkable). A single
    symbol costs 0 bits (depth 0); empty input costs 0."""
    import heapq

    h = [int(c) for c in counts if c > 0]
    if len(h) < 2:
        return 0
    heapq.heapify(h)
    total = 0
    while len(h) > 1:
        a = heapq.heappop(h)
        b = heapq.heappop(h)
        total += a + b
        heapq.heappush(h, a + b)
    return total


def read_parquet_unify(path_or_files) -> Dataset:
    """Schema-evolution-safe parquet source: scans every fragment FOOTER
    for the union-by-name schema (first-seen type wins), then null-fills
    absent columns per block so every downstream exchange sees ONE
    schema. Ray's raw ``read_parquet`` over mixed-schema fragments emits
    per-file block schemas (with a 'may lead to unexpected behavior'
    warning) and breaks groupbys; this is the evolution-aware read a
    long-lived lakehouse table needs after columns were added over time.
    Footer scan is metadata-only (no row bytes leave storage)."""
    import glob as _glob

    if isinstance(path_or_files, str):
        files = sorted(_glob.glob(os.path.join(path_or_files, "*.parquet")))
    else:
        files = list(path_or_files)
    import pyarrow.parquet as _pq

    fields: dict[str, pa.DataType] = {}
    for f in files:
        for fld in _pq.read_schema(f):
            fields.setdefault(fld.name, fld.type)
    uschema = pa.schema([pa.field(k, v) for k, v in fields.items()])

    def fill(t: pa.Table) -> pa.Table:
        cols = []
        for fld in uschema:
            if fld.name in t.column_names:
                cols.append(pc.cast(t[fld.name], fld.type))
            else:
                cols.append(pa.nulls(t.num_rows, fld.type))
        return pa.table(dict(zip(uschema.names, cols)))

    return ray.data.read_parquet(files).map_batches(
        fill, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Katz centrality (truncated attenuated walk counts)
# --------------------------------------------------------------------------


def katz(
    edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    alpha: float = 0.05,
    iters: int = 4,
    round_decimals: int = 9,
    broadcast_threshold: int = 65536,
    driver_edge_limit: int = 500_000,
) -> Dataset:
    """``iters``-truncated Katz index over a directed weighted edge list:
    ``x = Σ_{k=1..iters} α^k (Aᵀ)^k 1`` via the fixed-point recurrence
    ``x ← round(α · Aᵀ(x + 1))`` from ``x = 0`` — the attenuated
    walk-count centrality (all incoming walks, geometrically damped),
    which sees multi-hop volume where degree sees only hop 1 and, unlike
    PageRank, does NOT normalize away a neighbor's own out-volume.
    Truncation makes the result well-defined regardless of spectral
    radius (no α < 1/λ_max requirement); per-iteration rounding to
    ``round_decimals`` makes re-runs bit-stable within a regime exactly
    as in :func:`pagerank` (same caveat: regimes differ in float
    partial-sum decomposition, so rounding-boundary data could in
    principle flip an ulp across regimes).

    Same three-regime layout as :func:`pagerank` (the recurrence is a
    strict simplification — no degree division, no dangling term):

    * ``edges ≤ driver_edge_limit``: canonically-sorted edges iterate on
      the driver (a constructed KG backbone is node-scale tiny).
    * ``nodes ≤ broadcast_threshold``: one streaming pass per iteration;
      every edge block emits a dense contribution partial over the
      broadcast node index, partials reduce in canonical byte order.
    * otherwise fully distributed: per iteration ``contrib = edges ⋈ x
      (on src) → groupby(dst).sum``, ``x = nodes ⟕ contrib``; only
      node-scale tables materialize.

    Returns ``(node, katz)`` with float64 ``katz``.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    w_expr = (lambda t: pc.cast(t[weight], pa.float64())) if weight else (
        lambda t: pa.array(np.ones(len(t)), type=pa.float64()))

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[src], "dst": t[dst], "w": w_expr(t)})

    e = _compact(edges.map_batches(project, batch_format="pyarrow")).materialize()

    n_edges = e.count()
    if 0 < n_edges <= driver_edge_limit:
        rows = sorted(((r["src"], r["dst"], float(r["w"])) for r in e.take_all()))
        nodes_l = sorted({a for a, _, _ in rows} | {b for _, b, _ in rows})
        pos = {v: i for i, v in enumerate(nodes_l)}
        nn = len(nodes_l)
        si = np.asarray([pos[a] for a, _, _ in rows], dtype=np.int64)
        di = np.asarray([pos[b] for _, b, _ in rows], dtype=np.int64)
        wv = np.asarray([x for _, _, x in rows], dtype=np.float64)
        x = np.zeros(nn)
        for _ in range(iters):
            c = np.zeros(nn)
            np.add.at(c, di, wv * (x[si] + 1.0))
            x = np.round(alpha * c, round_decimals)
        node_type = e.schema().base_schema.field("src").type
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes_l, type=node_type),
            "katz": pa.array(x, type=pa.float64()),
        }))

    nodes = _compact(distinct(
        e.map_batches(lambda t: pa.table({"node": t["src"]}),
                      batch_format="pyarrow")
        .union(e.map_batches(lambda t: pa.table({"node": t["dst"]}),
                             batch_format="pyarrow")),
        ["node"],
    )).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda t: t.append_column("katz", pa.array([], type=pa.float64())),
            batch_format="pyarrow",
        )

    if n <= broadcast_threshold:
        node_type = nodes.schema().base_schema.field("node").type
        node_vals = sorted(r["node"] for r in nodes.take_all())
        iref = ray.put(node_vals)

        def dense_partial(xref):
            def fn(t: pa.Table) -> pa.Table:
                vals = ray.get(iref)
                idx = pd.Index(vals)
                si = idx.get_indexer(t["src"].to_pylist())
                di = idx.get_indexer(t["dst"].to_pylist())
                w_arr = t["w"].to_numpy(zero_copy_only=False)
                xv = ray.get(xref)
                v = np.zeros(len(vals))
                np.add.at(v, di, w_arr * (xv[si] + 1.0))
                return pa.table({"v": pa.array([v.tolist()],
                                               type=pa.list_(pa.float64()))})
            return fn

        def reduce_vec(ds: Dataset) -> "np.ndarray":
            # canonical sort before reducing: arrival order is
            # nondeterministic and float addition non-associative
            vecs = [np.asarray(row["v"], dtype=np.float64)
                    for row in ds.take_all()]
            vecs.sort(key=lambda a: a.tobytes())
            out = np.zeros(n)
            for v in vecs:
                out += v
            return out

        x = np.zeros(n)
        for _ in range(iters):
            xref = ray.put(x)
            c = reduce_vec(e.map_batches(dense_partial(xref),
                                         batch_format="pyarrow"))
            x = np.round(alpha * c, round_decimals)
        return ray.data.from_arrow(pa.table({
            "node": pa.array(node_vals, type=node_type),
            "katz": pa.array(x, type=pa.float64()),
        }))

    rank = nodes.map_batches(
        lambda t: t.append_column(
            "katz", pa.array(np.zeros(len(t)), type=pa.float64())),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        contrib = _compact(
            hash_join(e, rank, on=("src",), right_on=("node",))
            .map_batches(
                lambda t: pa.table({
                    "dst": t["dst"],
                    "c": pc.multiply(
                        t["w"], pc.add(t["katz"], pa.scalar(1.0))),
                }),
                batch_format="pyarrow",
            )
            .groupby("dst").aggregate(Sum("c", alias_name="c"))
        )

        def renew(t: pa.Table) -> pa.Table:
            c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
            c = np.nan_to_num(c, nan=0.0)
            return pa.table({
                "node": t["node"],
                "katz": pa.array(np.round(alpha * c, round_decimals),
                                 type=pa.float64()),
            })

        rank = _compact(hash_join(nodes, contrib, on=("node",),
                                  right_on=("dst",),
                                  how="left_outer").map_batches(
            renew, batch_format="pyarrow"
        )).materialize()

    return rank


def core_numbers(
    und_edges: Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    driver_edge_limit: int = 500_000,
    max_iters: int = 10_000,
) -> Dataset:
    """FULL core decomposition — every node's core number (the largest k
    such that the node survives k-core peeling), vs :func:`kcore`'s single
    fixed-k membership. Input: DISTINCT undirected edges (each pair once,
    either orientation); isolated nodes never appear.

    Two regimes, identical integer results (degree peeling is exact
    integer math — no float regime caveats):

    * ``edges ≤ driver_edge_limit``: dense numpy mask peeling on the
      driver (a constructed KG backbone is node-scale tiny) — ascending-k
      rounds of the same boolean-mask peel the kcore oracle uses.
    * larger graphs: ascending-k distributed peeling over a symmetrized
      edge Dataset that SHRINKS monotonically — per round a per-batch
      degree combiner + node-bounded groupby, survivors semi-joined back
      onto both endpoints (:func:`hash_join_sized`); nodes dropped while
      constructing the k-core get core number k−1. Only node-scale
      tables materialize per round; total rounds are bounded by the
      graph degeneracy (cap RAISES, no-silent-caps rule).

    Returns (node, core) sorted by node.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[src], "dst": t[dst]})

    e = _compact(und_edges.map_batches(project,
                                       batch_format="pyarrow")).materialize()
    n_edges = e.count()
    node_type = (e.schema().base_schema.field("src").type
                 if n_edges else pa.string())

    if n_edges <= driver_edge_limit:
        pairs = sorted((r["src"], r["dst"]) for r in e.take_all())
        nodes_l = sorted({a for a, _ in pairs} | {b for _, b in pairs})
        pos = {v: i for i, v in enumerate(nodes_l)}
        ai = np.asarray([pos[a] for a, _ in pairs], dtype=np.int64)
        bi = np.asarray([pos[b] for _, b in pairs], dtype=np.int64)
        nn = len(nodes_l)
        core = np.zeros(nn, dtype=np.int64)
        alive = np.ones(nn, dtype=bool)
        k = 1
        rounds = 0
        while alive.any():
            # construct the k-core; drops get core k-1
            while True:
                rounds += 1
                if rounds > max_iters:
                    raise RuntimeError(
                        f"core_numbers: no convergence in {max_iters} "
                        f"peel rounds — raise max_iters")
                keep = alive[ai] & alive[bi]
                deg = np.zeros(nn, dtype=np.int64)
                np.add.at(deg, ai[keep], 1)
                np.add.at(deg, bi[keep], 1)
                drop = alive & (deg < k)
                if not drop.any():
                    break
                core[drop] = k - 1
                alive &= ~drop
            k += 1
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes_l, type=node_type),
            "core": pa.array(core, pa.int64()),
        })).sort("node")

    sym = e.union(e.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"]}),
        batch_format="pyarrow")).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([("src", "count")])
        return pa.table({"src": g["src"],
                         "d": pc.cast(g["src_count"], pa.int64())})

    # live node set is tracked EXPLICITLY: a node whose last edge vanishes
    # (both endpoints peeled) disappears from the degree table entirely —
    # it must still receive a core number (it is degree-0 at the current
    # level, i.e. dropped at k with core k−1).
    cur_nodes = _compact(distinct(
        sym.map_batches(lambda t: pa.table({"src": t["src"]}),
                        batch_format="pyarrow"), ["src"])).materialize()
    dropped_parts: list[Dataset] = []
    k = 2
    rounds = 0
    while True:
        rounds += 1
        if rounds > max_iters:
            raise RuntimeError(
                f"core_numbers: no convergence in {max_iters} peel "
                f"rounds — raise max_iters")
        if cur_nodes.count() == 0:
            break
        deg = (sym.map_batches(deg_partial, batch_format="pyarrow")
               .groupby("src").aggregate(Sum("d", alias_name="degree"))
               ).materialize()
        alive = _compact(deg.map_batches(
            lambda t, kk=k: t.filter(pc.greater_equal(
                t["degree"], pa.scalar(kk, pa.int64()))).select(["src"]),
            batch_format="pyarrow")).materialize()
        n_alive = alive.count()
        if n_alive:
            dead = hash_join_sized(cur_nodes, alive, on=("src",),
                                   how="left_anti").materialize()
        else:
            dead = cur_nodes
        n_dead = dead.count()
        if n_dead:
            dropped_parts.append(dead.map_batches(
                lambda t, c=k - 1: pa.table({
                    "node": t["src"],
                    "core": pa.array(np.full(len(t), c), pa.int64())}),
                batch_format="pyarrow").materialize())
        if n_alive == 0:
            break
        cur_nodes = alive
        if n_dead == 0:
            k += 1  # k-core constructed; go peel at the next level
            continue
        alive_c = _compact(alive)
        sym = hash_join_sized(sym, alive_c, on=("src",), how="left_semi")
        sym = hash_join_sized(
            sym, alive_c.map_batches(
                lambda t: pa.table({"dst": t["src"]}),
                batch_format="pyarrow"),
            on=("dst",), how="left_semi").materialize()

    if not dropped_parts:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], type=node_type),
            "core": pa.array([], pa.int64())}))
    out = dropped_parts[0]
    for d in dropped_parts[1:]:
        out = out.union(d)
    return out.sort("node")
