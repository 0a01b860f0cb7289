"""Lineage-keyed query-result cache (materialized-result memoization).

A long-lived engine re-runs the same analytic over unchanged inputs far
more often than inputs change; the classic fix is a result cache keyed by
the QUERY identity plus a FINGERPRINT of its input files — any input
mutation (new shard, rewritten partition, different file set) changes the
fingerprint and the entry silently misses, so staleness is impossible by
construction (no TTLs, no invalidation protocol). Results live as one
parquet per (name, fingerprint); publishes are atomic (tmp + rename),
matching the manifest discipline in :mod:`state.manifest`.

The fingerprint hashes (path, size, mtime_ns) per input file — content
hashing would reread every byte on every lookup, defeating the cache; a
rewritten-in-place file with identical size and mtime is indistinguishable,
which is the standard and documented trade (same contract as make / most
build caches).
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq


def input_fingerprint(paths: list[str]) -> str:
    """Order-insensitive digest of (path, size, mtime_ns) per input file."""
    h = hashlib.md5()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns};".encode())
    return h.hexdigest()


def cached_result(
    cache_root: str,
    name: str,
    input_paths: list[str],
    compute: Callable[[], pa.Table],
) -> tuple[pa.Table, bool]:
    """Return ``(table, was_hit)`` — the memoized result when the
    fingerprint matches, else ``compute()`` (atomically published)."""
    fp = input_fingerprint(input_paths)
    entry = os.path.join(cache_root, name, f"{fp}.parquet")
    if os.path.exists(entry):
        return pq.read_table(entry), True
    t = compute()
    os.makedirs(os.path.dirname(entry), exist_ok=True)
    tmp = entry + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, entry)
    return t, False


def evict_stale(cache_root: str, name: str,
                input_paths: list[str]) -> list[str]:
    """Drop every cached entry for ``name`` whose fingerprint no longer
    matches the current inputs (the GC for superseded results). Returns
    the removed file names."""
    keep = input_fingerprint(input_paths) + ".parquet"
    d = os.path.join(cache_root, name)
    removed = []
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet") and f != keep:
                os.remove(os.path.join(d, f))
                removed.append(f)
    return removed
