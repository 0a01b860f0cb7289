"""Fellegi-Sunter pattern counts vs a brute DuckDB pair scan, EM kernel
properties, integer LTTB vs a float reference, MWU u2 vs pair counting,
and integer Benjamini-Hochberg vs a float brute."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray

from newsagency_classification_ray import ops
from newsagency_classification_ray.queries import (
    _bh_reject, _fs_em_nano, _lttb_indices, _mwu_z_p_nano)


def _fs_table():
    rng = np.random.default_rng(41)
    names = ["martha", "marhta", "marta", "zzzzz", "abcdef", "abcdeg",
             "wolff", "wolf", "havas", "havaas"]
    rows = []
    for i in range(60):
        rows.append({
            "blk": f"B{int(rng.integers(0, 3))}",
            "id": i,
            "name": names[int(rng.integers(0, len(names)))],
            "typ": ["x", "y"][int(rng.integers(0, 2))],
            "cents": int(rng.integers(0, 400)),
        })
    return pa.Table.from_pylist(rows)


def test_fs_pattern_counts_vs_brute_duckdb(ray_session):
    import duckdb

    t = _fs_table()
    got = {r["pattern"]: r["n"] for r in ops.fs_pattern_counts(
        ray.data.from_arrow(t), "blk", "id", "name", "typ", "cents",
        jw_threshold=0.9, cents_tol=100).take_all()}
    exp = dict(duckdb.connect().execute("""
        SELECT CASE WHEN jaro_winkler_similarity(a.name, b.name) >= 0.9
                    THEN 4 ELSE 0 END
               + CASE WHEN a.typ = b.typ THEN 2 ELSE 0 END
               + CASE WHEN abs(a.cents - b.cents) <= 100 THEN 1 ELSE 0 END
                 AS pattern,
               count(*) AS n
        FROM t a JOIN t b ON a.blk = b.blk AND a.id < b.id
        GROUP BY 1""").fetchall())
    assert got == {int(k): int(v) for k, v in exp.items()}


def test_fs_em_nano_separates_planted_mixture():
    # heavy mass on all-agree (matches) and all-disagree (non-matches)
    pats = [(7, 100), (0, 900), (6, 20), (1, 30)]
    out = _fs_em_nano(pats)
    assert [g for g, _, _ in out] == [0, 1, 6, 7]
    post = {g: q for g, _, q in out}
    assert 0 <= min(post.values()) and max(post.values()) <= 10**9
    assert post[7] >= post[6] > post[0]
    assert post[7] > 900_000_000 and post[0] < 100_000_000


def test_fs_em_nano_deterministic():
    pats = [(0, 50), (3, 7), (5, 9), (7, 13)]
    assert _fs_em_nano(pats) == _fs_em_nano(list(reversed(pats)))


def _lttb_float_ref(x, y, n_out):
    n = len(x)
    if n <= n_out:
        return list(range(n))
    k = n_out - 2
    sel = [0]
    bounds = [1 + (i * (n - 2)) // k for i in range(k + 1)]
    prev = 0
    for b in range(k):
        lo, hi = bounds[b], bounds[b + 1]
        if b + 1 < k:
            nlo, nhi = bounds[b + 1], bounds[b + 2]
        else:
            nlo, nhi = n - 1, n
        ax = sum(x[nlo:nhi]) / (nhi - nlo)
        ay = sum(y[nlo:nhi]) / (nhi - nlo)
        best_i, best_a = lo, -1.0
        for i in range(lo, hi):
            area = abs((x[i] - x[prev]) * (ay - y[prev])
                       - (ax - x[prev]) * (y[i] - y[prev])) / 2.0
            if area > best_a:
                best_a, best_i = area, i
        sel.append(best_i)
        prev = best_i
    sel.append(n - 1)
    return sel


def test_lttb_matches_float_reference():
    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(3, 200))
        x = list(range(n))
        y = [int(v) for v in rng.integers(0, 1 << 16, n)]
        n_out = int(rng.integers(3, 20))
        got = _lttb_indices(x, y, n_out)
        assert got == _lttb_float_ref(x, y, n_out)
        assert got[0] == 0 and got[-1] == n - 1
        if n > n_out:
            assert len(got) == n_out
        assert got == sorted(got)


def test_lttb_short_series_passthrough():
    assert _lttb_indices([0, 1, 2], [5, 6, 7], 12) == [0, 1, 2]


def test_mwu_u2_matches_pair_counting():
    rng = np.random.default_rng(13)
    for _ in range(30):
        a = rng.integers(0, 8, int(rng.integers(1, 40)))
        b = rng.integers(0, 8, int(rng.integers(1, 40)))
        # u2 via doubled tie-averaged ranks (the query's decomposition)
        v = np.concatenate([a, b])
        grp_a = np.concatenate([np.ones(len(a), bool),
                                np.zeros(len(b), bool)])
        order = np.argsort(v, kind="stable")
        sv, sg = v[order], grp_a[order]
        uniq, start = np.unique(sv, return_index=True)
        cnt = np.diff(np.append(start, len(sv)))
        w = np.repeat(2 * start + cnt + 1, cnt)
        u2_rank = int(w[sg].sum()) - len(a) * (len(a) + 1)
        # u2 via brute pair counting: 2*#{a>b} + #{a==b}
        gt = int((a[:, None] > b[None, :]).sum())
        eq = int((a[:, None] == b[None, :]).sum())
        assert u2_rank == 2 * gt + eq
        tc = int((cnt.astype(np.int64) ** 3 - cnt).sum())
        z_nano, p_nano = _mwu_z_p_nano(len(a), len(b), u2_rank, tc)
        assert 0 <= p_nano <= 10**9
        # direct float recompute of the same formula
        n = len(a) + len(b)
        var_u = len(a) * len(b) / 12.0 * ((n + 1) - tc / (n * (n - 1.0)))
        if var_u > 0:
            z = (u2_rank - len(a) * len(b)) / (2.0 * math.sqrt(var_u))
            assert abs(z_nano / 1e9 - z) <= 2e-9
            assert abs(p_nano / 1e9 - math.erfc(abs(z) / math.sqrt(2))) \
                <= 2e-9


def test_mwu_degenerate_groups():
    assert _mwu_z_p_nano(0, 5, 0, 0) == (0, 10**9)
    # all values tied -> zero variance -> p = 1
    n_a, n_b = 3, 4
    tc = (7**3 - 7)
    assert _mwu_z_p_nano(n_a, n_b, 2 * n_a * (n_a + n_b + 1) // 2
                         - 0, tc)[1] >= 0


def test_bh_reject_matches_float_brute():
    rng = np.random.default_rng(29)
    for _ in range(40):
        m = int(rng.integers(1, 12))
        p = [int(v) for v in rng.integers(0, 10**9, m)]
        got = _bh_reject(p)
        # float brute
        order = sorted(range(m), key=lambda i: (p[i], i))
        kmax = 0
        for rank, i in enumerate(order, 1):
            if p[i] / 1e9 <= 0.05 * rank / m:
                kmax = rank
        cut = p[order[kmax - 1]] if kmax else -1
        exp = [1 if p[i] <= cut else 0 for i in range(m)]
        assert got == exp


def test_bh_known_cases():
    # all tiny -> all rejected; all huge -> none
    assert _bh_reject([0, 1, 2]) == [1, 1, 1]
    assert _bh_reject([9 * 10**8] * 4) == [0, 0, 0, 0]
    # step-up: a large p can be rescued by smaller ones below the line
    assert _bh_reject([10_000_000, 24_000_000]) == [1, 1]
