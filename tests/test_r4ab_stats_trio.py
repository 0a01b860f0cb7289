"""Spearman rho vs a float rank-based recompute, the chi-square /
Cramér's V kernel vs the textbook float formula, and the ANOVA kernel
vs numpy group statistics."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray

from newsagency_classification_ray import ops
from newsagency_classification_ray.queries import _anova_nano, _chi2_nano


def _avg_ranks(a: np.ndarray) -> np.ndarray:
    order = np.argsort(a, kind="stable")
    ranks = np.empty(len(a), dtype=float)
    sorted_a = a[order]
    i = 0
    while i < len(a):
        j = i
        while j < len(a) and sorted_a[j] == sorted_a[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    return ranks


def _spearman_float(x: np.ndarray, y: np.ndarray) -> float:
    rx, ry = _avg_ranks(x), _avg_ranks(y)
    rx -= rx.mean()
    ry -= ry.mean()
    return float((rx * ry).sum() / math.sqrt((rx * rx).sum()
                                             * (ry * ry).sum()))


def test_spearman_matches_float_recompute_with_ties(ray_session):
    rng = np.random.default_rng(5)
    x = rng.integers(0, 12, 400)
    y = (x + rng.integers(-4, 5, 400)).clip(0, 15)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(x, pa.int64()),
                                       "y": pa.array(y, pa.int64())}))
    got = ops.spearman_rho(ds, "x", "y").to_pylist()[0]
    assert got["n_rows"] == 400
    assert abs(got["rho_s_nano"] / 1e9 - _spearman_float(x, y)) < 1e-6


def test_spearman_perfect_and_inverse(ray_session):
    x = np.arange(50, dtype=np.int64)
    for y, want in [(x * 3 + 7, 1.0), (-x, -1.0)]:
        ds = ray.data.from_arrow(pa.table({"x": pa.array(x),
                                           "y": pa.array(y, pa.int64())}))
        got = ops.spearman_rho(ds, "x", "y").to_pylist()[0]
        assert got["rho_s_nano"] == int(want * 1e9)


def test_spearman_constant_column_is_zero(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array([1, 2, 3, 4], pa.int64()),
        "y": pa.array([7, 7, 7, 7], pa.int64())}))
    assert ops.spearman_rho(ds, "x", "y").to_pylist()[0]["rho_s_nano"] == 0


def _chi2_float(cells):
    rm, cm, n = {}, {}, 0
    for r, c, k in cells:
        rm[r] = rm.get(r, 0) + k
        cm[c] = cm.get(c, 0) + k
        n += k
    chi2 = 0.0
    for r in rm:
        for c in cm:
            o = next((k for rr, cc, k in cells if rr == r and cc == c), 0)
            e = rm[r] * cm[c] / n
            chi2 += (o - e) ** 2 / e
    return chi2


def test_chi2_kernel_matches_float_formula():
    cells = [("a", "x", 30), ("a", "y", 10), ("b", "x", 15),
             ("b", "y", 45), ("c", "x", 5), ("c", "y", 20)]
    chi2, v, dof = _chi2_nano(cells)
    want = _chi2_float(cells)
    assert dof == 2
    assert abs(chi2 / 1e9 - want) < 1e-6
    n = sum(k for _, _, k in cells)
    assert abs(v / 1e9 - math.sqrt(want / n)) < 1e-6  # min(r,c)-1 == 1


def test_chi2_independent_table_is_zero():
    # O_ij = R_i * C_j / N exactly -> chi2 == 0 up to per-cell rounding
    cells = [("a", "x", 20), ("a", "y", 40), ("b", "x", 10), ("b", "y", 20)]
    chi2, v, dof = _chi2_nano(cells)
    assert dof == 1
    assert chi2 <= 4  # |cells| half-ulps of nano rounding at most
    assert v <= 1000


def test_chi2_degenerate_returns_zeros():
    assert _chi2_nano([]) == (0, 0, 0)
    assert _chi2_nano([("a", "x", 5), ("a", "y", 3)]) == (0, 0, 0)


def test_anova_kernel_matches_numpy():
    rng = np.random.default_rng(11)
    groups = []
    raw = []
    for mu in (10, 14, 25):
        y = rng.integers(mu - 5, mu + 6, 120).astype(np.int64)
        raw.append(y)
        groups.append((len(y), int(y.sum()), int((y * y).sum())))
    n, k, ssb, ssw, f = _anova_nano(groups)
    allv = np.concatenate(raw).astype(float)
    gm = allv.mean()
    ssb_f = sum(len(y) * (y.mean() - gm) ** 2 for y in raw)
    ssw_f = sum(((y - y.mean()) ** 2).sum() for y in raw)
    f_f = (ssb_f / (k - 1)) / (ssw_f / (n - k))
    assert n == 360 and k == 3
    assert abs(ssb / 1e9 - ssb_f) < 1e-5
    assert abs(ssw / 1e9 - ssw_f) < 1e-5
    assert abs(f / 1e9 - f_f) < 1e-4


def test_anova_single_group_and_no_variance():
    assert _anova_nano([(10, 50, 260)]) == (10, 1, 0, 0, 0)
    # identical constant groups: SSW == 0 and SSB == 0 -> F defined as 0
    n, k, ssb, ssw, f = _anova_nano([(4, 12, 36), (4, 12, 36)])
    assert (ssb, ssw, f) == (0, 0, 0)
