"""Band-sweep monotonicity, residual kernel identities, dup consistency."""

from __future__ import annotations

import math

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.queries import _pearson_resid_nano

SF = "/root/testdata/sf0.001"


def test_band_sweep_monotone_in_bands():
    """More bands (shorter band keys) can only ADD candidate pairs:
    a pair colliding on an r-row band also collides on some sub-band
    when r halves (prefix property of contiguous slicing). So candidates
    are monotone nonincreasing as rows_per_band grows."""
    t = Q.QUERIES["docs_minhash_band_sweep"](SF).to_pandas() \
        .sort_values("rows_per_band")
    cands = t.n_candidates.tolist()  # rpb = 2, 4, 8
    assert cands[0] >= cands[1] >= cands[2]
    # precision monotone nondecreasing with rows_per_band (tighter keys)
    prec = t.precision_nano.tolist()
    assert prec[0] <= prec[1] <= prec[2]
    assert (t.n_est_dups <= t.n_candidates).all()


def test_band_sweep_16x4_matches_minhash_pairs_candidates():
    """The (16,4) row of the sweep counts the SAME candidate set the
    production minhash_pairs stage banding produces (sanity cross-tie:
    est-dups can differ from verified pairs, candidates cannot be
    fewer)."""
    t = Q.QUERIES["docs_minhash_band_sweep"](SF).to_pandas()
    row = t[(t.bands == 16) & (t.rows_per_band == 4)].iloc[0]
    pairs = Q.QUERIES["minhash_pairs"](SF).to_pandas()
    assert row.n_candidates >= len(pairs)


def test_pearson_residuals_sum_weighted_zero():
    # residual identity: sum over cells of z*sqrt(E) == 0 (O and E share
    # both marginals)
    cells = [("a", "x", 30), ("a", "y", 10), ("b", "x", 20), ("b", "y", 40)]
    rm = {"a": 40, "b": 60}
    cm = {"x": 50, "y": 50}
    zs = _pearson_resid_nano(cells, rm, cm, 100)
    acc = 0.0
    for (r, c, n), z in zip(cells, zs):
        e = rm[r] * cm[c] / 100
        acc += (z / 1e9) * math.sqrt(e)
    assert abs(acc) < 1e-6
    # chi2 == sum z^2
    chi2 = sum((z / 1e9) ** 2 for z in zs)
    ref = sum((n - rm[r] * cm[c] / 100) ** 2 / (rm[r] * cm[c] / 100)
              for r, c, n in cells)
    assert abs(chi2 - ref) < 1e-6


def test_host_lang_residuals_shape():
    t = Q.QUERIES["pages_host_lang_residuals"](SF).to_pandas()
    assert t.n.sum() == 2000  # every page counted exactly once
    assert set(t.lang) == {"fr", "de", "en", "lb"}


def test_dup_consistency_on_synthetic_corpus():
    """The generator's duplicates are EXACT copies (i % 997 rows), so the
    inconsistency counter must be zero while dup urls exist."""
    r = Q.QUERIES["pages_dup_consistency"](SF).to_pylist()[0]
    assert r["n_dup_urls"] >= 1
    assert r["n_dup_rows"] >= 2 * r["n_dup_urls"]
    assert r["n_inconsistent_urls"] == 0
