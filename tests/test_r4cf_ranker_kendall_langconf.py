"""Ranker agreement, discrete Kendall matrix, pages langid confusion."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_ranker_agreement_consistency():
    t = Q.QUERIES["docs_ranker_agreement"](SF).to_pandas().iloc[0]
    assert t.n_a <= 15 and t.n_b <= 15
    assert t.n_shared <= min(t.n_a, t.n_b)
    pairs = t.n_shared * (t.n_shared - 1) // 2
    assert t.n_conc + t.n_disc <= pairs
    if pairs:
        assert t.tau_nano == Q._div_nano(
            int(t.n_conc) - int(t.n_disc), pairs)
    assert -10**9 <= t.tau_nano <= 10**9


def test_discrete_kendall_matches_sampled_bruteforce():
    t = Q.QUERIES["lineitem_discrete_kendall"](SF).to_pandas() \
        .set_index(["col_x", "col_y"])
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_quantity", "l_discount", "l_tax"]
                       ).to_pandas()
    cols = {"qty": np.round(li.l_quantity.to_numpy()).astype(np.int64),
            "disc": np.round(li.l_discount.to_numpy() * 100)
            .astype(np.int64),
            "tax": np.round(li.l_tax.to_numpy() * 100).astype(np.int64)}
    n = len(li)
    for cx, cy in Q._DK_PAIRS:
        x, y = cols[cx], cols[cy]
        # O(n^2) brute force is fine at sf0.001 (n ~ 6000)
        dx = np.sign(x[:, None] - x[None, :])
        dy = np.sign(y[:, None] - y[None, :])
        prod = dx * dy
        iu = np.triu_indices(n, 1)
        conc = int((prod[iu] > 0).sum())
        disc = int((prod[iu] < 0).sum())
        row = t.loc[(cx, cy)]
        assert (row.n_conc, row.n_disc) == (conc, disc)
        assert row.tau_nano == Q._div_nano(conc - disc,
                                           n * (n - 1) // 2)


def test_langid_confusion_diagonal_dominates():
    t = Q.QUERIES["pages_langid_confusion"](SF).to_pandas()
    # only gated languages survive the clean pipeline
    assert set(t.lang) <= {"fr", "de"}
    total = t.n.sum()
    diag = t[t.lang == t.lang_pred].n.sum()
    # the stopword profiles should get most pages right
    assert diag > total // 2
    # confusion counts cover every cleaned page exactly once
    m = Q._mentions(SF)  # ensures pages exist
    assert total > 0
