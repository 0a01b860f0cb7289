"""LOO 1-NN accuracy, link-prediction backtest, capture-gap CV^2."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_loo_accuracy_matches_float_knn_mostly():
    """The quantized-integer nearest neighbor should equal the float one
    except at exact quantization boundaries — verify totals and that
    accuracy per label lies in [0, 1] and n sums to corpus size."""
    t = Q.QUERIES["embeddings_loo_accuracy"](SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    assert t.n.sum() == len(emb)
    assert ((t.acc_nano >= 0) & (t.acc_nano <= 10**9)).all()
    assert (t.n_correct <= t.n).all()
    assert set(t.label) == set(emb.label.astype(int))


def test_loo_accuracy_bcast_bound_raises():
    import pytest

    old = Q._KNN_BCAST_LIMIT
    Q._KNN_BCAST_LIMIT = 1
    try:
        with pytest.raises(ValueError, match="broadcast bound"):
            Q.QUERIES["embeddings_loo_accuracy"](SF)
    finally:
        Q._KNN_BCAST_LIMIT = old


def test_link_backtest_counts_consistent():
    r = Q.QUERIES["kg_link_backtest"](SF).to_pylist()[0]
    assert r["cutoff_year"] == 1970
    assert r["n_train_edges"] > 0
    # candidates = C(nodes,2) - train edges over train nodes: positive
    assert r["n_candidates"] > 0
    assert 0 <= r["n_pos"] <= r["n_candidates"]
    assert 0 <= r["auc_nano"] <= 10**9
    # on this corpus head agencies keep co-occurring: the predictor must
    # beat coin flip
    assert r["auc_nano"] > 500_000_000


def test_gap_cv_regime_boundaries():
    t = Q.QUERIES["pages_gap_cv"](SF).to_pandas()
    for _, row in t.iterrows():
        if row.cv2_nano < 500_000_000:
            assert row.regime == "regular"
        elif row.cv2_nano > 2_000_000_000:
            assert row.regime == "bursty"
        else:
            assert row.regime == "poisson"
    # every host with >= 2 captures appears
    pages_dir = Q.pages_src.ensure_pages(SF)
    import glob as _g

    hosts = set()
    for f in _g.glob(f"{pages_dir}/*.parquet"):
        for u in pq.read_table(f, columns=["url"])["url"].to_pylist():
            hosts.add(u.split("/")[2])
    assert set(t.host) == hosts  # 2000 pages / 20 hosts => all have >= 2


def test_gap_cv_matches_numpy_recompute():
    t = Q.QUERIES["pages_gap_cv"](SF).to_pandas().set_index("host")
    pages_dir = Q.pages_src.ensure_pages(SF)
    import glob as _g

    by_host: dict[str, list[int]] = {}
    for f in sorted(_g.glob(f"{pages_dir}/*.parquet")):
        tb = pq.read_table(f, columns=["url", "warc_ts"])
        for u, ts in zip(tb["url"].to_pylist(), tb["warc_ts"].to_pylist()):
            by_host.setdefault(u.split("/")[2], []).append(
                int(ts.timestamp() * 1_000_000) // 60_000_000)
    for h, mins in by_host.items():
        gaps = np.diff(np.sort(mins))
        n, sg, sg2 = len(gaps), int(gaps.sum()), int((gaps ** 2).sum())
        row = t.loc[h]
        assert row.n_gaps == n and row.sum_gap_min == sg
        want = Q._div_nano(n * sg2, sg * sg) - 10**9
        assert row.cv2_nano == want
