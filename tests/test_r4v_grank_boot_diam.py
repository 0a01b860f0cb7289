"""Distributed per-group row_number, Poisson-bootstrap replicate sums, and
the double-sweep diameter helper's argmax reduce."""
import numpy as np
import pyarrow as pa
import pytest
import ray

from newsagency_classification_ray import ops


def test_group_row_number_matches_pandas(ray_session):
    rng = np.random.default_rng(23)
    n = 3000
    g = rng.choice(["a", "b", "c", "d"], n)
    v = rng.permutation(n).astype(np.int64)
    t = pa.table({"g": pa.array(g), "v": pa.array(v, pa.int64())})
    out, sizes = ops.group_row_number(
        ray.data.from_arrow(t).repartition(9), "g", ["v"],
        out_col="rn", return_sizes=True)
    df = out.to_pandas()
    ref = (t.to_pandas().sort_values(["g", "v"])
           .assign(rn=lambda d: d.groupby("g").cumcount() + 1))
    m = df.merge(ref, on=["g", "v"], suffixes=("", "_ref"))
    assert (m["rn"] == m["rn_ref"]).all()
    assert sizes == {k: int((g == k).sum()) for k in "abcd"}


def test_group_row_number_numeric_groups_order(ray_session):
    # group ids 2 and 10: stringified ordering would corrupt the block
    # prefix accounting; tuple ordering must not
    n = 400
    g = np.where(np.arange(n) % 2 == 0, 2, 10).astype(np.int64)
    v = np.arange(n, dtype=np.int64)
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    out = ops.group_row_number(
        ray.data.from_arrow(t).repartition(7), "g", ["v"]).to_pandas()
    for grp in (2, 10):
        sub = out[out["g"] == grp].sort_values("v")
        assert (sub["rn"].to_numpy() == np.arange(1, len(sub) + 1)).all()


def test_group_row_number_duplicate_key_raises(ray_session):
    t = pa.table({"g": pa.array(["a", "a"]),
                  "v": pa.array([1, 1], pa.int64())})
    with pytest.raises(Exception, match="unique composite"):
        ops.group_row_number(
            ray.data.from_arrow(t).repartition(2), "g", ["v"]).take_all()


def test_poisson_weights_distribution():
    u = np.linspace(0, 1, 100001)[:-1]
    w = ops._poisson1_weights(u)
    import math

    # inverse-CDF: fraction with w == 0 ~ e^-1, w <= 1 ~ 2/e
    assert abs((w == 0).mean() - math.exp(-1)) < 1e-3
    assert abs((w <= 1).mean() - 2 * math.exp(-1)) < 1e-3
    assert w.max() <= 12


def test_poisson_bootstrap_partition_invariant(ray_session):
    rng = np.random.default_rng(4)
    n = 2000
    ids = rng.permutation(10**6)[:n].astype(np.int64)
    vals = rng.uniform(1, 100, n)
    t = pa.table({"rid": pa.array(ids, pa.int64()),
                  "price": pa.array(vals, pa.float64())})
    a = ops.poisson_bootstrap_sums(
        ray.data.from_arrow(t).repartition(3), "rid", "price",
        n_replicates=8)
    b = ops.poisson_bootstrap_sums(
        ray.data.from_arrow(t).repartition(17), "rid", "price",
        n_replicates=8)
    assert a.equals(b)
    # replicate totals bracket the true total (unbiased resampling)
    true_cents = int(np.round(vals * 100).sum())
    tots = a["total_cents"].to_numpy()
    assert tots.min() < true_cents < tots.max()
    assert len(set(tots.tolist())) > 1  # replicates actually differ


def test_block_argmax_far_tiebreak(ray_session):
    from newsagency_classification_ray.queries import _block_argmax_far

    t = pa.table({"node": pa.array(["z", "b", "a", "c"]),
                  "dist": pa.array([3, 5, 5, 1], pa.int64())})
    node, dist = _block_argmax_far(ray.data.from_arrow(t).repartition(3))
    assert (node, dist) == ("a", 5)  # max dist, lexicographic min node
