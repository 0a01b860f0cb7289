"""TPC-H-shape query edge semantics (queries_tpch): boundary strictness,
tie-breaks, distinct counting, exclusion lists — pinned on tiny synthetic
tables the sf-scale oracle data can't isolate."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries_tpch as qt

D = lambda s: dt.datetime.fromisoformat(s)


def _write(tmp_path, name, cols):
    pq.write_table(pa.table(cols), tmp_path / f"{name}.parquet")


def _base_tables(tmp_path):
    _write(tmp_path, "customer", {
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": ["Customer#1", "Customer#2", "Customer#3"],
        "c_nationkey": pa.array([0, 1, 0], pa.int32()),
        "c_mktsegment": ["BUILDING", "MACHINERY", "BUILDING"],
    })
    _write(tmp_path, "nation", {
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": ["ALPHA", "BETA"],
        "n_regionkey": pa.array([0, 0], pa.int32()),
    })
    _write(tmp_path, "supplier", {
        "s_suppkey": pa.array([10, 11], pa.int64()),
        "s_name": ["Supplier#000000010", "Supplier#000000011"],
    })
    _write(tmp_path, "part", {
        "p_partkey": pa.array([100, 101], pa.int64()),
        "p_brand": ["Brand#1", "Brand#2"],
        "p_type": ["PROMO", "STANDARD"],
        "p_size": pa.array([1, 2], pa.int32()),
    })


def test_q3_cutoff_strictness_and_tiebreak(ray_session, tmp_path):
    _base_tables(tmp_path)
    cut = D(qt._Q3_CUT)
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        # order 3 is dated exactly AT the cutoff -> excluded (strict <);
        # order 4 belongs to a MACHINERY customer -> excluded by segment
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderdate": pa.array(
            [D("1996-01-01"), D("1996-01-01"), cut, D("1996-01-01")],
            pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"] * 4,
        "o_totalprice": [10.0] * 4,
    })
    _write(tmp_path, "lineitem", {
        "l_orderkey": pa.array([1, 2, 2, 3, 4], pa.int64()),
        "l_partkey": pa.array([100] * 5, pa.int64()),
        "l_suppkey": pa.array([10] * 5, pa.int64()),
        "l_quantity": [1.0] * 5,
        # orders 1 and 2 both total 50.00 -> revenue tie, orderkey breaks it;
        # one of order 2's lines ships exactly AT the cutoff (strict >)
        "l_extendedprice": [50.0, 50.0, 7.0, 50.0, 50.0],
        "l_discount": [0.0] * 5,
        "l_shipdate": pa.array(
            [D("1999-01-01"), D("1999-01-01"), cut, D("1999-01-01"),
             D("1999-01-01")], pa.timestamp("us")),
    })
    out = qt.q3_shipping_priority(str(tmp_path)).to_pandas()
    assert list(out["l_orderkey"]) == [1, 2]          # tie -> lower key first
    assert list(out["revenue_e4"]) == [500_000, 500_000]


def test_q4_sixty_day_boundary_is_strict(ray_session, tmp_path):
    _base_tables(tmp_path)
    od = D("1996-03-01")
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        # order 3 sits outside the [LO, HI) window entirely
        "o_orderdate": pa.array([od, od, D("1999-01-01")], pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT"],
        "o_totalprice": [10.0] * 3,
    })
    _write(tmp_path, "lineitem", {
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_partkey": pa.array([100] * 4, pa.int64()),
        "l_suppkey": pa.array([10] * 4, pa.int64()),
        "l_quantity": [1.0] * 4,
        "l_extendedprice": [1.0] * 4,
        "l_discount": [0.0] * 4,
        # order 1: exactly +60d (NOT late, strict >) and +61d (late, but
        # only ONE distinct order row must come out of the two lines);
        # order 2: exactly +60d only -> not late
        "l_shipdate": pa.array(
            [od + dt.timedelta(days=60), od + dt.timedelta(days=61),
             od + dt.timedelta(days=60), D("1999-06-01")],
            pa.timestamp("us")),
    })
    out = qt.q4_order_priority(str(tmp_path)).to_pandas()
    assert list(out["o_orderpriority"]) == ["1-URGENT"]
    assert list(out["order_count"]) == [1]


def test_q10_returnflag_and_window(ray_session, tmp_path):
    _base_tables(tmp_path)
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 2, 1], pa.int64()),
        # order 3 is dated exactly AT the exclusive upper bound
        "o_orderdate": pa.array(
            [D("1996-02-01"), D("1996-02-01"), D(qt._Q10_HI)],
            pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"] * 3,
        "o_totalprice": [10.0] * 3,
    })
    _write(tmp_path, "lineitem", {
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_partkey": pa.array([100] * 4, pa.int64()),
        "l_suppkey": pa.array([10] * 4, pa.int64()),
        "l_quantity": [1.0] * 4,
        "l_extendedprice": [100.0, 30.0, 40.0, 99.0],
        "l_discount": [0.5, 0.0, 0.0, 0.0],
        # second line of order 1 is flag 'N' -> excluded
        "l_returnflag": ["R", "N", "R", "R"],
        "l_shipdate": pa.array([D("1996-03-01")] * 4, pa.timestamp("us")),
    })
    out = qt.q10_returned_items(str(tmp_path)).to_pandas()
    assert list(out["c_custkey"]) == [1, 2]   # 50.0 > 40.0
    assert list(out["revenue_e4"]) == [500_000, 400_000]
    assert list(out["n_name"]) == ["ALPHA", "BETA"]


def test_q14_promo_share_exact_ints(ray_session, tmp_path):
    _base_tables(tmp_path)
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array([D("1996-01-05")], pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"],
        "o_totalprice": [10.0],
    })
    _write(tmp_path, "lineitem", {
        "l_orderkey": pa.array([1, 1, 1], pa.int64()),
        # part 100 is PROMO, 101 is STANDARD; third line ships out of window
        "l_partkey": pa.array([100, 101, 100], pa.int64()),
        "l_suppkey": pa.array([10] * 3, pa.int64()),
        "l_quantity": [1.0] * 3,
        "l_extendedprice": [10.0, 20.0, 500.0],
        "l_discount": [0.1, 0.0, 0.0],
        "l_shipdate": pa.array(
            [D("1996-05-01"), D("1996-05-01"), D("1999-01-01")],
            pa.timestamp("us")),
    })
    out = qt.q14_promo_revenue(str(tmp_path)).to_pandas()
    assert out["promo_rev_e4"].iloc[0] == 90_000      # 9.0
    assert out["total_rev_e4"].iloc[0] == 290_000     # 29.0


def test_q16_exclusion_and_distinct_suppliers(ray_session, tmp_path):
    _base_tables(tmp_path)
    # supplier 11's name ends in the complaint suffix '1' -> excluded
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array([D("1996-01-05")], pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"],
        "o_totalprice": [10.0],
    })
    _write(tmp_path, "lineitem", {
        # part 100 (size 1): supplier 10 ships it THREE times (distinct ->
        # counts once) and supplier 11 ships it (excluded);
        # part 101 (size 2): not in the size list -> no row
        "l_orderkey": pa.array([1] * 5, pa.int64()),
        "l_partkey": pa.array([100, 100, 100, 100, 101], pa.int64()),
        "l_suppkey": pa.array([10, 10, 10, 11, 10], pa.int64()),
        "l_quantity": [1.0] * 5,
        "l_extendedprice": [1.0] * 5,
        "l_discount": [0.0] * 5,
        "l_returnflag": ["N"] * 5,
        "l_shipdate": pa.array([D("1996-03-01")] * 5, pa.timestamp("us")),
    })
    out = qt.q16_parts_supplier_cnt(str(tmp_path)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.p_brand, row.p_type, row.p_size, row.supplier_cnt) == \
        ("Brand#1", "PROMO", 1, 1)


def test_q18_threshold_is_strict(ray_session, tmp_path):
    _base_tables(tmp_path)
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([D("1996-01-05")] * 2, pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"] * 2,
        "o_totalprice": [1234.56, 99.0],
    })
    thr = float(qt._Q18_QTY)
    _write(tmp_path, "lineitem", {
        # order 1 totals exactly the threshold -> excluded (strict >);
        # order 2 totals threshold + 0.5 -> included
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([100] * 4, pa.int64()),
        "l_suppkey": pa.array([10] * 4, pa.int64()),
        "l_quantity": [thr - 50.0, 50.0, thr, 0.5],
        "l_extendedprice": [1.0] * 4,
        "l_discount": [0.0] * 4,
        "l_shipdate": pa.array([D("1996-03-01")] * 4, pa.timestamp("us")),
    })
    out = qt.q18_large_volume(str(tmp_path))
    assert list(out["o_orderkey"].to_pylist()) == [2]
    assert list(out["qty_e2"].to_pylist()) == [int((thr + 0.5) * 100)]
    assert list(out["c_name"].to_pylist()) == ["Customer#2"]


def test_q7_direction_and_year(ray_session, tmp_path):
    _write(tmp_path, "nation", {
        "n_nationkey": pa.array([3, 19, 7], pa.int32()),
        "n_name": ["NATION_3", "NATION_19", "NATION_7"],
        "n_regionkey": pa.array([0, 0, 0], pa.int32()),
    })
    _write(tmp_path, "supplier", {
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": ["s1", "s2", "s3"],
        "s_nationkey": pa.array([3, 19, 7], pa.int32()),
    })
    _write(tmp_path, "customer", {
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": ["c1", "c2", "c3"],
        "c_nationkey": pa.array([19, 3, 7], pa.int32()),
        "c_mktsegment": ["BUILDING"] * 3,
    })
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 2, 1, 3], pa.int64()),
        "o_orderdate": pa.array([D("1996-01-05")] * 4, pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"] * 4,
        "o_totalprice": [1.0] * 4,
    })
    _write(tmp_path, "lineitem", {
        # line 1: supp N3 -> cust N19 in 1996 (10.0)
        # line 2: supp N19 -> cust N3 in 1997 (20.0) — reverse direction
        # line 3: supp N19 -> cust N19 — SAME nation pair side, excluded
        # line 4: supp N3 -> cust N7 — N7 not in the pair, excluded
        "l_orderkey": pa.array([1, 2, 1, 4], pa.int64()),
        "l_partkey": pa.array([100] * 4, pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 1], pa.int64()),
        "l_quantity": [1.0] * 4,
        "l_extendedprice": [10.0, 20.0, 7.0, 9.0],
        "l_discount": [0.0] * 4,
        "l_shipdate": pa.array(
            [D("1996-03-01"), D("1997-03-01"), D("1996-03-01"),
             D("1996-03-01")], pa.timestamp("us")),
    })
    out = qt.q7_nation_volume(str(tmp_path)).to_pandas()
    assert [tuple(r) for r in out.itertuples(index=False)] == [
        ("NATION_19", "NATION_3", 1997, 200_000),
        ("NATION_3", "NATION_19", 1996, 100_000),
    ]


def test_q22_avg_boundary_and_recent_cutoff(ray_session, tmp_path):
    _base_tables(tmp_path)
    _write(tmp_path, "customer", {
        # balances 10, 20, 30, 20 -> avg 20; only cust 3 is strictly above
        # (cust 2 and 4 sit exactly ON the average -> excluded)
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": [f"c{i}" for i in range(1, 5)],
        "c_nationkey": pa.array([0] * 4, pa.int32()),
        "c_mktsegment": ["BUILDING"] * 4,
        "c_acctbal": [10.0, 20.0, 30.0, 20.0],
    })
    cut = D(qt._Q22_RECENT)
    _write(tmp_path, "orders", {
        # cust 3's only order is BEFORE the cutoff -> idle;
        # an order exactly AT the cutoff would make a customer active
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([3, 1], pa.int64()),
        "o_orderdate": pa.array(
            [cut - dt.timedelta(days=1), cut], pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"] * 2,
        "o_totalprice": [1.0] * 2,
    })
    out = qt.q22_idle_balance(str(tmp_path)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.c_mktsegment, row.n_cust, row.bal_cents) == \
        ("BUILDING", 1, 3000)


def test_events_daily_delta_gap_and_first_null(ray_session, tmp_path):
    from newsagency_classification_ray import queries as Q
    ts = [D("2024-01-01"), D("2024-01-01"), D("2024-01-02"),
          D("2024-01-05")]  # days 1,1,2,5 — gap between 2 and 5
    _write(tmp_path, "events", {
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * 4, pa.int64()),
        "event_type": ["a"] * 4,
        "value": [1.0] * 4,
        "props": ["{}"] * 4,
    })
    out = Q.q_events_daily_delta(str(tmp_path)).to_pandas()
    assert list(out.n) == [2, 1, 1]
    assert out.delta.iloc[0] != out.delta.iloc[0] or out.delta.isna().iloc[0]
    # LAG runs over EXISTING days, not a filled calendar: day5 - day2 = 0
    assert list(out.delta.iloc[1:]) == [-1, 0]
