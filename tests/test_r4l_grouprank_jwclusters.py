"""Edge semantics for the grouped rank-window + JW transitive-closure
batch, plus the empty-result schema guard on the co-citation anti-join."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q


def _orders(tmp_path, rows):  # rows: (orderkey, priority, totalprice)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([1] * len(rows), pa.int64()),
        "o_orderstatus": ["O"] * len(rows),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
        "o_orderdate": pa.array([0] * len(rows), pa.timestamp("us")),
        "o_orderpriority": [r[1] for r in rows],
    }), tmp_path / "orders.parquet")


def test_group_pctrank_ties_and_singleton(ray_session, tmp_path):
    # P1: values 10, 20, 20, 30 -> pct_rank 0, 1/3, 1/3, 1;
    # cume_dist 1/4, 3/4, 3/4, 1. P2: singleton -> pct 0, cume 1.
    _orders(tmp_path, [(1, "P1", 10.0), (2, "P1", 20.0), (3, "P1", 20.0),
                       (4, "P1", 30.0), (5, "P2", 7.0)])
    out = {r["o_orderkey"]: r
           for r in Q.q_orders_group_pctrank(str(tmp_path)).take_all()}
    assert out[1]["pct_rank"] == 0.0 and out[1]["cume_dist"] == 0.25
    assert out[2]["pct_rank"] == 1.0 / 3 and out[2]["cume_dist"] == 0.75
    assert out[3]["pct_rank"] == out[2]["pct_rank"]
    assert out[4]["pct_rank"] == 1.0 and out[4]["cume_dist"] == 1.0
    assert out[5]["pct_rank"] == 0.0 and out[5]["cume_dist"] == 1.0


def _parts(tmp_path, rows):  # rows: (partkey, name, brand)
    pq.write_table(pa.table({
        "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "p_name": [r[1] for r in rows],
        "p_brand": [r[2] for r in rows],
        "p_type": ["t"] * len(rows),
        "p_size": pa.array([1] * len(rows), pa.int32()),
        "p_retailprice": pa.array([1.0] * len(rows), pa.float64()),
    }), tmp_path / "part.parquet")


def test_jw_clusters_transitive_closure(ray_session, tmp_path):
    # martha~marhta and marhta~marhtb chain into ONE cluster labeled by
    # the min id even if martha~marhtb alone scores lower; distinct
    # brands never cluster together
    _parts(tmp_path, [(1, "martha", "B1"), (2, "marhta", "B1"),
                      (3, "marhtb", "B1"), (9, "martha", "B2"),
                      (4, "zzzzzz", "B1")])
    out = {r["p_partkey"]: r["cluster"]
           for r in Q.q_part_jw_clusters(str(tmp_path)).take_all()}
    assert out.get(1) == 1 and out.get(2) == 1 and out.get(3) == 1
    assert 9 not in out and 4 not in out


def test_cocitation_except_empty_keeps_schema(ray_session):
    # sf0.01 yields an EMPTY exclusive neighborhood; the query must still
    # return a qid-typed result (Ray drops schemas on all-empty Datasets)
    res = Q.q_kg_cocitation_except("/root/testdata/sf0.01")
    t = res if isinstance(res, pa.Table) else pa.concat_tables(
        [pa.Table.from_batches([b]) for b in res.iter_batches(
            batch_format="pyarrow")])
    assert t.column_names == ["qid"]
