"""Edge semantics for the containment + XYZ batch: directional containment
on a constructed boilerplate-inclusion pair, and the integer CV fences."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q

_BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4


def _docs(tmp_path, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), tmp_path / "documents.parquet")


def test_containment_detects_inclusion_direction(ray_session, tmp_path):
    # doc 1 CONTAINS doc 0 verbatim plus extra tail: containment
    # inter/n_a must be (near) 1 while inter/n_b is strictly smaller
    _docs(tmp_path, [_BASE, _BASE + ("extra closing words here " * 10)])
    rows = Q.q_docs_dup_containment(str(tmp_path)).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["inter"] == r["n_a"]          # A fully contained in B
    assert r["n_b"] > r["n_a"]


def _lineitem(tmp_path, rows):  # rows: (partkey, qty, week_index)
    n = len(rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(list(range(n)), pa.int64()),
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([float(r[1]) for r in rows], pa.float64()),
        "l_extendedprice": pa.array([1.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": ["N"] * n,
        "l_linestatus": ["O"] * n,
        # Mondays so date_trunc('week') == the day itself
        "l_shipdate": pa.array(
            [dt.datetime(2024, 1, 1) + dt.timedelta(weeks=r[2])
             for r in rows], pa.timestamp("us")),
    }), tmp_path / "lineitem.parquet")


def test_xyz_classes_integer_fences(ray_session, tmp_path):
    # 2 calendar weeks. part 1: (10, 10) -> CV = 0 -> X.
    # part 1b: (10, 30) -> CV exactly 0.5 -> X boundary (4·var == s1²).
    # part 2: (10, 40) -> strictly between the fences -> Y.
    # part 3: one week only (40, 0) -> CV = 1 -> Y boundary
    # (var_num == s1² exactly, class Y not Z).
    _lineitem(tmp_path, [(1, 10, 0), (1, 10, 1),
                         (11, 10, 0), (11, 30, 1),
                         (2, 10, 0), (2, 40, 1),
                         (3, 40, 0)])
    out = {r["p_partkey"]: r for r in
           Q.q_part_xyz_classes(str(tmp_path)).take_all()}
    assert out[1]["xyz"] == "X" and out[1]["var_num"] == 0
    assert out[11]["xyz"] == "X" and 4 * out[11]["var_num"] \
        == out[11]["s1"] * out[11]["s1"]
    assert out[2]["xyz"] == "Y"
    s1 = out[3]["s1"]
    assert out[3]["var_num"] == s1 * s1 and out[3]["xyz"] == "Y"
