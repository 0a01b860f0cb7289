"""Edge semantics for the late-r4 batch-2 queries: rank-vs-dense-rank under
ties, strict above-average boundary, Gopher rule boundaries and word-boundary
stopword matching, PMI bigram doc-boundary masking."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from newsagency_classification_ray import queries as Q


def _write(tmp_path, name, cols):
    pq.write_table(pa.table(cols), tmp_path / f"{name}.parquet")


def _orders(tmp_path, rows):  # rows: (orderkey, custkey, priority, price)
    _write(tmp_path, "orders", {
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": ["O"] * len(rows),
        "o_totalprice": [float(r[3]) for r in rows],
        "o_orderdate": pa.array([dt.datetime(1996, 1, 1)] * len(rows),
                                pa.timestamp("us")),
        "o_orderpriority": [r[2] for r in rows],
    })


def test_rank_vs_dense_rank_under_ties(ray_session, tmp_path):
    _orders(tmp_path, [
        # priority A: prices 100, 100, 90, 80 -> dense 1,2,3; rank 1,3,4
        (1, 1, "A", 100.0), (2, 1, "A", 100.0),
        (3, 1, "A", 90.0), (4, 1, "A", 80.0),
        # priority B: a single price -> one row, rank = dense = 1
        (5, 1, "B", 7.0),
    ])
    out = Q.q_orders_rank_in_priority(str(tmp_path)).to_pandas()
    a = out[out.o_orderpriority == "A"].reset_index(drop=True)
    assert list(a.price_cents) == [10_000, 9_000, 8_000]
    assert list(a.drank) == [1, 2, 3]
    assert list(a.rnk) == [1, 3, 4]
    assert list(a.n_orders) == [2, 1, 1]
    assert list(a.group_n) == [4, 4, 4]
    b = out[out.o_orderpriority == "B"].reset_index(drop=True)
    assert list(b.rnk) == [1] and list(b.group_n) == [1]


def test_above_cust_avg_strict_boundary(ray_session, tmp_path):
    _orders(tmp_path, [
        # cust 1: all orders equal -> NOBODY above the average (strict >)
        (1, 1, "A", 50.0), (2, 1, "A", 50.0), (3, 1, "A", 50.0),
        # cust 2: 10, 20, 30 -> avg 20; only the 30 is above (20 is not)
        (4, 2, "A", 10.0), (5, 2, "A", 20.0), (6, 2, "A", 30.0),
    ])
    out = Q.q_orders_above_cust_avg(str(tmp_path)).to_pandas()
    assert list(out.o_custkey) == [2]
    assert list(out.n_above) == [1]


def _docs(tmp_path, texts):
    _write(tmp_path, "documents", {
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["src0"] * len(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def test_gopher_rules_boundaries(ray_session, tmp_path):
    ok20 = " ".join(["the"] + ["abcd"] * 19)       # exactly 20 words, mwl ok
    short = " ".join(["the"] + ["abcd"] * 18)      # 19 words -> fail
    theme = " ".join(["theme"] + ["abcd"] * 19)    # 'theme' is NOT 'the'
    long_words = " ".join(["the"] + ["abcdefghijk"] * 19)  # mwl > 10 -> fail
    mwl_lo = " ".join(["the"] + ["abc"] * 19)      # sum_wlen == 3n exactly -> pass
    _docs(tmp_path, [ok20, short, theme, long_words, mwl_lo])
    out = Q.q_docs_gopher_rules(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[0].gpass == 1
    assert out.loc[1].gpass == 0          # word count below 20
    assert out.loc[2].gpass == 0          # \bthe\b must not match 'theme'
    assert out.loc[2].n_the == 0
    assert out.loc[3].gpass == 0          # mean word length above 10
    assert out.loc[4].gpass == 1          # 3n <= sum boundary inclusive
    assert out.loc[4].sum_wlen == 3 * out.loc[4].n_words


def test_pmi_bigrams_doc_boundary_and_counts(ray_session, tmp_path):
    # 'b a' never occurs INSIDE a doc — only across the boundary of doc0/doc1
    _docs(tmp_path, ["a b", "a b c", "c c"])
    out = Q.q_docs_pmi_bigrams(str(tmp_path)).to_pandas()
    pairs = {(r.w1, r.w2): r.c_xy for r in out.itertuples()}
    assert pairs[("a", "b")] == 2
    assert ("b", "a") not in pairs        # no cross-doc bigram
    assert pairs[("b", "c")] == 1 and pairs[("c", "c")] == 1
    row = out[(out.w1 == "a") & (out.w2 == "b")].iloc[0]
    assert (row.c_x, row.c_y, row.n_total) == (2, 2, 7)
    # deterministic order: c_xy desc, then (w1, w2)
    assert list(out.c_xy) == sorted(out.c_xy, reverse=True)
