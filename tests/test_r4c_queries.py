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


def test_q2_argmin_tiebreak_lowest_suppkey(ray_session, tmp_path):
    _write(tmp_path, "lineitem", {
        # part 1: price tie 5.00 between supp 9 and supp 2 -> supp 2 wins;
        # part 2: single cheapest 1.00 at supp 7
        "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([9, 2, 3, 7, 1], pa.int64()),
        "l_quantity": [1.0] * 5,
        "l_extendedprice": [5.0, 5.0, 6.0, 1.0, 2.0],
        "l_discount": [0.0] * 5,
        "l_shipdate": pa.array([dt.datetime(1996, 1, 1)] * 5,
                               pa.timestamp("us")),
    })
    out = Q.q2_cheapest_supplier(str(tmp_path)).to_pandas()
    assert list(out.l_partkey) == [1, 2]
    assert list(out.best_suppkey) == [2, 7]
    assert list(out.min_price_cents) == [500, 100]


def test_kcore_iterative_peel_and_empty_core(ray_session):
    import ray.data
    from newsagency_classification_ray import ops

    # triangle a-b-c plus a chain c-d-e-f: k=2 must peel f, then e, then d
    # (three rounds — exercises the LOOP, not just one filter pass)
    edges = ray.data.from_arrow(pa.table({
        "src": ["a", "a", "b", "c", "d", "e"],
        "dst": ["b", "c", "c", "d", "e", "f"],
    }))
    out = ops.kcore(edges, k=2, src="src", dst="dst")
    res = out.to_pandas() if hasattr(out, "to_pandas") else out
    got = dict(zip(res["node"], res["core_deg"]))
    assert got == {"a": 2, "b": 2, "c": 2}

    # a pure tree has NO 2-core -> empty result, loop still terminates
    tree = ray.data.from_arrow(pa.table({
        "src": ["a", "a", "b"], "dst": ["b", "c", "d"]}))
    empty = ops.kcore(tree, k=2, src="src", dst="dst")
    n = empty.num_rows if isinstance(empty, pa.Table) else empty.count()
    assert n == 0


def test_oov_rate_vocab_boundary(ray_session, tmp_path):
    # 18 distinct words: 'w00'..'w15' each appear 3x (vocab = those 16,
    # count ties broken by word asc), 'x' and 'y' appear once each -> OOV
    common = " ".join(f"w{i:02d}" for i in range(16))
    _docs(tmp_path, [common, common, common + " x y", ""])
    out = Q.q_docs_oov_rate(str(tmp_path)).to_pandas().set_index("doc_id")
    assert list(out.index) == [0, 1, 2]      # empty doc 3 excluded
    assert out.loc[0].n_tokens == 16 and out.loc[0].n_oov == 0
    assert out.loc[2].n_tokens == 18 and out.loc[2].n_oov == 2
