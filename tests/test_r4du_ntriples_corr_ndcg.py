"""N-Triples export, correlation matrix, nDCG eval."""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_ntriples_lines_are_valid_and_complete():
    t = Q.QUERIES["kg_ntriples_export"](SF).to_pandas()
    trip = Q.QUERIES["kg_triples"](SF).to_pandas()
    assert len(t) == len(trip)
    pat = re.compile(
        r"^<https://[^>\s]+> <http://example\.org/ns#cites_agency> "
        r"<http://www\.wikidata\.org/entity/Q\d+> \.$")
    assert all(pat.match(line) for line in t.ntriple)
    # subjects/objects round-trip to the triples table
    got = {(re.match(r"^<([^>]+)>.*entity/(Q\d+)>", line).groups())
           for line in t.ntriple}
    expect = {(u, q) for u, q in zip(trip.url, trip.qid)}
    assert got == expect


def test_corr_matrix_matches_numpy():
    t = Q.QUERIES["lineitem_corr_matrix"](SF).to_pandas() \
        .set_index(["col_a", "col_b"])
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=Q._CORR_COLS).to_pandas()
    basis = {
        "l_quantity": np.floor(li.l_quantity + 0.5),
        "l_extendedprice": np.floor(li.l_extendedprice + 0.5),
        "l_discount": np.floor(li.l_discount * 10000 + 0.5),
        "l_tax": np.floor(li.l_tax * 10000 + 0.5),
    }
    for i in range(4):
        for j in range(i + 1, 4):
            a = basis[Q._CORR_COLS[i]]
            b = basis[Q._CORR_COLS[j]]
            ref = np.corrcoef(a, b)[0, 1]
            got = t.loc[(Q._CORR_COLS[i], Q._CORR_COLS[j])].corr_nano / 1e9
            assert abs(got - ref) < 1e-6
    # valid correlation range (this synthetic generator draws the
    # measures independently, so no pair is forced to be strong)
    assert (t.corr_nano.abs() <= 10 ** 9).all()


def test_ndcg_matches_bruteforce():
    row = Q.QUERIES["docs_ndcg_eval"](SF).to_pandas().iloc[0]
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    rel = {}
    for r in docs.itertuples():
        toks = set(r.text.split())
        g = sum(1 for t in Q._BM25_TERMS if t in toks)
        if g:
            rel[int(r.doc_id)] = g
    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:Q._NDCG_K]
    idcg = sum(g / math.log2(i + 2) for i, (_, g) in enumerate(ideal))
    assert int(row.idcg_micro) == int(round(idcg * 1e6))
    assert 0 < int(row.ndcg_nano) <= 10 ** 9
    assert int(row.dcg_micro) <= int(row.idcg_micro)
    # consistency: ndcg == dcg/idcg at nano precision
    assert abs(int(row.ndcg_nano)
               - round(row.dcg_micro / row.idcg_micro * 1e9)) <= 1
