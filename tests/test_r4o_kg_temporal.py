"""Edge semantics for the KG alias-health + temporal-stability batch,
driven on the real sf0.001 corpus (invariant checks, not golden rows)."""

from __future__ import annotations

from newsagency_classification_ray import queries as Q


def test_alias_diversity_invariants(ray_session):
    rows = Q.q_kg_alias_diversity("/root/testdata/sf0.001").take_all()
    assert rows
    for r in rows:
        assert r["qid"] != "NIL"
        # each distinct alias contributes >=1 mention; hapax is a subset
        assert r["n_mentions"] >= r["n_aliases"] >= 1
        assert 0 <= r["hapax"] <= r["n_aliases"]
    # total mention volume must match the NIL-filtered mention count
    import pyarrow.compute as pc

    m = Q._mentions("/root/testdata/sf0.001")
    total = sum(r["n_mentions"] for r in rows)
    got = m.map_batches(
        lambda t: t.filter(pc.not_equal(t["qid"], "NIL")).select(["qid"]),
        batch_format="pyarrow").count()
    assert total == got


def test_yoy_neighbors_invariants(ray_session):
    rows = Q.q_kg_yoy_neighbors("/root/testdata/sf0.001").take_all()
    assert rows, "multi-year sf0.001 corpus should have YoY rows"
    for r in rows:
        # carried-over neighbors bounded by both years' degrees
        assert 0 <= r["inter"] <= min(r["deg_prev"], r["deg_curr"])
    # every (qid, year) appears at most once
    keys = [(r["qid"], r["year"]) for r in rows]
    assert len(keys) == len(set(keys))
