"""JSONL source round-trip, entity-discovery curve, churn-cohort bounds."""

from __future__ import annotations

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_jsonl_census_equals_parquet_census():
    jl = {r["lang"]: r["n"] for r in
          Q.QUERIES["pages_jsonl_source"](SF).take_all()}
    import duckdb

    from newsagency_classification_ray.sources.pages import ensure_pages
    path = ensure_pages(SF)
    pq = dict(duckdb.connect().execute(
        f"SELECT lang, count(*) FROM read_parquet('{path}/*.parquet') "
        f"GROUP BY 1").fetchall())
    assert jl == pq


def test_jsonl_export_is_idempotent():
    d1 = Q._jsonl_pages_dir(SF)
    d2 = Q._jsonl_pages_dir(SF)
    assert d1 == d2
    import os
    assert os.path.exists(os.path.join(d1, "_SUCCESS"))


def test_entity_discovery_monotone_and_consistent():
    t = Q.QUERIES["kg_entity_discovery"](SF).to_pandas()
    assert (t.year.diff().dropna() > 0).all()
    assert (t.n_new > 0).all()
    assert (t.n_new.cumsum() == t.cum_entities).all()
    # final cumulative == distinct linked QIDs
    m = Q.QUERIES["kg_mentions"](SF).to_pandas()
    assert t.cum_entities.iloc[-1] == m[m.qid != "NIL"].qid.nunique()


def test_churn_cohort_bounds():
    t = Q.QUERIES["events_churn_cohorts"](SF).to_pandas()
    assert (t.n_churned <= t.n_users).all()
    assert (t.churn_nano <= 10**9).all()
    assert t.n_users.sum() == 15  # sf0.001 has exactly 15 users
