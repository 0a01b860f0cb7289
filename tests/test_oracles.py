"""Driver-style oracle conformance at sf0.001 (§5 plan (d)).

Mirrors the driver's compare: row count, sorted column names, value equality.
The full set runs via ``python scripts/check_oracles.py``; here a
representative subset keeps the suite fast while covering every operator
family (KG pipeline, aggregate, join, window, dedup, text stats, ANN).
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"

SUBSET = [
    "kg_triples",
    "kg_canonical",
    "kg_cooccurrence",
    "pricing_summary",
    "top_customers",
    "events_hourly",
    "docs_exact_dedup",
    "docs_token_stats",
    "ann_topk",
    "lineitem_regression",
    "orders_price_ntile",
    "events_mode_per_user",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')")
    return c


@pytest.fixture(scope="module")
def oracle_map():
    old = Q._SF001
    Q._SF001 = SF
    yield Q.oracles()
    Q._SF001 = old


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, con, oracle_map):
    res = Q.QUERIES[name](SF)
    got = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    if isinstance(got, pa.Table):
        got = got.to_pandas()
    got = canon(got)
    want = canon(con.execute(oracle_map[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    want = want.astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
