"""Developer harness: run every oracle-backed query vs DuckDB, like the driver.

Usage: python scripts/check_oracles.py [sf_dir] [--only name1,name2,...]
Compares row-count, column names, and order-insensitive value equality.

The metric oracles need no scale-factor carve-out: kg_eval_strict's
frozen row is parameterized by sf (pinned for sf0.001/sf0.01, engine-
derived self-consistency elsewhere) and the hipe_* pins score fixed
reference TSVs, independent of sf.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import ray


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(res, Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import newsagency_classification_ray.queries as Q

    Q._SF001 = sf_dir  # point oracles at the requested scale
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    oracles = Q.oracles()
    if only is not None:
        oracles = {k: v for k, v in oracles.items() if k in only}
    failures = 0
    for name, sql in oracles.items():
        try:
            got = canon(to_df(Q.QUERIES[name](sf_dir)))
            want = canon(con.execute(sql).fetchdf())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                failures += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                failures += 1
                continue
            want = want.astype(got.dtypes.to_dict())
            if not got.equals(want):
                neq = (got != want).any(axis=1)
                print(f"FAIL {name}: {int(neq.sum())} differing rows, e.g.")
                print(got[neq].head(3))
                print(want[neq].head(3))
                failures += 1
                continue
            print(f"ok   {name}: {len(got)} rows")
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            failures += 1
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sys.exit(main())
