"""Driver-contract smoke: entry(), queries(), oracle_sql() shape."""

import importlib.util
import sys
from pathlib import Path

import ray.data


def load_entry_module():
    path = Path(__file__).resolve().parents[1] / "__ray_entry__.py"
    spec = importlib.util.spec_from_file_location("__ray_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs_and_has_stable_schema():
    mod = load_entry_module()
    ds = mod.entry()
    assert isinstance(ds, ray.data.Dataset)
    tbl = ds.to_pandas()
    assert len(tbl) >= 0
    assert {"url", "predicate", "qid", "year", "n_mentions"} <= set(tbl.columns)
    assert (tbl["predicate"] == "cites_agency").all()


def test_queries_and_oracles_consistent():
    mod = load_entry_module()
    qs = mod.queries()
    sql = mod.oracle_sql()
    assert len(qs) >= 25
    assert set(sql) <= set(qs)  # every oracle has a query
    assert len(sql) >= 20
    for name, s in sql.items():
        assert isinstance(s, str) and "SELECT" in s.upper(), name
