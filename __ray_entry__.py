"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on /root/testdata/sf0.001's
synthetic pages corpus (BASELINE.json input_hint shape) and returns the
triples Dataset. ``queries()`` / ``oracle_sql()`` expose every implemented
operator pipeline (SURVEY.md §2 + training-data extras) with DuckDB oracles
where SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing
below calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from newsagency_classification_ray.pipelines import kg
    from newsagency_classification_ray.sources.pages import ensure_pages

    path = ensure_pages("/root/testdata/sf0.001")
    pages = kg.read_pages(path)
    mentions = kg.extract_mentions(pages)
    return kg.triples(mentions)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    Each callable is memoized through the lineage-fingerprinted result
    cache (``state.result_cache``): repeated driver sweeps over unchanged
    inputs + unchanged engine sources return the materialized parquet
    instead of recomputing; any input or code change misses by
    construction. ``NACR_RESULT_CACHE=0`` disables."""
    from newsagency_classification_ray.queries import (
        QUERIES, wrap_with_result_cache)

    return wrap_with_result_cache(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    from newsagency_classification_ray.queries import oracles

    return oracles()
