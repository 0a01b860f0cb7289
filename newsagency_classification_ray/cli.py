"""Production entrypoint — the cluster invocation shape the engine targets:

    ray job submit --working-dir . -- \
        python -m newsagency_classification_ray.cli \
            --input /data/pages --output /data/kg --partitions 256

The Ray Jobs runtime provides the cluster address; standalone runs fall
back to ``RAY_ADDRESS`` (``local`` in this sandbox). Session ownership
follows the driver contract: the CLI initialises Ray only when nothing
else has (so it composes with the test fixture and the graft driver, both
of which own their sessions), and shuts down only what it started.

Output is one JSON line of run metrics: row counts plus the per-partition
write/skip tally from the lineage manifests — re-submitting the same job
after a partial failure skips every finished partition (see
``state/manifest.py`` and the resume test in ``tests/``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import ray


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(prog="newsagency_classification_ray")
    ap.add_argument("--input", required=True,
                    help="pages parquet file or shard directory "
                         "(url, warc_ts, html, text, lang)")
    ap.add_argument("--output", required=True,
                    help="graph output root (nodes/ edges/ mentions/ + "
                         "per-partition lineage manifests)")
    ap.add_argument("--partitions", type=int, default=64,
                    help="output hash partitions per table (resume "
                         "granularity; size to the cluster)")
    args = ap.parse_args(argv)

    from .pipelines import kg
    from .pipelines.graph import materialize_graph

    owns = not ray.is_initialized()
    if owns:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False)
    try:
        # materialize mentions ONCE, then fan out — every downstream branch
        # (triples/canonical/cooccurrence → nodes/edges) reads the
        # materialized blocks instead of re-running the tagger actor pool
        # per consumer (which can also starve small CPU budgets)
        pages = kg.read_pages(args.input)
        mentions = kg.extract_mentions(pages).materialize()
        trip = kg.triples(mentions)
        canon = kg.canonicalize(mentions)
        cooc = kg.cooccurrence_edges(mentions)
        nodes = kg.build_nodes(canon, trip)
        edges = kg.build_edges(trip, cooc)
        stats = materialize_graph(
            nodes, edges, mentions, args.output,
            num_partitions=args.partitions, input_fragments=[args.input])
        written = sum(1 for v in stats.values() if v.get("written"))
        out = {
            "input": args.input,
            "output": args.output,
            "mentions": mentions.count(),
            "triples": trip.count(),
            "partitions_written": written,
            "partitions_skipped": len(stats) - written,
        }
        print(json.dumps(out))
        return out
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
