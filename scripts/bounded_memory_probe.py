"""Streaming-with-backpressure evidence: run the flagship over sf0.1
(~120 MB of input + intermediates) with the object store capped at 200 MB.
The streaming executor must pipeline/spill rather than materialize.

Usage: python scripts/bounded_memory_probe.py  → one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         object_store_memory=200 * 1024 * 1024, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from newsagency_classification_ray.pipelines import kg
from newsagency_classification_ray.sources.pages import ensure_pages

p = ensure_pages("/root/testdata/sf0.1")
t0 = time.perf_counter()
mentions = kg.extract_mentions(kg.read_pages(p)).materialize()
out = {
    "object_store_mb": 200,
    "n_pages": 200000,
    "n_mentions": mentions.count(),
    "wall_s": round(time.perf_counter() - t0, 2),
    "completed": True,
}
print(json.dumps(out))
ray.shutdown()
