"""End-to-end crash-resumable flagship (input + output checkpoints)."""

from __future__ import annotations

import glob
import os
import shutil

from newsagency_classification_ray.pipelines import kg
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"
WD = "/tmp/nacr_flagship_resume"


def test_flagship_resumable_end_to_end(ray_session):
    pages = ensure_pages(SF)
    shutil.rmtree(WD, ignore_errors=True)

    s1 = kg.flagship_resumable(pages, WD, num_partitions=4)
    n_shards = len(glob.glob(os.path.join(pages, "*.parquet")))
    assert len(s1["extract"]["written"]) == n_shards
    assert s1["extract"]["row_count"] == 371  # sf0.001 mention count
    assert any(v["written"] for v in s1["graph"].values())

    # a full rerun is a complete no-op on BOTH checkpoint layers
    s2 = kg.flagship_resumable(pages, WD, num_partitions=4)
    assert not s2["extract"]["written"]
    assert len(s2["extract"]["skipped"]) == n_shards
    assert all(not v["written"] for v in s2["graph"].values())

    # simulate a crash that lost one extraction shard AND one graph
    # partition: resume redoes exactly those
    victim_shard = sorted(glob.glob(os.path.join(WD, "mentions",
                                                 "shard=*")))[0]
    os.remove(os.path.join(victim_shard, "_manifest.json"))
    gdirs = sorted(glob.glob(os.path.join(WD, "graph", "*", "part=*")))
    victim_part = gdirs[0]
    os.remove(os.path.join(victim_part, "_manifest.json"))

    s3 = kg.flagship_resumable(pages, WD, num_partitions=4)
    assert s3["extract"]["written"] == [os.path.basename(victim_shard)]
    rewritten = [k for v in s3["graph"].values() for k in v["written"]]
    assert rewritten == [os.path.basename(victim_part)]

    # the resumed output still matches the monolithic flagship
    m = kg.read_checkpointed_mentions(os.path.join(WD, "mentions"))
    assert m.count() == 371
