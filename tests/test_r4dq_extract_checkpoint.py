"""Input-shard-level extraction checkpointing (resume upstream of the
graph write)."""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd

from newsagency_classification_ray.pipelines import kg
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"
OUT = "/tmp/nacr_ckpt_mentions"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_checkpointed_extraction_resume_and_equality(ray_session):
    pages = ensure_pages(SF)
    shutil.rmtree(OUT, ignore_errors=True)

    s1 = kg.extract_mentions_checkpointed(pages, OUT)
    n_shards = len(glob.glob(os.path.join(pages, "*.parquet")))
    assert len(s1["written"]) == n_shards and not s1["skipped"]
    assert s1["row_count"] > 0

    # equality with the monolithic run (byte-level, all columns)
    ckpt = _canon(kg.read_checkpointed_mentions(OUT).to_pandas())
    full = _canon(kg.extract_mentions(kg.read_pages(pages)).to_pandas())
    pd.testing.assert_frame_equal(ckpt, full)

    # rerun: everything skipped, nothing rewritten
    s2 = kg.extract_mentions_checkpointed(pages, OUT)
    assert not s2["written"] and len(s2["skipped"]) == n_shards

    # knock out ONE shard's manifest → only that shard is redone,
    # and the re-extracted partition carries the identical content hash
    victim = sorted(glob.glob(os.path.join(OUT, "shard=*")))[3]
    from newsagency_classification_ray.state.manifest import read_manifest

    before = read_manifest(victim)
    os.remove(os.path.join(victim, "_manifest.json"))
    s3 = kg.extract_mentions_checkpointed(pages, OUT)
    assert s3["written"] == [os.path.basename(victim)]
    assert len(s3["skipped"]) == n_shards - 1
    after = read_manifest(victim)
    assert after is not None
    assert after["content_hash"] == before["content_hash"]
    assert after["row_count"] == before["row_count"]
    assert after["input_fragments"] == before["input_fragments"]

    # and the union is still equal after the partial redo
    ckpt2 = _canon(kg.read_checkpointed_mentions(OUT).to_pandas())
    pd.testing.assert_frame_equal(ckpt2, full)
