"""CLI / PipelineConfig surface (SURVEY.md §2.10)."""

import os

from newsagency_classification_ray.cli import PipelineConfig, main, run_pipeline
from newsagency_classification_ray.sources.pages import ensure_pages


def test_run_pipeline_end_to_end(tmp_path, ray_session):
    p = ensure_pages("/root/testdata/sf0.001")
    out = run_pipeline(PipelineConfig(
        input_path=p, output_root=os.path.join(tmp_path, "kg"),
        num_partitions=4, gexf_path=os.path.join(tmp_path, "g.gexf"),
    ))
    assert out["mentions"] == 371 and out["triples"] == 330
    assert out["write"]["nodes"]["rows"] == 212
    assert os.path.exists(os.path.join(tmp_path, "g.gexf"))
    for table in ("nodes", "edges", "mentions"):
        for k in range(4):
            assert os.path.exists(
                os.path.join(tmp_path, "kg", table, f"part={k}", "_manifest.json")
            )
    # rerun resumes: nothing rewritten
    again = run_pipeline(PipelineConfig(
        input_path=p, output_root=os.path.join(tmp_path, "kg"), num_partitions=4,
    ))
    assert all(v["written"] == 0 for v in again["write"].values())


def test_cli_eval_subcommand(ray_session, capsys):
    p = ensure_pages("/root/testdata/sf0.001")
    out = main(["eval", "--input", p])
    assert out["precision"] == 1.0 and out["recall"] >= 0.95
