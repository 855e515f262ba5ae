"""O-2 config source: YAML document -> typed defaults (SURVEY.md §2.A)."""

import pytest

from hackmd_data_pipeline_spark.config import PipelineConfig


def test_defaults_match_reference():
    c = PipelineConfig()
    assert (c.batch_size, c.max_results_goal, c.num_categories_per_run) == (100, 1000, 3)
    assert (c.lookback_months, c.pending_gz_batch, c.etl_batch_size) == (6, 10, 100)


def test_from_yaml_roundtrip(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(
        "batch_size: 50\n"
        "lookback_months: 3\n"
        "categories: [cs.AI, cs.LG]\n"
        "unknown_future_knob: whatever\n",   # ignored, not an error
        encoding="utf-8",
    )
    c = PipelineConfig.from_yaml(str(p))
    assert c.batch_size == 50
    assert c.lookback_months == 3
    assert c.categories == ("cs.AI", "cs.LG")
    assert c.max_results_goal == 1000  # defaulted


def test_from_yaml_rejects_non_mapping(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("- just\n- a list\n", encoding="utf-8")
    with pytest.raises(ValueError):
        PipelineConfig.from_yaml(str(p))


def test_from_hadoop_path_round_trip(spark, tmp_path):
    """O-2 remote load (VERDICT r03 item 6): the scheme-aware FS API
    resolves a file:-scheme URI the same way it would s3a://hdfs://
    in a deployed session (reference arxiv_collector.py:21-35)."""
    p = tmp_path / "config.yaml"
    p.write_text(
        "batch_size: 25\n"
        "num_categories_per_run: 7\n"
        "categories: [cs.DB]\n",
        encoding="utf-8",
    )
    c = PipelineConfig.from_hadoop_path(spark, f"file:{p}")
    assert c.batch_size == 25
    assert c.num_categories_per_run == 7
    assert c.categories == ("cs.DB",)
    assert c.etl_batch_size == 100  # defaulted


def test_from_hadoop_path_rejects_non_mapping(spark, tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("- nope\n", encoding="utf-8")
    with pytest.raises(ValueError):
        PipelineConfig.from_hadoop_path(spark, f"file:{p}")
