"""Both lineage-truncation modes of the iterative operators (r06
VERDICT item 3): local checkpoints (the local[*] default) and RELIABLE
checkpoints (cluster posture — survives executor loss). The contract:
identical results either way, and the reliable path must actually
write into the configured checkpoint directory (not silently fall back
to executor storage).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hackmd_data_pipeline_spark.operators.bpe import train_bpe_merges_distributed
from hackmd_data_pipeline_spark.operators.checkpointing import (
    iter_checkpoint,
    reliable_checkpoint_dir,
)
from hackmd_data_pipeline_spark.operators.dedup import dedup_clusters


@pytest.fixture
def reliable_dir(spark, tmp_path):
    """Flip the session into reliable-checkpoint mode for one test;
    restore local mode after via the EMPTY-conf override (the
    SparkContext checkpoint dir cannot be unset; the empty string is
    reliable_checkpoint_dir's documented way back, and it must persist
    so later suite tests never checkpoint into this deleted
    tmp_path)."""
    ckpt = tmp_path / "reliable_ckpt"
    spark.conf.set("spark.graft.checkpointDir", str(ckpt))
    yield str(ckpt)
    # Spark has no unsetCheckpointDir: the EMPTY conf value is the
    # documented way back to local mode (reliable_checkpoint_dir),
    # and it must stay set so later suite tests never checkpoint into
    # this test's deleted tmp_path
    spark.conf.set("spark.graft.checkpointDir", "")


def _ckpt_files(root: str) -> int:
    n = 0
    for _, _, files in os.walk(root):
        n += len(files)
    return n


def _edges(spark):
    """A multi-cluster graph big enough to defeat the small-graph
    driver shortcut is impractical in tests — instead call the
    DISTRIBUTED path directly via a tiny threshold."""
    rows = [(i, i + 1) for i in range(0, 40, 2)]      # 20 two-node clusters
    rows += [(100, 101), (101, 102), (102, 103)]      # one chain
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_reliable_mode_detected_and_writes_files(spark, reliable_dir):
    assert reliable_checkpoint_dir(spark) is not None
    df = iter_checkpoint(spark.range(10), eager=True)
    assert df.count() == 10
    assert _ckpt_files(reliable_dir) > 0, (
        "reliable mode configured but no checkpoint files written")


def test_local_mode_is_the_default(spark):
    # the empty-conf override must force local mode even when the
    # SparkContext dir was set by an earlier reliable-mode test
    spark.conf.set("spark.graft.checkpointDir", "")
    assert reliable_checkpoint_dir(spark) is None
    df = iter_checkpoint(spark.range(10), eager=True)
    assert df.count() == 10


def test_cc_identical_across_modes(spark, reliable_dir, tmp_path):
    pairs = _edges(spark)
    reliable = sorted(map(tuple, dedup_clusters(
        pairs, small_graph_threshold=1).collect()))
    assert _ckpt_files(reliable_dir) > 0
    spark.conf.set("spark.graft.checkpointDir", "")
    local = sorted(map(tuple, dedup_clusters(
        pairs, small_graph_threshold=1).collect()))
    assert reliable == local
    # and both match the driver-side union-find shortcut
    shortcut = sorted(map(tuple, dedup_clusters(
        pairs, small_graph_threshold=100_000).collect()))
    assert reliable == shortcut


def test_bpe_merges_identical_across_modes(spark, reliable_dir):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3)
         for i in range(8)] +
        [(100 + i, "pack my box with five dozen liquor jugs " * 2)
         for i in range(8)],
        "doc_id long, text string")
    reliable = train_bpe_merges_distributed(docs, n_merges=12,
                                            checkpoint_every=4)
    spark.conf.set("spark.graft.checkpointDir", "")
    local = train_bpe_merges_distributed(docs, n_merges=12,
                                         checkpoint_every=4)
    assert reliable == local
    assert len(reliable) > 0
