"""Lineage truncation for iterative operators — local vs reliable
(r06 VERDICT item 3).

The iterative operators (connected-components min-label propagation in
operators/dedup.py, PageRank in operators/graph.py, the distributed
BPE trainer in operators/bpe.py) must truncate their per-round lineage
or the plan grows quadratically. ``localCheckpoint`` does that by
storing blocks in EXECUTOR storage — fast, zero configuration, and the
right default on local[*] — but on a real cluster those blocks die
with their executor: one lost node makes the truncated lineage
unrecoverable and kills a 100 TB dedup job mid-flight.

``iter_checkpoint`` is the single switch point: it uses Spark's
RELIABLE ``.checkpoint()`` (writes to the fault-tolerant checkpoint
directory, typically HDFS/S3, survives any executor loss) whenever a
checkpoint dir is configured, and ``localCheckpoint`` otherwise.
Configure either way:

  * ``spark.sparkContext.setCheckpointDir("hdfs://.../ckpt")`` — the
    native Spark knob; or
  * session conf ``spark.graft.checkpointDir`` — declarative form for
    launchers that only control ``--conf`` (applied lazily here,
    because SparkConf entries cannot call setCheckpointDir themselves).

Both modes produce identical results by contract —
tests/test_checkpointing.py pins CC and distributed-BPE outputs equal
across modes and proves the reliable path actually writes checkpoint
files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_GRAFT_CKPT_CONF = "spark.graft.checkpointDir"


def reliable_checkpoint_dir(spark: SparkSession) -> str | None:
    """The effective reliable-checkpoint directory, or None when the
    session is in local-checkpoint mode.

    Precedence: the session conf is authoritative when present — a
    non-empty value selects reliable mode (and is applied to the
    SparkContext, which cannot be configured via --conf directly), the
    EMPTY string forces local mode (the only way back: Spark has no
    unsetCheckpointDir, so a session that ever went reliable can
    declare itself local again). With no conf at all, a natively-set
    SparkContext checkpoint dir selects reliable mode."""
    conf_dir = spark.conf.get(_GRAFT_CKPT_CONF, None)
    sc = spark.sparkContext
    jopt = sc._jsc.sc().getCheckpointDir()
    native = jopt.get() if jopt.isDefined() else None
    if conf_dir is not None:
        if not conf_dir:
            return None
        # idempotent unless redirected; the native dir gains a random
        # subdir suffix, so compare by PATH prefix — substring
        # containment would treat a new conf dir that happens to be a
        # string prefix of the old native dir (/tmp/ck vs /tmp/ckpt/x)
        # as already applied (r07 ADVICE)
        base = conf_dir.rstrip("/")
        if native is None or not (native == base
                                  or native.startswith(base + "/")):
            sc.setCheckpointDir(conf_dir)
            jopt = sc._jsc.sc().getCheckpointDir()
            native = jopt.get() if jopt.isDefined() else None
        return native
    return native


def iter_checkpoint(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``.checkpoint()`` when a
    checkpoint dir is configured (cluster posture — survives executor
    loss), ``localCheckpoint`` otherwise (local posture — no extra
    I/O). ``eager=False`` lets the caller's next action materialize
    it, one job instead of two."""
    if reliable_checkpoint_dir(df.sparkSession) is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def iter_checkpoint_eager(df: DataFrame) -> DataFrame:
    """``iter_checkpoint`` with eager materialization — for call sites
    whose next action is a driver collect that must not re-execute the
    lineage (``.transform``-friendly form)."""
    return iter_checkpoint(df, eager=True)
