"""Sink retry posture (O-3, VERDICT r03 "What's missing" #3): the
reference retries a failed S3 upload 3 times with backoff
(arxiv_collector.py:177-193); Spark's equivalent is TASK retry under
the file-commit protocol — a failed attempt's output is discarded at
commit, the retry's output lands alone. This test PROVES that posture
instead of just documenting it: a write task whose first attempt
always dies must succeed on retry with exactly-once output.

Runs in a subprocess because retry needs the ``local[N, F]`` master
form (local mode hardcodes maxFailures=1 otherwise) and the shared
test session is already up in this JVM.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

_SCRIPT = textwrap.dedent("""
    import pandas as pd
    from pyspark import TaskContext
    from pyspark.sql import SparkSession

    out = sys.argv[1]
    spark = (SparkSession.builder.master("local[4, 2]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    def flaky(batches):
        ctx = TaskContext.get()
        if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            raise RuntimeError("injected first-attempt failure")
        for pdf in batches:
            yield pdf

    df = (spark.range(0, 100, 1, 4)
          .mapInPandas(flaky, "id long"))
    df.write.mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    ids = sorted(r.id for r in back.collect())
    assert ids == list(range(100)), (len(ids), ids[:5])
    print("RETRY_WRITE_OK", len(ids))
    spark.stop()
""")


def test_failed_write_task_retries_and_commits_exactly_once(tmp_path):
    res = subprocess.run(
        [sys.executable, "-c", "import sys\n" + _SCRIPT, str(tmp_path / "out")],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "RETRY_WRITE_OK 100" in res.stdout
    # the injected failure really happened (retry exercised, not skipped)
    assert "injected first-attempt failure" in (res.stderr + res.stdout)
