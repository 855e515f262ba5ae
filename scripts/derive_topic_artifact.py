#!/usr/bin/env python
"""Derive (and print) the PINNED_TOPIC_TERMS literal for
operators/topics.py — the r06 VERDICT item-1 recipe: freeze a
topic-term log-prob table so topic SCORING becomes pure relational
algebra (explode -> join -> exact int64 sum -> argmax), fully
DuckDB-restatable, while LDA TRAINING stays pytest-gated.

Run:  python scripts/derive_topic_artifact.py
The output is the exact literal frozen in operators/topics.py; the
provenance test re-derives it the same way and asserts equality.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hackmd_data_pipeline_spark.operators.topics import (  # noqa: E402
    derive_topic_term_artifact,
)
from hackmd_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("derive-topic-artifact")
    art = derive_topic_term_artifact(spark, "/root/testdata/sf0.01")
    print(f"# {len(art)} terms x {len(art[0][1])} topics")
    print("PINNED_TOPIC_TERMS: list[tuple[str, tuple[int, ...]]] = [")
    for term, logps in art:
        print(f"    ({term!r}, {tuple(logps)!r}),")
    print("]")


if __name__ == "__main__":
    main()
