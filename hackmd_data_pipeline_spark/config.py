"""Pipeline configuration (SURVEY.md §2.A O-2).

The reference loads a YAML document from S3 at import time and reads
tunables off it (reference src/core/config.py:1-43, config/config.yaml;
loaded at arxiv_collector.py:21-35 and arxiv_etl.py:19-31). Here the
same document shape becomes a typed, defaulted dataclass loaded on the
driver — values seed the Collector / ingest pipeline knobs and, where
relevant, Spark session conf. No S3 dependency: any local path or
pre-parsed mapping works.

Defaults mirror the reference's committed config.yaml (SURVEY.md §6):
batch_size=100, max_results_goal=1000, num_categories_per_run=3,
lookback_months=6, pending_gz_batch=10, etl_batch_size=100.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping
from typing import Any

try:  # PyYAML is present in this environment but stays optional
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    batch_size: int = 100              # records per raw file (O-36)
    max_results_goal: int = 1000       # per-category scan cap (O-33)
    num_categories_per_run: int = 3    # head-of-queue slice (O-34)
    lookback_months: int = 6           # dedup lookback window (O-19/O-22)
    pending_gz_batch: int = 10         # files claimed per ETL run (O-24)
    etl_batch_size: int = 100          # sink batch size (O-5)
    categories: tuple[str, ...] = ()   # work list (reference: 84 arXiv cats)

    @classmethod
    def from_mapping(cls, doc: Mapping[str, Any]) -> "PipelineConfig":
        """Build from a parsed config document; unknown keys ignored,
        missing keys defaulted (the reference's .get(...) posture)."""
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs: dict[str, Any] = {}
        for k, v in doc.items():
            if k not in fields:
                continue
            kwargs[k] = tuple(v) if k == "categories" else v
        return cls(**kwargs)

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        if yaml is None:  # pragma: no cover
            raise RuntimeError("PyYAML not available; use from_mapping")
        with open(path, encoding="utf-8") as fh:
            doc = yaml.safe_load(fh) or {}
        if not isinstance(doc, Mapping):
            raise ValueError(f"config root must be a mapping, got {type(doc).__name__}")
        return cls.from_mapping(doc)

    @classmethod
    def from_hadoop_path(cls, spark, path: str) -> "PipelineConfig":
        """Load the YAML document from ANY filesystem the session can
        reach — ``s3a://bucket/config/config.yaml``, ``hdfs://...``,
        or ``file:/...`` — mirroring the reference's
        download-config-from-object-store-at-startup behavior
        (reference arxiv_collector.py:21-35) without a cloud SDK: the
        path's scheme picks the Hadoop FileSystem exactly as it does
        for data reads (sources/fs.py), so the same deployment
        credentials/endpoints apply."""
        if yaml is None:  # pragma: no cover
            raise RuntimeError("PyYAML not available; use from_mapping")
        from .sources.fs import fs_read_text
        doc = yaml.safe_load(fs_read_text(spark, path)) or {}
        if not isinstance(doc, Mapping):
            raise ValueError(f"config root must be a mapping, got {type(doc).__name__}")
        return cls.from_mapping(doc)
