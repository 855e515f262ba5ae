from .jsonl_gz import read_raw_jsonl, split_quarantine
from .writers import write_partitioned_json, write_partitioned_parquet

__all__ = [
    "read_raw_jsonl",
    "split_quarantine",
    "write_partitioned_json",
    "write_partitioned_parquet",
]
