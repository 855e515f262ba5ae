from .control import ControlTable, claim_pending, mark_status
from .pipeline import run_ingest_stream

__all__ = ["ControlTable", "claim_pending", "mark_status", "run_ingest_stream"]
