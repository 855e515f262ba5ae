from .scalars import (
    batch_id,
    elapsed_micros,
    fingerprint,
    sanitize_key,
    scrub_text,
    token_count,
    tokens,
)

__all__ = [
    "batch_id",
    "elapsed_micros",
    "fingerprint",
    "sanitize_key",
    "scrub_text",
    "token_count",
    "tokens",
]
