from .sink import (
    RETENTION_BLOCKS,
    apply_retention,
    idempotent_append,
    read_sink,
    with_block_bucket,
)
from .follow import follow, process_batch, sync_state

__all__ = [
    "RETENTION_BLOCKS",
    "apply_retention",
    "idempotent_append",
    "read_sink",
    "with_block_bucket",
    "follow",
    "process_batch",
    "sync_state",
]
