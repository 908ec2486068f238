from .jsonl import read_blocks, read_txns, split_corrupt, stream_blocks
from .inventory import enrich_inventory, read_gateway_inventory

__all__ = [
    "read_blocks",
    "read_txns",
    "split_corrupt",
    "stream_blocks",
    "read_gateway_inventory",
    "enrich_inventory",
]
