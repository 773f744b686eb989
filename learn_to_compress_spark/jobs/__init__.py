from .compact import compact_store, fragmented_parts, vacuum_store
from .decode import decode_table
from .encode import encode_table

__all__ = [
    "encode_table",
    "decode_table",
    "compact_store",
    "fragmented_parts",
    "vacuum_store",
]
