from .decode import decode_table
from .encode import encode_table

__all__ = ["encode_table", "decode_table"]
