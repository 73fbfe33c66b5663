from .bits import (
    bytes_to_bits,
    bits_to_bytes,
    pack_header,
    parse_header,
    HEADER_OVERHEAD,
)

__all__ = [
    "bytes_to_bits",
    "bits_to_bytes",
    "pack_header",
    "parse_header",
    "HEADER_OVERHEAD",
]
