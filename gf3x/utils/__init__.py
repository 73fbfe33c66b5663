from .bits import (
    bytes_to_bits,
    bits_to_bytes,
    pack_header,
    parse_header,
    parse_frame_header,
    FrameHeader,
    HEADER_OVERHEAD,
)

__all__ = [
    "bytes_to_bits",
    "bits_to_bytes",
    "pack_header",
    "parse_header",
    "parse_frame_header",
    "FrameHeader",
    "HEADER_OVERHEAD",
]
