"""FEC package: QC-LDPC code construction + the four decoder backends."""

from .ldpc import LdpcCode

__all__ = ["LdpcCode"]
