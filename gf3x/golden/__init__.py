from .modem import GoldenModem, GoldenDecodeResult

__all__ = ["GoldenModem", "GoldenDecodeResult"]
