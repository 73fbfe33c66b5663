"""gf3x — a TPU-native acoustic OFDM modem framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
`adamg-97/GF3-audio-modem` (see SURVEY.md; the public API contract is
BASELINE.json:5: `encode(bytes) -> waveform`, `decode(waveform) -> bytes`).

    from gf3x import Modem, preset
    modem = Modem(preset("gf3"))
    waveform = modem.encode(b"payload bytes", filename="f.txt")
    result = modem.decode(recording)   # .payload, .filename, .crc_ok, .diag
"""

from .config import ModemConfig, preset, GF3_STANDARD, CONFIG1_LOOPBACK, layout
from .models import Modem, DecodeDiag, DecodeResult
from .golden import GoldenModem

__version__ = "0.1.0"

__all__ = [
    "ModemConfig",
    "preset",
    "layout",
    "GF3_STANDARD",
    "CONFIG1_LOOPBACK",
    "Modem",
    "DecodeDiag",
    "DecodeResult",
    "GoldenModem",
    "__version__",
]
