"""gf3x — a TPU-native acoustic OFDM modem framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
`adamg-97/GF3-audio-modem` (see SURVEY.md; the public API contract is
BASELINE.json:5: `encode(bytes) -> waveform`, `decode(waveform) -> bytes`).

    from gf3x import Modem, preset
    modem = Modem(preset("gf3"))
    waveform = modem.encode(b"payload bytes", filename="f.txt")
    result = modem.decode(recording)   # .payload, .filename, .crc_ok, .diag
"""

import os as _os

# Optional persistent XLA compilation cache (GF3X_COMPILE_CACHE=<dir>).
# Off by default: the tunneled axon TPU compiles remotely and never hits the
# cache, while the XLA:CPU AOT entries it stores re-load with mismatched
# machine-feature sets on this host ("could lead to SIGILL" warnings).
if _os.environ.get("GF3X_COMPILE_CACHE"):
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["GF3X_COMPILE_CACHE"])
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

from .config import (ModemConfig, preset, GF3_STANDARD, GF3_FAST,
                     GF3_HICAP, GF3_TURBO, GF3_ROBUST, CONFIG1_LOOPBACK,
                     layout)
from .models import Modem, DecodeDiag, DecodeResult
from .golden import GoldenModem

__version__ = "0.1.0"

__all__ = [
    "ModemConfig",
    "preset",
    "layout",
    "GF3_STANDARD",
    "GF3_FAST",
    "GF3_HICAP",
    "GF3_TURBO",
    "GF3_ROBUST",
    "CONFIG1_LOOPBACK",
    "Modem",
    "DecodeDiag",
    "DecodeResult",
    "GoldenModem",
    "__version__",
]
