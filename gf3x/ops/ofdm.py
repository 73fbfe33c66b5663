"""OFDM layer (reference L3, SURVEY.md §2): batched real-FFT mod/demod + CP.

The reference's per-symbol IFFT loop (hot loop #1, SURVEY.md §4.1) becomes a
single batched `jnp.fft.irfft` over all symbols of all frames — the XLA FFT
runs once over a (batch·symbols, n_fft) array, which is the TPU-native shape
(BASELINE.json north-star: "becomes a batched XLA FFT path"). Hermitian
symmetry for a real waveform is implicit in the rfft/irfft pair.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import ModemConfig

__all__ = ["ofdm_modulate", "ofdm_demodulate"]


def ofdm_modulate(cfg: ModemConfig, sym_bins: jnp.ndarray) -> jnp.ndarray:
    """(..., S, n_used) complex64 bin values → (..., S·(N+CP)) float32 samples.

    The used bins are a contiguous range [bin_lo, bin_hi], so spectrum
    placement is a zero-pad (concat) — never a scatter, which lowers to a
    per-element store loop on TPU. Inverse real FFT, symbol-RMS scaling,
    CP prepend, flatten.
    """
    *lead, S, _ = sym_bins.shape
    pad = [(0, 0)] * (len(lead) + 1) + [(cfg.bin_lo, cfg.n_bins - cfg.bin_hi - 1)]
    spec = jnp.pad(sym_bins.astype(jnp.complex64), pad)
    x = jnp.fft.irfft(spec, cfg.n_fft, axis=-1).astype(jnp.float32) * jnp.float32(cfg.ofdm_scale)
    with_cp = jnp.concatenate([x[..., -cfg.cp:], x], axis=-1)
    return with_cp.reshape(*lead, S * cfg.symbol_len)


def ofdm_demodulate(cfg: ModemConfig, samples: jnp.ndarray) -> jnp.ndarray:
    """(..., S·(N+CP)) float32 samples → (..., S, n_used) complex64 bins.

    The reference's per-symbol FFT loop (hot loop #3, SURVEY.md §4.2) as one
    batched rfft with the CP stripped by reshape+slice; used-bin extraction
    is a contiguous slice.
    """
    *lead, T = samples.shape
    S = T // cfg.symbol_len
    sym = samples.reshape(*lead, S, cfg.symbol_len)[..., cfg.cp:]
    spec = jnp.fft.rfft(sym, cfg.n_fft, axis=-1) / np.float32(cfg.ofdm_scale)
    return spec[..., cfg.bin_lo: cfg.bin_hi + 1].astype(jnp.complex64)
