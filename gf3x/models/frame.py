"""GF3 standard frame schema (reference L6, SURVEY.md §2):

    chirp ∥ [Schmidl–Cox symbol] ∥ K known symbols ∥ D pilot-bearing data symbols

Assembly/parsing of the bin-domain frame, shared by the jitted encode and
decode paths. All geometry is static from `ModemConfig` (BASELINE.json:10
"Full GF3 standard frame").
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModemConfig, layout

__all__ = ["data_symbols_from_bits", "frame_bin_matrix", "bits_from_llr_layout"]


def data_symbols_from_bits(cfg: ModemConfig, coded_bits: jnp.ndarray) -> jnp.ndarray:
    """Channel bits (..., raw_bits_per_frame) → data-symbol bins (..., D, n_used).

    Maps Gray QAM onto data positions and writes the class-standard pilot
    values on pilot positions (same pilots every symbol — the phase-tracking
    reference, SURVEY.md Appendix "Pilot phase tracking").
    """
    from ..ops.constellation import qam_map

    lay = layout(cfg)
    *lead, _ = coded_bits.shape
    grp = coded_bits.reshape(*lead, cfg.n_data_symbols, cfg.n_data_bins, cfg.bits_per_symbol)
    dsym = qam_map(grp, cfg.bits_per_symbol)
    out = jnp.zeros((*lead, cfg.n_data_symbols, cfg.n_used), dtype=jnp.complex64)
    out = out.at[..., jnp.asarray(lay.data_pos)].set(dsym)
    out = out.at[..., jnp.asarray(lay.pilot_pos)].set(jnp.asarray(lay.pilot_vals))
    return out


def frame_bin_matrix(cfg: ModemConfig, data_syms: jnp.ndarray) -> jnp.ndarray:
    """Prepend the K known channel-estimation symbols → (..., K+D, n_used)."""
    lay = layout(cfg)
    *lead, D, U = data_syms.shape
    known = jnp.broadcast_to(
        jnp.asarray(lay.known_syms), (*lead, cfg.n_known_symbols, U)
    )
    return jnp.concatenate([known, data_syms], axis=-2)


def bits_from_llr_layout(cfg: ModemConfig, llr: jnp.ndarray) -> jnp.ndarray:
    """Flatten demapper LLRs (..., D, n_data_bins, bps) → (..., raw_bits)."""
    *lead, _, _, _ = llr.shape
    return llr.reshape(*lead, cfg.raw_bits_per_frame)
