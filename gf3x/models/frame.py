"""GF3 standard frame schema (reference L6, SURVEY.md §2):

    chirp ∥ [Schmidl–Cox symbol] ∥ K known symbols ∥ D pilot-bearing data symbols

Assembly/parsing of the bin-domain frame, shared by the jitted encode and
decode paths. All geometry is static from `ModemConfig` (BASELINE.json:10
"Full GF3 standard frame").
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ModemConfig, layout

__all__ = [
    "data_symbols_from_bits",
    "frame_bin_matrix",
    "bits_from_llr_layout",
    "interleave_pilots",
    "split_pilots",
]


def interleave_pilots(cfg: ModemConfig, dsym: jnp.ndarray) -> jnp.ndarray:
    """Data symbols (..., n_data_bins) + class-standard pilots → (..., n_used).

    Strided layout (cfg.strided_pilots, the standard presets): the used band
    viewed as (n_pilots, spacing) groups, pilot at slot 0 of each group —
    pure reshape/concat, no scatter (TPU gathers/scatters are per-element
    loops). Falls back to scatter for irregular layouts.
    """
    lay = layout(cfg)
    *lead, _ = dsym.shape
    if cfg.strided_pilots:
        sp = cfg.pilot_spacing
        grp = dsym.reshape(*lead, cfg.n_pilots, sp - 1)
        pil = jnp.broadcast_to(
            jnp.asarray(lay.pilot_vals), (*lead, cfg.n_pilots))[..., None]
        return jnp.concatenate([pil, grp], axis=-1).reshape(*lead, cfg.n_used)
    out = jnp.zeros((*lead, cfg.n_used), dtype=jnp.complex64)
    out = out.at[..., jnp.asarray(lay.data_pos)].set(dsym)
    out = out.at[..., jnp.asarray(lay.pilot_pos)].set(jnp.asarray(lay.pilot_vals))
    return out


def split_pilots(cfg: ModemConfig, bins: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., n_used) → (pilot bins (..., n_pilots), data bins (..., n_data_bins)),
    the inverse of `interleave_pilots` (slice/reshape on strided layouts)."""
    lay = layout(cfg)
    if cfg.strided_pilots:
        *lead, _ = bins.shape
        grp = bins.reshape(*lead, cfg.n_pilots, cfg.pilot_spacing)
        return grp[..., 0], grp[..., 1:].reshape(*lead, cfg.n_data_bins)
    return (bins[..., jnp.asarray(lay.pilot_pos)],
            bins[..., jnp.asarray(lay.data_pos)])


def data_symbols_from_bits(cfg: ModemConfig, coded_bits: jnp.ndarray) -> jnp.ndarray:
    """Channel bits (..., raw_bits_per_frame) → data-symbol bins (..., D, n_used).

    Maps Gray QAM onto data positions and writes the class-standard pilot
    values on pilot positions (same pilots every symbol — the phase-tracking
    reference, SURVEY.md Appendix "Pilot phase tracking").
    """
    from ..ops.constellation import qam_map

    *lead, _ = coded_bits.shape
    grp = coded_bits.reshape(*lead, cfg.n_data_symbols, cfg.n_data_bins, cfg.bits_per_symbol)
    dsym = qam_map(grp, cfg.bits_per_symbol)
    return interleave_pilots(cfg, dsym)


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
