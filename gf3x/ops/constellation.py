"""Symbol layer (reference L2, SURVEY.md §2): Gray QPSK/QAM map + max-log LLR demap.

Vectorized jnp ops — pure elementwise/gather work that XLA fuses into the
surrounding FFT/EQ pipeline (BASELINE.json north-star: "constellation
mapping/demapping ... run as vectorized int/complex ops"). Bit-for-bit the
same labeling as the golden model (`gf3x.golden.modem.qam_map`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["pam_label_levels", "qam_norm", "qam_map", "qam_demap_llr", "hard_bits"]


def pam_label_levels(m: int) -> np.ndarray:
    """Gray-coded PAM lookup (host constant): label int → amplitude.

    Identical construction to the golden model: level positions idx carry
    amplitudes (M−1)−2·idx and Gray label g = idx ^ (idx>>1), so the
    all-zeros label is the most positive level (QPSK → 1−2b).
    """
    M = 1 << m
    idx = np.arange(M)
    lut = np.empty(M, dtype=np.float32)
    lut[idx ^ (idx >> 1)] = (M - 1) - 2 * idx
    return lut


def qam_norm(bits_per_symbol: int) -> float:
    M = 1 << (bits_per_symbol // 2)
    return float(1.0 / np.sqrt(2.0 * (M * M - 1) / 3.0))


def qam_map(bits: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """(..., bits_per_symbol) bits → complex64 unit-power Gray QAM symbols."""
    m = bits_per_symbol // 2
    lut = jnp.asarray(pam_label_levels(m) * qam_norm(bits_per_symbol))
    w = jnp.asarray(1 << np.arange(m - 1, -1, -1), dtype=jnp.int32)
    b = bits.astype(jnp.int32)
    bi = jnp.sum(b[..., :m] * w, axis=-1)
    bq = jnp.sum(b[..., m:] * w, axis=-1)
    return jnp.take(lut, bi) + 1j * jnp.take(lut, bq)


def qam_demap_llr(y: jnp.ndarray, noise_var: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """Max-log LLRs, positive ⇒ bit 0. y: (...,) complex64; noise_var
    broadcastable to y.shape. Returns (..., bits_per_symbol) float32.

    Square QAM is separable: per-axis PAM distances over the (static, ≤8)
    level set — a small reduction XLA keeps on the VPU.
    """
    m = bits_per_symbol // 2
    M = 1 << m
    lv = jnp.asarray(pam_label_levels(m) * qam_norm(bits_per_symbol))  # (M,)
    bit_tbl = np.stack(
        [((np.arange(M) >> (m - 1 - j)) & 1).astype(np.bool_) for j in range(m)],
        axis=-1,
    )  # (M, m) host constant: bit_tbl[label, j] = j-th bit of label

    def axis_llr(x):
        d = (x[..., None] - lv) ** 2                         # (..., M)
        big = jnp.float32(1e30)
        outs = []
        for j in range(m):                                   # static unroll, m ≤ 3
            mask = jnp.asarray(bit_tbl[:, j])                # True where bit_j = 1
            d0 = jnp.min(jnp.where(mask, big, d), axis=-1)
            d1 = jnp.min(jnp.where(mask, d, big), axis=-1)
            outs.append(d1 - d0)
        return jnp.stack(outs, axis=-1)                      # (..., m)

    nv = jnp.maximum(noise_var, 1e-12).astype(jnp.float32)[..., None]
    lre = axis_llr(jnp.real(y)) / nv
    lim = axis_llr(jnp.imag(y)) / nv
    return jnp.concatenate([lre, lim], axis=-1)


def hard_bits(llr: jnp.ndarray) -> jnp.ndarray:
    """LLR convention: positive ⇒ bit 0, so hard bit = (llr < 0)."""
    return (llr < 0).astype(jnp.uint8)
