"""Matmul FFT: large transforms as MXU batched matmuls (four-step algorithm).

XLA's TPU FFT runs on the VPU at a fraction of a percent of peak — measured
36–47 ms per direction for (1024, 65536) transforms, which dominates the
whole receiver. The four-step factorization N = n1·n2 turns one length-N
FFT into n1-point and n2-point DFT *matmuls* with a twiddle in between:

    n = n1·a + b,  k = n2·c + d
    G[d, b] = Σ_a x[n1·a + b]·W_N2^{ad}          (DFT matmul over a)
    H[d, b] = G[d, b]·W_N^{bd}                    (twiddle, elementwise)
    X[n2·c + d] = Σ_b H[d, b]·W_N1^{cb}           (DFT matmul over b)

≈ 50× the FLOPs of Cooley–Tukey, but on the 128×128 systolic array — net
~5-10× faster for the sizes the sync path uses. float32 throughout; DFT and
twiddle matrices are host-precomputed float64 then cast (error ~1e-6 rel).

Used automatically by the sync path for power-of-two sizes ≥ 2^14 on TPU;
`jnp.fft` remains the reference/CPU path and the parity target.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fft_mm", "ifft_mm", "rfft_mm", "irfft_mm", "good_mm_size"]


def good_mm_size(n: int) -> bool:
    """Sizes the matmul INVERSE path beats the VPU FFT at: power of two,
    2^13 … 2^24 (measured at 8192 on v5e: irfft_mm 0.48 ms vs VPU 1.05 ms
    per (1024, 8192); the forward rfft stays on the VPU — 0.78 ms vs
    rfft_mm's 1.31 ms at the same shape)."""
    return n >= (1 << 13) and (n & (n - 1)) == 0 and n <= (1 << 24)


def _split(n: int) -> tuple[int, int]:
    """n = n1·n2 with both as close to √n (MXU-friendly 128..512)."""
    p = n.bit_length() - 1
    p1 = p // 2
    return 1 << p1, 1 << (p - p1)


@functools.lru_cache(maxsize=None)
def _tables(n: int):
    """Host NumPy constants (NEVER jnp here — lru_cache would capture
    tracers when first called inside a trace)."""
    n1, n2 = _split(n)
    a = np.arange(n2)
    b = np.arange(n1)
    c = np.arange(n1)
    d = np.arange(n2)
    W2 = np.exp(-2j * np.pi * np.outer(d, a) / n2).astype(np.complex64)  # (n2, n2)
    W1t = np.exp(-2j * np.pi * np.outer(b, c) / n1).astype(np.complex64) # (n1, n1) = W1ᵀ
    T = np.exp(-2j * np.pi * np.outer(d, b) / n).astype(np.complex64)    # (n2, n1)
    return n1, n2, W2, W1t, T


def fft_mm(x: jnp.ndarray, n: int,
           precision: jax.lax.Precision | None = None,
           n_out: int | None = None) -> jnp.ndarray:
    """Forward complex FFT of length n (power of two ≥ 2^14) over the last
    axis via two MXU matmul stages. x: (..., m) complex64, zero-padded or
    truncated to n. Output index k = n2·c + d is returned as the (..., d, c)
    matrix transposed — both matmuls are in natural (no-relayout) form.

    `precision` trades matmul passes for error (measured per-element rel):
    HIGHEST (default, f32/bf16x6) ~1e-6; HIGH (bf16x3) ~1e-5; DEFAULT (one
    bf16 pass) ~4e-3 (−45 dB) — pick per consumer: the demod-facing window
    extraction wants ≥HIGH, a peak-picked matched filter tolerates DEFAULT.

    `n_out` prunes the transform to outputs k < n_out (rounded up to a
    whole n2-column): k = n2·c + d means a prefix of k is a prefix of c
    columns of the FINAL matmul, so a consumer that reads only the first
    lags (the bounded-sync matched filter) skips most of the second stage
    and its output writes. Returns (..., roundup(n_out, n2)) then.
    """
    n1, n2, W2, W1t, T = _tables(n)
    *lead, m = x.shape
    if m < n:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, n - m)])
    elif m > n:
        x = x[..., :n]
    xr = x.reshape(*lead, n2, n1)                           # [a, b] = x[n1·a+b]
    hi = jax.lax.Precision.HIGHEST if precision is None else precision
    G = jnp.matmul(jnp.asarray(W2), xr, precision=hi)       # (..., d, b)
    H = G * jnp.asarray(T)
    cmax = n1 if n_out is None else min(n1, -(-n_out // n2))
    X = jnp.matmul(H, jnp.asarray(W1t[:, :cmax]), precision=hi)  # (..., d, c)
    return jnp.swapaxes(X, -1, -2).reshape(*lead, cmax * n2)  # k = n2·c + d


def ifft_mm(X: jnp.ndarray, n: int,
            precision: jax.lax.Precision | None = None,
            n_out: int | None = None) -> jnp.ndarray:
    """Inverse complex FFT: conj∘fft∘conj / n (`n_out` as in `fft_mm`)."""
    return jnp.conj(fft_mm(jnp.conj(X), n, precision, n_out)) / n


def rfft_mm(x: jnp.ndarray, n: int,
            precision: jax.lax.Precision | None = None) -> jnp.ndarray:
    """Real→half-spectrum FFT of length n over the last axis.

    Packs even/odd samples into one complex sequence of length n/2 (the
    standard real-FFT trick) so the matmul work is halved versus a zero-imag
    complex transform.
    """
    *lead, m = x.shape
    if m < n:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, n - m)])
    elif m > n:
        x = x[..., :n]
    h = n // 2
    # even/odd pack as a dtype VIEW: [re0, im0, re1, im1, ...] is exactly the
    # complex64 memory layout, so no (..., h, 2)-shaped f32 temporary is
    # materialized (its minor dim of 2 pads to 128 lanes on TPU — a 64×
    # memory blowup that OOMed real compiles)
    z = x.view(jnp.complex64)                               # (..., n/2)
    Z = fft_mm(z, h, precision)
    Zf = jnp.concatenate([Z, Z[..., :1]], axis=-1)          # Z[k], k=0..h
    Zr = jnp.concatenate([Z[..., :1], Z[..., :0:-1], Z[..., :1]],
                         axis=-1)                           # Z[(h−k) mod h], k=0..h
    Xe = 0.5 * (Zf + jnp.conj(Zr))
    Xo = -0.5j * (Zf - jnp.conj(Zr))
    k = np.arange(h + 1)
    w = jnp.asarray(np.exp(-2j * np.pi * k / n).astype(np.complex64))
    return (Xe + w * Xo).astype(jnp.complex64)              # (..., n/2+1)


def irfft_mm(R: jnp.ndarray, n: int,
             precision: jax.lax.Precision | None = None,
             n_out: int | None = None) -> jnp.ndarray:
    """Half-spectrum → real inverse FFT of length n (inverse of rfft_mm).

    Untangles the half spectrum back into the length-n/2 complex transform
    of the packed even/odd sequence and inverts that — half the matmul work
    of a full-length complex inverse. `n_out` computes only the first
    outputs (rounded up to the four-step's column granularity ×2): packed
    complex sample j carries real samples 2j and 2j+1, so a real-output
    prefix is a packed-output prefix.
    """
    h = n // 2
    Xf = R[..., :h]                                         # X[k], k=0..n/2−1
    Xr = jnp.conj(R[..., h:0:-1])                           # X*[n/2−k] = X[k+n/2]… via symmetry
    k = np.arange(h)
    w = jnp.asarray(np.exp(2j * np.pi * k / n).astype(np.complex64))
    Ze = 0.5 * (Xf + Xr)
    Zo = 0.5 * w * (Xf - Xr)
    Z = Ze + 1j * Zo                                        # fft of packed seq
    z = ifft_mm(Z, h, precision,
                None if n_out is None else -(-n_out // 2))
    *lead, _ = z.shape
    # interleave via dtype view (see rfft_mm): complex64 memory IS the
    # interleaved (re, im) float stream
    return z.view(jnp.float32)                              # (..., ≥n_out)