"""Channel estimation + equalization (reference L5, SURVEY.md §2).

LS estimate, one-tap FD EQ, and pilot phase/SFO tracking as fused batched
complex arithmetic (BASELINE.json north-star: "pilot-based least-squares
channel estimation and one-tap frequency-domain equalization fuse into a
single complex-arithmetic kernel") — here expressed as jnp ops XLA fuses;
a hand-fused Pallas variant lives in `gf3x.ops.pallas.equalize`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModemConfig, layout

__all__ = ["estimate_channel", "equalize", "pilot_phase_correct",
           "denoise_projection", "isi_profile"]

import functools


@functools.lru_cache(maxsize=None)
def denoise_projection(cfg: ModemConfig) -> np.ndarray:
    """Host projection matrix P (n_used × n_used) complex64 onto the
    subspace of channels with ≤ cfg.est_taps time-domain taps.

    The raw LS Ĥ has independent per-bin noise; a physical channel inside
    the cyclic prefix spans ≤ cp taps, so H_used = W h with
    W[k,t] = e^{-2πi·k·t/N} over the used band. P = W (WᴴW)⁻¹ Wᴴ is the
    least-squares projector: Ĥ' = P Ĥ keeps the channel exactly (when it
    fits in the taps) and cuts estimator noise by ≈ n_used/taps
    (SURVEY.md:132's impulse-response-domain estimate refinement).
    """
    taps = cfg.est_taps
    assert taps > 0
    k = np.arange(cfg.bin_lo, cfg.bin_hi + 1, dtype=np.float64)
    t = np.arange(taps, dtype=np.float64)
    W = np.exp(-2j * np.pi * np.outer(k, t) / cfg.n_fft)
    G = W.conj().T @ W + 1e-9 * np.eye(taps)
    P = W @ np.linalg.solve(G, W.conj().T)
    return P.astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _isi_operator(cfg: ModemConfig):
    """Host tables of the beyond-CP ISI measure: (M, q, t0) — or None when
    the config's geometry leaves no measurable tail window.

    The used-band LS Ĥ of a channel longer than the receiver's timing
    budget carries the tail's response: fit the RAW Ĥ exactly with an
    n_used-tap impulse response (square regularized LS on the band-limited
    DFT submatrix), recenter the bulk delay to tap t0, and read the energy
    at taps beyond t0 + (cp − backoff) — arrivals the cut window cannot
    cover, i.e. inter-symbol interference. M = W[:, tail]·W⁻¹[tail, :] maps
    Ĥ to the tail's per-bin response in one (U×U) matmul; q[k] = Σ_j|M_kj|²
    is the per-bin noise gain used to subtract the estimator-noise share
    (white Ĥ noise of variance σ² contributes σ²·q[k] to |{MĤ}(k)|²)."""
    U, N, cp = cfg.n_used, cfg.n_fft, cfg.cp
    t0 = min(16, U // 8)
    safe = t0 + cp - cp // 4
    if safe >= U - 4:
        return None                       # tail window empty: nothing to see
    k = np.arange(cfg.bin_lo, cfg.bin_hi + 1, dtype=np.float64)
    t = np.arange(U, dtype=np.float64)
    W = np.exp(-2j * np.pi * np.outer(k, t) / N)
    G = W.conj().T @ W + 1e-6 * U * np.eye(U)
    Winv = np.linalg.solve(G, W.conj().T)
    tail = np.arange(U) >= safe
    M = (W[:, tail] @ Winv[tail, :]).astype(np.complex64)
    q = np.sum(np.abs(M) ** 2, axis=1).astype(np.float32)
    return M, q, t0


def isi_profile(cfg: ModemConfig, H_raw: jnp.ndarray, noise_var: jnp.ndarray):
    """Beyond-CP ISI floor from the RAW LS Ĥ (SURVEY.md §6.3; VERDICT r4
    weak #4): (isi_var (..., n_used) f32 — per-bin tail-response power, an
    additive noise-floor term in the same units as `noise_var` — and
    isi_ratio (...,) f32 — tail/total channel energy, the scalar room
    honesty figure; both exact zeros when the geometry has no tail window).

    Uses the raw (pre-denoise) Ĥ: the denoiser projects onto ≤ est_taps
    taps and would erase exactly the energy this measures. The estimator-
    noise share (σ̂²/K through the tail operator's per-bin gain) is
    subtracted, so on an AWGN channel the profile reads ≈ 0 instead of
    echoing the noise floor."""
    op = _isi_operator(cfg)
    if op is None:
        z = jnp.zeros(H_raw.shape[:-1] + (cfg.n_used,), jnp.float32)
        return z, jnp.zeros(H_raw.shape[:-1], jnp.float32)
    M, q, t0 = op
    k = jnp.arange(cfg.bin_lo, cfg.bin_hi + 1, dtype=jnp.float32)
    inc = H_raw[..., 1:] * jnp.conj(H_raw[..., :-1])
    a = jnp.angle(jnp.sum(inc, axis=-1))
    s_hat = jnp.round(-a * np.float32(cfg.n_fft / (2.0 * np.pi)))
    r0 = (s_hat - t0)[..., None]
    ang = jnp.float32(2.0 * np.pi / cfg.n_fft) * k * r0
    ramp = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    Ht = (H_raw * ramp) @ jnp.asarray(M).T
    sigH2 = (noise_var / np.float32(cfg.n_known_symbols))[..., None]
    isi = jnp.maximum(jnp.abs(Ht) ** 2 - sigH2 * jnp.asarray(q), 0.0)
    num = jnp.mean(isi, axis=-1)
    den = jnp.mean(jnp.abs(H_raw) ** 2, axis=-1)
    return isi.astype(jnp.float32), (num / jnp.maximum(den, 1e-12)
                                     ).astype(jnp.float32)


def estimate_channel(cfg: ModemConfig, known_rx: jnp.ndarray, delta=None,
                     with_isi: bool = False):
    """LS: Ĥ[k] = mean_r(Y_r[k]/X_r[k]); scalar residual noise variance.

    known_rx: (..., K, n_used) complex64 → (Ĥ (..., n_used), noise_var (...,)),
    plus (isi_var, isi_ratio) from `isi_profile` of the RAW Ĥ when
    `with_isi` (the raw estimate only exists inside this function — the
    returned Ĥ is denoised, which erases the tail the profile measures).
    SURVEY.md Appendix "LS channel estimate".

    `delta` (traced scalar clock offset) derotates each known symbol's
    SFO-induced phase ramp before averaging: symbol r drifts δ·r·symbol_len
    samples relative to symbol 0, i.e. a per-bin ramp 2πk·δ·r·L/N that at
    |δ| ≳ 500 ppm spreads top-bin phases over >π and collapses |Ĥ| —
    without this the clock-offset correction loop still loses the frame.
    """
    lay = layout(cfg)
    X = jnp.asarray(lay.known_syms)                      # (K, n_used) complex64
    if delta is not None:
        k = jnp.arange(cfg.bin_lo, cfg.bin_hi + 1, dtype=jnp.float32)[None, :]
        r = jnp.arange(cfg.n_known_symbols, dtype=jnp.float32)[:, None]
        ang = jnp.float32(-2.0 * np.pi / cfg.n_fft) * k * (delta * cfg.symbol_len) * r
        known_rx = known_rx * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    ratio = known_rx / X
    H = jnp.mean(ratio, axis=-2)
    # noise_var from the RAW residual (before denoising): a conservative
    # post-EQ noise figure for the LLR scaling
    resid = known_rx - H[..., None, :] * X
    noise_var = jnp.mean(jnp.abs(resid) ** 2, axis=(-2, -1))
    isi = isi_profile(cfg, H, noise_var) if with_isi else None
    if cfg.est_taps:
        # Recenter the bulk delay before projecting: a window cut s samples
        # before the impulse response puts the IR at tap s, and taps beyond
        # est_taps would be TRUNCATED (measured: SC-sync timing error plus
        # the cp//4 backoff pushed the IR past the window and produced
        # garbage Ĥ). Estimate s from the adjacent-bin phase slope of Ĥ,
        # shift the IR to tap est_taps//4 (headroom for fit noise /
        # pre-cursors), project, shift back — all elementwise + one matmul.
        k = jnp.arange(cfg.bin_lo, cfg.bin_hi + 1, dtype=jnp.float32)
        inc = H[..., 1:] * jnp.conj(H[..., :-1])
        a = jnp.angle(jnp.sum(inc, axis=-1))             # ≈ −2πs/N, (...,)
        s_hat = jnp.round(-a * np.float32(cfg.n_fft / (2.0 * np.pi)))
        r0 = (s_hat - cfg.est_taps // 4)[..., None]      # (..., 1)
        ang = jnp.float32(2.0 * np.pi / cfg.n_fft) * k * r0
        ramp = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        P = jnp.asarray(denoise_projection(cfg))
        H = ((H * ramp) @ P.T) * jnp.conj(ramp)          # Ĥ'[j] = Σ_k P[j,k]·Ĥ[k]
    if with_isi:
        return H, noise_var, isi
    return H, noise_var


def equalize(H: jnp.ndarray, data_rx: jnp.ndarray) -> jnp.ndarray:
    """One-tap FD EQ X̂ = Y/Ĥ. data_rx: (..., D, n_used), H: (..., n_used)."""
    return data_rx / H[..., None, :]


def pilot_phase_correct(cfg: ModemConfig, eq: jnp.ndarray,
                        H: jnp.ndarray | None = None):
    """Residual timing-drift/phase correction from pilot phase slopes.

    Per data symbol fit ∠(X̂_p·p*) ≈ a·k + b (SURVEY.md Appendix "Pilot
    phase tracking"): slope from adjacent-pilot phase increments (no
    unwrapping), intercept from the slope-compensated pilot sum. Returns
    (corrected (..., D, n_used), slope (..., D), intercept (..., D)).

    Pass Ĥ to CSI-weight the fit: post-EQ pilots in a deep notch carry
    noise amplified by 1/|H| (measured: a 19-bin notch made 50×-amplified
    garbage pilots DOMINATE the unweighted fit and rotate whole symbols).
    Weighting z by |H_p|² is equivalent to fitting on the pre-EQ values
    Y_p·conj(Ĥ·p) — scale-invariant on flat channels.
    """
    from ..models.frame import split_pilots

    lay = layout(cfg)
    if cfg.n_pilots < 2:
        zeros = jnp.zeros(eq.shape[:-1], dtype=jnp.float32)
        return eq, zeros, zeros
    pvals = jnp.asarray(lay.pilot_vals)
    pil, _ = split_pilots(cfg, eq)
    z = pil * jnp.conj(pvals)                            # (..., D, P)
    if H is not None:
        w, _ = split_pilots(cfg, jnp.abs(H) ** 2)        # (..., P)
        z = z * w[..., None, :]
    mean_dk = np.float32(np.mean(np.diff(lay.pilot_pos.astype(np.float64))))
    inc = z[..., 1:] * jnp.conj(z[..., :-1])
    a = jnp.angle(jnp.sum(inc, axis=-1)) / mean_dk       # coarse, (..., D)
    k = jnp.asarray(lay.pilot_pos.astype(np.float32))
    # baseline ladder (see the golden twin): each refinement stays within
    # the previous stage's ±π/baseline ambiguity range
    P = cfg.n_pilots
    kp = lay.pilot_pos.astype(np.float64)
    for Q in sorted({max(2, P // 8), P // 2}):
        if not 1 <= Q < P:           # degenerate pilot counts (P == 2)
            continue
        zd = z * jnp.exp(-1j * a[..., None] * k)
        corr = jnp.sum(zd[..., Q:] * jnp.conj(zd[..., :-Q]), axis=-1)
        base = np.float32(np.mean(kp[Q:] - kp[:-Q]))
        a = a + jnp.angle(corr) / base
    b = jnp.angle(jnp.sum(z * jnp.exp(-1j * a[..., None] * k), axis=-1))
    kk = jnp.arange(cfg.n_used, dtype=jnp.float32)
    corr = jnp.exp(-1j * (a[..., None] * kk + b[..., None]))
    return eq * corr, a, b
