"""Pallas TPU kernel: fused one-tap EQ + pilot phase tracking + QAM demap.

BASELINE.json's north star names this fusion explicitly: "pilot-based
least-squares channel estimation and one-tap frequency-domain equalization
fuse into a single complex-arithmetic kernel". The LS estimate itself is a
tiny mean over K known symbols (left to XLA); everything per *data* symbol —
complex EQ, pilot-slope/CPE regression, derotation, max-log LLRs, EVM —
happens here in one VMEM pass per (symbol, lane-block), instead of ~15
separate XLA ops streaming the symbol matrix through HBM.

Complex numbers are (re, im) float32 planes (pallas TPU has no complex
dtype); `atan2` is not lowered by Mosaic, so it is implemented inline
(odd minimax polynomial + quadrant fixup, |err| < 1e-4 rad — far below the
phase-tracking noise floor).

Layouts: lanes carry the frame batch (128 per grid step), sublanes carry
bins. LLR rows are emitted PLANE-MAJOR over ALL used bins — row
p·n_used + k is bit-plane p (I-axis bits then Q-axis) of used bin k,
pilot rows zeroed via the sign plane — NOT bin-major over data bins.
Rationale (measured r4, B=1024): the bin-major layout needed two sublane
shuffles per symbol (compact pilot rows out: (P,sp,L)[:,1:] reshape;
interleave the 2m bit planes: stack+reshape) costing 0.47 ms of the
1.03 ms kernel — Mosaic lowers both to long vreg-permute chains. The
plane layout is shuffle-free in VMEM; the FEC epilogue folds the static
row permutation (`stream_row_perm`) into its existing gather/transpose
for ~free (XLA fuses an indexed read into the relayout it already does).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import ModemConfig, layout
from ..constellation import pam_label_levels, qam_norm

__all__ = ["fused_eq_demap_tpu", "fused_shapes_ok", "stream_row_perm",
           "plane_rows", "LANES"]

LANES = 128


def plane_rows(cfg: ModemConfig) -> int:
    """Padded LLR row count of the plane-major kernel output: 2m bit-planes
    × n_used bins (pilot rows included, zeroed), rounded up to sublanes."""
    return -(-cfg.n_used * cfg.bits_per_symbol // 8) * 8


def stream_row_perm(cfg: ModemConfig) -> np.ndarray:
    """Static row permutation from the kernel's plane-major layout to the
    per-symbol bin-major bit order the frame schema uses: entry ρ (stream
    bit k_data·bps + j, I-axis bits first per bin — the `qam_demap_llr`
    order) is the plane-layout row j·n_used + data_pos[k_data]."""
    lay = layout(cfg)
    bps = cfg.bits_per_symbol
    j = np.arange(bps, dtype=np.int64)
    return (j[None, :] * cfg.n_used
            + lay.data_pos.astype(np.int64)[:, None]).reshape(-1)


def _chunk_divisor(cfg: ModemConfig, LP: int) -> int:
    """Largest divisor of D (symbols per grid step) whose scoped-VMEM
    footprint fits the 16 MB v5e stack. The footprint model (calibrated on
    hardware via tools/tpu_parity.py probes): double-buffered in/out
    windows + the unrolled body's live vectors — per symbol
    2·(2·n_used + LP + 8) window floats plus ~(2m+3)·n_used running demap
    vectors (the plane layout demaps every used bin) plus ~2·LP for the
    plane stack — times 128 lanes, within a 12 MB budget (XLA also scopes
    the custom call's sub-16-MiB full operands, ~3 MB at GF3 geometry).
    Gives dc=4 at QPSK, 2 at 16-QAM; 0 when even one symbol exceeds the
    budget (route to the XLA twin)."""
    m = cfg.bits_per_symbol // 2
    per_sym = (2 * (2 * cfg.n_used + LP + 8)
               + (2 * m + 3) * cfg.n_used + 2 * LP) * LANES * 4
    D = cfg.n_data_symbols
    return max((d for d in range(1, D + 1)
                if D % d == 0 and d * per_sym <= (12 << 20)), default=0)


def fused_shapes_ok(cfg: ModemConfig, B: int) -> bool:
    """Whether the fused kernel is safe + worthwhile at batch B.

    XLA places a custom call's operand/result buffers in scoped VMEM when
    they fall under a per-buffer size threshold (observed on v5e: a 30 MB
    64-QAM LLR output was scoped — and OOMed the 16 MB scoped limit — while
    the 40.6 MB QPSK-at-B=1024 one was not, consistent with a 32 MiB cut).
    Keep the kernel only when the buffers XLA might scope (anything under
    32 MiB) sum to well within the 16 MB limit; otherwise
    route to the XLA twin — which is also the faster path at tiny batches,
    where padding to 128 lanes wastes almost the whole kernel.

    Also requires ≥2 pilots (the in-kernel slope regression is meaningless
    below that — degenerate configs take the XLA twin, whose
    `pilot_phase_correct` no-ops cleanly) and a valid symbol-chunk divisor
    (`_chunk_divisor`; an unguarded search raised on very wide configs).

    64-QAM is routed to the XLA twin: its kernel compiles to a 21–23 MB
    scoped-VMEM stack on v5e (> the 16 MB limit) that neither symbol
    chunking, a leaner demap, nor a plane-major emission brought under
    budget (measured via tools/tpu_parity.py probes; r2's kernel had the
    same overflow but was never executed at 64-QAM on hardware).
    """
    if cfg.n_pilots < 2 or cfg.bits_per_symbol >= 6:
        return False
    LP = plane_rows(cfg)
    if _chunk_divisor(cfg, LP) == 0:
        return False
    Bp = -(-B // LANES) * LANES
    D, U = cfg.n_data_symbols, cfg.n_used
    bufs = [
        D * 2 * U * Bp * 4,        # y_ri
        2 * U * Bp * 4,            # h_ri
        8 * Bp * 4,                # nv
        2 * cfg.n_pilots * 4,      # pilot values
        D * LP * 4,                # descrambler sign plane
        D * LP * Bp * 4,           # llr out
        D * 8 * Bp * 4,            # diag out
    ]
    maybe_scoped = sum(b for b in bufs if b < (32 << 20))
    return maybe_scoped <= (8 << 20)


def _atan2(y, x):
    """Elementwise atan2 for the VPU (Mosaic has no atan2 primitive).

    atan(t) on [0,1] via an odd minimax polynomial, then octant fixup.
    """
    ax, ay = jnp.abs(x), jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    s = t * t
    # minimax for atan(t)/t on [0,1], max err ~1e-5 rad
    p = 0.0208351
    p = p * s - 0.085133
    p = p * s + 0.180141
    p = p * s - 0.3302995
    p = p * s + 0.999866
    r = t * p
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _make_kernel(cfg: ModemConfig, LP: int):
    lay = layout(cfg)
    n_used, n_pil, sp = cfg.n_used, cfg.n_pilots, cfg.pilot_spacing
    bps = cfg.bits_per_symbol
    m = bps // 2
    lv = [float(v) for v in pam_label_levels(m) * qam_norm(bps)]  # by label int
    mean_dk = np.float32(np.mean(np.diff(lay.pilot_pos.astype(np.float64))))
    _kp = lay.pilot_pos.astype(np.float64)
    ladder = [
        (Q, float(np.mean(_kp[Q:] - _kp[:-Q])))
        for Q in sorted({max(2, cfg.n_pilots // 8), cfg.n_pilots // 2})
        if 1 <= Q < cfg.n_pilots     # degenerate pilot counts (P == 2)
    ]
    n_data = cfg.n_data_bins

    def kernel(y_ref, h_ref, nv_ref, pv_ref, sign_ref, llr_ref, diag_ref):
        # static index ramps (pallas kernels cannot close over arrays;
        # tpu.iota is integer-only — cast after)
        kpil = (jax.lax.broadcasted_iota(jnp.int32, (n_pil, 1), 0)
                .astype(jnp.float32) * jnp.float32(sp))           # pilot_offset=0
        kki = jax.lax.broadcasted_iota(jnp.int32, (n_used, 1), 0)
        kk = kki.astype(jnp.float32)
        # 0.0 on pilot rows, 1.0 on data rows (pilot_offset=0): gates the
        # EVM mean now that every used bin is demapped
        dmask = jnp.where(kki % sp == 0, 0.0, 1.0).astype(jnp.float32)
        pvr = pv_ref[0]                                           # (P, 1)
        pvi = pv_ref[1]
        # several data symbols per grid step (static unroll): one-symbol
        # blocks measured ~5 µs of per-step pipeline overhead × 160 steps —
        # chunking cut the kernel 0.85 → ~0.4 ms at B=1024
        for s in range(y_ref.shape[0]):
            _one_symbol(y_ref[s, 0], y_ref[s, 1], h_ref, nv_ref, pvr, pvi,
                        kpil, kk, dmask, sign_ref, llr_ref, diag_ref, s)

    def _one_symbol(yr, yi, h_ref, nv_ref, pvr, pvi, kpil, kk, dmask,
                    sign_ref, llr_ref, diag_ref, s):
        hr, hi = h_ref[0], h_ref[1]
        h2 = hr * hr + hi * hi
        inv = 1.0 / jnp.maximum(h2, 1e-12)
        er = (yr * hr + yi * hi) * inv                            # eq = Y·H*/|H|²
        ei = (yi * hr - yr * hi) * inv

        # ---- pilot phase regression (slope a, intercept b), CSI-weighted:
        # z = X̂_p·p*·|H_p|² — equivalent to fitting on pre-EQ pilot values,
        # so notch bins (noise amplified 1/|H| by the EQ) cannot dominate
        err3 = er.reshape(n_pil, sp, LANES)
        eri3 = ei.reshape(n_pil, sp, LANES)
        pr, pi_ = err3[:, 0], eri3[:, 0]                          # (P, L)
        h2p = h2.reshape(n_pil, sp, LANES)[:, 0]                  # (P, L)
        zr = (pr * pvr + pi_ * pvi) * h2p
        zi = (pi_ * pvr - pr * pvi) * h2p
        ir = jnp.sum(zr[1:] * zr[:-1] + zi[1:] * zi[:-1], axis=0, keepdims=True)
        ii = jnp.sum(zi[1:] * zr[:-1] - zr[1:] * zi[:-1], axis=0, keepdims=True)
        a = _atan2(ii, ir) / mean_dk                              # coarse rad/bin
        # baseline ladder (matches the XLA twin): each refinement stays
        # within the previous stage's ±π/baseline ambiguity range
        for Q, base in ladder:
            ph0 = a * kpil                                        # (P, L)
            c0, s0 = jnp.cos(ph0), jnp.sin(ph0)
            zdr = zr * c0 + zi * s0                               # z·e^{-i a k}
            zdi = zi * c0 - zr * s0
            cr = jnp.sum(zdr[Q:] * zdr[:-Q] + zdi[Q:] * zdi[:-Q],
                         axis=0, keepdims=True)
            ci = jnp.sum(zdi[Q:] * zdr[:-Q] - zdr[Q:] * zdi[:-Q],
                         axis=0, keepdims=True)
            a = a + _atan2(ci, cr) / jnp.float32(base)
        ph = a * kpil                                             # (P, L)
        ca, sa = jnp.cos(ph), jnp.sin(ph)
        wr = jnp.sum(zr * ca + zi * sa, axis=0, keepdims=True)    # Σ z·e^{-iφ}
        wi = jnp.sum(zi * ca - zr * sa, axis=0, keepdims=True)
        b = _atan2(wi, wr)                                        # (1, L)

        # ---- derotate all used bins by e^{-i(a·k + b)}
        phase = a * kk + b                                        # (n_used, L)
        cp_, sp_ = jnp.cos(phase), jnp.sin(phase)
        er2 = er * cp_ + ei * sp_
        ei2 = ei * cp_ - er * sp_

        # ---- effective noise over ALL used bins (pilot rows are demapped
        # too — their LLR rows cost nothing extra on the VPU and the sign
        # plane zeroes them; compacting them out was the 0.47 ms shuffle)
        dr, di, h2d = er2, ei2, h2
        # per-symbol noise floor from the derotated pilots' CSI-weighted
        # residuals (twin of Modem._eq_body): σ̂² = Σ_p h²_p·|X̂_p − p|²/P
        pr2 = er2.reshape(n_pil, sp, LANES)[:, 0]
        pi2 = ei2.reshape(n_pil, sp, LANES)[:, 0]
        perr = (pr2 - pvr) ** 2 + (pi2 - pvi) ** 2                # (P, L)
        sig = jnp.sum(h2p * perr, axis=0, keepdims=True) / jnp.float32(n_pil)
        nv = jnp.maximum(nv_ref[0:1, :], sig)                     # (1, L)
        nv_eff = jnp.maximum(nv / jnp.maximum(h2d, 1e-12), 1e-12)
        inv_nv = 1.0 / nv_eff

        # ---- max-log demap per axis (static level set) + EVM.
        # Label-OUTER with running per-bit mins: each level's distance dies
        # after its iteration instead of all M distances staying live (the
        # precomputed-ds form held ~8 extra (n_data, L) vectors at 64-QAM,
        # which at dc>1 unroll blew the 16 MB scoped-VMEM stack on v5e —
        # caught by tools/tpu_parity.py). The minimum chains consume the
        # same operands in the same label order, so results are bit-equal.
        def axis(x):
            d0 = [None] * m
            d1 = [None] * m
            md = None
            for lbl, v in enumerate(lv):
                d = (x - v) ** 2
                for j in range(m):
                    if (lbl >> (m - 1 - j)) & 1:
                        d1[j] = d if d1[j] is None else jnp.minimum(d1[j], d)
                    else:
                        d0[j] = d if d0[j] is None else jnp.minimum(d0[j], d)
                md = d if md is None else jnp.minimum(md, d)
            outs = [(d1[j] - d0[j]) * inv_nv for j in range(m)]
            return outs, md

        lre, mdr = axis(dr)
        lim, mdi = axis(di)
        # plane-major rows: I-axis bit-planes then Q-axis, each over all
        # n_used bins (a sublane CONCAT — free — where the bin-major layout
        # needed a stack+reshape interleave). `stream_row_perm` maps these
        # rows back to the qam_demap_llr bit order downstream.
        llr = jnp.concatenate(lre + lim, axis=0)                  # (2m·n_used, L)
        pad = LP - n_used * bps
        if pad:
            llr = jnp.concatenate(
                [llr, jnp.zeros((pad, LANES), jnp.float32)], axis=0)
        # fold the channel-bit descrambler in: sign_ref[s] (LP, 1) is
        # (1 − 2·scramble) in this symbol's plane-row layout, ZERO on pilot
        # and pad rows — so the emitted LLRs are DESCRAMBLED and the
        # non-payload rows are exactly 0
        llr = llr * sign_ref[s]
        # demapper-confidence sum while the rows are VMEM-resident (saves
        # the XLA-side 40 MB re-read for mean_abs_llr; the ±1 signs leave
        # |llr| unchanged, pilot/pad rows contribute exact zeros)
        sumabs = jnp.sum(jnp.abs(llr), axis=0, keepdims=True)     # (1, L)
        llr_ref[s] = llr

        evm = (jnp.sum((mdr + mdi) * dmask, axis=0, keepdims=True)
               / jnp.float32(n_data))                             # (1, L)
        diag_ref[s] = jnp.concatenate(
            [a, b, evm, sumabs, jnp.zeros((4, LANES), jnp.float32)], axis=0)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 5))
def fused_eq_demap_tpu(cfg: ModemConfig, y_ri: jnp.ndarray, h_ri: jnp.ndarray,
                       nv: jnp.ndarray, sign: jnp.ndarray,
                       interpret: bool = False):
    """y_ri: (D, 2, n_used, B) data-symbol bins (re,im); h_ri: (2, n_used, B);
    nv: (8, B) noise variance in row 0; sign: (D, LP, 1) descrambler signs
    in the PLANE-MAJOR row layout (±1 on payload rows, 0.0 on pilot/pad
    rows — `Modem._sign_plane` builds it via `stream_row_perm`).
    B % 128 == 0.

    Returns (llr (D, LP, B) with LP = plane_rows(cfg) — row p·n_used + k is
    bit-plane p of used bin k, descrambled, pilot/pad rows exactly 0; the
    caller gathers `stream_row_perm` rows — and diag (D, 8, B): rows 0..3 =
    slope, cpe, evm, Σ|llr|).
    """
    D, _, n_used, B = y_ri.shape
    assert B % LANES == 0
    LP = plane_rows(cfg)
    assert sign.shape == (D, LP, 1), sign.shape
    kern = _make_kernel(cfg, LP)
    lay = layout(cfg)
    pv_ri = jnp.asarray(np.stack([
        lay.pilot_vals.real.astype(np.float32)[:, None],
        lay.pilot_vals.imag.astype(np.float32)[:, None],
    ]))                                                           # (2, P, 1)
    # symbols per grid step: the largest D divisor whose in+out blocks stay
    # within ~2 MB of VMEM (×2 for double buffering). `fused_shapes_ok`
    # routes configs with no valid divisor to the XLA twin before this runs;
    # a direct caller on such a config falls back to one symbol per step.
    dc = _chunk_divisor(cfg, LP) or 1
    grid = (D // dc, B // LANES)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((dc, 2, n_used, LANES), lambda d, g: (d, 0, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_used, LANES), lambda d, g: (0, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda d, g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, cfg.n_pilots, 1), lambda d, g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, LP, 1), lambda d, g: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((dc, LP, LANES), lambda d, g: (d, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, 8, LANES), lambda d, g: (d, 0, g),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, LP, B), jnp.float32),
            jax.ShapeDtypeStruct((D, 8, B), jnp.float32),
        ),
        interpret=interpret,
    )(y_ri, h_ri, nv, pv_ri, sign)
