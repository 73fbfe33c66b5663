"""Pallas TPU kernels: the two-stage (split) EQ/demap tail for the
constellations the monolithic fused kernel cannot hold in VMEM.

The monolithic `fused_eq` kernel keeps EQ + pilot regression + derotation +
demap live per (symbol, lane-block); at 64-QAM its scoped-VMEM stack
measured 21–23 MB on v5e — over the 16 MB limit at ANY symbol chunking
(BASELINE.md r3/r4 measured non-lever notes), so `gf3-turbo` and every
bit-loaded config fell back to the ~15-op XLA tail (r4: 0.66–5.7 ms of
step time at hicap geometry). The split cuts the live state two ways:

- **Kernel A (`eq_track_tpu`)** — one-tap EQ, CSI-weighted pilot
  slope/CPE regression, derotation, and the per-symbol burst noise floor.
  Per-symbol state only (~6 used-band vectors); constellation-independent.
  Emits derotated equalized bins + (slope, cpe, nv_sym) diag rows.

- **Kernel B (`demap_bins_tpu`)** — max-log demap of the equalized bins,
  chunked over the BIN axis, which is embarrassingly parallel once
  derotation is done. Live state is (bps+3) chunk-width vectors, so even
  64-QAM's 8-level label-outer demap fits comfortably. Emits plane-major
  LLR rows (plane p of bin k at row p·U + k — the same row convention as
  the monolithic kernel, unpadded) with the descrambler sign folded in,
  plus accumulated Σ|llr| and EVM diag.

The intermediate (derotated equalized bins, 2·U floats/symbol/frame)
round-trips HBM once — the price of the split — but that is one dense
tensor against the XLA tail's ~15 separate passes.

Grid order note: kernel B's diag output accumulates across its symbol and
bin-chunk grid dims, so those are the FASTEST-varying dims (lanes
outermost): all visits to one lane-block's diag are consecutive and the
block stays VMEM-resident through its accumulation.
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
from .fused_eq import LANES, _atan2

__all__ = ["eq_track_tpu", "demap_bins_tpu", "split_shapes_ok",
           "split_chunks"]


def _make_eq_kernel(cfg: ModemConfig):
    """Kernel A body: `fused_eq._one_symbol` up through derotation + the
    per-symbol noise floor, demap excluded. Same math, same op order — the
    emitted equalized bins equal the monolithic kernel's internal er2/ei2
    bit for bit (shared `_atan2`, shared ladder constants)."""
    lay = layout(cfg)
    n_used, n_pil, sp = cfg.n_used, cfg.n_pilots, cfg.pilot_spacing
    mean_dk = np.float32(np.mean(np.diff(lay.pilot_pos.astype(np.float64))))
    _kp = lay.pilot_pos.astype(np.float64)
    ladder = [
        (Q, float(np.mean(_kp[Q:] - _kp[:-Q])))
        for Q in sorted({max(2, cfg.n_pilots // 8), cfg.n_pilots // 2})
        if 1 <= Q < cfg.n_pilots
    ]

    def kernel(y_ref, h_ref, nv_ref, pv_ref, eq_ref, diag_ref):
        kpil = (jax.lax.broadcasted_iota(jnp.int32, (n_pil, 1), 0)
                .astype(jnp.float32) * jnp.float32(sp))
        kk = (jax.lax.broadcasted_iota(jnp.int32, (n_used, 1), 0)
              .astype(jnp.float32))
        pvr, pvi = pv_ref[0], pv_ref[1]
        for s in range(y_ref.shape[0]):
            yr, yi = y_ref[s, 0], y_ref[s, 1]
            hr, hi = h_ref[0], h_ref[1]
            h2 = hr * hr + hi * hi
            inv = 1.0 / jnp.maximum(h2, 1e-12)
            er = (yr * hr + yi * hi) * inv
            ei = (yi * hr - yr * hi) * inv

            err3 = er.reshape(n_pil, sp, LANES)
            eri3 = ei.reshape(n_pil, sp, LANES)
            pr, pi_ = err3[:, 0], eri3[:, 0]
            h2p = h2.reshape(n_pil, sp, LANES)[:, 0]
            zr = (pr * pvr + pi_ * pvi) * h2p
            zi = (pi_ * pvr - pr * pvi) * h2p
            ir = jnp.sum(zr[1:] * zr[:-1] + zi[1:] * zi[:-1],
                         axis=0, keepdims=True)
            ii = jnp.sum(zi[1:] * zr[:-1] - zr[1:] * zi[:-1],
                         axis=0, keepdims=True)
            a = _atan2(ii, ir) / mean_dk
            for Q, base in ladder:
                ph0 = a * kpil
                c0, s0 = jnp.cos(ph0), jnp.sin(ph0)
                zdr = zr * c0 + zi * s0
                zdi = zi * c0 - zr * s0
                cr = jnp.sum(zdr[Q:] * zdr[:-Q] + zdi[Q:] * zdi[:-Q],
                             axis=0, keepdims=True)
                ci = jnp.sum(zdi[Q:] * zdr[:-Q] - zdr[Q:] * zdi[:-Q],
                             axis=0, keepdims=True)
                a = a + _atan2(ci, cr) / jnp.float32(base)
            ph = a * kpil
            ca, sa = jnp.cos(ph), jnp.sin(ph)
            wr = jnp.sum(zr * ca + zi * sa, axis=0, keepdims=True)
            wi = jnp.sum(zi * ca - zr * sa, axis=0, keepdims=True)
            b = _atan2(wi, wr)

            phase = a * kk + b
            cp_, sp_ = jnp.cos(phase), jnp.sin(phase)
            er2 = er * cp_ + ei * sp_
            ei2 = ei * cp_ - er * sp_

            pr2 = er2.reshape(n_pil, sp, LANES)[:, 0]
            pi2 = ei2.reshape(n_pil, sp, LANES)[:, 0]
            perr = (pr2 - pvr) ** 2 + (pi2 - pvi) ** 2
            sig = (jnp.sum(h2p * perr, axis=0, keepdims=True)
                   / jnp.float32(n_pil))
            nv = jnp.maximum(nv_ref[0:1, :], sig)

            eq_ref[s, 0] = er2
            eq_ref[s, 1] = ei2
            diag_ref[s] = jnp.concatenate(
                [a, b, nv, jnp.zeros((5, LANES), jnp.float32)], axis=0)

    return kernel


def _eq_chunk_divisor(cfg: ModemConfig) -> int:
    """Symbols per grid step for kernel A: largest divisor of D whose
    double-buffered in/out windows + live vectors fit a 10 MB budget —
    per symbol ~2·(2U in + 2U out + 8) window floats + ~10U live vectors,
    × 128 lanes × 4 B."""
    U, D = cfg.n_used, cfg.n_data_symbols
    per_sym = (2 * (4 * U + 8) + 10 * U) * LANES * 4
    return max((d for d in range(1, D + 1)
                if D % d == 0 and d * per_sym <= (10 << 20)), default=0)


@functools.partial(jax.jit, static_argnums=(0, 4))
def eq_track_tpu(cfg: ModemConfig, y_ri: jnp.ndarray, h_ri: jnp.ndarray,
                 nv: jnp.ndarray, interpret: bool = False):
    """Kernel A. y_ri: (D, 2, n_used, B); h_ri: (2, n_used, B); nv: (8, B)
    with the LS noise floor in row 0. B % 128 == 0.

    Returns (eq (D, 2, n_used, B) — derotated equalized bins — and
    diag (D, 8, B): rows 0..2 = pilot slope a, CPE b, per-symbol noise
    floor max(nv, sig)).
    """
    D, _, n_used, B = y_ri.shape
    assert B % LANES == 0
    lay = layout(cfg)
    pv_ri = jnp.asarray(np.stack([
        lay.pilot_vals.real.astype(np.float32)[:, None],
        lay.pilot_vals.imag.astype(np.float32)[:, None],
    ]))
    dc = _eq_chunk_divisor(cfg) or 1
    grid = (D // dc, B // LANES)
    return pl.pallas_call(
        _make_eq_kernel(cfg),
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
        ],
        out_specs=(
            pl.BlockSpec((dc, 2, n_used, LANES), lambda d, g: (d, 0, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dc, 8, LANES), lambda d, g: (d, 0, g),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, 2, n_used, B), jnp.float32),
            jax.ShapeDtypeStruct((D, 8, B), jnp.float32),
        ),
        interpret=interpret,
    )(y_ri, h_ri, nv, pv_ri)


def _make_demap_kernel(bps: int, U: int, CH: int, sp: int, inv_gain: float,
                       pilots_strided: bool):
    """Kernel B body for one (dcb symbols × CH bins × LANES lanes) block.

    `sp` masks pilot bins out of the EVM sum when `pilots_strided` (the
    uniform-constellation case demaps every used bin and lets the sign
    plane zero pilot rows); group-compacted (bit-loaded) calls carry data
    bins only and mask nothing. `inv_gain` undoes the loading TX boost
    (1.0 for uniform)."""
    m = bps // 2
    lv = [float(v) for v in pam_label_levels(m) * qam_norm(bps)]

    def kernel(eq_ref, h_ref, dA_ref, sign_ref, llr_ref, dB_ref):
        di = pl.program_id(1)         # symbol group (lanes dim 0 outermost
        c = pl.program_id(2)          # bin chunk     — see module note)
        first = jnp.logical_and(di == 0, c == 0)
        kk = (jax.lax.broadcasted_iota(jnp.int32, (CH, 1), 0)
              + c * CH)                                    # global bin index
        if pilots_strided:
            dmask = jnp.where(kk % sp == 0, 0.0, 1.0).astype(jnp.float32)
        else:
            dmask = jnp.where(kk < U, 1.0, 0.0).astype(jnp.float32)
        evm_acc = jnp.zeros((1, LANES), jnp.float32)
        abs_acc = jnp.zeros((1, LANES), jnp.float32)
        for s in range(eq_ref.shape[0]):
            hr, hi = h_ref[0], h_ref[1]
            h2 = hr * hr + hi * hi
            nv_sym = dA_ref[s, 2:3, :]                     # (1, L)
            nv_eff = jnp.maximum(nv_sym / jnp.maximum(h2, 1e-12), 1e-12)
            # loading: demap on y/g with noise nv/g² (loaded_demap_llr's
            # twin; g = TX power boost, inv_gain = 1/g, 1.0 when uniform)
            inv_nv = 1.0 / (nv_eff * jnp.float32(inv_gain * inv_gain))
            dr = eq_ref[s, 0] * jnp.float32(inv_gain)
            di_ = eq_ref[s, 1] * jnp.float32(inv_gain)

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
                return [(d1[j] - d0[j]) * inv_nv for j in range(m)], md

            lre, mdr = axis(dr)
            lim, mdi = axis(di_)
            llr = jnp.concatenate(lre + lim, axis=0)       # (bps·CH, L)
            llr = llr.reshape(bps, CH, LANES) * sign_ref[s]
            llr_ref[s] = llr
            abs_acc = abs_acc + jnp.sum(
                jnp.abs(llr).reshape(bps * CH, LANES), axis=0, keepdims=True)
            evm_acc = evm_acc + jnp.sum((mdr + mdi) * dmask,
                                        axis=0, keepdims=True)
        row = jnp.concatenate(
            [evm_acc, abs_acc, jnp.zeros((6, LANES), jnp.float32)], axis=0)

        @pl.when(first)
        def _init():
            dB_ref[...] = row

        @pl.when(jnp.logical_not(first))
        def _acc():
            dB_ref[...] = dB_ref[...] + row

    return kernel


def split_chunks(cfg_U: int, bps: int, D: int) -> tuple[int, int]:
    """(dcb symbols, CH bins) per kernel-B grid step: CH divides U (and is
    a multiple of 8), dcb divides D; chosen to keep the double-buffered
    blocks + live demap vectors within 8 MB while minimizing grid steps.
    Returns (0, 0) when no geometry fits (caller routes to the XLA tail)."""
    best = None
    for CH in sorted((c for c in range(8, cfg_U + 1, 8) if cfg_U % c == 0),
                     reverse=True):
        for dcb in range(D, 0, -1):
            if D % dcb:
                continue
            per = (2 * (2 * CH + bps * CH + 8)       # dbl-buffered in+out
                   + (bps + 3) * CH) * dcb * LANES * 4
            if per <= (8 << 20):
                steps = (D // dcb) * (cfg_U // CH)
                if best is None or steps < best[0]:
                    best = (steps, dcb, CH)
                break
    return (best[1], best[2]) if best else (0, 0)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 8))
def demap_bins_tpu(bps: int, sp: int, inv_gain: float, n_valid: int,
                   eq: jnp.ndarray, diagA: jnp.ndarray, h_ri: jnp.ndarray,
                   sign: jnp.ndarray = None, interpret: bool = False):
    """Kernel B. eq: (D, 2, U, B) derotated equalized bins (kernel A out);
    diagA: (D, 8, B) (noise floor in row 2); h_ri: (2, U, B); sign:
    (D, bps, U, 1) descrambler signs (±1 payload, 0.0 pilot/pad rows).
    `sp` > 0 masks strided pilots out of the EVM; `sp` == 0 marks a
    group-compacted call where bins ≥ `n_valid` are padding. B % 128 == 0.

    Returns (llr (D, bps, U, B) — plane p of bin k at [d, p, k] (row
    p·U + k of the plane-major layout), descrambled — and diagB (D?, no:)
    (8, B): row 0 = Σ min-distance (EVM numerator over unmasked bins),
    row 1 = Σ|llr|).
    """
    D, _, U, B = eq.shape
    assert B % LANES == 0
    dcb, CH = split_chunks(U, bps, D)
    assert dcb, (U, bps, D)
    kern = _make_demap_kernel(bps, n_valid, CH, max(sp, 1), inv_gain,
                              pilots_strided=sp > 0)
    grid = (B // LANES, D // dcb, U // CH)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((dcb, 2, CH, LANES), lambda g, d, c: (d, 0, c, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, CH, LANES), lambda g, d, c: (0, c, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dcb, 8, LANES), lambda g, d, c: (d, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dcb, bps, CH, 1), lambda g, d, c: (d, 0, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((dcb, bps, CH, LANES), lambda g, d, c: (d, 0, c, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda g, d, c: (0, g),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, bps, U, B), jnp.float32),
            jax.ShapeDtypeStruct((8, B), jnp.float32),
        ),
        interpret=interpret,
    )(eq, h_ri, diagA, sign)


def split_shapes_ok(cfg: ModemConfig, B: int) -> bool:
    """Whether the split tail can serve this config at batch B: strided
    pilots with ≥2 of them (kernel A's regression), a used band that
    reshapes into whole sublanes, valid chunk geometries for both kernels,
    and the same XLA scoped-VMEM operand guard as the monolithic router
    (`fused_shapes_ok` note): every buffer XLA might scope (< 32 MiB) must
    sum well under the 16 MB limit."""
    if cfg.n_pilots < 2 or not cfg.strided_pilots:
        return False
    if cfg.n_used % 8 or _eq_chunk_divisor(cfg) == 0:
        return False
    if cfg.bit_loading is None:
        if split_chunks(cfg.n_used, cfg.bits_per_symbol,
                        cfg.n_data_symbols)[0] == 0:
            return False
    else:
        from ...models.frame import loading_tables
        for m, pos in loading_tables(cfg).groups:
            Up = -(-len(pos) // 8) * 8
            if split_chunks(Up, m, cfg.n_data_symbols)[0] == 0:
                return False
    Bp = -(-B // LANES) * LANES
    D, U = cfg.n_data_symbols, cfg.n_used
    bufs = [
        D * 2 * U * Bp * 4,            # y_ri / eq intermediate
        D * 2 * U * Bp * 4,
        2 * U * Bp * 4,                # h_ri
        8 * Bp * 4,                    # nv
        D * 8 * Bp * 4,                # diagA
        D * cfg.bits_per_symbol * U * Bp * 4,   # llr out (largest case)
        8 * Bp * 4,                    # diagB
    ]
    maybe_scoped = sum(b for b in bufs if b < (32 << 20))
    return maybe_scoped <= (8 << 20)
