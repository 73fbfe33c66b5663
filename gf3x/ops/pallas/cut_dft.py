"""Pallas TPU kernel: fused frame cut + used-band DFT (cut_symbols ∘ ofdm_dft).

The r5 bench step spends its two biggest HBM stages on the cut→DFT pair
(BENCH_r05 bytes model: cut_symbols 257.9 MB, dft 210.8 MB of 820 MB/step):
`cut_symbols_tpu` writes the 92 MB (B, S, n_fft) f32 symbol matrix to HBM
only for `ofdm_dft_lanes` to read it straight back, and the two kernels run
back-to-back with no overlap (0.52 + 0.56 ms measured in isolation). This
kernel fuses them: each grid step stages one `rows`-row group of the
recording through VMEM (the `cut_symbols_tpu` staging-DMA pattern,
ops/pallas/gather_cut.py), extracts the CP-stripped symbol slices into a
VMEM scratch, and runs the used-band DFT as in-kernel MXU dots against
resident bf16 hi/lo cos/sin tables — the symbol matrix never exists in HBM,
and the staging DMA of group g+1 flies while group g's dots run, so the
cut's DMA time hides under the DFT's MXU time.

Precision: the same bf16x3 scheme as the XLA `Precision.HIGH` matmuls
(ops/ofdm.py:121-125) — operands split as x = x_hi + x_lo (bf16 each),
tables as C = C_hi + C_lo, and three exact bf16×bf16→f32 MXU passes
x_hi·C_hi + x_hi·C_lo + x_lo·C_hi; the dropped x_lo·C_lo term is ~2⁻¹⁶
relative, the same −100 dB-class floor the XLA path has (gated on chip by
tools/tpu_parity.py's DFT-error check). The r2 in-kernel-DFT rejection
(BASELINE.md) predates this: it fed f32 to Mosaic's dot, which is a single
bf16 pass (−49 dB); explicit bf16 operands with f32 accumulation are exact.

Dot orientation and output layout were chosen by measurement (bench
geometry, B=1024, rows=32, tools/bench_cutdft.py + /tmp probes):
- (S·R, n_fft)·(n_fft, U) dots put U=280 on the result lanes → padded to
  384, MXU at 73 %, and a per-group B-minor output block pads `rows` of
  128 lanes 4-16×: composed chain 0.92 ms — LOST to the 0.86 ms pair.
- The A·Bᵀ form (U, n_fft)×(S·R, n_fft) → (U, S·R) puts the full
  S·R = 768 lanes (a 128-multiple) on the result: composed 0.75 ms.
The kernel therefore emits the GROUP-MAJOR layout (B/R, 2, U, S·R) —
result lane j of group g is (symbol j // R, batch row g·R + j % R) — and
the consumer pays one XLA relayout pass (~0.09 ms) to the EQ kernels'
(S, 2, U, B) lanes layout. The block-misalignment deroll ramp
e^{+2πik·roll/N} rides the kernel epilogue (per-lane roll = the group's
roll vector tiled S times), deleting the downstream 110 MB deroll pass.
rows=32 measured best (0.741 vs 0.774 at 64, 1.10 at 8).

Same cut semantics and caller contract (q, qb, span staging, zero tail,
alignment) as `cut_symbols_tpu` — reference: SURVEY.md §4.2 hot loop #3
(the per-symbol FFT demod loop) + §3.2 frame-batch DP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cut_dft_tpu"]


def _cut_dft_kernel(q_ref, qb_ref, roll_ref, rxp_ref, ch_ref, cl_ref,
                    sh_ref, sl_ref, out_ref, scw_ref, s0, s1, xs, sem0,
                    sem1, *, block: int, R: int, Wr: int, S: int,
                    n_fft: int, body_off: int, sym_len: int, cp: int,
                    sc_off: int, U: int, bin_lo: int, deroll: bool,
                    gpb: int):
    g = pl.program_id(0)
    G = pl.num_programs(0)

    def dma(gg, sref, sem):
        # one (R, Wr) group DMA per step, based at the group's smallest
        # window block (qb, pre-clamped by the caller — the cut_symbols_tpu
        # contract verbatim)
        base = pl.multiple_of(qb_ref[gg] * block, block)
        return pltpu.make_async_copy(
            rxp_ref.at[pl.ds(gg * R, R), pl.ds(base, Wr)],
            sref.at[:, pl.ds(0, Wr)], sem)

    @pl.when(g == 0)
    def _():
        # zero tail past the staged span: windows overrunning the
        # recording's whole-block prefix read zeros (gather_cut semantics)
        s0[:, Wr:] = jnp.zeros_like(s0[:, Wr:])
        s1[:, Wr:] = jnp.zeros_like(s1[:, Wr:])
        dma(0, s0, sem0).start()

    even = jax.lax.rem(g, 2) == 0

    @pl.when((g + 1 < G) & even)
    def _():
        dma(g + 1, s1, sem1).start()

    @pl.when((g + 1 < G) & jnp.logical_not(even))
    def _():
        dma(g + 1, s0, sem0).start()

    def extract(sref, sem):
        dma(g, sref, sem).wait()
        for r in range(R):
            off = pl.multiple_of((q_ref[g * R + r] - qb_ref[g]) * block,
                                 block)
            for s in range(S):
                # dynamic base (128-multiple) + static symbol offset: one
                # vector copy per OFDM symbol into the (S, R, n_fft) DFT
                # operand scratch (s-major so the dot's (S·R, n_fft)
                # reshape is a free leading-dims collapse)
                a = body_off + s * sym_len + cp
                xs[s, r, :] = sref[r, pl.ds(off + a, n_fft)]
            if sc_off >= 0:
                scw_ref[r, :] = sref[r, pl.ds(off + sc_off, n_fft)]

    @pl.when(even)
    def _():
        extract(s0, sem0)

    @pl.when(jnp.logical_not(even))
    def _():
        extract(s1, sem1)

    x = xs[:].reshape(S * R, n_fft)
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    # contract both operands on their LAST dim (the A·Bᵀ MXU form):
    # (U, n_fft) × (S·R, n_fft) → (U, S·R). Lanes of the result are the
    # full S·R (a 128-multiple — rows 8/16/32 × 24 symbols), where the
    # (S·R, U)-oriented dot padded its 280 output lanes to 384 and ran
    # the MXU at 73 % — measured 0.92 vs 0.75 ms composed at rows=32.
    dn = (((1,), (1,)), ((), ()))

    def dft(t_hi, t_lo):
        # bf16x3: exact bf16×bf16 products, f32 accumulation on the MXU
        acc = jax.lax.dot_general(t_hi, x_hi, dn,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(t_lo, x_hi, dn,
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(t_hi, x_lo, dn,
                                   preferred_element_type=jnp.float32)
        return acc                                              # (U, S·R)

    re = dft(ch_ref[:], cl_ref[:])              # re:  (cos·inv) · xᵀ
    im = dft(sh_ref[:], sl_ref[:])              # im:  (−sin·inv) · xᵀ
    if deroll:
        # undo the block-grid cut misalignment here instead of in a
        # separate downstream pass over the 55 MB spectra plane:
        # Y[k] ·= e^{+2πik·roll/N} (models/modem.py `_deroll_lanes` math,
        # identical placement — after the DFT, before the EQ). Result
        # lane j is (symbol s = j // R, row r = j % R), so the per-lane
        # roll is the group's (R,) roll vector tiled S times.
        # tpu.iota is integer-only — cast after (cf. ops/pallas/fused_eq.py)
        k = (jnp.float32(bin_lo)
             + jax.lax.broadcasted_iota(jnp.int32, (U, 1), 0)
             .astype(jnp.float32))                              # (U, 1)
        rv = jnp.stack(
            [roll_ref[g * R + r].astype(jnp.float32) for r in range(R)]
        ).reshape(1, R)
        rolls = jnp.concatenate([rv] * S, axis=1)               # (1, S·R)
        ang = jnp.float32(2.0 * np.pi / n_fft) * k * rolls      # (U, S·R)
        c, s = jnp.cos(ang), jnp.sin(ang)
        re, im = re * c - im * s, im * c + re * s
    if gpb == 1:
        # group-major output: one (1, 2, U, S·R) block per grid step
        out_ref[0, 0] = re
        out_ref[0, 1] = im
    else:
        # LANES output: `gpb` consecutive grid steps revisit one full
        # (S, 2, U, gpb·R = 128) block (pallas output-revisit semantics —
        # the block flushes to HBM when its index g // gpb changes), each
        # writing its R-lane stripe per symbol at a STATIC lane offset
        # (one pl.when branch per phase) — full-width HBM writes in the
        # EQ kernels' layout, no downstream relayout pass
        phase = jax.lax.rem(g, gpb)
        for qq in range(gpb):
            @pl.when(phase == qq)
            def _(qq=qq):
                for s in range(S):
                    out_ref[s, 0, :, qq * R:(qq + 1) * R] = \
                        re[:, s * R:(s + 1) * R]
                    out_ref[s, 1, :, qq * R:(qq + 1) * R] = \
                        im[:, s * R:(s + 1) * R]


@functools.partial(
    jax.jit, static_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17))
def cut_dft_tpu(rxp: jnp.ndarray, q: jnp.ndarray, qb: jnp.ndarray,
                roll: jnp.ndarray, tables: tuple, block: int, S: int,
                n_fft: int, body_off: int, sym_len: int, cp: int,
                sc_off: int, rows: int, ws_blocks: int, bin_lo: int = 0,
                deroll: bool = False, lanes_out: bool = False,
                interpret: bool = False):
    """Fused cut + used-band DFT: rxp (B, T) f32, q/qb per
    `cut_symbols_tpu`'s contract (ops/pallas/gather_cut.py:242), tables
    (C_hi, C_lo, S_hi, S_lo) — (U, n_fft) bf16 hi/lo splits of
    cos(θ)ᵀ/ofdm_scale and −sin(θ)ᵀ/ofdm_scale → (spectra, scw (B, n_fft)
    f32, or (B, 128) zeros when sc_off < 0).

    Spectra layout: with `lanes_out=False`, ygrp (B/rows, 2, U, S·rows)
    f32 in the kernel's group-major layout — result lane j of group g is
    (symbol j // rows, batch row g·rows + j % rows). With `lanes_out=True`
    (requires B % 128 == 0 and rows dividing 128), the EQ kernels'
    (S, 2, U, B) LANES layout directly: 128//rows consecutive grid steps
    revisit one full 128-lane output block, each writing its rows-lane
    stripe — full-width HBM writes, no downstream relayout pass.

    `deroll=True` additionally applies the block-misalignment phase ramp
    e^{+2πik·roll/N} per row (k from `bin_lo`) — the downstream
    `_deroll_lanes` pass folded into the kernel epilogue. `roll` (B,)
    int32 is ignored when deroll=False (pass zeros).

    Spectra equal `ofdm_dft(cfg, cut_symbols(...)[0])` (derolled when
    asked) to the shared bf16x3 floor (~1e-5 rel; different summation
    order, not bit-identical)."""
    B, T = rxp.shape
    ch, cl, sh, sl = (jnp.asarray(t) for t in tables)
    U = ch.shape[0]
    Wr = ws_blocks * block
    Ws = Wr + 8 * block
    assert B % rows == 0 and Wr <= (T // block) * block
    assert ch.shape == (U, n_fft) and ch.dtype == jnp.bfloat16
    gpb = 1
    if lanes_out:
        assert B % 128 == 0 and 128 % rows == 0, (B, rows)
        gpb = 128 // rows
    n_sc = n_fft if sc_off >= 0 else 128
    tab_spec = pl.BlockSpec((U, n_fft), lambda g, *_: (0, 0),
                            memory_space=pltpu.VMEM)
    if lanes_out:
        y_spec = pl.BlockSpec((S, 2, U, 128),
                              lambda g, *_, gpb=gpb: (0, 0, 0, g // gpb),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((S, 2, U, B), jnp.float32)
    else:
        y_spec = pl.BlockSpec((1, 2, U, S * rows),
                              lambda g, *_: (g, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        y_shape = jax.ShapeDtypeStruct((B // rows, 2, U, S * rows),
                                       jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  tab_spec, tab_spec, tab_spec, tab_spec],
        out_specs=(
            y_spec,
            pl.BlockSpec((rows, n_sc), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, Ws), jnp.float32),
            pltpu.VMEM((rows, Ws), jnp.float32),
            pltpu.VMEM((S, rows, n_fft), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_cut_dft_kernel, block=block, R=rows, Wr=Wr, S=S,
                          n_fft=n_fft, body_off=body_off, sym_len=sym_len,
                          cp=cp, sc_off=sc_off, U=U, bin_lo=bin_lo,
                          deroll=deroll, gpb=gpb),
        grid_spec=grid_spec,
        out_shape=(y_shape, jax.ShapeDtypeStruct((B, n_sc), jnp.float32)),
        # the resident tables + staging + dot operands exceed Mosaic's
        # default scoped-VMEM budget at rows ≥ 16; the caller's row choice
        # (ops/sync.py cut_dft_spectra) keeps the true footprint bounded
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(q.astype(jnp.int32), qb.astype(jnp.int32), roll.astype(jnp.int32),
      rxp, ch, cl, sh, sl)
