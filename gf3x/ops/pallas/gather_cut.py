"""Pallas TPU kernels: block-aligned per-row window cut of a recording batch.

The receive path cuts one frame window per recording row at a data-dependent
(but block-aligned) offset. The XLA formulation — a vmap'd `dynamic_slice`
over a (rows, n_blocks, block) view — measured 3.15 ms for a
(1024, 47k) → (1024, 32k) cut on a v5e (~40 GB/s effective): on the 2-D
(B, T) HBM layout every (8, 128) tile interleaves 8 batch rows, so a one-row
window forces 8× the bytes through HBM; per-row DMA variants bottom out at
~160 GB/s on DMA-issue overhead (one descriptor per row).

`gather_cut_group_tpu` (the fast path, B % 8 == 0 and the recording fits
VMEM staging): each grid step DMAs one WHOLE 8-row group — a tile-aligned
(8, Tp) slice of the 2-D layout, so every input byte moves exactly once —
into a VMEM staging buffer (double-buffered so the next group's DMA flies
while this one extracts), then copies each row's window out of staging with
a dynamic but 128-lane-aligned slice (q·block is a lane multiple; static
sublane index, so the copy is plain vector loads). Output blocks are
auto-pipelined back to HBM.

`gather_cut_tpu` (fallback: odd batch sizes, or recordings too long to
stage): one DMA per row on the (B, n_blocks, block) tile view, slice shape
(1, K, block) — legal for any dynamic block offset as long as K is a
multiple of the 8-sublane tile. A rolling window keeps transfers in flight.

Scalar-prefetched `q` (the per-row block index) is available before the body
runs, which is exactly what computing DMA addresses needs
(PrefetchScalarGridSpec pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_cut_tpu", "gather_cut_group_tpu", "MAX_STAGE_BYTES"]

_INFLIGHT = 16            # rolling DMA window depth (per-row kernel)
MAX_STAGE_BYTES = 8 << 20  # staging budget: 2 slots × 8 rows × Tf × 4 B (≈3 s of audio)


def _group_kernel(q_ref, rxp_ref, out_ref, s0, s1, sem0, sem1,
                  *, block: int, L: int, Tf: int):
    g = pl.program_id(0)
    G = pl.num_programs(0)

    def dma(gg, sref, sem):
        # only the block-aligned prefix [0, Tf) of each row is staged — the
        # ragged tail is never read and the recording needs no padding; the
        # scratch's zero tail (set once below) stands in for the zero pad
        # the XLA fallback applies, so windows may overrun the recording by
        # up to the 8-block alignment slack with identical (zero) content
        return pltpu.make_async_copy(
            rxp_ref.at[pl.ds(gg * 8, 8), pl.ds(0, Tf)],
            sref.at[:, pl.ds(0, Tf)], sem)

    @pl.when(g == 0)
    def _():
        s0[:, Tf:] = jnp.zeros_like(s0[:, Tf:])
        s1[:, Tf:] = jnp.zeros_like(s1[:, Tf:])

    @pl.when(g == 0)
    def _():
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
        for r in range(8):
            off = pl.multiple_of(q_ref[g * 8 + r] * block, block)
            out_ref[r, :] = sref[r, pl.ds(off, L)]

    @pl.when(even)
    def _():
        extract(s0, sem0)

    @pl.when(jnp.logical_not(even))
    def _():
        extract(s1, sem1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def gather_cut_group_tpu(rxp: jnp.ndarray, q: jnp.ndarray, block: int,
                         nb: int, interpret: bool = False) -> jnp.ndarray:
    """rxp: (B, T) f32 with B % 8 == 0 (T need NOT be block-aligned — only
    the whole-block prefix is read); q: (B,) int32 with
    (q + nb)·block ≤ floor(T/block)·block + 8·block (caller clips) →
    (B, nb·block) f32 windows of rxp[i] zero-extended past floor(T/block)
    (matching the XLA fallback's zero pad; the ragged tail [Tf, T) is not
    read)."""
    B, T = rxp.shape
    L = nb * block
    Tf = (T // block) * block
    Ws = Tf + 8 * block
    assert B % 8 == 0 and L <= Ws
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // 8,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, L), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, Ws), jnp.float32),
            pltpu.VMEM((8, Ws), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_group_kernel, block=block, L=L, Tf=Tf),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.float32),
        interpret=interpret,
    )(q.astype(jnp.int32), rxp)


def _row_kernel(q_ref, rx_ref, out_ref, sems, *, B: int, K: int):
    W = min(_INFLIGHT, B)

    def dma(row):
        return pltpu.make_async_copy(
            rx_ref.at[row, pl.ds(q_ref[row], K), :],
            out_ref.at[row, :, :],
            sems.at[row % W],
        )

    # rolling window: W transfers stay in flight; waiting row i frees sem
    # slot i % W, which row i+W then reuses
    for r in range(W):
        dma(r).start()

    def body(i, carry):
        dma(i).wait()

        @pl.when(i + W < B)
        def _():
            dma(i + W).start()

        return carry

    jax.lax.fori_loop(0, B, body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def gather_cut_tpu(rxb: jnp.ndarray, q: jnp.ndarray, K: int,
                   interpret: bool = False) -> jnp.ndarray:
    """rxb: (B, n_blocks, block) f32, q: (B,) int32 with q + K ≤ n_blocks
    (caller clips) → (B, K, block) f32 = rxb[i, q[i]:q[i]+K].

    K must be a multiple of 8 (the f32 sublane tile): the DMA slice shape
    (1, K, block) must be tile-aligned; the per-row offset q need not be.
    """
    B, n_blocks, block = rxb.shape
    assert K % 8 == 0 and K <= n_blocks, (K, n_blocks)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((min(_INFLIGHT, B),))],
    )
    return pl.pallas_call(
        functools.partial(_row_kernel, B=B, K=K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, block), jnp.float32),
        interpret=interpret,
    )(q.astype(jnp.int32), rxb)


def _symbols_kernel(q_ref, qb_ref, rxp_ref, syms_ref, scw_ref, s0, s1,
                    sem0, sem1, *, block: int, R: int, Wr: int, S: int,
                    n_fft: int, body_off: int, sym_len: int, cp: int,
                    sc_off: int):
    g = pl.program_id(0)
    G = pl.num_programs(0)

    def dma(gg, sref, sem):
        # one (R, Wr) group DMA per step, based at the group's smallest
        # window block (qb, pre-clamped so base + Wr stays inside the
        # whole-block prefix): the staged span covers every row's window
        base = pl.multiple_of(qb_ref[gg] * block, block)
        return pltpu.make_async_copy(
            rxp_ref.at[pl.ds(gg * R, R), pl.ds(base, Wr)],
            sref.at[:, pl.ds(0, Wr)], sem)

    @pl.when(g == 0)
    def _():
        # scratch tail past the staged span: zeros once — windows that
        # overrun the recording's whole-block prefix read zeros (the
        # gather_cut boundary semantics); DMAs never write it
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
                # vector copy per OFDM symbol, written CP-stripped straight
                # into the (R, S, n_fft) output block — the downstream DFT
                # matmul consumes this layout with no reshape/slice copy
                a = body_off + s * sym_len + cp
                syms_ref[r, s, :] = sref[r, pl.ds(off + a, n_fft)]
            if sc_off >= 0:
                scw_ref[r, :] = sref[r, pl.ds(off + sc_off, n_fft)]

    @pl.when(even)
    def _():
        extract(s0, sem0)

    @pl.when(jnp.logical_not(even))
    def _():
        extract(s1, sem1)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
def cut_symbols_tpu(rxp: jnp.ndarray, q: jnp.ndarray, qb: jnp.ndarray,
                    block: int, S: int, n_fft: int, body_off: int,
                    sym_len: int, cp: int, sc_off: int, rows: int,
                    ws_blocks: int, interpret: bool = False):
    """Fused frame cut + symbol extraction: rxp (B, T) f32 (B % rows == 0),
    q (B,) int32 block index of each row's window start → (syms, scw):
    syms (B, S, n_fft) = CP-stripped OFDM symbol s at
    rxp[i, q·block + body_off + s·sym_len + cp :][:n_fft], and
    scw (B, n_fft) at q·block + sc_off (sc_off < 0 → zeros; pass the
    Schmidl–Cox window offset within the cut otherwise). Samples past the
    recording's whole-block prefix read as zeros, exactly like
    `gather_cut`.

    `rows` rows are cut per grid step (one group DMA each — amortizes the
    ~5 µs/step grid cost AND the DMA issue cost over more work).
    `ws_blocks` is the staged span in blocks: each step stages only
    [qb·block, qb·block + ws_blocks·block) of the recording, where qb
    (B/rows,) is the per-group base block from `cut_span_bases` — the
    whole-prefix case is ws_blocks = nf with qb = 0, the bounded-search
    case stages just (q spread + window) per group. The caller guarantees
    (per `cut_span_bases`): 0 ≤ q − qb ≤ ws_blocks − nb (window blocks nb),
    qb·block + ws_blocks·block ≤ floor(T/block)·block, and
    q·block + need ≤ floor(T/block)·block + 8·block (`max_cut_start`)."""
    B, T = rxp.shape
    Wr = ws_blocks * block
    Ws = Wr + 8 * block
    assert B % rows == 0 and Wr <= (T // block) * block
    # sc_off < 0 (no Schmidl–Cox symbol): shrink the never-written second
    # output to one lane tile instead of hauling (B, n_fft) of uninitialized
    # VMEM back to HBM every grid step
    n_sc = n_fft if sc_off >= 0 else 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((rows, S, n_fft), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, n_sc), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, Ws), jnp.float32),
            pltpu.VMEM((rows, Ws), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_symbols_kernel, block=block, R=rows, Wr=Wr, S=S,
                          n_fft=n_fft, body_off=body_off, sym_len=sym_len,
                          cp=cp, sc_off=sc_off),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, S, n_fft), jnp.float32),
            jax.ShapeDtypeStruct((B, n_sc), jnp.float32),
        ),
        interpret=interpret,
    )(q.astype(jnp.int32), qb.astype(jnp.int32), rxp)
