"""Pallas TPU kernel: VMEM-resident LDPC normalized-min-sum decoder.

The XLA formulation of the decoder (gf3x.fec.ldpc.decode_jax) is
HBM-bandwidth-bound: each of the ~25 iterations streams the (E, B, z)
message array through HBM several times (~87 ms at 4096 codewords). Here the
whole message state lives in VMEM scratch across ALL iterations — HBM sees
the LLRs once in and the totals once out.

Layout: per-edge message tiles are (z, B_blk) with B_blk = 128 lanes and
z = 96 sublanes, so circulant shifts are static sublane rolls (pltpu.roll)
and every reduction is elementwise over (z, 128) tiles. The base matrix is
static: the edge structure is Python-unrolled into the kernel body (~76
edges), exactly mirroring the XLA twin's schedule so decoded bits are
bit-identical.

The schedule is LAYERED (block-row-serial): the totals live in VMEM and
each block row's message delta is applied to them immediately, so later
rows of the same iteration see it — roughly half the iterations to
convergence of the flooding schedule at the same rolls per edge (one for
v2c, one for the totals update). All four backends (NumPy golden, XLA,
this kernel, C++) share the exact layer order and tie-breaking, so
decoded bits are bit-identical.

Early termination (`early_exit=True`, the default): before each sweep the
kernel computes every lane's syndrome from the current totals; lanes whose
checks are all satisfied freeze (messages AND totals stop updating, so
their decode equals the first zero-syndrome pass regardless of batch
composition — the same rule as the twins), and a `lax.while_loop` exits
once the whole 128-lane block is frozen.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...fec.codes import N_BLOCK_COLS, block_rows, build_H_blocks

__all__ = ["minsum_totals_tpu", "LANES"]

LANES = 128
_ALPHA = 0.8
_BIG = np.float32(1e30)


def _kernel(lam_ref, out_ref, diag_ref, c2v_ref, tot_ref, *, z: int,
            iters: int, edges, rows, by_col, early_exit: bool):
    E = len(edges)
    MB = len(rows)

    def negroll(x, s):
        # variable order → check order: y[c] = x[(c + s) mod z]
        return pltpu.roll(x, z - s if s else 0, 0)

    def _first_at(mag, d, m1):
        # True where edge d is the FIRST row edge attaining the minimum —
        # mirrors argmin semantics of the XLA twin (ties broken by index).
        earlier = jnp.zeros_like(m1, dtype=jnp.bool_)
        for dd in range(d):
            earlier = earlier | (mag[dd] == m1)
        return jnp.logical_not(earlier)

    def sweep(frozen):
        """One LAYERED iteration: each block row reads the totals already
        updated by this iteration's earlier rows and writes its message
        delta straight back — roughly half the iterations to convergence of
        the flooding schedule, same rolls per edge (one for v2c, one for
        the totals update). `frozen` ((1, LANES) bool or None) lanes keep
        messages AND totals."""
        for i in range(MB):
            row = rows[i]
            # v2c in check order from the CURRENT totals
            v2c = [negroll(tot_ref[j], s) - c2v_ref[e] for (e, j, s) in row]
            mag = [jnp.abs(v) for v in v2c]
            sgn = [jnp.where(v < 0, -1.0, 1.0) for v in v2c]
            prod = sgn[0]
            for sg in sgn[1:]:
                prod = prod * sg
            # min1 / min2 over the (static, ≤7) row degree
            m1 = mag[0]
            for mg in mag[1:]:
                m1 = jnp.minimum(m1, mg)
            m2 = jnp.full_like(m1, _BIG)
            seen_min = jnp.zeros_like(m1, dtype=jnp.bool_)
            for mg in mag:
                is_min_first = (mg == m1) & jnp.logical_not(seen_min)
                m2 = jnp.where(is_min_first, m2, jnp.minimum(m2, mg))
                seen_min = seen_min | (mg == m1)
            for d, (e, j, s) in enumerate(row):
                exclude_min = (mag[d] == m1) & _first_at(mag, d, m1)
                mins = jnp.where(exclude_min, m2, m1)
                new = _ALPHA * (prod * sgn[d]) * mins
                delta = new - c2v_ref[e]
                if frozen is not None:
                    delta = jnp.where(frozen, 0.0, delta)
                c2v_ref[e] = c2v_ref[e] + delta
                # check order → variable order: contribution shifts by +s
                tot_ref[j] = tot_ref[j] + pltpu.roll(delta, s, 0)

    def unsat_lanes():
        """(1, LANES) bool: any parity check of the current totals' hard
        decisions violated, per lane."""
        unsat = None
        for i in range(MB):
            par = None
            for (e, j, s) in rows[i]:
                h = negroll(tot_ref[j], s) < 0.0
                par = h if par is None else (par != h)
            row_unsat = jnp.any(par, axis=0, keepdims=True)   # (1, LANES)
            unsat = row_unsat if unsat is None else (unsat | row_unsat)
        return unsat

    for e in range(E):
        c2v_ref[e] = jnp.zeros_like(c2v_ref[e])
    for j in range(N_BLOCK_COLS):
        tot_ref[j] = lam_ref[j]

    if early_exit:
        def cond(state):
            it, done = state
            return (it < iters) & jnp.logical_not(done)

        def body(state):
            it, _ = state
            frozen = jnp.logical_not(unsat_lanes())
            sweep(frozen)
            return it + 1, jnp.all(frozen)

        it, done = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(False)))
        # convergence is detected one body late (the final body's sweep was
        # a no-op): report the NumPy twin's count — sweeps that updated
        it_run = it - done.astype(jnp.int32)
    else:
        def body(_, carry):
            sweep(None)
            return carry

        jax.lax.fori_loop(0, iters, body, 0)
        it_run = jnp.int32(iters)
    for j in range(N_BLOCK_COLS):
        out_ref[j] = tot_ref[j]
    # decoder-stress diag (SURVEY.md §6.5): row 0 = 1.0 where the lane's
    # codeword still violates a parity check, row 1 = message-update passes
    # this 128-lane block ran (its slowest unfrozen lane gates the loop)
    lanes = diag_ref.shape[1]
    diag_ref[...] = jnp.zeros((8, lanes), jnp.float32)
    diag_ref[0:1] = unsat_lanes().astype(jnp.float32)
    diag_ref[1:2] = jnp.full((1, lanes), 1.0) * it_run.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def minsum_totals_tpu(lam_t: jnp.ndarray, z: int, iters: int,
                      early_exit: bool = True, interpret: bool = False,
                      rate: str = "1/2"):
    """lam_t: (24, z, B) f32 LLRs (B % 128 == 0) → (totals (24, z, B),
    diag (8, B): row 0 = unsat flag per lane, row 1 = passes run by the
    lane's 128-lane grid block).

    Hard decision and info-bit slicing happen in the caller (XLA), keeping
    the kernel output layout tile-friendly. `interpret=True` runs the
    Pallas interpreter (kernel-logic tests on CPU).
    """
    _, _, B = lam_t.shape
    assert B % LANES == 0, B
    edges = build_H_blocks(z, rate)
    rows = [[] for _ in range(block_rows(rate))]
    by_col = [[] for _ in range(N_BLOCK_COLS)]
    for e, (i, j, s) in enumerate(edges):
        rows[i].append((e, j, s))
        by_col[j].append(e)
    E = len(edges)

    kern = functools.partial(
        _kernel, z=z, iters=iters,
        edges=tuple(edges),
        rows=tuple(tuple(r) for r in rows),
        by_col=tuple(tuple(c) for c in by_col),
        early_exit=early_exit,
    )
    grid = (B // LANES,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N_BLOCK_COLS, z, LANES), lambda g: (0, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N_BLOCK_COLS, z, LANES), lambda g: (0, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(lam_t.shape, jnp.float32),
            jax.ShapeDtypeStruct((8, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((E, z, LANES), jnp.float32),            # c2v messages
            pltpu.VMEM((N_BLOCK_COLS, z, LANES), jnp.float32), # column totals
        ],
        interpret=interpret,
    )(lam_t)
