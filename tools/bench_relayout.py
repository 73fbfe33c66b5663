#!/usr/bin/env python
"""Measure the deferred cut→DFT→fused-EQ relayout lever (VERDICT r4 weak #1).

The composed step's symbol matrix flows: cut kernel → (B, S, n_fft) f32 →
DFT matmuls → (B, S, U) re/im → transpose to the fused kernel's
(D, 2, U, B) lanes-batch layout. BASELINE.md r4 asserted (without
measuring) that a cut kernel emitting the transposed matrix would not pay.
This microbench times the CONSUMER side of the three candidate layouts at
the bench geometry, isolating how much of the step the relayout actually
costs and which formulation XLA serves best:

  V0  matmul on (B·S, n_fft) then stack/transpose to (S, 2, U, B)
      (today's composition: ofdm_dft + _fused_eq_demap's transpose)
  V1  one einsum 'bsn,nu->sub' per cos/sin table — same (B, S, n_fft)
      input, transposed OUTPUT layout chosen by XLA inside the matmul
  V2  pre-transposed input (S, n_fft, B), einsum 'snb,nu->sub' — what a
      batch-minor cut kernel would feed

V2's win over V0 bounds the prize of rebuilding the cut kernel; V1's win
is FREE (no kernel change — just let XLA fold the transpose into the
matmul epilogue). Writes tools/bench_relayout.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from gf3x import GF3_STANDARD
from gf3x.ops.ofdm import _dft_tables

B, REPS = 1024, 128


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    o = fn(*args)
    jax.device_get(jnp.sum(o[0] if isinstance(o, tuple) else o))
    return (time.perf_counter() - t0)


def main():
    cfg = GF3_STANDARD
    S = cfg.n_known_symbols + cfg.n_data_symbols
    N, U = cfg.n_fft, cfg.n_used
    C, Sm = _dft_tables(cfg)
    Cj, Sj = jnp.asarray(C), jnp.asarray(Sm)
    hi = jax.lax.Precision.HIGH
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, N)).astype(np.float32))
    xt = jnp.asarray(np.ascontiguousarray(
        np.asarray(x).transpose(1, 2, 0)))          # (S, N, B)

    @jax.jit
    def v0(x):
        def scan_body(c, _):
            xc = x.at[0, 0, 0].add(c * 1e-30)
            re = jnp.matmul(xc, Cj, precision=hi,
                            preferred_element_type=jnp.float32)
            im = -jnp.matmul(xc, Sj, precision=hi,
                             preferred_element_type=jnp.float32)
            y = jnp.stack([re, im], axis=1).transpose(2, 1, 3, 0)  # (S,2,U,B)
            return c + jnp.sum(y[0, 0, 0]), 0
        c, _ = jax.lax.scan(scan_body, jnp.float32(0), None, length=REPS)
        return c

    @jax.jit
    def v1(x):
        def scan_body(c, _):
            xc = x.at[0, 0, 0].add(c * 1e-30)
            re = jnp.einsum("bsn,nu->sub", xc, Cj, precision=hi,
                            preferred_element_type=jnp.float32)
            im = -jnp.einsum("bsn,nu->sub", xc, Sj, precision=hi,
                             preferred_element_type=jnp.float32)
            y = jnp.stack([re, im], axis=1)                        # (S,2,U,B)
            return c + jnp.sum(y[0, 0, 0]), 0
        c, _ = jax.lax.scan(scan_body, jnp.float32(0), None, length=REPS)
        return c

    @jax.jit
    def v2(xt):
        def scan_body(c, _):
            xc = xt.at[0, 0, 0].add(c * 1e-30)
            re = jnp.einsum("snb,nu->sub", xc, Cj, precision=hi,
                            preferred_element_type=jnp.float32)
            im = -jnp.einsum("snb,nu->sub", xc, Sj, precision=hi,
                             preferred_element_type=jnp.float32)
            y = jnp.stack([re, im], axis=1)
            return c + jnp.sum(y[0, 0, 0]), 0
        c, _ = jax.lax.scan(scan_body, jnp.float32(0), None, length=REPS)
        return c

    res = {}
    for name, fn, arg in (("v0_matmul_then_transpose", v0, x),
                          ("v1_einsum_transposed_out", v1, x),
                          ("v2_pretransposed_input", v2, xt)):
        dt = timeit(fn, arg) / REPS
        res[name] = round(dt * 1e3, 4)
        print(f"{name}: {dt*1e3:.3f} ms")
    Path(__file__).with_name("bench_relayout.json").write_text(
        json.dumps(res, indent=1) + "\n")


if __name__ == "__main__":
    main()
