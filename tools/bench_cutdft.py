#!/usr/bin/env python
"""Does the fused cut+DFT kernel (ops/pallas/cut_dft.py) beat the
cut_symbols → ofdm_dft_lanes pair it replaces?

The pair is the r5 step's two biggest HBM stages (BENCH_r05 bytes model:
257.9 + 210.8 MB of 820 MB/step) and runs back-to-back with no overlap —
the fusion deletes the 92 MB (B, S, n_fft) symbol-matrix round-trip and
hides the cut's staging DMA under the DFT's MXU dots. This times the
composed chain up to the lanes-layout spectra (the fused-EQ kernel's
input) both ways at bench geometry, correctness-gated on the spectra
agreeing to the shared bf16x3 floor.

Measurement: carry-dependent-scan form (ARCHITECTURE.md rule 4c) so the
body cannot be hoisted and the tunneled ~25 ms dispatch floor amortizes.
Writes tools/bench_cutdft.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = 1024
SCAN_BATCHES = 64
STEPS = 3
MARGIN = 4096


def main():
    import jax
    import jax.numpy as jnp

    from gf3x import GF3_STANDARD as cfg
    from gf3x.models.modem import Modem
    from gf3x.ops.ofdm import ofdm_dft_lanes
    from gf3x.ops.sync import cut_dft_spectra, cut_symbols

    rng = np.random.default_rng(11)
    modem = Modem(cfg, max_delay=MARGIN + cfg.cp)
    T = cfg.frame_len + MARGIN
    rx = rng.standard_normal((B, T)).astype(np.float32) * 0.05
    starts = rng.integers(0, MARGIN, B).astype(np.int32)

    S = cfg.n_known_symbols + cfg.n_data_symbols
    backoff = cfg.cp // 4
    block = modem._cut_block
    base_np = starts + cfg.chirp_len - backoff
    sc_off = cfg.cp + backoff + block // 2
    span = modem.max_delay + block

    def chain_pair(r, base):
        syms, scw, roll = cut_symbols(
            r, base, S=S, n_fft=cfg.n_fft, sym_len=cfg.symbol_len,
            cp=cfg.cp, body_off=cfg.sc_len, sc_off=sc_off, block=block,
            max_start_span=span)
        Yl = modem._deroll_lanes(ofdm_dft_lanes(cfg, syms), roll)
        return Yl, scw

    def chain_fused(r, base):
        got = cut_dft_spectra(
            cfg, r, base, S=S, body_off=cfg.sc_len, sc_off=sc_off,
            block=block, max_start_span=span)
        assert got is not None, "fused plan refused at bench geometry"
        return got                     # (Yl lanes layout, scw) — derolled

    # correctness gate: spectra + SC window agree across the two chains
    rj = jnp.asarray(rx[:16])
    bj = jnp.asarray(base_np[:16])
    Ya, sa = jax.jit(chain_pair)(rj, bj)
    Yb, sb = jax.jit(chain_fused)(rj, bj)
    rel = float(jnp.linalg.norm(Yb - Ya) / jnp.linalg.norm(Ya))
    assert rel < 5e-5, f"spectra disagree: rel {rel}"
    assert bool(jnp.array_equal(sa, sb)), "sc windows disagree"
    print(f"parity: rel spectra err {rel:.2e}, scw exact")

    def timed(chain):
        @jax.jit
        def scan(r, base):
            def step(carry, _):
                acc, rr = carry
                rr = rr.at[0, 0].add(acc * jnp.float32(1e-30))
                Yl, _ = chain(rr, base)
                # FULL-array reduction: a sliced reduction lets XLA
                # dead-code-eliminate most of the einsum variant (the
                # Pallas variant is opaque), skewing the comparison
                return (acc + jnp.sum(Yl).astype(jnp.float32), rr), 0
            (acc, _), _ = jax.lax.scan(step, (jnp.float32(0), r), None,
                                       length=SCAN_BATCHES)
            return acc

        r = jax.device_put(jnp.asarray(rx))
        base = jax.device_put(jnp.asarray(base_np))
        jax.device_get(scan(r, base))
        jax.device_get(scan(r, base))
        t0 = time.perf_counter()
        outs = [scan(r, base) for _ in range(STEPS)]
        for o in outs:
            jax.device_get(o)
        return (time.perf_counter() - t0) / (STEPS * SCAN_BATCHES)

    t_pair = timed(chain_pair)
    t_fused = timed(chain_fused)
    out = {
        "config": "GF3_STANDARD cut→lanes-spectra chain, B=1024, span-staged",
        "pair_ms": round(t_pair * 1e3, 3),
        "fused_ms": round(t_fused * 1e3, 3),
        "saved_ms": round((t_pair - t_fused) * 1e3, 3),
        "rel_spectra_err": rel,
    }
    print(json.dumps(out))
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
