#!/usr/bin/env python
"""Does the r5 two-kernel split tail beat the monolithic fused kernel at
QPSK (GF3_STANDARD, the bench config)?

The split (`ops/pallas/split_eq.py`) was built for the constellations the
monolithic kernel cannot hold in VMEM (64-QAM, bit-loaded) and was only
ever measured there — where it competes against the ~15-op XLA tail, not
against the monolithic kernel. At QPSK both kernels are available, and
they trade differently: the split's demap kernel B chunks over the bin
axis with tiny live state (fewer Mosaic sublane shuffles), but its
derotated-bins intermediate round-trips HBM once (~46 MB at bench
geometry, ≈0.06 ms of traffic). This measures the composed prewindowed
step both ways (plus the XLA tail for scale) at bench geometry so the
`_demod_syms` routing decision is data, not assumption.

Measurement: same carry-dependent-scan form as tools/bench_loaded.py
(ARCHITECTURE.md rule 4c — the body cannot be hoisted, and the tunneled
~25 ms dispatch floor amortizes over SCAN_BATCHES). Correctness-gated:
each variant must decode the payload before it is timed. Writes
tools/bench_split_qpsk.json.
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


def build_windows(modem, rng) -> "tuple[np.ndarray, bytes]":
    cfg = modem.cfg
    payload = rng.integers(0, 256, 400, dtype=np.uint8).tobytes()
    wav = np.asarray(modem.encode(payload, "b.bin"))
    win = np.zeros((B, cfg.frame_len), np.float32)
    win[:, : wav.size] = wav
    p = float(np.mean(wav**2))
    win += (rng.standard_normal(win.shape) * np.sqrt(p / 100.0)).astype(np.float32)
    return win, payload


def time_variant(modem, win_np, payload, use_pallas, force_split=False):
    import jax
    import jax.numpy as jnp

    from gf3x.ops.pallas import fused_eq

    cfg = modem.cfg
    need = (cfg.n_known_symbols + cfg.n_data_symbols) * cfg.symbol_len
    a = cfg.preamble_len - cfg.cp // 4

    real_ok = fused_eq.fused_shapes_ok
    if force_split:
        # the split is _demod_syms's fallback when the monolithic kernel
        # refuses; refusing unconditionally forces it at QPSK
        fused_eq.fused_shapes_ok = lambda *a, **k: False
    try:
        def decode_win(w):
            syms = modem._sym_matrix(w[..., a: a + need])
            llr_like, _ = modem._demod_syms(syms, use_pallas=use_pallas)
            bits, _, _, _ = modem._payload_bits(llr_like, w.shape[:-1])
            return bits

        @jax.jit
        def scan(w):
            def step(carry, _):
                acc, r = carry
                r = r.at[0, 0].add(acc * jnp.float32(1e-30))
                bits = decode_win(r)
                return (acc + jnp.sum(bits.astype(jnp.int32)).astype(jnp.float32), r), 0
            (acc, _), _ = jax.lax.scan(step, (jnp.float32(0), w), None,
                                       length=SCAN_BATCHES)
            return acc

        b2 = jax.jit(decode_win)(jnp.asarray(win_np[:2]))
        res = modem._result(np.asarray(b2[0]), None)
        assert res.crc_ok and res.payload == payload, "variant decode broken"

        w = jax.device_put(jnp.asarray(win_np))
        jax.device_get(scan(w)); jax.device_get(scan(w))
        t0 = time.perf_counter()
        outs = [scan(w) for _ in range(STEPS)]
        for o in outs:
            jax.device_get(o)
        return (time.perf_counter() - t0) / (STEPS * SCAN_BATCHES)
    finally:
        fused_eq.fused_shapes_ok = real_ok


def main():
    from gf3x import GF3_STANDARD, Modem

    rng = np.random.default_rng(7)
    modem = Modem(GF3_STANDARD)
    win, payload = build_windows(modem, rng)
    sym_per_step = B * modem.cfg.n_data_symbols

    t_fused = time_variant(modem, win, payload, use_pallas=None)
    t_split = time_variant(modem, win, payload, use_pallas=None,
                           force_split=True)
    t_xla = time_variant(modem, win, payload, use_pallas=False)

    out = {
        "config": "GF3_STANDARD prewindowed step, B=1024",
        "fused_ms": round(t_fused * 1e3, 3),
        "split_ms": round(t_split * 1e3, 3),
        "xla_ms": round(t_xla * 1e3, 3),
        "fused_msym_s": round(sym_per_step / t_fused / 1e6, 2),
        "split_msym_s": round(sym_per_step / t_split / 1e6, 2),
    }
    print(json.dumps(out))
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
