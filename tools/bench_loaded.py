#!/usr/bin/env python
"""Measure the bit-loaded receive-tail penalty (VERDICT r3 item 3).

The fused Pallas EQ/demap kernel excludes bit-loaded configs
(models/modem.py routes `cfg.bit_loading is not None` to the XLA twin).
This harness quantifies what that exclusion costs on the flagship adaptive
mode — `gf3-hicap` + a realistic mixed loading table — by timing the
prewindowed decode scan (the streaming receiver's steady state, same
measurement shape as bench.py) at B=1024 on chip for three variants:

  hicap_fused   gf3-hicap, loading None, fused Pallas tail   (the default)
  hicap_xla     gf3-hicap, loading None, forced XLA twin     (isolates the
                fused-kernel benefit at this geometry)
  hicap_loaded  gf3-hicap + mixed 0/2/4/6 loading, XLA loaded tail

Prints one JSON line with per-variant step_ms and symbols/s. The
hicap_xla − hicap_fused gap bounds what a loaded fused kernel could
recover; hicap_loaded vs hicap_xla shows what the group-sorted demap
itself adds on top of the plain XLA tail.
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


def time_variant(modem, win_np, payload, use_pallas):
    import jax
    import jax.numpy as jnp

    cfg = modem.cfg
    need = (cfg.n_known_symbols + cfg.n_data_symbols) * cfg.symbol_len
    a = cfg.preamble_len - cfg.cp // 4

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

    # correctness gate: this variant actually decodes the payload
    # (jitted — the axon backend lacks eager implementations of some ops)
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


def main():
    from gf3x import Modem, preset

    rng = np.random.default_rng(7)
    out = {}

    hicap = preset("gf3-hicap")
    mh = Modem(hicap)
    win, pay = build_windows(mh, rng)
    for name, up in (("hicap_fused", True), ("hicap_xla", False)):
        dt = time_variant(mh, win, pay, up)
        out[name] = {"step_ms": round(dt * 1e3, 3),
                     "symbols_per_sec": round(B * hicap.n_data_symbols / dt, 1)}

    # realistic mixed table on the hicap geometry (same draw family as the
    # tpu_parity bit-loaded fixture; hicap's 16-QAM mean order)
    table = tuple(int(x) for x in np.random.default_rng(5).choice(
        [0, 2, 4, 6], size=hicap.n_data_bins, p=[0.1, 0.25, 0.45, 0.2]))
    cfgL = hicap.replace(bit_loading=table)
    mL = Modem(cfgL)
    winL, payL = build_windows(mL, rng)
    # router (use_pallas=None): since r5 this lands on the two-kernel
    # SPLIT Pallas tail; use_pallas=False pins the old XLA loaded tail
    # for the before/after
    dt = time_variant(mL, winL, payL, None)
    out["hicap_loaded_split"] = {
        "step_ms": round(dt * 1e3, 3),
        "symbols_per_sec": round(B * cfgL.n_data_symbols / dt, 1),
        "bits_per_ofdm_symbol": cfgL.bits_per_ofdm_symbol,
    }
    dtx = time_variant(mL, winL, payL, False)
    out["hicap_loaded_xla"] = {
        "step_ms": round(dtx * 1e3, 3),
        "symbols_per_sec": round(B * cfgL.n_data_symbols / dtx, 1),
    }

    # gf3-turbo (uniform 64-QAM): split tail vs the XLA tail it replaces
    turbo = preset("gf3-turbo")
    mt = Modem(turbo)
    winT, payT = build_windows(mt, rng)
    dts = time_variant(mt, winT, payT, None)      # router → split (r5)
    dtxt = time_variant(mt, winT, payT, False)
    out["turbo_split"] = {
        "step_ms": round(dts * 1e3, 3),
        "symbols_per_sec": round(B * turbo.n_data_symbols / dts, 1)}
    out["turbo_xla"] = {
        "step_ms": round(dtxt * 1e3, 3),
        "symbols_per_sec": round(B * turbo.n_data_symbols / dtxt, 1)}

    out["fused_vs_xla_gap_ms"] = round(
        out["hicap_xla"]["step_ms"] - out["hicap_fused"]["step_ms"], 3)
    out["loaded_split_gain_ms"] = round(
        out["hicap_loaded_xla"]["step_ms"]
        - out["hicap_loaded_split"]["step_ms"], 3)
    out["turbo_split_gain_ms"] = round(
        out["turbo_xla"]["step_ms"] - out["turbo_split"]["step_ms"], 3)
    print(json.dumps(out))
    from pathlib import Path
    Path(__file__).with_name("bench_loaded.json").write_text(
        json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
