#!/usr/bin/env python
"""Runnable on-TPU parity gate (SURVEY.md §5 test pyramid, §8 risks):
everything CI checks in interpret mode, re-verified on the REAL chip.

CI's Pallas tests run the kernels in interpreter mode on the CPU mesh; the
compiled Mosaic kernels and the bf16x3 DFT matmuls only ever execute on
hardware. This script fails loudly (exit 1) if the hardware path diverges:

1. the four frozen capture WAVs decode bit-exact (sha256 vs the manifest);
2. fused EQ/demap kernel ≡ XLA twin on real frame geometry (hard decisions
   exact, soft LLRs within tolerance) at QPSK/16-QAM/64-QAM;
3. Pallas LDPC ≡ XLA min-sum, bit-exact, including the early-exit pass
   count and unsat diag;
4. gather_cut / cut_symbols DMA kernels ≡ the XLA fallback, sample-exact;
5. the HIGH-precision (bf16x3) demod DFT holds its error floor vs a float64
   NumPy reference (ADVICE r2: the floor rested on one manual measurement —
   a future XLA change to HIGH's implementation must not silently degrade
   LLR quality).

Writes tools/tpu_parity.json with per-check results. Run: python tools/tpu_parity.py
"""

import hashlib
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

RESULTS: list[dict] = []


def check(name: str, ok: bool, detail: str = ""):
    RESULTS.append({"check": name, "ok": bool(ok), "detail": detail})
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")


def main() -> int:
    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon") or "TPU" in str(dev)
    print(f"device: {dev} (tpu={on_tpu})")
    if not on_tpu:
        print("ERROR: this gate must run on the real TPU "
              "(it re-verifies what CI can only interpret)")
        return 2

    from gf3x import GF3_STANDARD, Modem, preset
    from gf3x.io import read_wav
    from gf3x.models.stream import decode_stream

    # ---- 1. frozen captures decode bit-exact on hardware
    fixtures = Path(__file__).resolve().parent.parent / "tests" / "fixtures"
    manifest = json.loads((fixtures / "manifest.json").read_text())
    from gf3x.utils.captures import capture_config

    for cap in manifest["captures"]:
        rx, _ = read_wav(fixtures / cap["wav"])
        res = decode_stream(Modem(capture_config(cap)), rx)
        ok = (res.complete
              and hashlib.sha256(res.payload).hexdigest() == cap["payload_sha256"])
        check(f"capture:{cap['wav']}", ok,
              f"{cap['n_frames']} frame(s), {cap['payload_len']} B")

    # ---- 2. fused EQ/demap kernel vs XLA twin, compiled Mosaic
    from gf3x.models.frame import interleave_bits
    from gf3x.ops.chanest import estimate_channel
    from gf3x.ops.ofdm import ofdm_demodulate

    from gf3x.ops.pallas.fused_eq import fused_shapes_ok

    for bps in (2, 4):
        cfg = GF3_STANDARD.replace(bits_per_symbol=bps, fec="none",
                                   chanest_taps=0)
        m = Modem(cfg)
        rng = np.random.default_rng(bps)
        # the bench batch: a shape the production router actually sends to
        # the kernel (smaller batches are refused by fused_shapes_ok — XLA
        # scopes their mid-size buffers into VMEM and OOMs the 16 MB limit;
        # 64-QAM is routed to the XLA twin outright: its kernel's scoped
        # stack measures 21-23 MB on v5e at any chunking — checked below)
        B = 1024
        assert fused_shapes_ok(cfg, B), (bps, B)
        info = rng.integers(0, 2, (B, cfg.payload_bits_per_frame),
                            dtype=np.uint8)
        # _encode_jit, not bare modulate_frames: eager complex ops are
        # unimplemented on the axon backend
        wav = np.asarray(m._encode_jit(jnp.asarray(info)))
        a = cfg.preamble_len - cfg.cp // 4
        need = (cfg.n_known_symbols + cfg.n_data_symbols) * cfg.symbol_len
        body = wav[:, a: a + need] + rng.normal(0, 3e-3, (B, need))
        body = jnp.asarray(body.astype(np.float32))

        llr_x, _ = jax.jit(lambda b: m._demod_prewindowed(
            b, use_pallas=False))(body)
        llr_x = np.asarray(interleave_bits(cfg, llr_x, inverse=True))
        llr_x = llr_x * (1.0 - 2.0 * m.lay.scramble)

        def fused_path(b):
            Y = ofdm_demodulate(cfg, b)
            H, nv = estimate_channel(cfg, Y[..., : cfg.n_known_symbols, :])
            fused, _ = m._fused_eq_demap(Y, H, nv, b.shape[:-1])
            return m._stream_llr(fused)
        llr_p = np.asarray(jax.jit(fused_path)(body)).T[:B]

        hard_ok = np.array_equal(llr_p < 0, llr_x < 0)
        scale = float(np.mean(np.abs(llr_x)))
        soft_err = float(np.max(np.abs(llr_p - llr_x))) / (scale + 1e-12)
        check(f"fused_eq:{bps}bps", hard_ok and soft_err < 0.03,
              f"max soft err {soft_err:.2e} of mean |LLR|")

    # 64-QAM: the router must refuse the MONOLITHIC kernel (scoped-VMEM
    # overflow, see fused_shapes_ok) and take the r5 two-kernel SPLIT tail
    # (ops/pallas/split_eq) instead; a coded gf3-turbo frame must decode
    # end to end on the chip through it
    from gf3x.ops.pallas.split_eq import split_shapes_ok

    cfg6 = preset("gf3-turbo")
    assert not fused_shapes_ok(cfg6, 1024)
    assert split_shapes_ok(cfg6, 1024)
    m6 = Modem(cfg6)
    rng = np.random.default_rng(66)
    pay6 = bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
    wav6 = m6.encode(pay6, "t.bin")
    rx6 = np.zeros(wav6.size + 4000, np.float32)
    rx6[1500: 1500 + wav6.size] = 0.6 * wav6
    rx6 += (rng.standard_normal(rx6.size) * 3e-3).astype(np.float32)
    r6 = m6.decode(rx6)
    check("qam64_split_decode", r6.crc_ok and r6.payload == pay6,
          "gf3-turbo on-chip decode via the split Pallas tail")

    # 2b. compiled split kernels ≡ XLA twin at the bench batch: hard
    # decisions exact, soft LLRs within the monolithic check's tolerance —
    # at 64-QAM (uniform split) AND a bit-loaded gf3-standard config
    # (per-group split), the two shapes CI can only interpret
    from gf3x.ops.ofdm import ofdm_demodulate as _odm

    cfgL0 = GF3_STANDARD.replace(bit_loading=tuple(
        int(x) for x in np.random.default_rng(5).choice(
            [0, 2, 4, 6], size=GF3_STANDARD.n_data_bins,
            p=[0.1, 0.4, 0.35, 0.15])), fec="none", chanest_taps=0)
    for label, cfgS in (("qam64", cfg6.replace(fec="none", chanest_taps=0)),
                        ("loaded", cfgL0)):
        mS = Modem(cfgS)
        rngS = np.random.default_rng(31)
        B = 1024
        infoS = rngS.integers(0, 2, (B, cfgS.payload_bits_per_frame),
                              dtype=np.uint8)
        wavS = np.asarray(mS._encode_jit(jnp.asarray(infoS)))
        aS = cfgS.preamble_len - cfgS.cp // 4
        needS = (cfgS.n_known_symbols + cfgS.n_data_symbols) * cfgS.symbol_len
        bodyS = wavS[:, aS: aS + needS] + rngS.normal(0, 3e-3, (B, needS))
        bodyS = jnp.asarray(bodyS.astype(np.float32))

        def xla_s(b, mS=mS):
            llr, _ = mS._demod_prewindowed(b, use_pallas=False)
            return mS.coded_stream_llr(llr, b.shape[:-1])

        def split_s(b, mS=mS, cfgS=cfgS):
            from gf3x.ops.chanest import estimate_channel as _ec
            Y = _odm(cfgS, b)
            H, nv = _ec(cfgS, Y[..., : cfgS.n_known_symbols, :])
            fused, _ = mS._split_eq_demap(Y, H, nv, b.shape[:-1])
            return mS.coded_stream_llr(fused, b.shape[:-1])

        lx = np.asarray(jax.jit(xla_s)(bodyS))
        lp = np.asarray(jax.jit(split_s)(bodyS))
        hard_ok = np.array_equal(lp < 0, lx < 0)
        scale = float(np.mean(np.abs(lx)))
        soft_err = float(np.max(np.abs(lp - lx))) / (scale + 1e-12)
        check(f"split_eq:{label}", hard_ok and soft_err < 0.03,
              f"max soft err {soft_err:.2e} of mean |LLR|")

    # ---- 3. Pallas LDPC vs XLA min-sum, bit-exact + diag
    from gf3x.fec.codes import N_BLOCK_COLS
    from gf3x.fec.ldpc import LdpcCode

    code = LdpcCode(96)
    rng = np.random.default_rng(7)
    Bc = 512
    u = rng.integers(0, 2, size=(Bc, code.k), dtype=np.uint8)
    c = code.encode(u)
    sigma = np.where(np.arange(Bc)[:, None] % 2 == 0, 0.45, 0.75)
    y = (1.0 - 2.0 * c) + rng.normal(0, 1.0, c.shape) * sigma
    llr = (2 * y / sigma**2).astype(np.float32)
    bx, itx, unx = code.decode_jax(jnp.asarray(llr), 30, use_pallas=False,
                                   with_diag=True)
    lam_t = jnp.asarray(llr).reshape(Bc, N_BLOCK_COLS, code.z).transpose(1, 2, 0)
    tot, itp, unp = code.decode_lanes(lam_t, 30, use_pallas=True)
    totn = np.asarray(tot).transpose(2, 0, 1).reshape(Bc, code.n)
    bp = (totn < 0).astype(np.uint8)[:, : code.k]
    bits_ok = np.array_equal(bp, np.asarray(bx))
    unsat_ok = np.array_equal(np.asarray(unp), np.asarray(unx))
    check("ldpc_pallas", bits_ok and unsat_ok,
          f"iters xla={int(np.max(np.asarray(itx)))} "
          f"pallas_max={int(np.max(np.asarray(itp)))}")

    # ---- 3b. multi-rate family on chip: Pallas ≡ XLA at rate 3/4 and the
    # gf3-hicap preset decodes a coded frame end to end on hardware
    code34 = LdpcCode(96, "3/4")
    u = rng.integers(0, 2, size=(256, code34.k), dtype=np.uint8)
    c = code34.encode(u)
    y = (1.0 - 2.0 * c) + rng.normal(0, 0.62, c.shape)
    llr34 = (2 * y / 0.62**2).astype(np.float32)
    bx34 = code34.decode_jax(jnp.asarray(llr34), 30, use_pallas=False)
    lam34 = jnp.asarray(llr34).reshape(256, N_BLOCK_COLS, 96).transpose(1, 2, 0)
    tot34, _, _ = code34.decode_lanes(lam34, 30, use_pallas=True)
    bp34 = (np.asarray(tot34).transpose(2, 0, 1)
            .reshape(256, code34.n)[:, : code34.k] < 0).astype(np.uint8)
    check("ldpc_pallas_rate34", np.array_equal(bp34, np.asarray(bx34)), "")

    mh = Modem(preset("gf3-hicap"))
    payh = bytes(rng.integers(0, 256, 1500, dtype=np.uint8))
    wavh = mh.encode(payh, "h.bin")
    rxh = np.zeros(wavh.size + 4000, np.float32)
    rxh[1100: 1100 + wavh.size] = 0.7 * wavh
    rxh += (rng.standard_normal(rxh.size) * 2e-3).astype(np.float32)
    rh = mh.decode(rxh)
    check("hicap_decode", rh.crc_ok and rh.payload == payh,
          "16-QAM rate-3/4 on-chip decode")

    # ---- 3c. bit-loaded config on chip (SPEC §5b): the router must refuse
    # the fused kernel and the XLA tail must decode bit-identically to the
    # float64 golden twin on the same recording
    from gf3x import GoldenModem
    cfgL = GF3_STANDARD.replace(bit_loading=tuple(
        int(x) for x in np.random.default_rng(5).choice(
            [0, 2, 4, 6], size=GF3_STANDARD.n_data_bins,
            p=[0.1, 0.4, 0.35, 0.15])))
    mL = Modem(cfgL)
    payL = bytes(rng.integers(0, 256, 600, dtype=np.uint8))
    wavL = np.asarray(mL.encode(payL, "l.bin"))
    rxL = np.zeros(wavL.size + 3000, np.float32)
    rxL[900: 900 + wavL.size] = 0.8 * wavL
    rxL += (rng.standard_normal(rxL.size) * 2e-3).astype(np.float32)
    rL = mL.decode(rxL)
    rG = GoldenModem(cfgL).decode(rxL.astype(np.float64))
    check("bit_loading_decode",
          rL.crc_ok and rL.payload == payL
          and np.array_equal(rL.bits, rG.bits),
          f"{cfgL.bits_per_ofdm_symbol} bits/sym, golden-bit-exact on chip")

    # ---- 4. DMA cut kernels vs XLA fallback, sample-exact
    from gf3x.ops.pallas.gather_cut import gather_cut_group_tpu
    from gf3x.ops.sync import max_cut_start

    rng = np.random.default_rng(11)
    block, need, T, Bq = 128, 34048, 50001, 64
    nb = -(-(need + block) // block)
    nb = -(-nb // 8) * 8
    nf = T // block
    rxq = rng.standard_normal((Bq, T)).astype(np.float32)
    starts = rng.integers(0, max_cut_start(T, need, block), Bq).astype(np.int32)
    q = np.clip(starts // block, 0, nf + 8 - nb)
    rxe = np.pad(rxq[:, : nf * block], ((0, 0), (0, 8 * block)))
    ref = np.stack([rxe[i, q[i] * block: (q[i] + nb) * block] for i in range(Bq)])
    g = np.asarray(gather_cut_group_tpu(jnp.asarray(rxq), jnp.asarray(q),
                                        block, nb))
    check("gather_cut_group", np.array_equal(g, ref), f"B={Bq} nb={nb}")

    # the GF3 production geometry (every extraction offset 128-aligned —
    # the kernel's documented contract; unaligned geometries route to XLA).
    # Driven through the public wrapper, which on TPU routes to the Pallas
    # kernel — whole-prefix mode and span-bounded staging mode both.
    from gf3x.ops.sync import cut_symbols

    S, n_fft, cp = 8, 1024, 256
    sym_len = n_fft + cp
    body_off, sc_off = sym_len, cp + cp // 4 + block // 2
    def cut_ref(st):
        win = np.stack([rxe[i, (st[i] // block) * block:
                             (st[i] // block) * block + nb * block]
                        for i in range(Bq)])
        bodyref = win[:, body_off: body_off + S * sym_len]
        return (bodyref.reshape(Bq, S, sym_len)[..., cp: cp + n_fft],
                win[:, sc_off: sc_off + n_fft])

    # narrow-span starts (the bounded-sync production case) + full-range
    span2 = 4096
    starts2 = (2048 + (starts % span2)).astype(np.int32)
    for span, st in ((None, starts), (span2, starts2)):
        sref, scref = cut_ref(st)
        syms, scw, _ = cut_symbols(
            jnp.asarray(rxq), jnp.asarray(st), S=S, n_fft=n_fft,
            sym_len=sym_len, cp=cp, body_off=body_off, sc_off=sc_off,
            block=block, max_start_span=span)
        check(f"cut_symbols:span={span}",
              np.array_equal(np.asarray(syms), sref)
              and np.array_equal(np.asarray(scw), scref), "")

    # ---- 4a. fused cut+DFT kernel (ops/pallas/cut_dft.py) vs the
    # cut_symbols → ofdm_dft → deroll pair it replaces: lanes-layout
    # spectra within the shared bf16x3 floor, SC window sample-exact, at
    # the real GF3 geometry in span-staged mode (the bench path)
    from gf3x.models.modem import Modem as _M
    from gf3x.ops.ofdm import ofdm_dft_lanes
    from gf3x.ops.sync import cut_dft_spectra

    cfgF = GF3_STANDARD
    mF = _M(cfgF, max_delay=4096 + cfgF.cp)
    mF.use_cut_dft = True              # force the fused route under test
    SF = cfgF.n_known_symbols + cfgF.n_data_symbols
    sc_offF = cfgF.cp + cfgF.cp // 4 + block // 2
    spanF = mF.max_delay + block
    TF = cfgF.frame_len + 4096
    rxF = rng.standard_normal((64, TF)).astype(np.float32) * 0.05
    stF = (rng.integers(0, 4096, 64) + cfgF.chirp_len
           - cfgF.cp // 4).astype(np.int32)

    def pairF(r, st):
        syms, scw, roll = cut_symbols(
            r, st, S=SF, n_fft=cfgF.n_fft, sym_len=cfgF.symbol_len,
            cp=cfgF.cp, body_off=cfgF.sc_len, sc_off=sc_offF, block=block,
            max_start_span=spanF)
        return mF._deroll_lanes(ofdm_dft_lanes(cfgF, syms), roll), scw

    def fusedF(r, st):
        return cut_dft_spectra(cfgF, r, st, S=SF, body_off=cfgF.sc_len,
                               sc_off=sc_offF, block=block,
                               max_start_span=spanF)

    Ya, sca = jax.jit(pairF)(jnp.asarray(rxF), jnp.asarray(stF))
    Yb, scb = jax.jit(fusedF)(jnp.asarray(rxF), jnp.asarray(stF))
    relF = float(jnp.linalg.norm(Yb - Ya) / jnp.linalg.norm(Ya))
    check("cut_dft_spectra", relF < 5e-5
          and np.array_equal(np.asarray(sca), np.asarray(scb)),
          f"lanes spectra rel {relF:.2e} (bf16x3 floor), scw exact")

    # full receiver through the fused route vs the two-stage route: the
    # decoded payload bits must agree bit-exactly AND equal the truth
    import gf3x.ops.sync as _sync
    rng2 = np.random.default_rng(23)
    infoF = rng2.integers(0, 2, (16, cfgF.payload_bits_per_frame),
                          dtype=np.uint8)
    wavF = np.asarray(mF._encode_jit(jnp.asarray(infoF)))
    rxD = np.zeros((16, TF), np.float32)
    for i in range(16):
        d = int(rng2.integers(0, 4096))
        rxD[i, d: d + wavF.shape[-1]] = 0.7 * wavF[i]
    rxD += (rng2.standard_normal(rxD.shape) * 2e-3).astype(np.float32)
    bitsN, _ = jax.jit(mF.demodulate)(rxD)            # fused route (default)
    real_cds = _sync.cut_dft_spectra
    try:
        _sync.cut_dft_spectra = lambda *a, **k: None  # force two-stage route
        mO = _M(cfgF, max_delay=4096 + cfgF.cp)
        bitsO, _ = jax.jit(mO.demodulate)(rxD)
    finally:
        _sync.cut_dft_spectra = real_cds
    check("cut_dft_decode",
          np.array_equal(np.asarray(bitsN), np.asarray(bitsO))
          and np.array_equal(np.asarray(bitsN), infoF),
          "fused-route decode ≡ two-stage route ≡ truth (16 synced frames)")

    # ---- 4b. sharded_decode on a real-TPU mesh with the Pallas kernels
    # ENGAGED (r4 VERDICT item 1a): shard_map gives each shard local
    # shapes, so this exercises NamedSharding + shard_map + compiled
    # pallas_call lowering — the exact composition a multi-chip mesh runs —
    # at one chip. Bit-parity vs the unsharded jit of the same receiver.
    from jax.sharding import Mesh
    from gf3x.parallel import sharded_decode

    m1 = Modem(GF3_STANDARD)
    rng = np.random.default_rng(21)
    Bs = 16
    info_s = rng.integers(0, 2, (Bs, GF3_STANDARD.payload_bits_per_frame),
                          dtype=np.uint8)
    wavs = np.asarray(m1._encode_jit(jnp.asarray(info_s)))
    Ts = wavs.shape[-1] + 2048
    rxs = np.zeros((Bs, Ts), np.float32)
    for i in range(Bs):
        rxs[i, 400 + 16 * i: 400 + 16 * i + wavs.shape[-1]] = 0.7 * wavs[i]
    rxs += (rng.standard_normal(rxs.shape) * 2e-3).astype(np.float32)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("dp",))
    bits_sh, diag_sh = sharded_decode(m1, mesh1)(rxs)
    bits_un, _ = jax.jit(m1.demodulate)(rxs)
    check("sharded_pallas_decode",
          np.array_equal(np.asarray(bits_sh), np.asarray(bits_un))
          and np.array_equal(np.asarray(bits_sh), info_s),
          "shard_map mesh decode ≡ unsharded, Pallas engaged")

    # ---- 5. demod DFT precision floor (bf16x3 vs float64 reference)
    from gf3x.config import layout
    from gf3x.ops.ofdm import ofdm_dft

    cfg = GF3_STANDARD
    lay = layout(cfg)
    rng = np.random.default_rng(13)
    x = rng.standard_normal((64, 8, cfg.n_fft)).astype(np.float32)
    Yt = np.asarray(jax.jit(lambda s: jnp.stack(
        [(Y := ofdm_dft(cfg, s)).real, Y.imag], -1))(jnp.asarray(x)))
    Y64 = np.fft.rfft(x.astype(np.float64), cfg.n_fft)[..., lay.used_bins] \
        / cfg.ofdm_scale
    err = Yt[..., 0] + 1j * Yt[..., 1] - Y64
    rel = float(np.sqrt(np.mean(np.abs(err) ** 2) / np.mean(np.abs(Y64) ** 2)))
    floor_db = 20 * np.log10(rel + 1e-300)
    check("demod_dft_precision", floor_db < -80.0,
          f"error floor {floor_db:.1f} dB (gate −80, measured −100 class)")

    out = {"device": str(dev), "when": time.strftime("%Y-%m-%d %H:%M:%S"),
           "ok": all(r["ok"] for r in RESULTS), "checks": RESULTS}
    path = Path(__file__).resolve().parent / "tpu_parity.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"\nwrote {path}  ok={out['ok']}")
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
