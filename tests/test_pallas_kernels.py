"""Pallas kernel logic tests (interpreter mode on the CPU test mesh).

The real-TPU speed/parity runs happen in bench.py and the verify drives;
these check that the kernels' message schedules match their XLA twins
bit-for-bit, which is what guarantees TPU decodes equal golden decodes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gf3x.fec.ldpc import LdpcCode
from gf3x.fec.codes import N_BLOCK_COLS
from gf3x.ops.pallas.ldpc_bp import LANES, minsum_totals_tpu


@pytest.mark.parametrize(
    "z", [24, pytest.param(96, marks=pytest.mark.slow)])  # z=96: 73 s;
# the production-z compiled kernel is re-verified on chip by tpu_parity
def test_ldpc_pallas_kernel_matches_xla(z):
    code = LdpcCode(z)
    rng = np.random.default_rng(z)
    B = LANES  # one lane block
    u = rng.integers(0, 2, size=(B, code.k), dtype=np.uint8)
    c = code.encode(u)
    sigma = 0.75
    y = (1.0 - 2.0 * c) + rng.normal(0, sigma, c.shape)
    llr = (2 * y / sigma**2).astype(np.float32)

    bits_xla = np.asarray(code.decode_jax(jnp.asarray(llr), 8, use_pallas=False))

    lam_t = jnp.asarray(llr).reshape(B, N_BLOCK_COLS, z).transpose(1, 2, 0)
    tot, diag = minsum_totals_tpu(lam_t, z, 8, interpret=True)
    total = np.asarray(tot).transpose(2, 0, 1).reshape(B, code.n)
    bits_pal = (total < 0).astype(np.uint8)[:, : code.k]

    assert np.array_equal(bits_pal, bits_xla)
    assert np.mean(bits_xla != u) < 0.01  # and it actually decodes
    # diag rows: iterations run (≤ budget) and per-lane unsat flags
    diag = np.asarray(diag)
    assert 1 <= diag[1, 0] <= 8
    assert diag[0].min() >= 0.0 and diag[0].max() <= 1.0


@pytest.mark.parametrize("bps", [2, 4, 6])
def test_fused_eq_demap_matches_xla(bps):
    """The fused Pallas EQ/track/demap kernel vs its XLA twin on real frame
    geometry at every constellation order — including the M=8 static
    level-set unroll (VERDICT r1 item 7: previously untested)."""
    import jax
    import numpy as np
    from gf3x import GF3_STANDARD, Modem
    from gf3x.ops.chanest import estimate_channel
    from gf3x.ops.ofdm import ofdm_demodulate

    cfg = GF3_STANDARD.replace(bits_per_symbol=bps, fec="none",
                               n_data_symbols=6, chanest_taps=0)
    m = Modem(cfg)
    rng = np.random.default_rng(bps)
    info = rng.integers(0, 2, (2, cfg.payload_bits_per_frame), dtype=np.uint8)
    wav = np.asarray(m.modulate_frames(jnp.asarray(info)))
    a = cfg.preamble_len - cfg.cp // 4
    need = (cfg.n_known_symbols + cfg.n_data_symbols) * cfg.symbol_len
    body = wav[:, a: a + need] + rng.normal(0, 3e-3, (2, need)).astype(np.float32)
    body = jnp.asarray(body.astype(np.float32))

    llr_x, (_, _, sl_x, cp_x, evm_x, mabs_x, *_r) = m._demod_prewindowed(
        body, use_pallas=False)
    # bring the XLA LLRs to the descrambled coded-stream order the fused
    # path emits (its descrambler is folded into the kernel)
    from gf3x.models.frame import interleave_bits
    llr_x = np.asarray(interleave_bits(cfg, llr_x, inverse=True)
                       if cfg.interleave else llr_x)
    llr_x = llr_x * (1.0 - 2.0 * m.lay.scramble)

    Y = ofdm_demodulate(cfg, body)
    H, nv = estimate_channel(cfg, Y[..., : cfg.n_known_symbols, :])
    fused, (_, _, sl_p, cp_p, evm_p, mabs_p) = m._fused_eq_demap(
        Y, H, nv, body.shape[:-1], interpret=True)
    llr_p = np.asarray(m._stream_llr(fused)).T[:2]          # (B, raw_bits)

    # identical hard decisions, near-identical soft values and diagnostics
    assert np.array_equal(llr_p < 0, llr_x < 0)
    scale = np.mean(np.abs(llr_x))
    assert np.max(np.abs(llr_p - llr_x)) < 0.02 * scale + 1e-3
    assert np.allclose(np.asarray(sl_p), np.asarray(sl_x), atol=1e-4)
    assert np.allclose(np.asarray(cp_p), np.asarray(cp_x), atol=1e-4)
    assert np.allclose(np.asarray(evm_p), np.asarray(evm_x), rtol=0.02, atol=1e-6)
    assert np.allclose(np.asarray(mabs_p), np.asarray(mabs_x), rtol=0.02)


def test_coded_64qam_roundtrip_e2e():
    """gf3-turbo (coded 64-QAM) end-to-end through delay + noise, golden and
    JAX bit-identical (VERDICT r1 item 7)."""
    import numpy as np
    from gf3x import GoldenModem, Modem, preset
    from gf3x.channel import awgn, delay_gain

    cfg = preset("gf3-turbo")
    assert cfg.bits_per_symbol == 6 and cfg.fec == "ldpc"
    m, g = Modem(cfg), GoldenModem(cfg)
    rng = np.random.default_rng(66)
    payload = bytes(rng.integers(0, 256, 1500, dtype=np.uint8))
    wav = m.encode(payload, "turbo.bin")
    rx = awgn(delay_gain(wav.astype(np.float64), 4000, 0.5,
                         total_len=len(wav) + 9000), 24.0, rng)
    res = m.decode(rx.astype(np.float32))
    gres = g.decode(rx)
    assert res.crc_ok and res.payload == payload
    assert gres.crc_ok and gres.payload == payload
    assert np.array_equal(res.bits, gres.bits)


@pytest.mark.parametrize("B", [8, 16])
def test_gather_cut_kernels_match_xla(B):
    """Both gather-cut DMA kernels (group-staged and per-row) return exactly
    the XLA fallback's windows for random block-aligned offsets, including
    rolls at every phase and windows clipped at the recording edge."""
    import jax

    from gf3x.ops.pallas.gather_cut import gather_cut_group_tpu, gather_cut_tpu

    from gf3x.ops.sync import max_cut_start

    rng = np.random.default_rng(B)
    block, need, T = 128, 3000, 20001   # ragged tail: T % block != 0
    nb = -(-(need + block) // block)
    nb = -(-nb // 8) * 8
    nf = T // block
    rx = rng.standard_normal((B, T)).astype(np.float32)
    starts = np.concatenate([
        rng.integers(0, max_cut_start(T, need, block), B - 2),
        [0, max_cut_start(T, need, block)],  # edges
    ]).astype(np.int32)
    q = np.clip(starts // block, 0, nf + 8 - nb)
    # reference semantics: whole-block prefix of rx, zero-extended by the
    # 8-block alignment slack
    rxe = np.pad(rx[:, : nf * block], ((0, 0), (0, 8 * block)))
    ref = np.stack([rxe[i, q[i] * block: (q[i] + nb) * block]
                    for i in range(B)])

    g = gather_cut_group_tpu(jnp.asarray(rx), jnp.asarray(q), block, nb,
                             True)
    assert np.array_equal(np.asarray(g), ref)

    r = gather_cut_tpu(jnp.asarray(rxe).reshape(B, nf + 8, block),
                       jnp.asarray(q), nb, True)
    assert np.array_equal(np.asarray(r).reshape(B, nb * block), ref)


def test_fused_shapes_ok_routing():
    """The VMEM-placement guard keeps the fused kernel off the shapes that
    blow the 16 MB scoped-VMEM limit on hardware, while keeping it for the
    bench shapes. Measured (tools/tpu_parity.py probes, r3): 64-QAM's
    kernel allocates a 21–23 MB scoped stack at ANY batch/chunking → always
    routed to the XLA twin; 16-QAM fits at the calibrated symbol chunking;
    QPSK unchanged. Degenerate pilot counts also route away."""
    from gf3x import GF3_STANDARD, ModemConfig, preset
    from gf3x.ops.pallas.fused_eq import fused_shapes_ok

    assert fused_shapes_ok(GF3_STANDARD, 1024)        # bench: clearly HBM
    assert fused_shapes_ok(preset("gf3-fast"), 1024)  # 16-QAM at dc=2
    assert not fused_shapes_ok(preset("gf3-fast"), 128)  # scoped-buf OOM
    assert not fused_shapes_ok(preset("gf3-turbo"), 1024)   # 64-QAM: always XLA
    assert not fused_shapes_ok(preset("gf3-turbo"), 1)
    assert not fused_shapes_ok(ModemConfig(pilot_spacing=0), 1024)
    assert not fused_shapes_ok(ModemConfig(pilot_spacing=280), 1024)


def test_cut_symbols_kernel_matches_xla():
    """The fused cut+CP-strip kernel returns exactly the gather_cut-derived
    symbol matrix and SC window on the CPU fallback path."""
    import jax

    from gf3x.ops.pallas.gather_cut import cut_symbols_tpu
    from gf3x.ops.sync import cut_symbols

    rng = np.random.default_rng(5)
    block, S, n_fft, cp = 128, 5, 512, 128
    sym_len = n_fft + cp
    body_off, sc_off = sym_len, 96
    T = 9000 + 77                       # ragged tail
    B = 16
    rx = rng.standard_normal((B, T)).astype(np.float32)
    starts = rng.integers(0, T - body_off - S * sym_len - 200, B).astype(np.int32)

    # reference: the XLA fallback (gather_cut + reshape/slice)
    ref_syms, ref_scw, ref_roll = cut_symbols(
        jnp.asarray(rx), jnp.asarray(starts), S=S, n_fft=n_fft,
        sym_len=sym_len, cp=cp, body_off=body_off, sc_off=sc_off, block=block)

    need = body_off + S * sym_len
    nb = -(-(need + block) // block)
    nb = -(-nb // 8) * 8
    nf = T // block
    q = np.clip(starts // block, 0, nf + 8 - nb)
    for rows in (8, 16):
        # whole-prefix staging (ws = nf, base 0 per group)
        qb = np.zeros(B // rows, np.int32)
        syms, scw = cut_symbols_tpu(jnp.asarray(rx), jnp.asarray(q),
                                    jnp.asarray(qb), block, S, n_fft,
                                    body_off, sym_len, cp, sc_off, rows,
                                    nf, True)
        assert np.array_equal(np.asarray(syms), np.asarray(ref_syms)), rows
        assert np.array_equal(np.asarray(scw), np.asarray(ref_scw)), rows
    assert np.array_equal(np.asarray(ref_roll), starts - q * block)


def test_cut_symbols_span_staging_matches_xla():
    """Bounded-span staging (per-group dynamic DMA base): identical output
    to the whole-prefix form when starts honor the declared span, including
    windows that overrun the whole-block prefix (zero tail)."""
    from gf3x.ops.sync import cut_symbols

    rng = np.random.default_rng(9)
    block, S, n_fft, cp = 128, 4, 512, 128
    sym_len = n_fft + cp
    body_off, sc_off = sym_len, 0
    T = 12 * 1024 + 31                   # ragged tail
    B = 32
    span = 2048
    rx = rng.standard_normal((B, T)).astype(np.float32)
    # starts bounded to [base0, base0 + span): the bounded-sync contract;
    # lands some windows past the whole-block prefix (zero-tail semantics)
    base0 = T - span - body_off - S * sym_len - 64
    starts = (base0 + rng.integers(0, span, B)).astype(np.int32)
    ref_syms, ref_scw, _ = cut_symbols(
        jnp.asarray(rx), jnp.asarray(starts), S=S, n_fft=n_fft,
        sym_len=sym_len, cp=cp, body_off=body_off, sc_off=sc_off,
        block=block)
    # the wrapper's span-mode routing math, driven through the kernel's
    # interpret mode (the CPU wrapper always takes the XLA fallback)
    from gf3x.ops.pallas.gather_cut import cut_symbols_tpu

    need = max(body_off + S * sym_len, sc_off + n_fft)
    nb = -(-(need + block) // block)
    nb = -(-nb // 8) * 8
    nf = T // block
    ws = min(span // block + 1 + nb, nf)
    q = np.clip(starts // block, 0, nf + 8 - nb)
    for rows in (8, 16):
        qb = np.clip(q.reshape(-1, rows).min(axis=1), 0, max(nf - ws, 0))
        qbr = np.repeat(qb, rows)
        qq = np.minimum(q, qbr + (ws - nb) + np.where(qbr >= nf - ws, 8, 0))
        syms, scw = cut_symbols_tpu(jnp.asarray(rx), jnp.asarray(qq),
                                    jnp.asarray(qb), block, S, n_fft,
                                    body_off, sym_len, cp, sc_off, rows,
                                    ws, True)
        assert np.array_equal(np.asarray(syms), np.asarray(ref_syms)), rows
        assert np.array_equal(np.asarray(scw), np.asarray(ref_scw)), rows

    # a start that VIOLATES the declared span clamps into it (the wrapper's
    # documented mis-cut semantics): the kernel at the clamped q equals the
    # XLA reference cut at the clamped start — never an out-of-bounds read
    rows = 8
    bad = starts.copy()
    bad[3] = 0                                     # far below the group span
    qv = np.clip(bad // block, 0, nf + 8 - nb)
    qbv = np.clip(qv.reshape(-1, rows).min(axis=1), 0, max(nf - ws, 0))
    qbr = np.repeat(qbv, rows)
    qc = np.minimum(qv, qbr + (ws - nb) + np.where(qbr >= nf - ws, 8, 0))
    # row 3's group min is now ~0, pulling its group's base down; every
    # in-span row still satisfies q - qb <= ws - nb only if the span holds,
    # so the OTHER rows of group 0 clamp — exercising the clamp path
    assert (qc != qv).any()
    syms, scw = cut_symbols_tpu(jnp.asarray(rx), jnp.asarray(qc),
                                jnp.asarray(qbv), block, S, n_fft,
                                body_off, sym_len, cp, sc_off, rows, ws,
                                True)
    ref_syms_c, ref_scw_c, _ = cut_symbols(
        jnp.asarray(rx), jnp.asarray(qc * block), S=S, n_fft=n_fft,
        sym_len=sym_len, cp=cp, body_off=body_off, sc_off=sc_off,
        block=block)
    assert np.array_equal(np.asarray(syms), np.asarray(ref_syms_c))
    assert np.array_equal(np.asarray(scw), np.asarray(ref_scw_c))


def test_cut_dft_kernel_small_geometry():
    """The fused cut+DFT kernel (interpret mode, tiny aligned geometry):
    spectra match a float64 cut+DFT reference to the bf16x3 floor, the
    group-major output layout maps (group, lane) → (symbol, batch row) as
    documented, the SC window is sample-exact, and deroll=True applies
    exactly the e^{+2πik·roll/N} ramp."""
    import ml_dtypes

    from gf3x.ops.pallas.cut_dft import cut_dft_tpu

    rng = np.random.default_rng(7)
    block, S, n_fft, cp, U, bin_lo = 128, 3, 512, 128, 72, 5
    sym_len = n_fft + cp
    body_off, sc_off = sym_len, 128
    B, rows = 8, 8
    T = 4096 + 55                      # ragged tail
    rx = rng.standard_normal((B, T)).astype(np.float32)
    q = rng.integers(0, 8, B).astype(np.int32)
    qb = np.zeros(1, np.int32)
    roll = rng.integers(0, block, B).astype(np.int32)
    nf = T // block

    # hand-built (U, n_fft) bf16 hi/lo tables with a folded scale
    inv = 1.0 / 3.7
    n = np.arange(n_fft)[None, :].astype(np.float64)
    k = np.arange(bin_lo, bin_lo + U)[:, None].astype(np.float64)
    th = 2.0 * np.pi * n * k / n_fft
    bf16 = np.dtype(ml_dtypes.bfloat16)
    tabs = []
    for t64 in (np.cos(th) * inv, -np.sin(th) * inv):
        t = t64.astype(np.float32)
        hi = t.astype(bf16)
        tabs += [hi, (t - hi.astype(np.float32)).astype(bf16)]

    # float64 reference: numpy cut at q·block, then exact DFT
    Tf = (T // block) * block
    rxz = np.concatenate([rx[:, :Tf], np.zeros((B, 9 * block), np.float32)], 1)
    ref = np.zeros((B, S, U), np.complex128)
    scw_ref = np.zeros((B, n_fft), np.float32)
    for i in range(B):
        w = rxz[i, q[i] * block:]
        for s in range(S):
            a = body_off + s * sym_len + cp
            x = w[a: a + n_fft].astype(np.float64)
            ref[i, s] = ((np.cos(th) @ x) - 1j * (np.sin(th) @ x)) * inv
        scw_ref[i] = w[sc_off: sc_off + n_fft]

    for deroll in (False, True):
        ygrp, scw = cut_dft_tpu(
            jnp.asarray(rx), jnp.asarray(q), jnp.asarray(qb),
            jnp.asarray(roll), tuple(jnp.asarray(t) for t in tabs), block,
            S, n_fft, body_off, sym_len, cp, sc_off, rows, nf, bin_lo,
            deroll, False, True)
        assert ygrp.shape == (B // rows, 2, U, S * rows)
        assert np.array_equal(np.asarray(scw), scw_ref)
        got = np.asarray(ygrp)
        # documented layout: lane j of group g is (symbol j // rows,
        # batch row g·rows + j % rows)
        Y = (got[:, 0] + 1j * got[:, 1]).reshape(B // rows, U, S, rows)
        Y = np.transpose(Y, (0, 3, 2, 1)).reshape(B, S, U)
        want = ref.copy()
        if deroll:
            kk = np.arange(bin_lo, bin_lo + U)[None, :]
            want = want * np.exp(2j * np.pi * kk
                                 * roll[:, None, None] / n_fft)
        rel = np.linalg.norm(Y - want) / np.linalg.norm(want)
        assert rel < 5e-5, (deroll, rel)


def test_cut_dft_kernel_lanes_output():
    """`lanes_out=True` (interpret mode): 128 // rows consecutive grid
    steps revisit one full 128-lane output block, so the kernel emits the
    EQ kernels' (S, 2, U, B) lanes layout directly — must equal the
    group-major output relaid out, stripe boundaries included."""
    import ml_dtypes

    from gf3x.ops.pallas.cut_dft import cut_dft_tpu

    rng = np.random.default_rng(17)
    block, S, n_fft, cp, U, bin_lo = 128, 3, 256, 128, 48, 2
    sym_len = n_fft + cp
    body_off, sc_off = sym_len, 0
    B, rows = 256, 32                  # gpb = 4, two revisited out blocks
    T = 3200
    rx = rng.standard_normal((B, T)).astype(np.float32)
    q = rng.integers(0, 4, B).astype(np.int32)
    qb = np.zeros(B // rows, np.int32)
    roll = rng.integers(0, block, B).astype(np.int32)
    nf = T // block

    inv = 1.0 / 2.1
    n = np.arange(n_fft)[None, :].astype(np.float64)
    k = np.arange(bin_lo, bin_lo + U)[:, None].astype(np.float64)
    th = 2.0 * np.pi * n * k / n_fft
    bf16 = np.dtype(ml_dtypes.bfloat16)
    tabs = []
    for t64 in (np.cos(th) * inv, -np.sin(th) * inv):
        t = t64.astype(np.float32)
        hi = t.astype(bf16)
        tabs += [hi, (t - hi.astype(np.float32)).astype(bf16)]
    args = (jnp.asarray(rx), jnp.asarray(q), jnp.asarray(qb),
            jnp.asarray(roll), tuple(jnp.asarray(t) for t in tabs), block,
            S, n_fft, body_off, sym_len, cp, sc_off, rows, nf, bin_lo,
            True)

    ygrp, scw_g = cut_dft_tpu(*args, False, True)     # group-major
    ylan, scw_l = cut_dft_tpu(*args, True, True)      # lanes
    assert ylan.shape == (S, 2, U, B)
    want = (np.asarray(ygrp).reshape(B // rows, 2, U, S, rows)
            .transpose(3, 1, 2, 0, 4).reshape(S, 2, U, B))
    assert np.array_equal(np.asarray(ylan), want)
    assert np.array_equal(np.asarray(scw_l), np.asarray(scw_g))


@pytest.mark.slow
def test_cut_dft_spectra_wrapper_matches_pair():
    """`cut_dft_spectra` (interpret mode, real GF3 geometry, span-staged)
    ≡ the cut_symbols → ofdm_dft_lanes → deroll chain it replaces, in the
    EQ kernels' lanes layout; CPU hosts without interpret get None (the
    two-stage fallback)."""
    from gf3x import GF3_STANDARD as cfg
    from gf3x.models.modem import Modem
    from gf3x.ops.ofdm import ofdm_dft_lanes
    from gf3x.ops.sync import cut_dft_spectra, cut_symbols

    rng = np.random.default_rng(3)
    modem = Modem(cfg, max_delay=1024 + cfg.cp)
    B = 8
    T = cfg.frame_len + 1024
    rx = rng.standard_normal((B, T)).astype(np.float32)
    base = (rng.integers(0, 1024, B) + cfg.chirp_len
            - cfg.cp // 4).astype(np.int32)
    S = cfg.n_known_symbols + cfg.n_data_symbols
    sc_off = cfg.cp + cfg.cp // 4 + 64
    span = modem.max_delay + 128

    assert cut_dft_spectra(cfg, jnp.asarray(rx), jnp.asarray(base), S=S,
                           body_off=cfg.sc_len, sc_off=sc_off,
                           max_start_span=span) is None  # CPU: fallback

    Yl, scw = cut_dft_spectra(cfg, jnp.asarray(rx), jnp.asarray(base), S=S,
                              body_off=cfg.sc_len, sc_off=sc_off,
                              max_start_span=span, interpret=True)
    syms, scw_ref, roll = cut_symbols(
        jnp.asarray(rx), jnp.asarray(base), S=S, n_fft=cfg.n_fft,
        sym_len=cfg.symbol_len, cp=cfg.cp, body_off=cfg.sc_len,
        sc_off=sc_off, block=128, max_start_span=span)
    ref = modem._deroll_lanes(ofdm_dft_lanes(cfg, syms), roll)
    assert Yl.shape == ref.shape == (S, 2, cfg.n_used, B)
    rel = float(jnp.linalg.norm(Yl - ref) / jnp.linalg.norm(ref))
    assert rel < 5e-5, rel
    assert np.array_equal(np.asarray(scw), np.asarray(scw_ref))


@pytest.mark.parametrize("bps", [2, 4, 6])
def test_stream_row_perm_layout_contract(bps):
    """The plane-major layout contract between the fused kernel and the FEC
    epilogue (pure-NumPy, no jit): `stream_row_perm` is injective into the
    plane rows, hits exactly the non-pilot bins, and the sign plane built
    from it is ±1 precisely on permuted rows and 0.0 everywhere else
    (pilot + pad rows) — the invariant that keeps the in-kernel Σ|llr|
    confidence sum payload-only."""
    from gf3x import GF3_STANDARD, Modem
    from gf3x.config import layout
    from gf3x.ops.pallas.fused_eq import plane_rows, stream_row_perm

    cfg = GF3_STANDARD.replace(bits_per_symbol=bps, fec="none")
    perm = stream_row_perm(cfg)
    R = cfg.n_data_bins * bps
    assert perm.shape == (R,)
    assert len(np.unique(perm)) == R                     # injective
    assert perm.min() >= 0 and perm.max() < plane_rows(cfg)
    # rows hit = every (plane, data bin); pilot bins never referenced
    lay = layout(cfg)
    bins_hit = np.unique(perm % cfg.n_used)
    assert np.array_equal(bins_hit, np.sort(lay.data_pos))
    assert not np.isin(lay.pilot_pos, bins_hit).any()
    # stream bit rho = k_data*bps + j maps to plane j, bin data_pos[k_data]
    rho = np.arange(R)
    assert np.array_equal(perm // cfg.n_used, rho % bps)
    assert np.array_equal(perm % cfg.n_used, lay.data_pos[rho // bps])

    plane = Modem(cfg)._sign_plane[..., 0]               # (D, LP)
    on = np.zeros(plane.shape, bool)
    on[:, perm] = True
    assert np.isin(plane[on], (-1.0, 1.0)).all()
    assert (plane[~on] == 0.0).all()


def test_lanes_row_idx_one_gather_matches_chain():
    """The r5 one-gather FEC ingest (`Modem._lanes_row_idx`) composes the
    plane-row permutation, interleaver inverse, and codeword split into a
    single static index array — pinned here against the three-step chain it
    replaced (pure NumPy, no jit)."""
    from gf3x import GF3_STANDARD, Modem
    from gf3x.models.frame import scatter_factors
    from gf3x.ops.pallas.fused_eq import plane_rows, stream_row_perm

    cfg = GF3_STANDARD
    assert cfg.fec == "ldpc" and cfg.interleave
    m = Modem(cfg)
    D, LP = cfg.n_data_symbols, plane_rows(cfg)
    R = cfg.bits_per_ofdm_symbol
    ncw, z = cfg.n_codewords, cfg.ldpc_z
    used = ncw * cfg.ldpc_n
    Bp = 4
    rng = np.random.default_rng(9)
    llr_p = rng.standard_normal((D, LP, Bp)).astype(np.float32)

    # the replaced chain: row gather → interleave inverse → codeword split
    x = llr_p[:, stream_row_perm(cfg), :]                 # (D, R, Bp)
    A2, B2 = scatter_factors(R)
    stream = (x.reshape(D, B2, A2, Bp).transpose(2, 1, 0, 3)
              .reshape(cfg.raw_bits_per_frame, Bp))
    lam_old = (stream[:used].reshape(ncw, 24, z, Bp)
               .transpose(1, 2, 0, 3).reshape(24, z, ncw * Bp))

    idx = m._lanes_row_idx
    assert idx.shape == (24, z, ncw)
    lam_new = (llr_p.reshape(D * LP, Bp)[idx.reshape(-1)]
               .reshape(24, z, ncw, Bp).reshape(24, z, ncw * Bp))
    assert np.array_equal(lam_new, lam_old)

    # and on a non-interleaved config the same property holds
    cfg2 = GF3_STANDARD.replace(interleave=False)
    m2 = Modem(cfg2)
    x2 = llr_p[:, stream_row_perm(cfg2), :].reshape(cfg2.raw_bits_per_frame, Bp)
    lam_old2 = (x2[:used].reshape(ncw, 24, z, Bp)
                .transpose(1, 2, 0, 3).reshape(24, z, ncw * Bp))
    lam_new2 = (llr_p.reshape(D * LP, Bp)[m2._lanes_row_idx.reshape(-1)]
                .reshape(24, z, ncw, Bp).reshape(24, z, ncw * Bp))
    assert np.array_equal(lam_new2, lam_old2)


@pytest.mark.parametrize("mode", ["qam64", "qam16", "loaded"])
def test_split_eq_demap_matches_xla(mode):
    """The r5 two-kernel split tail (ops/pallas/split_eq, interpret mode;
    tools/tpu_parity.py re-checks compiled Mosaic): EQ+track+derotate
    kernel A feeding the bin-chunked demap kernel B equals the XLA twin —
    hard decisions exact, soft LLRs and diag within the same tolerance the
    monolithic-kernel test uses. Covers the two configs the monolithic
    kernel refuses: 64-QAM and bit-loaded."""
    import jax

    from gf3x import Modem, ModemConfig
    from gf3x.ops.chanest import estimate_channel
    from gf3x.ops.ofdm import ofdm_demodulate

    base = ModemConfig(
        n_fft=256, cp=64, bin_lo=8, bin_hi=103, pilot_spacing=8,
        n_known_symbols=2, n_data_symbols=12, chirp_duration=0.02,
        fec="none", chanest_taps=0,
    )
    if mode == "loaded":
        rng0 = np.random.default_rng(2)
        tbl = tuple(int(x) for x in rng0.choice(
            [0, 2, 4, 6], size=base.validate().n_data_bins,
            p=[0.1, 0.4, 0.35, 0.15]))
        cfg = base.replace(bits_per_symbol=2, bit_loading=tbl).validate()
    else:
        cfg = base.replace(
            bits_per_symbol=6 if mode == "qam64" else 4).validate()
    m = Modem(cfg)
    rng = np.random.default_rng(7)
    B = 4
    info = rng.integers(0, 2, (B, cfg.payload_bits_per_frame), dtype=np.uint8)
    wav = np.asarray(jax.jit(m.modulate_frames)(info))
    a = cfg.preamble_len - cfg.cp // 4
    need = (cfg.n_known_symbols + cfg.n_data_symbols) * cfg.symbol_len
    body = wav[:, a: a + need] + rng.normal(0, 2e-3, (B, need))
    body = jnp.asarray(body.astype(np.float32))

    def xla_path(b):
        llr, (H, nv, slope, cpe, evm, mabs, *_r) = m._demod_prewindowed(
            b, use_pallas=False)
        return m.coded_stream_llr(llr, b.shape[:-1]), slope, cpe, evm, mabs

    def split_path(b):
        syms = m._sym_matrix(b)
        Y = ofdm_demodulate(cfg, b)
        H, nv = estimate_channel(cfg, Y[..., : cfg.n_known_symbols, :])
        fused, (_, _, slope, cpe, evm, mabs) = m._split_eq_demap(
            Y, H, nv, b.shape[:-1], interpret=True)
        return m.coded_stream_llr(fused, b.shape[:-1]), slope, cpe, evm, mabs

    lx, sx, cx, ex, mx = jax.jit(xla_path)(body)
    lp, sp_, cp_, ep, mp = jax.jit(split_path)(body)
    lx, lp = np.asarray(lx), np.asarray(lp)
    assert np.array_equal(lp < 0, lx < 0)                  # hard-exact
    scale = float(np.mean(np.abs(lx)))
    assert float(np.max(np.abs(lp - lx))) / scale < 0.03
    assert np.allclose(np.asarray(sp_), np.asarray(sx), atol=1e-3)
    assert np.allclose(np.asarray(cp_), np.asarray(cx), atol=1e-3)
    assert np.allclose(np.asarray(ep), np.asarray(ex), rtol=0.05, atol=1e-6)
    assert np.allclose(np.asarray(mp), np.asarray(mx), rtol=0.05)


def test_ofdm_dft_lanes_matches_reference():
    """`ofdm_dft_lanes` (the r5 einsum DFT emitting the kernels' lanes
    layout inside the matmul epilogue) equals the rfft reference and
    `_deroll_lanes` equals `_deroll`, on CPU at f32 tolerance."""
    import jax

    from gf3x import GF3_STANDARD, Modem
    from gf3x.ops.ofdm import ofdm_dft, ofdm_dft_lanes

    cfg = GF3_STANDARD.replace(n_data_symbols=4, fec="none")
    m = Modem(cfg)
    S = cfg.n_known_symbols + cfg.n_data_symbols
    rng = np.random.default_rng(5)
    B = 3
    x = jnp.asarray(rng.standard_normal((B, S, cfg.n_fft)).astype(np.float32))
    Yl = np.asarray(jax.jit(lambda a: ofdm_dft_lanes(cfg, a))(x))
    Yc = np.asarray(jax.jit(lambda a: jnp.stack(
        [(Y := ofdm_dft(cfg, a)).real, Y.imag], 0))(x))   # (2, B, S, U)
    ref = Yc.transpose(2, 0, 3, 1)                        # (S, 2, U, B)
    scale = np.mean(np.abs(ref))
    assert np.max(np.abs(Yl - ref)) < 1e-3 * scale

    # warped (delta) form too
    d = jnp.float32(3e-4)
    Yld = np.asarray(jax.jit(lambda a: ofdm_dft_lanes(cfg, a, d))(x))
    Ycd = np.asarray(jax.jit(lambda a: jnp.stack(
        [(Y := ofdm_dft(cfg, a, d)).real, Y.imag], 0))(x))
    refd = Ycd.transpose(2, 0, 3, 1)
    assert np.max(np.abs(Yld - refd)) < 1e-3 * np.mean(np.abs(refd))

    # deroll parity between the complex and lanes forms
    roll = jnp.asarray(np.array([5, 0, 37], np.int32))
    Zl = np.asarray(jax.jit(lambda a, r: m._deroll_lanes(
        ofdm_dft_lanes(cfg, a), r))(x, roll))
    Zc = np.asarray(jax.jit(lambda a, r: jnp.stack(
        [(Y := m._deroll(ofdm_dft(cfg, a), r)).real, Y.imag], 0))(x, roll))
    refz = Zc.transpose(2, 0, 3, 1)
    assert np.max(np.abs(Zl - refz)) < 2e-3 * np.mean(np.abs(refz))
