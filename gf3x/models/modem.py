"""The TPU-native modem: jitted, batched `encode(bytes)→waveform` /
`decode(waveform)→bytes` (reference L6 public API, BASELINE.json:5).

Design (SURVEY.md §8): every stage is a pure function of statically-shaped
arrays; `ModemConfig` is closed over as a static constant, so one `Modem`
instance compiles one XLA program per (batch, recording-length) signature.
Batching over frames is a leading axis throughout — the ≥100× throughput
lever (BASELINE.json:5 "batched frames"; SURVEY.md §3.2 frame-batch data
parallelism). The data-dependent frame start is handled with clamped
`dynamic_slice` over a fixed frame window, never Python control flow.

Host boundaries are thin: byte↔bit packing and header parsing live on the
host; everything between waveform in and LLR/bits out runs on device.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ModemConfig, layout
from ..ops.chanest import equalize, estimate_channel, pilot_phase_correct
from ..ops.chirp import make_chirp
from ..ops.constellation import hard_bits, qam_demap_llr, qam_map
from ..ops.ofdm import ofdm_demodulate, ofdm_modulate
from ..ops.sync import find_frame_start
from ..utils.bits import bits_to_bytes, bytes_to_bits, pack_header
from .frame import data_symbols_from_bits, frame_bin_matrix

__all__ = ["Modem", "DecodeDiag", "DecodeResult"]


class DecodeDiag(NamedTuple):
    """Structured per-decode observability (SURVEY.md §6.5): returned as an
    auxiliary pytree from the jitted decode so diagnostics are jit-compatible."""

    sync_start: jnp.ndarray      # (...,) int32 — chirp onset sample
    sync_metric: jnp.ndarray     # (...,) f32 — correlation peak / mean floor
    sc_metric: jnp.ndarray       # (...,) f32 — Schmidl–Cox M(d) at the SC
                                 # symbol position (≈1 when a frame is really
                                 # there; second sync opinion, BASELINE.json:5)
    H: jnp.ndarray               # (..., n_used, 2) f32 (re, im) on device; the
                                 # host wrappers convert to (..., n_used) complex64.
                                 # (The axon TPU PJRT cannot transfer complex
                                 # buffers host<->device — jit I/O must be real.)
    noise_var: jnp.ndarray       # (...,) f32 — LS residual power
    pilot_slope: jnp.ndarray     # (..., D) f32 — rad/bin timing drift
    common_phase: jnp.ndarray    # (..., D) f32 — per-symbol phase error
    evm: jnp.ndarray             # (...,) f32 — mean |X̂ − hard-decision|²
    mean_abs_llr: jnp.ndarray    # (...,) f32 — demapper confidence
    clock_ppm: jnp.ndarray       # (...,) f32 — TX/RX sampling-clock offset
                                 # estimate (ppm) from the cross-symbol
                                 # pilot-slope regression (ops.sfo); on the
                                 # SFO-corrected path this includes the
                                 # applied correction
    fec_iters: jnp.ndarray       # (...,) int32 — LDPC message-update passes
                                 # the frame's codewords ran (max over its
                                 # codewords' decode blocks; 0 for fec='none')
                                 # — decoder stress short of CRC failure
    fec_unsat: jnp.ndarray       # (...,) int32 — codewords whose final hard
                                 # decisions still violate a parity check
                                 # (the decoder gave up; 0 = all converged)
    isi_var: jnp.ndarray         # (..., n_used) f32 — per-bin beyond-CP
                                 # ISI floor (ops.chanest.isi_profile): the
                                 # channel-tail response power at each bin,
                                 # same units as noise_var; ≈0 on channels
                                 # inside the timing budget. Adaptation
                                 # reads it so long-room probes stop
                                 # recommending presets whose room FER is 1
    isi_db: jnp.ndarray          # (...,) f32 — tail/total channel energy in
                                 # dB (−inf-ish ≪ −40 on clean channels);
                                 # the scalar room-honesty figure
    llr_hist: jnp.ndarray        # (..., 16) int32 — per-decode |LLR|
                                 # histogram (SURVEY.md §6.5): bin k counts
                                 # demapper LLRs with |llr| ∈ [2^(k-2),
                                 # 2^(k-1)) (bin 0 = below 0.25 incl. exact
                                 # zeros, bin 15 = 8192 and up), on a
                                 # 1/8-strided subsample of the frame's
                                 # coded bits (a shape-static diagnostic
                                 # that costs ~nothing in the hot path)


class _FusedLlr(NamedTuple):
    """Demapper output of a fused Pallas path, kept in its device layout
    (D, LP, Bp) — descrambled, batch in LANES — so the FEC epilogue runs
    with one static gather (the r2 transpose chain moved the batch
    lanes→sublanes→lanes twice, ~0.5 ms of pure relayout at B=1024).

    Produced by BOTH Pallas tails: the monolithic `fused_eq` kernel
    (LP = plane_rows(cfg), pilot/pad rows zeroed) and the two-kernel split
    (`split_eq`; LP = bps·n_used uniform, or the concatenated padded group
    planes when bit-loaded). `rows` names the layout: wire bit ρ of a
    symbol lives at plane row rows[ρ]."""

    llr_p: jnp.ndarray           # (D, LP, Bp) f32 plane-major rows
    batch: int                   # valid lanes (caller batch before padding)
    rows: np.ndarray = None      # (R,) wire-position → plane-row map; None
                                 # = the monolithic `stream_row_perm(cfg)`
    tag: str = "u"               # layout cache key ('u' uniform, 'l' loaded)


@dataclass
class DecodeResult:
    payload: bytes
    filename: str
    crc_ok: bool
    bits: np.ndarray
    diag: Optional[DecodeDiag] = None
    seq: int = 0
    total: int = 1


class Modem:
    """JAX/TPU implementation of the GF3 transceiver.

    >>> m = Modem(preset("gf3"))
    >>> wav = m.encode(b"hello", "hi.txt")       # host bytes -> np waveform
    >>> res = m.decode(recording)                # np waveform -> DecodeResult
    Batched device paths: `modulate_frames`, `demodulate` (leading axes free).
    """

    # Route the plain (non-SFO, non-DD) demod through the fused cut+DFT
    # kernel (ops/pallas/cut_dft.py). OFF by default: the kernel wins the
    # isolated chain microbench (0.75 vs 0.86 ms, tools/bench_cutdft.json)
    # but its group-major output pays an XLA relayout to the EQ kernels'
    # lanes layout that the microbench's sum-reduction consumer let XLA
    # fuse away — COMPOSED, the route measured +0.25 ms/step at bench
    # geometry (2.56 vs 2.31 ms, B=1024 scan, 2026-08-19). Emitting the
    # lanes layout from the kernel directly (output-block revisiting,
    # `lanes_out=True`) was measured too and is WORSE: 3.46 vs 2.38 ms
    # composed — the revisited (S, 2, U, 128) output block pins ~27 MB of
    # VMEM across 128//rows grid steps and its per-phase stripe stores
    # serialize. The two-stage route (cut kernel + XLA DFT einsum) stays
    # the default; parity keeps both routes bit-identical
    # (tools/tpu_parity.py forces this one on its fixtures).
    use_cut_dft = False

    def __init__(self, cfg: ModemConfig, max_delay: Optional[int] = None):
        """`max_delay` (static, samples) bounds the frame onset the sync
        searches for — the streaming receiver's case (a frame is known to
        arrive within the current chunk). It shrinks the sync correlation
        to the recording prefix; None searches the whole recording."""
        self.cfg = cfg.validate()
        self.max_delay = max_delay
        # decimate the bounded sync correlation when the chirp band fits
        # the decimated Nyquist (timing granularity 2, inside the backoff)
        self._sync_decimate = 2 if cfg.chirp_f1 * 4 <= cfg.fs * 0.95 else 1
        self.lay = layout(cfg)
        self.chirp = make_chirp(cfg)
        self._code = None
        if cfg.fec == "ldpc":
            from ..fec.ldpc import LdpcCode
            self._code = LdpcCode.for_config(cfg)
        self._encode_jit = jax.jit(self.modulate_frames)
        self._decode_jit = jax.jit(self.demodulate)
        self._decode_at_jit = jax.jit(self.demodulate_at)
        self._decode_win_jit = jax.jit(self.demodulate_prewindowed)
        # lazy jits for the less-common decode variants (sc, sfo-corrected)
        # all live here — one caching mechanism (the eager four above are
        # shared with bench/stream callers)
        self._jit_cache = {"at": self._decode_at_jit, "chirp": self._decode_jit}

    # ------------------------------------------------------ device: transmit
    def _fec_coded_bits(self, info_bits: jnp.ndarray) -> jnp.ndarray:
        """Info bits (..., payload_bits) → coded-STREAM bits (..., raw_bits):
        the FEC codewords + pad, before scrambling/interleaving (the domain
        `coded_stream_llr` demaps into)."""
        cfg = self.cfg
        if cfg.fec != "ldpc":
            return info_bits
        *lead, _ = info_bits.shape
        u = info_bits.reshape(*lead, cfg.n_codewords, cfg.ldpc_k)
        coded = self._code.encode_jax(u).reshape(*lead, cfg.n_codewords * cfg.ldpc_n)
        pad = jnp.zeros((*lead, cfg.raw_bits_per_frame - coded.shape[-1]), jnp.uint8)
        return jnp.concatenate([coded, pad], axis=-1)

    def fec_encode(self, info_bits: jnp.ndarray) -> jnp.ndarray:
        """Info bits (..., payload_bits_per_frame) → scrambled channel bits.

        The PRBS scrambler (layout.scramble) keeps constant payloads and
        padding noise-like so no data symbol collapses into a time-domain
        impulse (PAPR control)."""
        cfg = self.cfg
        coded = self._fec_coded_bits(info_bits) ^ jnp.asarray(self.lay.scramble)
        if cfg.interleave:
            from .frame import interleave_bits
            coded = interleave_bits(cfg, coded)
        return coded

    def modulate_frames(self, info_bits: jnp.ndarray) -> jnp.ndarray:
        """(..., payload_bits_per_frame) uint8 → (..., frame_len) float32.

        The full TX stack (SURVEY.md §4.1): FEC → QAM map → pilot/known
        placement → batched irfft+CP → chirp/SC preamble concat.
        """
        cfg, lay = self.cfg, self.lay
        coded = self.fec_encode(info_bits)
        syms = frame_bin_matrix(cfg, data_symbols_from_bits(cfg, coded))
        ofdm = ofdm_modulate(cfg, syms)
        *lead, _ = ofdm.shape
        parts = [jnp.broadcast_to(jnp.asarray(self.chirp, jnp.float32), (*lead, cfg.chirp_len))]
        if cfg.use_schmidl_cox:
            # (1, n_used) bins → (symbol_len,) samples (S folds into the stream)
            sc = ofdm_modulate(cfg, jnp.asarray(lay.sc_sym)[None, :])
            parts.append(jnp.broadcast_to(sc, (*lead, cfg.symbol_len)))
        parts.append(ofdm)
        return jnp.concatenate(parts, axis=-1)

    # ------------------------------------------------------- device: receive
    @property
    def _cut_block(self) -> int:
        """Grid of the coarse frame cut: the ≤ block-sample misalignment is
        derotated post-FFT, so it must fit the CP's timing budget —
        backoff (cp//4) + block ≤ 3·cp//4 leaves cp//4 for channel spread.
        Capped at 128 (gathered slices of 512 B are already cheap); tiny-CP
        configs get tiny blocks rather than a floor that would overrun the
        CP."""
        return max(1, min(128, self.cfg.cp // 2))

    def _cut_frame(self, rx: jnp.ndarray, start: jnp.ndarray,
                   bounded: bool = False):
        """Sync position → (syms (..., S, n_fft), sc_win or None, roll).

        The cut is a pure BLOCK-ALIGNED extraction (`cut_symbols`: one
        fused Pallas kernel on TPU — staging DMA straight into the
        DFT-ready CP-stripped symbol layout — `gather_cut` + reshape
        elsewhere): no FFT pair at all, cost independent of the recording
        length. The windows start `roll` ∈ [0, _CUT_BLOCK) samples early;
        the CP absorbs the shift (the symbols already start `cp//4` inside
        the CP as timing backoff), so the demod corrects it with one
        post-FFT phase ramp, and the SC metric/clock estimators tolerate it
        via guarded half-windows."""
        from ..ops.sync import cut_symbols

        cfg = self.cfg
        base, S, sc_off, span = self._cut_geom(rx, start, bounded)
        return cut_symbols(rx, base, S=S, n_fft=cfg.n_fft,
                           sym_len=cfg.symbol_len, cp=cfg.cp,
                           body_off=cfg.sc_len, sc_off=sc_off,
                           block=self._cut_block, max_start_span=span)

    def _cut_geom(self, rx: jnp.ndarray, start: jnp.ndarray, bounded: bool):
        """Cut geometry shared by `_cut_frame` and `_cut_dft_frame`:
        (clamped base, symbol count S, sc_off, staging span)."""
        from ..ops.sync import max_cut_start

        cfg = self.cfg
        T = rx.shape[-1]
        S = cfg.n_known_symbols + cfg.n_data_symbols
        cut_len = cfg.sc_len + S * cfg.symbol_len
        backoff = cfg.cp // 4
        # the cut reads whole blocks of the recording prefix (zero-copy):
        # clamp the base to the largest start it honors exactly (≈ T −
        # cut_len − one block row; only frames butting the recording end
        # are affected, and those lose tail samples either way)
        base = jnp.clip(start + cfg.chirp_len - backoff, 0,
                        min(max(T - cut_len, 0),
                            max_cut_start(T, cut_len, self._cut_block)))
        base = jnp.broadcast_to(base, rx.shape[:-1])
        # centre the ±block misalignment inside the SC guard budget
        sc_off = (cfg.cp + backoff + self._cut_block // 2
                  if cfg.use_schmidl_cox else -1)
        # `bounded`: the start came from the bounded sync search (every
        # onset in [0, max_delay)), so across any row group the cut bases
        # spread at most max_delay + one block — the cut kernel then stages
        # only (span + window) per group instead of the whole prefix
        span = (self.max_delay + self._cut_block
                if bounded and self.max_delay is not None else None)
        return base, S, sc_off, span

    def _cut_dft_frame(self, rx: jnp.ndarray, start: jnp.ndarray,
                       bounded: bool = False):
        """Fused cut + used-band DFT (`ops.sync.cut_dft_spectra` — the
        symbol matrix never round-trips HBM): sync position → (Yl
        (S, 2, n_used, B) lanes-layout spectra, already DEROLLED, sc_win
        or None), or None when the kernel can't take the geometry (the
        caller then runs `_cut_frame` + the DFT stage as separate
        passes). Same cut semantics as `_cut_frame`."""
        from ..ops.sync import cut_dft_spectra

        cfg = self.cfg
        base, S, sc_off, span = self._cut_geom(rx, start, bounded)
        return cut_dft_spectra(cfg, rx, base, S=S, body_off=cfg.sc_len,
                               sc_off=sc_off, block=self._cut_block,
                               max_start_span=span)

    def _sc_of(self, sc_win: Optional[jnp.ndarray], lead: tuple) -> jnp.ndarray:
        """SC-symbol presence metric (≈1 on a frame) from its n_fft window."""
        from ..ops.sync import sc_metric_window

        if sc_win is None:
            return jnp.zeros(lead, jnp.float32)
        return sc_metric_window(self.cfg, sc_win).astype(jnp.float32)

    def _demod_at(self, rx: jnp.ndarray, start: jnp.ndarray,
                  use_pallas: Optional[bool] = None):
        """Demodulate frames whose chirp onset is `start`. rx: (..., T),
        start: (...,) int32 → (llr (..., raw_bits), diag pieces).

        Window cut via the block-aligned extraction, then the common
        symbol-matrix tail (fused Pallas EQ/demap on TPU, XLA twin
        elsewhere)."""
        syms, _, roll = self._cut_frame(rx, start)
        return self._demod_syms(syms, use_pallas, roll=roll)

    @functools.cached_property
    def _sign_plane(self) -> np.ndarray:
        """Descrambler signs (1 − 2·scramble) arranged in the fused kernel's
        plane-major (D, LP, 1) row layout — i.e. run through the TX
        interleaver, then scattered to `stream_row_perm` rows — so
        multiplying the kernel's LLR rows by it descrambles them in place.
        Pilot and pad rows get 0.0: the kernel demaps every used bin, and
        the zero sign makes the non-payload rows exact zeros (keeping the
        in-kernel Σ|llr| confidence sum a payload-only statistic)."""
        from ..ops.pallas.fused_eq import plane_rows, stream_row_perm

        cfg = self.cfg
        R, D = cfg.bits_per_ofdm_symbol, cfg.n_data_symbols
        signs = (1.0 - 2.0 * self.lay.scramble.astype(np.float32))
        if cfg.interleave:
            from .frame import interleave_bits
            signs = np.asarray(interleave_bits(cfg, signs))
        plane = np.zeros((D, plane_rows(cfg)), np.float32)
        plane[:, stream_row_perm(cfg)] = signs.reshape(D, R)
        return plane[:, :, None]

    def _build_lanes_idx(self, LP: int, perm: np.ndarray) -> np.ndarray:
        """Static (24, z, n_codewords) int32 gather indices into a fused
        tail's FLATTENED plane rows (D·LP,) that land the LLRs directly in
        the LDPC lanes layout `LdpcCode.decode_lanes` consumes: entry
        [j, zi, cw] is codeword cw's bit j·z + zi. One composed permutation
        of (a) the kernel's plane-major row layout (`perm`: wire position →
        plane row, `_FusedLlr.rows`), (b) the v3 interleaver inverse, and
        (c) the codeword split — so the whole FEC ingest is ONE gather over
        the LLR plane instead of the gather + interleave-reshape +
        codeword-transpose chain (measured r4: that chain re-read the
        ~42 MB plane ~4× — 155.8 MB/step of HBM in `fec_epilogue`,
        BENCH_r04 `hbm_stage_mb`)."""
        cfg = self.cfg
        R, D = cfg.bits_per_ofdm_symbol, cfg.n_data_symbols
        i = np.arange(cfg.raw_bits_per_frame, dtype=np.int64)
        if cfg.interleave:
            from .frame import scatter_factors
            A2, B2 = scatter_factors(R)
            # stream bit i = a2·B2·D + b2·D + d sits at wire position
            # ρ = b2·A2 + a2 of symbol d (interleave_bits inverse)
            a2, rem = i // (B2 * D), i % (B2 * D)
            b2, d = rem // D, rem % D
            rho = b2 * A2 + a2
        else:
            d, rho = i // R, i % R
        row = d * LP + perm[rho]                         # flat plane row
        ncw, z = cfg.n_codewords, cfg.ldpc_z
        used = ncw * cfg.ldpc_n
        idx = row[:used].reshape(ncw, 24, z).transpose(1, 2, 0)
        return np.ascontiguousarray(idx, dtype=np.int32)

    @functools.cached_property
    def _lanes_row_idx(self) -> np.ndarray:
        """`_build_lanes_idx` for the monolithic kernel's layout."""
        from ..ops.pallas.fused_eq import plane_rows, stream_row_perm

        return self._build_lanes_idx(plane_rows(self.cfg),
                                     stream_row_perm(self.cfg))

    def _lanes_idx(self, fused: _FusedLlr) -> np.ndarray:
        """The lanes gather index for whichever fused layout `fused`
        carries (cached per layout — at most two per modem)."""
        if fused.rows is None:
            return self._lanes_row_idx
        LP = fused.llr_p.shape[1]
        key = (LP, fused.tag)
        cache = self.__dict__.setdefault("_lanes_idx_cache", {})
        if key not in cache:
            cache[key] = self._build_lanes_idx(LP, fused.rows)
        return cache[key]

    @staticmethod
    def _hist16_of(x: jnp.ndarray) -> jnp.ndarray:
        """16-bin log2 magnitude bucket index of each element (int32, same
        shape): bucket k ⇔ |x| ∈ [2^(k-2), 2^(k-1)), clipped to [0, 15] —
        exact zeros land in bucket 0. Exponent extraction is a bitcast +
        shift (no transcendental), so histogramming stays ~free on the VPU."""
        e = (jax.lax.bitcast_convert_type(jnp.abs(x), jnp.int32) >> 23) & 0xFF
        return jnp.clip(e - 127 + 2, 0, 15)

    def _stream_llr(self, fused: _FusedLlr) -> jnp.ndarray:
        """Fused-layout LLRs (D, LP, Bp) → descrambled coded-STREAM layout
        (raw_bits_per_frame, Bp): bit i of the codeword stream in sublanes,
        batch still in lanes. The kernel emits plane-major rows; the static
        `stream_row_perm` gather here fuses in XLA with the interleaver's
        reshape/transpose (one relayout pass either way — measured r4), so
        moving the row shuffle out of the kernel's VPU is free. The batch
        never leaves the lane axis (cf. VERDICT r2 weak #2). (The LDPC
        ingest no longer routes through here — `_lanes_row_idx` gathers the
        lanes layout in one step; this remains the evaluation-surface view.)
        """
        from ..ops.pallas.fused_eq import stream_row_perm
        from .frame import scatter_factors

        cfg = self.cfg
        R, D = cfg.bits_per_ofdm_symbol, cfg.n_data_symbols
        rows = (stream_row_perm(cfg) if fused.rows is None else fused.rows)
        x = jnp.take(fused.llr_p, jnp.asarray(rows), axis=1)  # (D, R, Bp)
        Bp = x.shape[-1]
        if cfg.interleave:
            A2, B2 = scatter_factors(R)
            # symbol d, bit ρ = b2·A2 + a2 carries coded bit a2·B2·D + b2·D + d
            x = x.reshape(D, B2, A2, Bp).transpose(2, 1, 0, 3)
        return x.reshape(cfg.raw_bits_per_frame, Bp)

    def _ri_prep(self, Y: jnp.ndarray, H: jnp.ndarray,
                 noise_var: jnp.ndarray, lead: tuple):
        """Complex (…, S, U) bins + Ĥ → the kernels' lanes-layout inputs
        (y_ri (D, 2, U, B), h_ri (2, U, B), nv8 (8, B)). Compatibility prep
        for callers holding complex Y (tests, tools); the production router
        feeds the kernels from `ofdm_dft_lanes` and skips the 40 MB
        transpose this pays (tools/bench_relayout.py)."""
        cfg = self.cfg
        B = int(np.prod(lead)) if lead else 1
        D = cfg.n_data_symbols
        Yd = Y[..., cfg.n_known_symbols:, :].reshape(B, D, cfg.n_used)
        y_ri = jnp.stack([Yd.real, Yd.imag], axis=1).transpose(2, 1, 3, 0)
        h_ri = jnp.stack([H.real, H.imag], axis=0).reshape(
            2, B, cfg.n_used).transpose(0, 2, 1)
        nv8 = jnp.zeros((8, B), jnp.float32).at[0].set(noise_var.reshape(B))
        return y_ri, h_ri, nv8

    def _fused_eq_demap(self, Y: jnp.ndarray, H: jnp.ndarray,
                        noise_var: jnp.ndarray, lead: tuple,
                        interpret: bool = False):
        """Post-estimate tail on the fused Pallas kernel, from complex Y
        (compat entry; the router calls `_fused_tail` on lanes tensors).
        Returns (_FusedLlr, (H, nv, slope, cpe, evm, mean_abs_llr))."""
        y_ri, h_ri, nv8 = self._ri_prep(Y, H, noise_var, lead)
        return self._fused_tail(y_ri, h_ri, nv8, H, noise_var, lead,
                                interpret)

    def _fused_tail(self, y_ri: jnp.ndarray, h_ri: jnp.ndarray,
                    nv8: jnp.ndarray, H, noise_var, lead: tuple,
                    interpret: bool = False):
        """Monolithic fused kernel on lanes-layout inputs: y_ri
        (D, 2, U, B), h_ri (2, U, B), nv8 (8, B)."""
        from ..ops.pallas.fused_eq import LANES, fused_eq_demap_tpu

        cfg = self.cfg
        B = int(np.prod(lead)) if lead else 1
        Bp = -(-B // LANES) * LANES
        D = cfg.n_data_symbols
        if Bp != B:
            y_ri = jnp.pad(y_ri, ((0, 0), (0, 0), (0, 0), (0, Bp - B)))
            h_ri = jnp.pad(h_ri, ((0, 0), (0, 0), (0, Bp - B)),
                           constant_values=1.0)
            nv8 = jnp.pad(nv8, ((0, 0), (0, Bp - B)), constant_values=1.0)
        llr_p, diag_p = fused_eq_demap_tpu(
            cfg, y_ri, h_ri, nv8, jnp.asarray(self._sign_plane), interpret)
        if Bp != B:
            # pad lanes must carry ZERO LLRs: at bps>2 the pad inputs
            # (y=0, h=1) demap to a non-codeword hard word that would stall
            # the LDPC early-exit loop until the iteration cap
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Bp), 2)
            llr_p = jnp.where(lane < B, llr_p, 0.0)
        nbits = cfg.n_data_bins * cfg.bits_per_symbol
        slope = diag_p[:, 0, :B].T.reshape(*lead, D)
        cpe = diag_p[:, 1, :B].T.reshape(*lead, D)
        evm = jnp.mean(diag_p[:, 2, :B], axis=0).reshape(lead)
        mabs = (jnp.sum(diag_p[:, 3, :B], axis=0) /
                jnp.float32(D * nbits)).reshape(lead)
        return (_FusedLlr(llr_p, B),
                (H, noise_var, slope, cpe, evm, mabs))

    @functools.cached_property
    def _loaded_split_layout(self):
        """Static layout of the bit-loaded split tail: (rows, LPs, groups,
        sign_plane). Wire bit ρ of a symbol (group-sorted order, SPEC §5b)
        lives at plane row rows[ρ]; the plane is the concatenation of each
        group's (m_g bit-planes × padded group bins) block. groups entries:
        (m, used_idx (Ugp,) int32 — used-bin index per group bin, 0-filled
        pad —, plane base row, valid bin count Ug). sign_plane (D, LPs, 1)
        carries the descrambler signs, 0.0 on pad columns."""
        from .frame import loading_tables

        cfg = self.cfg
        t = loading_tables(cfg)
        lay = layout(cfg)
        R, D = cfg.bits_per_ofdm_symbol, cfg.n_data_symbols
        signs = (1.0 - 2.0 * self.lay.scramble.astype(np.float32))
        if cfg.interleave:
            from .frame import interleave_bits
            signs = np.asarray(interleave_bits(cfg, signs))
        signs = signs.reshape(D, R)
        rows = np.empty(R, np.int64)
        groups = []
        base = goff = 0
        for m, pos in t.groups:
            Ug = len(pos)
            Ugp = -(-Ug // 8) * 8
            used_idx = np.zeros(Ugp, np.int32)
            used_idx[:Ug] = lay.data_pos[pos]
            i = np.arange(Ug * m)
            # wire ρ = goff + bin·m + bit (qam_demap_llr bit order) →
            # plane row = base + bit·Ugp + bin (plane-major within group)
            rows[goff + i] = base + (i % m) * Ugp + i // m
            groups.append((m, used_idx, base, Ug))
            base += m * Ugp
            goff += Ug * m
        plane = np.zeros((D, base), np.float32)
        plane[:, rows] = signs
        return rows, base, groups, plane[:, :, None]

    def _split_eq_demap(self, Y: jnp.ndarray, H: jnp.ndarray,
                        noise_var: jnp.ndarray, lead: tuple,
                        interpret: bool = False):
        """Post-estimate tail on the TWO-KERNEL split (`ops.pallas.split_eq`)
        — the constellations the monolithic kernel's VMEM cannot hold:
        64-QAM and every bit-loaded config, from complex Y (compat entry;
        the router calls `_split_tail` on lanes tensors). Kernel A
        equalizes + tracks + derotates (constellation-independent);
        kernel B demaps, chunked over bins (per group when loaded). Same
        return contract as `_fused_eq_demap`."""
        y_ri, h_ri, nv8 = self._ri_prep(Y, H, noise_var, lead)
        return self._split_tail(y_ri, h_ri, nv8, H, noise_var, lead,
                                interpret)

    def _split_tail(self, y_ri: jnp.ndarray, h_ri: jnp.ndarray,
                    nv8: jnp.ndarray, H, noise_var, lead: tuple,
                    interpret: bool = False):
        from ..ops.pallas.fused_eq import LANES, stream_row_perm
        from ..ops.pallas.split_eq import demap_bins_tpu, eq_track_tpu

        cfg = self.cfg
        B = int(np.prod(lead)) if lead else 1
        Bp = -(-B // LANES) * LANES
        D = cfg.n_data_symbols
        if Bp != B:
            y_ri = jnp.pad(y_ri, ((0, 0), (0, 0), (0, 0), (0, Bp - B)))
            h_ri = jnp.pad(h_ri, ((0, 0), (0, 0), (0, Bp - B)),
                           constant_values=1.0)
            nv8 = jnp.pad(nv8, ((0, 0), (0, Bp - B)), constant_values=1.0)
        eq, dA = eq_track_tpu(cfg, y_ri, h_ri, nv8, interpret)
        if cfg.bit_loading is None:
            U, bps = cfg.n_used, cfg.bits_per_symbol
            sign = jnp.asarray(np.ascontiguousarray(
                self._sign_plane[:, : bps * U, :].reshape(D, bps, U, 1)))
            llr4, dB = demap_bins_tpu(bps, cfg.pilot_spacing, 1.0, U,
                                      eq, dA, h_ri, sign, interpret)
            llr_p = llr4.reshape(D, bps * U, Bp)
            rows, tag = stream_row_perm(cfg), "u"
            n_eff_bins = cfg.n_data_bins
        else:
            from .frame import loading_tables
            rows, _LPs, groups, plane = self._loaded_split_layout
            inv_gain = 1.0 / loading_tables(cfg).gain
            parts, dB = [], None
            for m, used_idx, gbase, Ug in groups:
                idxc = jnp.asarray(used_idx)
                eq_g = jnp.take(eq, idxc, axis=2)
                h_g = jnp.take(h_ri, idxc, axis=1)
                Ugp = used_idx.size
                sign_g = jnp.asarray(np.ascontiguousarray(
                    plane[:, gbase: gbase + m * Ugp, 0]
                    .reshape(D, m, Ugp, 1)))
                llr_g, dB_g = demap_bins_tpu(m, 0, inv_gain, Ug,
                                             eq_g, dA, h_g, sign_g, interpret)
                parts.append(llr_g.reshape(D, m * Ugp, Bp))
                dB = dB_g if dB is None else dB + dB_g
            llr_p = jnp.concatenate(parts, axis=1)
            tag = "l"
            n_eff_bins = cfg.n_active_bins
        if Bp != B:
            # pad lanes must carry ZERO LLRs (LDPC early-exit, cf.
            # _fused_eq_demap)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Bp), 2)
            llr_p = jnp.where(lane < B, llr_p, 0.0)
        slope = dA[:, 0, :B].T.reshape(*lead, D)
        cpe = dA[:, 1, :B].T.reshape(*lead, D)
        evm = (dB[0, :B] / jnp.float32(D * n_eff_bins)).reshape(lead)
        mabs = (dB[1, :B]
                / jnp.float32(cfg.raw_bits_per_frame)).reshape(lead)
        return (_FusedLlr(llr_p, B, rows, tag),
                (H, noise_var, slope, cpe, evm, mabs))

    def _deroll_lanes(self, Yl: jnp.ndarray, roll) -> jnp.ndarray:
        """`_deroll` in the kernels' lanes layout: Yl (S, 2, U, B);
        roll (...,) → B flat. Same phase ramp, real/imag planes."""
        cfg = self.cfg
        if roll is None:
            return Yl
        k = jnp.arange(cfg.bin_lo, cfg.bin_hi + 1, dtype=jnp.float32)[:, None]
        ang = (jnp.float32(2.0 * np.pi / cfg.n_fft)
               * roll.astype(jnp.float32).reshape(-1)[None, :] * k)  # (U, B)
        c, s = jnp.cos(ang), jnp.sin(ang)
        re, im = Yl[:, 0], Yl[:, 1]
        return jnp.stack([re * c - im * s, im * c + re * s], axis=1)

    def _deroll(self, Y: jnp.ndarray, roll) -> jnp.ndarray:
        """Undo a known early window cut of `roll` samples (gather_cut):
        Y_desired[k] = Y_early[k]·e^{+2πik·roll/N} (the CP makes the shift
        circular). Y: (..., S, n_used); roll: (...,) int32."""
        cfg = self.cfg
        if roll is None:
            return Y
        k = jnp.arange(cfg.bin_lo, cfg.bin_hi + 1, dtype=jnp.float32)
        ang = (jnp.float32(2.0 * np.pi / cfg.n_fft)
               * roll.astype(jnp.float32)[..., None, None] * k)
        return Y * jax.lax.complex(jnp.cos(ang), jnp.sin(ang))

    def _sym_matrix(self, body: jnp.ndarray) -> jnp.ndarray:
        """CP-aligned OFDM body (..., S·symbol_len) → CP-stripped symbol
        matrix (..., S, n_fft) (the layout the DFT stage and the fused cut
        kernel share)."""
        cfg = self.cfg
        *lead, T = body.shape
        S = T // cfg.symbol_len
        return body.reshape(*lead, S, cfg.symbol_len)[..., cfg.cp:]

    def _eq_syms(self, syms: jnp.ndarray, delta=None, roll=None):
        """CP-stripped symbol matrix → equalized, phase-tracked data symbols.

        syms: (..., K+D, n_fft) → (data (..., D, n_data_bins) complex,
        nv_eff (..., n_data_bins), (H, noise_var, slope, cpe, isi_var,
        isi_ratio)). The XLA (non-Pallas) receive tail, shared by
        `_demod_syms` and `equalized_symbols`. `delta` routes to the
        δ-warped DFT demod; `roll` derotates a block-grid cut misalignment."""
        from ..ops.ofdm import ofdm_dft

        cfg = self.cfg
        Y = self._deroll(ofdm_dft(cfg, syms, delta), roll)
        H, noise_var, isi = estimate_channel(
            cfg, Y[..., : cfg.n_known_symbols, :], delta, with_isi=True)
        data, nv_eff, (slope, cpe) = self._eq_tail(Y, H, noise_var)
        return data, nv_eff, (H, noise_var, slope, cpe, *isi)

    def _eq_tail(self, Y: jnp.ndarray, H: jnp.ndarray, noise_var):
        """Post-estimate XLA tail: equalize, pilot phase tracking, per-bin
        effective noise. Y: (..., K+D, n_used) complex → (data, nv_eff,
        (slope, cpe)). Split out of `_eq_syms` so the decision-directed
        retry (`_demod_syms_dd`) can re-run it with a refined Ĥ."""
        from .frame import split_pilots

        cfg = self.cfg
        lay = layout(cfg)
        eq = equalize(H, Y[..., cfg.n_known_symbols:, :])
        eq, slope, cpe = pilot_phase_correct(cfg, eq, H)
        pil, data = split_pilots(cfg, eq)                      # (..., D, n_data_bins)
        csi = jnp.abs(H) ** 2
        if cfg.n_pilots:
            w, _ = split_pilots(cfg, csi)                      # (..., P)
            # per-SYMBOL noise from the pilot residuals: a time-localized hit
            # (impulse, collision) makes that symbol's LLRs confidently WRONG
            # under the global noise estimate; σ̂²_d = Σ_p w_p·|X̂_p − p|²/P
            # (≈ σ²_d with CSI weighting) floors the per-symbol LLR scale so a
            # burst symbol demaps as erasures instead (SURVEY.md §6.3 fault
            # recovery; the interleaver then spreads what remains)
            perr = jnp.abs(pil - jnp.asarray(lay.pilot_vals)) ** 2  # (..., D, P)
            sig_d = jnp.sum(w[..., None, :] * perr, axis=-1) / cfg.n_pilots
            nv_sym = jnp.maximum(noise_var[..., None], sig_d)  # (..., D)
        else:
            # pilotless config ("0 spacing disables pilots"): no residuals to
            # floor on — the 0-pilot sum/0 division was a 0/0 → NaN-LLR bug
            # (VERDICT r2 weak #1); the global LS noise estimate is all we have
            nv_sym = jnp.broadcast_to(noise_var[..., None],
                                      (*noise_var.shape, cfg.n_data_symbols))
        _, inv_csi = split_pilots(cfg, 1.0 / jnp.maximum(csi, 1e-12))
        nv_eff = nv_sym[..., None] * inv_csi[..., None, :]     # (..., D, n_data_bins)
        return data, nv_eff, (slope, cpe)

    def equalized_symbols(self, rx: np.ndarray, start: Optional[int] = None) -> np.ndarray:
        """Host API for constellation plots/analysis: the equalized,
        phase-tracked data symbols of one recording → (..., D, n_data_bins)
        complex64 (SURVEY.md §5c visual checks)."""
        rx = jnp.asarray(np.asarray(rx, dtype=np.float32))

        def fn(r, s):
            syms, _, roll = self._cut_frame(r, s)
            data, _, _ = self._eq_syms(syms, roll=roll)
            return jnp.stack([data.real, data.imag], axis=-1)

        # cached jits (a fresh jax.jit per call would recompile every time)
        if start is None:
            def fn_sync(r):
                s, _ = find_frame_start(self.cfg, r, self.chirp)
                return fn(r, s)
            if "eqsym_sync" not in self._jit_cache:
                self._jit_cache["eqsym_sync"] = jax.jit(fn_sync)
            out = self._jit_cache["eqsym_sync"](rx)
        else:
            if "eqsym_at" not in self._jit_cache:
                self._jit_cache["eqsym_at"] = jax.jit(fn)
            out = self._jit_cache["eqsym_at"](rx, jnp.int32(start))
        out = np.asarray(out)
        return (out[..., 0] + 1j * out[..., 1]).astype(np.complex64)

    def _bits_from_llr(self, llr: jnp.ndarray) -> jnp.ndarray:
        """Channel LLRs (..., raw_bits) → info bits (..., payload_bits)
        (flat-layout compatibility wrapper around `_payload_bits`)."""
        bits, _, _, _ = self._payload_bits(llr, llr.shape[:-1])
        return bits

    def coded_stream_llr(self, llr_like, lead: tuple) -> jnp.ndarray:
        """Demapper output (either layout) → descrambled LLRs in coded-STREAM
        order (..., raw_bits): positive ⇒ the `_fec_coded_bits` bit is 0.
        The layout-agnostic pre-FEC view for evaluation harnesses."""
        cfg = self.cfg
        if isinstance(llr_like, _FusedLlr):
            stream = self._stream_llr(llr_like)            # (raw, Bp)
            return (stream[:, : llr_like.batch].T
                    .reshape(*lead, cfg.raw_bits_per_frame))
        llr = llr_like
        if cfg.interleave:
            from .frame import interleave_bits
            llr = interleave_bits(cfg, llr, inverse=True)
        return llr * jnp.asarray(1.0 - 2.0 * self.lay.scramble.astype(np.float32))

    def _payload_bits(self, llr_like, lead: tuple):
        """Demapper output → (info bits (..., payload_bits), fec_iters
        (...,) int32, fec_unsat (...,) int32, llr_hist (..., 16) int32).

        Two layouts: a flat (..., raw_bits) SCRAMBLED LLR array (the XLA
        twin), or `_FusedLlr` — the Pallas kernel's (D, LP, Bp) descrambled
        device layout, whose whole FEC ingest (deinterleave → codeword
        split → LDPC lanes batch) is ONE static gather over the flattened
        plane rows (`_lanes_row_idx`): the LDPC decoder runs on
        (24, z, ncw·Bp) directly (`LdpcCode.decode_lanes`) and only the
        final info-bit matrix (⅛ the LLR bytes) pays a lane→sublane
        relayout. llr_hist is the §6.5 observability histogram
        (`DecodeDiag.llr_hist`), computed on a 1/8-strided subsample of the
        coded LLRs so it costs ~nothing in the hot path."""
        cfg = self.cfg
        bins16 = jnp.arange(16, dtype=jnp.int32)
        if isinstance(llr_like, _FusedLlr):
            B, Bp = llr_like.batch, llr_like.llr_p.shape[-1]
            if cfg.fec == "ldpc":
                ncw, z = cfg.n_codewords, cfg.ldpc_z
                D = llr_like.llr_p.shape[0]
                flat = llr_like.llr_p.reshape(D * llr_like.llr_p.shape[1], Bp)
                idx = jnp.asarray(self._lanes_idx(llr_like).reshape(-1))
                lam = jnp.take(flat, idx, axis=0).reshape(24, z, ncw * Bp)
                # 1/8-strided z-subsample: whole (ncw·Bp)-rows skip, so the
                # histogram's extra HBM read is 1/8 of the lam plane
                bkt = self._hist16_of(lam[:, ::8, :])      # (24, z/8, ncw·Bp)
                hist = jnp.sum((bkt[..., None] == bins16).astype(jnp.int32),
                               axis=(0, 1))                # (ncw·Bp, 16)
                hist = (jnp.sum(hist.reshape(ncw, Bp, 16), axis=0)[:B]
                        .reshape(*lead, 16))
                tot, it_lane, unsat_lane = self._code.decode_lanes(
                    lam, cfg.ldpc_iters)
                kb = 24 - self._code.mb                    # info block cols
                info = (tot[:kb] < 0).astype(jnp.uint8)    # (kb, z, ncw·Bp)
                bits = (info.reshape(kb, z, ncw, Bp)[..., :B]
                        .transpose(3, 2, 0, 1)
                        .reshape(*lead, cfg.payload_bits_per_frame))
                iters = jnp.max(it_lane.reshape(ncw, Bp)[:, :B], axis=0)
                unsat = jnp.sum(unsat_lane.reshape(ncw, Bp)[:, :B]
                                .astype(jnp.int32), axis=0)
                return bits, iters.reshape(lead), unsat.reshape(lead), hist
            stream = self._stream_llr(llr_like)            # (raw, Bp)
            bkt = self._hist16_of(stream[::8, :])          # (raw/8, Bp)
            hist = (jnp.sum((bkt[..., None] == bins16).astype(jnp.int32),
                            axis=0)[:B].reshape(*lead, 16))
            bits = (stream < 0).astype(jnp.uint8)[:, :B]   # (raw, B)
            bits = bits.T.reshape(*lead, cfg.raw_bits_per_frame)
            zeros = jnp.zeros(lead, jnp.int32)
            return bits, zeros, zeros, hist
        llr = self.coded_stream_llr(llr_like, lead)
        bkt = self._hist16_of(llr[..., ::8])
        hist = jnp.sum((bkt[..., None] == bins16).astype(jnp.int32), axis=-2)
        if cfg.fec == "ldpc":
            used = cfg.n_codewords * cfg.ldpc_n
            *lead_, _ = llr.shape
            lw = llr[..., :used].reshape(*lead_, cfg.n_codewords, cfg.ldpc_n)
            info, it_cw, unsat_cw = self._code.decode_jax(
                lw, cfg.ldpc_iters, with_diag=True)
            return (info.reshape(*lead_, cfg.payload_bits_per_frame),
                    jnp.max(it_cw, axis=-1),
                    jnp.sum(unsat_cw.astype(jnp.int32), axis=-1), hist)
        zeros = jnp.zeros(lead, jnp.int32)
        return hard_bits(llr), zeros, zeros, hist

    def demodulate_prewindowed(self, windows: jnp.ndarray,
                               sfo_correct: bool = False):
        """Decode frames already cut at their chirp onset: windows
        (..., frame_len) → (bits, DecodeDiag).

        The streaming receiver slices exact frame windows on the host, so
        the shift-theorem extraction (two full-recording FFTs) reduces to a
        static slice — this path does only the per-symbol OFDM FFTs.
        `sfo_correct` inserts the clock-offset loop (see `demodulate_sfo`).
        """
        from ..ops.sfo import slope_clock_offset

        cfg = self.cfg
        need = (cfg.n_known_symbols + cfg.n_data_symbols) * cfg.symbol_len
        a = cfg.preamble_len - cfg.cp // 4   # a + need = frame_len − backoff
        syms = self._sym_matrix(windows[..., a: a + need])
        sc_win = None
        if cfg.use_schmidl_cox:
            o = cfg.chirp_len + cfg.cp       # SC body within the window
            sc_win = windows[..., o: o + cfg.n_fft]
        delta = self._two_pass_delta(syms, sc_win) if sfo_correct else None
        lead = windows.shape[:-1]
        llr_like, (H, nv, slope, cpe, evm, mabs, isi_var, isi_ratio) = \
            self._demod_syms(syms, delta=delta)
        bits, fec_iters, fec_unsat, llr_hist = self._payload_bits(llr_like, lead)
        ppm = slope_clock_offset(cfg, slope) * 1e6
        zeros = jnp.zeros(lead, jnp.int32)
        diag = DecodeDiag(
            sync_start=zeros,
            sync_metric=jnp.full(lead, jnp.inf, jnp.float32),
            sc_metric=self._sc_of(sc_win, lead),
            H=jnp.stack([H.real, H.imag], axis=-1).astype(jnp.float32),
            noise_var=nv, pilot_slope=slope, common_phase=cpe, evm=evm,
            mean_abs_llr=mabs,
            clock_ppm=jnp.broadcast_to(ppm, lead).astype(jnp.float32),
            fec_iters=fec_iters, fec_unsat=fec_unsat,
            isi_var=isi_var,
            isi_db=10.0 * jnp.log10(isi_ratio + 1e-12),
            llr_hist=llr_hist,
        )
        return bits, diag

    def _demod_prewindowed(self, body: jnp.ndarray, use_pallas: Optional[bool] = None,
                           delta=None, roll=None):
        """Demap a CP-aligned OFDM body (..., (K+D)·symbol_len): reshape to
        the symbol matrix and run the common tail."""
        return self._demod_syms(self._sym_matrix(body), use_pallas, delta, roll)

    def _demod_syms(self, syms: jnp.ndarray, use_pallas: Optional[bool] = None,
                    delta=None, roll=None):
        """Demap a CP-stripped symbol matrix (..., K+D, n_fft) — the common
        tail of every decode path (window extraction already done). Routes
        to the fused Pallas EQ/demap kernel on TPU, the XLA twin elsewhere.
        `delta` (traced scalar) routes the FFT stage to the δ-warped DFT;
        `roll` derotates a block-grid cut misalignment (cut_symbols)."""
        cfg = self.cfg
        lead = syms.shape[:-2]
        B = int(np.prod(lead)) if lead else 1
        use_split = False
        if use_pallas is None:
            route = self._tail_route(B)
            use_pallas = route == "fused"
            use_split = route == "split"
        if use_pallas or use_split:
            from ..ops.ofdm import ofdm_dft_lanes

            # DFT straight into the kernels' (S, 2, U, B) lanes layout —
            # the einsum emits the batch-minor layout inside the matmul
            # epilogue; the matmul-then-transpose form measured 0.86 vs
            # 0.56 ms at bench geometry (tools/bench_relayout.py)
            K = cfg.n_known_symbols
            syms2 = syms.reshape(B, K + cfg.n_data_symbols, cfg.n_fft)
            Yl = self._deroll_lanes(ofdm_dft_lanes(cfg, syms2, delta), roll)
            return self._demod_lanes(Yl, lead, use_pallas, delta)
        data, nv_eff, (H, noise_var, slope, cpe, isi_var, isi_ratio) = \
            self._eq_syms(syms, delta, roll)
        llr, evm, mabs, _ = self._xla_demap(data, nv_eff, lead)
        return llr, (H, noise_var, slope, cpe, evm, mabs, isi_var, isi_ratio)

    def _tail_route(self, B: int) -> str:
        """Receive-tail routing for a flat batch of B frames: 'fused' (the
        monolithic Pallas EQ/demap kernel), 'split' (the two-kernel split
        — the monolithic kernel's VMEM refusals: 64-QAM, every bit-loaded
        config), or 'xla' (CPU hosts / forced twins / tiny shapes).
        Measured at QPSK bench geometry the monolithic kernel and the
        split are within 0.6 % (tools/bench_split_qpsk.json), so each
        stays where its VMEM fits."""
        from ..ops.pallas.fused_eq import fused_shapes_ok
        from ..utils.device import pallas_ok

        cfg = self.cfg
        on = pallas_ok() and cfg.strided_pilots
        if on and cfg.bit_loading is None and fused_shapes_ok(cfg, B):
            return "fused"
        if on:
            from ..ops.pallas.split_eq import split_shapes_ok
            if split_shapes_ok(cfg, B):
                return "split"
        return "xla"

    def _demod_lanes(self, Yl: jnp.ndarray, lead: tuple, use_pallas: bool,
                     delta=None):
        """Common receive tail from lanes-layout spectra Yl (S, 2, U, B):
        LS estimate on the known symbols, then the fused or split Pallas
        EQ/demap kernel. Returns `_demod_syms`'s (llr_like, 8-tuple)
        contract."""
        cfg = self.cfg
        B = int(np.prod(lead)) if lead else 1
        K = cfg.n_known_symbols
        # known symbols back to (B, K, U) complex for the (tiny) LS
        # estimate — K·U·B floats, ~2 % of the plane the old path
        # transposed
        Yk = jax.lax.complex(Yl[:K, 0], Yl[:K, 1]).transpose(2, 0, 1)
        H, noise_var, (isi_v, isi_r) = estimate_channel(
            cfg, Yk, delta, with_isi=True)
        h_ri = jnp.stack([H.real, H.imag], axis=0).transpose(0, 2, 1)
        nv8 = jnp.zeros((8, B), jnp.float32).at[0].set(noise_var)
        tail = self._fused_tail if use_pallas else self._split_tail
        # diag tensors restored to the caller's lead shape (the flat-B
        # views above exist only for the kernels' lanes layout)
        llr_like, d6 = tail(Yl[K:], h_ri, nv8,
                            H.reshape(*lead, cfg.n_used),
                            noise_var.reshape(lead), lead)
        return llr_like, (*d6, isi_v.reshape(*lead, cfg.n_used),
                          isi_r.reshape(lead))

    def _xla_demap(self, data: jnp.ndarray, nv_eff: jnp.ndarray, lead: tuple):
        """XLA-tail demap of equalized data bins → (llr (..., raw_bits),
        evm, mean_abs_llr, Xd — the hard-decision data-bin SYMBOLS, which
        the decision-directed retry re-references Ĥ against)."""
        cfg = self.cfg
        if cfg.bit_loading is not None:
            from .frame import loaded_demap_llr, loaded_qam_map
            llr2, evm = loaded_demap_llr(cfg, data, nv_eff)   # (..., D, R)
            llr = llr2.reshape(*lead, cfg.raw_bits_per_frame)
            mabs = jnp.mean(jnp.abs(llr), axis=-1)
            Xd = loaded_qam_map(cfg, hard_bits(llr2))
            return llr, evm, mabs, Xd
        llr3 = qam_demap_llr(
            data, jnp.broadcast_to(nv_eff, data.shape), cfg.bits_per_symbol
        )
        Xd = qam_map(hard_bits(llr3), cfg.bits_per_symbol)
        evm = jnp.mean(jnp.abs(data - Xd) ** 2, axis=(-2, -1))
        llr = llr3.reshape(*lead, cfg.raw_bits_per_frame)
        mabs = jnp.mean(jnp.abs(llr), axis=-1)
        return llr, evm, mabs, Xd

    def _demod_syms_dd(self, syms: jnp.ndarray, delta=None, roll=None):
        """Two-pass DECISION-DIRECTED demod (XLA tail) — the CRC-failure
        retry path (SURVEY.md §6.3 recovery): re-estimate Ĥ from ALL D
        data symbols' first-pass hard decisions (pilots exact, decisions
        mostly right near the cliff), blended with the known-symbol
        estimate by observation count, then demap again. Attacks
        ESTIMATION error — which in a beyond-CP room carries the tail's
        corruption — not the per-symbol ISI itself (that fold measured as
        a non-lever, docs/ROBUSTNESS.md). Measured (tools/
        dd_room_check.json, 24 trials, 30 dB, DRR 0 dB): gf3-hicap at
        rt60 = 20 ms FER 0.667 → 0.375; AWGN cells unchanged; gf3 at
        rt60 = 40 ms slightly WORSE standalone (0.458 → 0.542 — decision
        feedback below the cliff), which is why this runs only as a retry
        on frames the standard pass already failed: the retry composition
        is ≤ the standard FER by construction."""
        from ..ops.ofdm import ofdm_dft
        from .frame import interleave_pilots

        cfg = self.cfg
        lead = syms.shape[:-2]
        K, D = cfg.n_known_symbols, cfg.n_data_symbols
        Y = self._deroll(ofdm_dft(cfg, syms, delta), roll)
        H, noise_var, isi = estimate_channel(
            cfg, Y[..., :K, :], delta, with_isi=True)
        data, nv_eff, (slope, cpe) = self._eq_tail(Y, H, noise_var)
        _, _, _, Xd = self._xla_demap(data, nv_eff, lead)
        # re-derotate the RECEIVED data bins by the measured per-symbol
        # phase, re-reference against the decided TX bins (pilots exact)
        kk = jnp.arange(cfg.n_used, dtype=jnp.float32)
        ph = slope[..., None] * kk + cpe[..., None]          # (..., D, U)
        Yd = Y[..., K:, :] * jnp.exp(-1j * ph)
        Xhat = interleave_pilots(cfg, Xd)                    # (..., D, U)
        H_dd = (jnp.sum(Yd * jnp.conj(Xhat), axis=-2)
                / jnp.maximum(jnp.sum(jnp.abs(Xhat) ** 2, axis=-2), 1e-12))
        H2 = (K * H + D * H_dd) / (K + D)
        data2, nv_eff2, (slope2, cpe2) = self._eq_tail(Y, H2, noise_var)
        llr, evm, mabs, _ = self._xla_demap(data2, nv_eff2, lead)
        return llr, (H2, noise_var, slope2, cpe2, evm, mabs, *isi)

    def _two_pass_delta(self, syms: jnp.ndarray, sc_win: Optional[jnp.ndarray],
                        roll=None):
        """Clock-offset correction loop (coarse → fine): the SC fractional
        estimate seeds a δ-warped demod pass; that pass's pilot slopes give
        the final δ̂. (The warp corrects the FREQUENCY scaling — ICI — so
        the pilot fits come out clean; the slopes themselves still measure
        the full timing drift 2πδ·symbol_len·d/N, i.e. δ itself, NOT the
        residual vs d0.) Returns a traced SCALAR δ̂ — one shared TX/RX
        clock pair per jit call; batch rows combine by MEDIAN, so one
        burst-destroyed frame's garbage slopes cannot drag the shared
        estimate outside the usable range and waste the whole retry
        (equals the mean at batch 1, so the golden single-frame twin stays
        in parity)."""
        from ..ops.sfo import sc_clock_offset, slope_clock_offset

        cfg = self.cfg
        if sc_win is not None:
            d0 = jnp.median(sc_clock_offset(cfg, sc_win))
        else:
            d0 = jnp.float32(0.0)
        _, (_, _, slope_a, *_rest) = self._demod_syms(syms, delta=d0, roll=roll)
        return jnp.median(slope_clock_offset(cfg, slope_a))

    def _demod_synced(self, rx: jnp.ndarray, start: jnp.ndarray,
                      metric: jnp.ndarray,
                      sfo_correct: bool = False, bounded: bool = False,
                      dd: bool = False):
        """Shared decode tail once a frame start is known: cut → demap →
        FEC → DecodeDiag. `sfo_correct` inserts the clock-offset loop
        (SC coarse estimate → warped-DFT demod → slope residual → final
        warped demod); `dd` routes through the decision-directed two-pass
        demod (`_demod_syms_dd` — the CRC-failure retry)."""
        from ..ops.sfo import slope_clock_offset

        cfg = self.cfg
        lead = rx.shape[:-1]
        out = None
        if self.use_cut_dft and not sfo_correct and not dd:
            # fused cut+DFT kernel (ops/pallas/cut_dft.py): the symbol
            # matrix never round-trips HBM and the cut's staging DMA hides
            # under the DFT's MXU dots — but only the plain demod consumes
            # spectra directly; the SFO loop and the decision-directed
            # retry need the symbol matrix (re-demod at a warped DFT /
            # refined Ĥ), so they keep the two-stage path
            route = self._tail_route(int(np.prod(lead)) if lead else 1)
            if route != "xla":
                got = self._cut_dft_frame(rx, start, bounded=bounded)
                if got is not None:
                    Yl, sc_win = got
                    out = self._demod_lanes(Yl, lead, route == "fused")
        if out is None:
            syms, sc_win, roll = self._cut_frame(rx, start, bounded=bounded)
            delta = (self._two_pass_delta(syms, sc_win, roll)
                     if sfo_correct else None)
            demod = self._demod_syms_dd if dd else self._demod_syms
            out = demod(syms, delta=delta, roll=roll)
        llr_like, (H, nv, slope, cpe, evm, mabs, isi_var, isi_ratio) = out
        bits, fec_iters, fec_unsat, llr_hist = self._payload_bits(llr_like, lead)
        # pilot slopes measure the full timing drift (= δ) on warped and
        # unwarped passes alike — no delta offset to add
        ppm = slope_clock_offset(cfg, slope) * 1e6
        diag = DecodeDiag(
            sync_start=jnp.broadcast_to(start, lead).astype(jnp.int32),
            sync_metric=jnp.broadcast_to(metric, lead).astype(jnp.float32),
            sc_metric=self._sc_of(sc_win, lead),
            H=jnp.stack([H.real, H.imag], axis=-1).astype(jnp.float32),
            noise_var=nv, pilot_slope=slope, common_phase=cpe, evm=evm,
            mean_abs_llr=mabs,
            clock_ppm=jnp.broadcast_to(ppm, lead).astype(jnp.float32),
            fec_iters=fec_iters, fec_unsat=fec_unsat,
            isi_var=isi_var,
            isi_db=10.0 * jnp.log10(isi_ratio + 1e-12),
            llr_hist=llr_hist,
        )
        return bits, diag

    def demodulate_at(self, rx: jnp.ndarray, start: jnp.ndarray,
                      sfo_correct: bool = False, dd: bool = False):
        """Decode with known frame start (loopback paths, BASELINE.json:7)."""
        return self._demod_synced(rx, start, jnp.float32(jnp.inf),
                                  sfo_correct=sfo_correct, dd=dd)

    def demodulate(self, rx: jnp.ndarray):
        """Full RX stack (SURVEY.md §4.2): sync → FFT → LS est → EQ → pilot
        tracking → demap → FEC. rx: (..., T) f32 → (bits, DecodeDiag).

        With a `max_delay` bound (streaming), the sync correlation runs on
        the static recording prefix; the frame cut and SC check share one
        block-gather extraction either way."""
        start, metric = find_frame_start(
            self.cfg, rx, self.chirp, search_len=self.max_delay,
            decimate=self._sync_decimate if self.max_delay else 1)
        return self._demod_synced(rx, start, metric,
                                  bounded=self.max_delay is not None)

    def demodulate_dd(self, rx: jnp.ndarray):
        """Full RX stack through the decision-directed two-pass demod
        (`_demod_syms_dd`) — the CRC-failure retry `decode(dd='auto')`
        dispatches; standalone use is for channels KNOWN to be estimation-
        limited (see the measured cells in tools/dd_room_check.json)."""
        start, metric = find_frame_start(
            self.cfg, rx, self.chirp, search_len=self.max_delay,
            decimate=self._sync_decimate if self.max_delay else 1)
        return self._demod_synced(rx, start, metric, dd=True,
                                  bounded=self.max_delay is not None)

    def demodulate_sfo(self, rx: jnp.ndarray):
        """Clock-offset-robust RX (SURVEY.md:133/:399 "fractional CFO from
        ∠P" + correction loop): chirp sync, then SC coarse δ̂ → warped-DFT
        demod → pilot-slope residual → final warped demod. Decodes GF3
        frames at TX/RX sampling-clock offsets far beyond the plain
        receiver's ±≈500 ppm (consumer soundcards drift 50–200 ppm; this
        path is engineered to ±~1000 ppm, where accumulated window drift
        approaches the CP timing budget). One jit program; assumes one
        shared clock pair across batch rows."""
        start, metric = find_frame_start(
            self.cfg, rx, self.chirp, search_len=self.max_delay,
            decimate=self._sync_decimate if self.max_delay else 1)
        return self._demod_synced(rx, start, metric, sfo_correct=True,
                                  bounded=self.max_delay is not None)

    def demodulate_sc(self, rx: jnp.ndarray, sfo_correct: bool = False,
                      dd: bool = False):
        """RX stack synced by the Schmidl–Cox plateau instead of the chirp —
        the fallback when the chirp is clipped/filtered/collided
        (BASELINE.json:5: sync by BOTH methods). rx: (..., T)."""
        from ..ops.sync import find_frame_start_sc

        start, sc_peak = find_frame_start_sc(self.cfg, rx)
        bits, diag = self._demod_synced(rx, start, jnp.float32(jnp.nan),
                                        sfo_correct=sfo_correct, dd=dd)
        return bits, diag._replace(sc_metric=sc_peak.astype(jnp.float32))

    @staticmethod
    def _host_diag(diag: DecodeDiag) -> DecodeDiag:
        """Reconstitute complex H on the host (jit outputs must be real on TPU)."""
        H = np.asarray(diag.H)
        return diag._replace(H=(H[..., 0] + 1j * H[..., 1]).astype(np.complex64))

    # -------------------------------------------------------- host wrappers
    def _info_bits(self, payload: bytes, filename: str, seq: int = 0, total: int = 1) -> np.ndarray:
        cap = self.cfg.payload_bits_per_frame
        bits = bytes_to_bits(pack_header(payload, filename, seq=seq, total=total))
        if bits.size > cap:
            raise ValueError(
                f"payload needs {bits.size} info bits; frame carries {cap} "
                f"(≤ {cap // 8} bytes incl. header)"
            )
        out = np.zeros(cap, dtype=np.uint8)
        out[: bits.size] = bits
        return out

    def encode(self, payload: bytes, filename: str = "", seq: int = 0, total: int = 1) -> np.ndarray:
        """bytes → float32 waveform (single frame)."""
        wav = self._encode_jit(jnp.asarray(self._info_bits(payload, filename, seq, total)))
        return np.asarray(wav)

    def encode_batch(
        self,
        payloads: Sequence[bytes],
        filenames: Optional[Sequence[str]] = None,
        seqs: Optional[Sequence[int]] = None,
        total: int = 1,
    ) -> np.ndarray:
        """List of payloads → (B, frame_len) float32 waveforms (one jit call)."""
        filenames = filenames or [""] * len(payloads)
        seqs = seqs if seqs is not None else [0] * len(payloads)
        bits = np.stack([
            self._info_bits(p, f, s, total)
            for p, f, s in zip(payloads, filenames, seqs)
        ])
        return np.asarray(self._encode_jit(jnp.asarray(bits)))

    def _result(self, bits: np.ndarray, diag) -> DecodeResult:
        from ..utils.bits import parse_frame_header
        stream = bits_to_bytes(bits)
        try:
            h = parse_frame_header(stream)
            return DecodeResult(payload=h.payload, filename=h.filename,
                                crc_ok=h.crc_ok, bits=bits, diag=diag,
                                seq=h.seq, total=h.total)
        except ValueError:
            return DecodeResult(payload=b"", filename="", crc_ok=False,
                                bits=bits, diag=diag)

    def decode(self, rx: np.ndarray, start: Optional[int] = None,
               sync: str = "chirp", sfo: str = "auto",
               dd: str = "auto") -> DecodeResult:
        """waveform → DecodeResult. `start` overrides sync (loopback);
        sync='sc' uses Schmidl–Cox timing instead of the chirp.

        sfo: 'off' | 'auto' | 'on' — the clock-offset correction loop
        (see `demodulate_sfo`), honored on every sync path. 'auto'
        (default) retries through it when the plain decode fails CRC or
        reports |clock_ppm| beyond the plain receiver's reliable range
        (real soundcard pairs drift 50–200 ppm).

        dd: 'off' | 'auto' | 'on' — decision-directed channel
        re-estimation (`_demod_syms_dd`). 'auto' (default) retries ONE
        dd pass when everything else failed CRC and the diagnostics show
        a measurable channel tail (`isi_db` > −25 — the estimation-limited
        regime the second pass provably helps, tools/dd_room_check.json);
        as a failure-path retry it can only add decodes, never lose them.
        'on' decodes through the dd path directly (sfo correction is not
        combined with it)."""
        from ..ops.sfo import auto_retry_needed, prefer_retry

        if sync not in ("chirp", "sc"):
            raise ValueError(f"unknown sync method {sync!r}; use 'chirp' or 'sc'")
        rx = jnp.asarray(np.asarray(rx, dtype=np.float32))
        correct = sfo == "on"

        def jit_of(name, fn):
            if name not in self._jit_cache:
                self._jit_cache[name] = jax.jit(fn)
            return self._jit_cache[name]

        if dd == "on":
            if start is not None:
                bits, diag = jit_of("at_dd", lambda r, st: self.demodulate_at(
                    r, st, dd=True))(rx, jnp.int32(start))
            elif sync == "sc":
                bits, diag = jit_of(
                    "sc_dd", functools.partial(self.demodulate_sc,
                                               dd=True))(rx)
            else:
                bits, diag = jit_of("chirp_dd", self.demodulate_dd)(rx)
            return self._result(np.asarray(bits),
                                self._host_diag(jax.device_get(diag)))
        if start is not None:
            if correct:
                bits, diag = jit_of("at_sfo", lambda r, st: self.demodulate_at(
                    r, st, sfo_correct=True))(rx, jnp.int32(start))
            else:
                bits, diag = jit_of("at", self.demodulate_at)(rx, jnp.int32(start))
        elif sync == "sc":
            bits, diag = jit_of(
                "sc_sfo" if correct else "sc",
                functools.partial(self.demodulate_sc, sfo_correct=correct))(rx)
        elif correct:
            bits, diag = jit_of("sfo", self.demodulate_sfo)(rx)
        else:
            bits, diag = jit_of("chirp", self.demodulate)(rx)
        res = self._result(np.asarray(bits), self._host_diag(jax.device_get(diag)))
        if (sfo == "auto" and self.cfg.use_schmidl_cox
                and auto_retry_needed(res.crc_ok, res.diag.clock_ppm)):
            retry = self.decode(rx, start=start, sync=sync, sfo="on",
                                dd="off")
            if prefer_retry(res.crc_ok, retry.crc_ok):
                return retry
        if (dd == "auto" and not res.crc_ok and res.diag is not None
                and float(np.max(np.asarray(res.diag.isi_db))) > -25.0):
            retry = self.decode(rx, start=start, sync=sync, sfo="off",
                                dd="on")
            if retry.crc_ok:
                return retry
        return res

    def coded_llrs(self, rx: np.ndarray, start: int,
                   sfo_correct: bool = False,
                   delta: Optional[float] = None) -> np.ndarray:
        """Host API: one reception's descrambled coded-STREAM LLRs
        (raw_bits_per_frame,) — the soft input `chase_combine` sums across
        repeated receptions of the same frame (LLRs are already 1/σ²
        normalized, so the straight sum is maximum-ratio combining).

        `delta` demodulates through the δ-warped DFT at a KNOWN clock
        offset (chase combining estimates one shared δ̂ jointly across
        receptions — `joint_clock_offset`); `sfo_correct` self-estimates
        per reception instead (unreliable below the waterfall cliff: the
        per-reception coarse stage fails nonlinearly there)."""
        rx = jnp.asarray(np.asarray(rx, dtype=np.float32))

        if delta is not None:
            def fn_d(r, s, d):
                syms, _, roll = self._cut_frame(r, s)
                llr_like, _ = self._demod_syms(syms, delta=d, roll=roll)
                return self.coded_stream_llr(llr_like, r.shape[:-1])
            if "coded_llr_d" not in self._jit_cache:
                self._jit_cache["coded_llr_d"] = jax.jit(fn_d)
            return np.asarray(self._jit_cache["coded_llr_d"](
                rx, jnp.int32(start), jnp.float32(delta)))

        def fn(r, s):
            syms, sc_win, roll = self._cut_frame(r, s)
            d = (self._two_pass_delta(syms, sc_win, roll)
                 if sfo_correct else None)
            llr_like, _ = self._demod_syms(syms, delta=d, roll=roll)
            return self.coded_stream_llr(llr_like, r.shape[:-1])

        key = "coded_llr_sfo" if sfo_correct else "coded_llr"
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return np.asarray(self._jit_cache[key](rx, jnp.int32(start)))

    def joint_clock_offset(self, receptions) -> float:
        """One shared δ̂ from ALL receptions of a frame (HARQ: the copies
        ride the same physical TX/RX clock pair, so their clock offset is
        one unknown). Coarse stage: the SC per-bin correlations of every
        reception sum COHERENTLY before the phase read (√R estimator
        gain — `sc_clock_offset(pool=True)`); fine stage: one δ₀-warped
        demod of the stacked receptions, pilot slopes fitted per row,
        combined by median. Reliable several dB below the single-
        reception estimator's working range."""
        from ..ops.sfo import sc_clock_offset, slope_clock_offset

        cuts = []
        for rx, start in receptions:
            r32 = jnp.asarray(np.asarray(rx, dtype=np.float32))
            if "cut_products" not in self._jit_cache:
                self._jit_cache["cut_products"] = jax.jit(self._cut_frame)
            syms, sc_win, roll = self._jit_cache["cut_products"](
                r32, jnp.int32(start))
            cuts.append((np.asarray(syms),
                         None if sc_win is None else np.asarray(sc_win),
                         np.asarray(roll)))
        syms_b = jnp.asarray(np.stack([c[0] for c in cuts]))
        roll_b = jnp.asarray(np.stack([c[2] for c in cuts]))
        sc_b = (jnp.asarray(np.stack([c[1] for c in cuts]))
                if cuts[0][1] is not None else None)

        def joint(sy, sc, ro):
            d0 = (sc_clock_offset(self.cfg, sc, pool=True)
                  if sc is not None else jnp.float32(0.0))
            _, (_, _, slope_a, *_rest) = self._demod_syms(
                sy, delta=d0, roll=ro)
            return jnp.median(slope_clock_offset(self.cfg, slope_a))

        # one cached wrapper per variant; jit itself retraces per reception
        # count (a fresh jax.jit each call would lose every prior trace)
        if sc_b is None:
            # no SC symbol in this config: fine stage only
            if "joint_delta_nosc" not in self._jit_cache:
                self._jit_cache["joint_delta_nosc"] = jax.jit(
                    lambda sy, ro: joint(sy, None, ro))
            return float(self._jit_cache["joint_delta_nosc"](syms_b, roll_b))
        if "joint_delta" not in self._jit_cache:
            self._jit_cache["joint_delta"] = jax.jit(joint)
        return float(self._jit_cache["joint_delta"](syms_b, sc_b, roll_b))

    def decode_stream_llr(self, llr: np.ndarray) -> DecodeResult:
        """Host API: descrambled coded-STREAM LLRs (raw_bits_per_frame,)
        → DecodeResult (FEC decode + header parse, no demodulation).
        The decode tail `chase_combine` runs on summed LLRs."""
        cfg = self.cfg
        if cfg.fec == "ldpc":
            used = cfg.n_codewords * cfg.ldpc_n
            lw = llr[:used].reshape(cfg.n_codewords, cfg.ldpc_n)
            info, _ = self._code.decode(lw.astype(np.float64), cfg.ldpc_iters)
            bits = info.reshape(cfg.payload_bits_per_frame)
        else:
            bits = (llr < 0).astype(np.uint8)
        return self._result(bits.astype(np.uint8), None)

    def decode_batch(self, rx: np.ndarray) -> list[DecodeResult]:
        """(B, T) recordings → list of DecodeResult (one jit call)."""
        rx = jnp.asarray(np.asarray(rx, dtype=np.float32))
        bits, diag = self._decode_jit(rx)
        bits = np.asarray(bits)
        diag = self._host_diag(jax.device_get(diag))
        out = []
        for i in range(bits.shape[0]):
            d = jax.tree.map(lambda x, i=i: x[i], diag)
            out.append(self._result(bits[i], d))
        return out
