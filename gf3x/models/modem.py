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

    def __init__(self, cfg: ModemConfig):
        self.cfg = cfg.validate()
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

    # ------------------------------------------------------ device: transmit
    def fec_encode(self, info_bits: jnp.ndarray) -> jnp.ndarray:
        """Info bits (..., payload_bits_per_frame) → scrambled channel bits.

        The PRBS scrambler (layout.scramble) keeps constant payloads and
        padding noise-like so no data symbol collapses into a time-domain
        impulse (PAPR control)."""
        cfg = self.cfg
        if cfg.fec == "ldpc":
            *lead, _ = info_bits.shape
            u = info_bits.reshape(*lead, cfg.n_codewords, cfg.ldpc_k)
            coded = self._code.encode_jax(u).reshape(*lead, cfg.n_codewords * cfg.ldpc_n)
            pad = jnp.zeros((*lead, cfg.raw_bits_per_frame - coded.shape[-1]), jnp.uint8)
            coded = jnp.concatenate([coded, pad], axis=-1)
        else:
            coded = info_bits
        return coded ^ jnp.asarray(self.lay.scramble)

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
    def _eq_stage(self, rx: jnp.ndarray, start: jnp.ndarray,
                  R: Optional[jnp.ndarray] = None, nfft: Optional[int] = None):
        """Sync-position → equalized, phase-tracked data symbols.

        rx: (..., T), start: (...,) int32 → (data (..., D, n_data_bins)
        complex, nv_eff (..., n_data_bins), (H, noise_var, slope, cpe)).
        The data-dependent frame cut uses the FFT shift theorem on the
        recording spectrum (see `extract_windows_spec`) — pass R/nfft to
        reuse the matched filter's rfft."""
        from ..ops.sync import extract_windows_spec, rx_spectrum, sync_nfft
        from .frame import split_pilots

        cfg = self.cfg
        T = rx.shape[-1]
        n_sym = cfg.n_known_symbols + cfg.n_data_symbols
        need = n_sym * cfg.symbol_len
        backoff = cfg.cp // 4
        ofdm_start = jnp.clip(start + cfg.preamble_len - backoff, 0, max(T - need, 0))
        ofdm_start = jnp.broadcast_to(ofdm_start, rx.shape[:-1])

        if R is None:
            nfft = sync_nfft(T, 0)
            R = rx_spectrum(rx, nfft)
        window = extract_windows_spec(R, ofdm_start, need, nfft)

        Y = ofdm_demodulate(cfg, window)                       # (..., K+D, n_used)
        H, noise_var = estimate_channel(cfg, Y[..., : cfg.n_known_symbols, :])
        eq = equalize(H, Y[..., cfg.n_known_symbols:, :])
        eq, slope, cpe = pilot_phase_correct(cfg, eq)

        _, data = split_pilots(cfg, eq)                        # (..., D, n_data_bins)
        csi = jnp.abs(H) ** 2
        _, nv_eff = split_pilots(cfg, noise_var[..., None] / jnp.maximum(csi, 1e-12))
        return data, nv_eff, (H, noise_var, slope, cpe)

    def _demod_at(self, rx: jnp.ndarray, start: jnp.ndarray,
                  R: Optional[jnp.ndarray] = None, nfft: Optional[int] = None,
                  use_pallas: Optional[bool] = None):
        """Demodulate frames whose chirp onset is `start`. rx: (..., T),
        start: (...,) int32 → (llr (..., raw_bits), diag pieces).

        On TPU (strided pilot layouts) the post-FFT chain — EQ, pilot
        tracking, derotation, demap, EVM — runs as the fused Pallas kernel
        (`ops.pallas.fused_eq`); elsewhere as the XLA twin."""
        cfg = self.cfg
        if use_pallas is None:
            from ..utils.device import computation_on_tpu
            use_pallas = computation_on_tpu() and cfg.strided_pilots
        if use_pallas:
            return self._demod_at_fused(rx, start, R, nfft)
        data, nv_eff, (H, noise_var, slope, cpe) = self._eq_stage(rx, start, R, nfft)
        llr3 = qam_demap_llr(
            data, jnp.broadcast_to(nv_eff[..., None, :], data.shape), cfg.bits_per_symbol
        )
        hard = hard_bits(llr3)
        evm = jnp.mean(jnp.abs(data - qam_map(hard, cfg.bits_per_symbol)) ** 2, axis=(-2, -1))
        llr = llr3.reshape(*rx.shape[:-1], cfg.raw_bits_per_frame)
        return llr, (H, noise_var, slope, cpe, evm)

    def _demod_at_fused(self, rx: jnp.ndarray, start: jnp.ndarray,
                        R: Optional[jnp.ndarray], nfft: Optional[int],
                        interpret: bool = False):
        """TPU path of `_demod_at`: window cut + FFT + LS estimate in XLA,
        then the fused EQ/track/demap Pallas kernel per (symbol, lane-block)."""
        from ..ops.sync import extract_windows_spec, rx_spectrum, sync_nfft

        cfg = self.cfg
        lead = rx.shape[:-1]
        T = rx.shape[-1]
        n_sym = cfg.n_known_symbols + cfg.n_data_symbols
        need = n_sym * cfg.symbol_len
        backoff = cfg.cp // 4
        ofdm_start = jnp.clip(start + cfg.preamble_len - backoff, 0, max(T - need, 0))
        ofdm_start = jnp.broadcast_to(ofdm_start, lead)
        if R is None:
            nfft = sync_nfft(T, 0)
            R = rx_spectrum(rx, nfft)
        window = extract_windows_spec(R, ofdm_start, need, nfft)
        Y = ofdm_demodulate(cfg, window)                       # (..., K+D, n_used)
        H, noise_var = estimate_channel(cfg, Y[..., : cfg.n_known_symbols, :])
        return self._fused_eq_demap(Y, H, noise_var, lead, interpret)

    def _fused_eq_demap(self, Y: jnp.ndarray, H: jnp.ndarray,
                        noise_var: jnp.ndarray, lead: tuple,
                        interpret: bool = False):
        """Post-estimate tail on the fused Pallas kernel (shared by the
        sync-included and prewindowed decode paths)."""
        from ..ops.pallas.fused_eq import LANES, fused_eq_demap_tpu

        cfg = self.cfg
        B = int(np.prod(lead)) if lead else 1
        Bp = -(-B // LANES) * LANES
        D = cfg.n_data_symbols
        Yd = Y[..., cfg.n_known_symbols:, :].reshape(B, D, cfg.n_used)
        y_ri = jnp.stack([Yd.real, Yd.imag], axis=1).transpose(2, 1, 3, 0)
        h_ri = jnp.stack([H.real, H.imag], axis=0).reshape(2, B, cfg.n_used).transpose(0, 2, 1)
        nv8 = jnp.zeros((8, B), jnp.float32).at[0].set(noise_var.reshape(B))
        if Bp != B:
            y_ri = jnp.pad(y_ri, ((0, 0), (0, 0), (0, 0), (0, Bp - B)))
            h_ri = jnp.pad(h_ri, ((0, 0), (0, 0), (0, Bp - B)),
                           constant_values=1.0)
            nv8 = jnp.pad(nv8, ((0, 0), (0, Bp - B)), constant_values=1.0)
        llr_p, diag_p = fused_eq_demap_tpu(cfg, y_ri, h_ri, nv8, interpret)
        nbits = cfg.n_data_bins * cfg.bits_per_symbol
        llr = llr_p[:, :nbits, :B].transpose(2, 0, 1).reshape(*lead, cfg.raw_bits_per_frame)
        slope = diag_p[:, 0, :B].T.reshape(*lead, D)
        cpe = diag_p[:, 1, :B].T.reshape(*lead, D)
        evm = jnp.mean(diag_p[:, 2, :B], axis=0).reshape(lead)
        return llr, (H, noise_var, slope, cpe, evm)

    def equalized_symbols(self, rx: np.ndarray, start: Optional[int] = None) -> np.ndarray:
        """Host API for constellation plots/analysis: the equalized,
        phase-tracked data symbols of one recording → (..., D, n_data_bins)
        complex64 (SURVEY.md §5c visual checks)."""
        rx = jnp.asarray(np.asarray(rx, dtype=np.float32))

        def fn(r, s):
            data, _, _ = self._eq_stage(r, s)
            return jnp.stack([data.real, data.imag], axis=-1)

        if start is None:
            def fn_sync(r):
                s, _ = find_frame_start(self.cfg, r, self.chirp)
                return fn(r, s)
            out = jax.jit(fn_sync)(rx)
        else:
            out = jax.jit(fn)(rx, jnp.int32(start))
        out = np.asarray(out)
        return (out[..., 0] + 1j * out[..., 1]).astype(np.complex64)

    def _bits_from_llr(self, llr: jnp.ndarray) -> jnp.ndarray:
        """Channel LLRs (..., raw_bits) → info bits (..., payload_bits)."""
        cfg = self.cfg
        llr = llr * jnp.asarray(1.0 - 2.0 * self.lay.scramble.astype(np.float32))
        if cfg.fec == "ldpc":
            used = cfg.n_codewords * cfg.ldpc_n
            *lead, _ = llr.shape
            lw = llr[..., :used].reshape(*lead, cfg.n_codewords, cfg.ldpc_n)
            info = self._code.decode_jax(lw, cfg.ldpc_iters)
            return info.reshape(*lead, cfg.payload_bits_per_frame)
        return hard_bits(llr)

    def _sc_check(self, rx: jnp.ndarray, start: jnp.ndarray,
                  R: Optional[jnp.ndarray] = None,
                  nfft: Optional[int] = None) -> jnp.ndarray:
        """SC-symbol presence metric at the synced position (≈1 on a frame).
        Pass R/nfft to reuse the sync spectrum for the window cut."""
        from ..ops.sync import sc_metric_at

        cfg = self.cfg
        if not cfg.use_schmidl_cox:
            return jnp.zeros(rx.shape[:-1], jnp.float32)
        body = jnp.broadcast_to(start, rx.shape[:-1]) + cfg.chirp_len + cfg.cp
        return sc_metric_at(cfg, rx, body, R=R, nfft=nfft).astype(jnp.float32)

    def demodulate_prewindowed(self, windows: jnp.ndarray):
        """Decode frames already cut at their chirp onset: windows
        (..., frame_len) → (bits, DecodeDiag).

        The streaming receiver slices exact frame windows on the host, so
        the shift-theorem extraction (two full-recording FFTs) reduces to a
        static slice — this path does only the per-symbol OFDM FFTs.
        """
        cfg = self.cfg
        need = (cfg.n_known_symbols + cfg.n_data_symbols) * cfg.symbol_len
        a = cfg.preamble_len - cfg.cp // 4   # a + need = frame_len − backoff
        body = windows[..., a: a + need]
        llr, (H, nv, slope, cpe, evm) = self._demod_prewindowed(body)
        bits = self._bits_from_llr(llr)
        zeros = jnp.zeros(windows.shape[:-1], jnp.int32)
        diag = DecodeDiag(
            sync_start=zeros,
            sync_metric=jnp.full(windows.shape[:-1], jnp.inf, jnp.float32),
            sc_metric=self._sc_check(windows, zeros),
            H=jnp.stack([H.real, H.imag], axis=-1).astype(jnp.float32),
            noise_var=nv, pilot_slope=slope, common_phase=cpe, evm=evm,
            mean_abs_llr=jnp.mean(jnp.abs(llr), axis=-1),
        )
        return bits, diag

    def _demod_prewindowed(self, body: jnp.ndarray, use_pallas: Optional[bool] = None):
        """Demap a CP-aligned OFDM body (..., (K+D)·symbol_len) — the common
        tail of both decode paths (window extraction already done). Routes
        to the fused Pallas EQ/demap kernel on TPU like `_demod_at`."""
        from .frame import split_pilots

        cfg = self.cfg
        if use_pallas is None:
            from ..utils.device import computation_on_tpu
            use_pallas = computation_on_tpu() and cfg.strided_pilots
        Y = ofdm_demodulate(cfg, body)
        H, noise_var = estimate_channel(cfg, Y[..., : cfg.n_known_symbols, :])
        if use_pallas:
            return self._fused_eq_demap(Y, H, noise_var, body.shape[:-1])
        eq = equalize(H, Y[..., cfg.n_known_symbols:, :])
        eq, slope, cpe = pilot_phase_correct(cfg, eq)
        _, data = split_pilots(cfg, eq)
        csi = jnp.abs(H) ** 2
        _, nv_eff = split_pilots(cfg, noise_var[..., None] / jnp.maximum(csi, 1e-12))
        llr3 = qam_demap_llr(
            data, jnp.broadcast_to(nv_eff[..., None, :], data.shape), cfg.bits_per_symbol
        )
        hard = hard_bits(llr3)
        evm = jnp.mean(jnp.abs(data - qam_map(hard, cfg.bits_per_symbol)) ** 2, axis=(-2, -1))
        llr = llr3.reshape(*body.shape[:-1], cfg.raw_bits_per_frame)
        return llr, (H, noise_var, slope, cpe, evm)

    def demodulate_at(self, rx: jnp.ndarray, start: jnp.ndarray):
        """Decode with known frame start (loopback paths, BASELINE.json:7)."""
        llr, (H, nv, slope, cpe, evm) = self._demod_at(rx, start)
        bits = self._bits_from_llr(llr)
        diag = DecodeDiag(
            sync_start=jnp.broadcast_to(start, rx.shape[:-1]).astype(jnp.int32),
            sync_metric=jnp.full(rx.shape[:-1], jnp.inf, jnp.float32),
            sc_metric=self._sc_check(rx, start),
            H=jnp.stack([H.real, H.imag], axis=-1).astype(jnp.float32),
            noise_var=nv, pilot_slope=slope, common_phase=cpe, evm=evm,
            mean_abs_llr=jnp.mean(jnp.abs(llr), axis=-1),
        )
        return bits, diag

    def demodulate(self, rx: jnp.ndarray):
        """Full RX stack (SURVEY.md §4.2): sync → FFT → LS est → EQ → pilot
        tracking → demap → FEC. rx: (..., T) f32 → (bits, DecodeDiag).

        One rfft of the recording feeds both the chirp matched filter and
        the shift-theorem frame cut."""
        from ..ops.sync import rx_spectrum, sync_nfft

        T = rx.shape[-1]
        nfft = sync_nfft(T, len(self.chirp))
        R = rx_spectrum(rx, nfft)
        start, metric = find_frame_start(self.cfg, rx, self.chirp, R=R, nfft=nfft)
        llr, (H, nv, slope, cpe, evm) = self._demod_at(rx, start, R=R, nfft=nfft)
        bits = self._bits_from_llr(llr)
        diag = DecodeDiag(
            sync_start=start.astype(jnp.int32), sync_metric=metric,
            sc_metric=self._sc_check(rx, start, R=R, nfft=nfft),
            H=jnp.stack([H.real, H.imag], axis=-1).astype(jnp.float32),
            noise_var=nv, pilot_slope=slope, common_phase=cpe, evm=evm,
            mean_abs_llr=jnp.mean(jnp.abs(llr), axis=-1),
        )
        return bits, diag

    def demodulate_sc(self, rx: jnp.ndarray):
        """RX stack synced by the Schmidl–Cox plateau instead of the chirp —
        the fallback when the chirp is clipped/filtered/collided
        (BASELINE.json:5: sync by BOTH methods). rx: (..., T)."""
        from ..ops.sync import find_frame_start_sc

        start, metric = find_frame_start_sc(self.cfg, rx)
        llr, (H, nv, slope, cpe, evm) = self._demod_at(rx, start)
        bits = self._bits_from_llr(llr)
        diag = DecodeDiag(
            sync_start=start.astype(jnp.int32),
            sync_metric=jnp.full(rx.shape[:-1], jnp.nan, jnp.float32),
            sc_metric=metric.astype(jnp.float32),
            H=jnp.stack([H.real, H.imag], axis=-1).astype(jnp.float32),
            noise_var=nv, pilot_slope=slope, common_phase=cpe, evm=evm,
            mean_abs_llr=jnp.mean(jnp.abs(llr), axis=-1),
        )
        return bits, diag

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
               sync: str = "chirp") -> DecodeResult:
        """waveform → DecodeResult. `start` overrides sync (loopback);
        sync='sc' uses Schmidl–Cox timing instead of the chirp."""
        rx = jnp.asarray(np.asarray(rx, dtype=np.float32))
        if start is not None:
            bits, diag = self._decode_at_jit(rx, jnp.int32(start))
        elif sync == "sc":
            if not hasattr(self, "_decode_sc_jit"):
                self._decode_sc_jit = jax.jit(self.demodulate_sc)
            bits, diag = self._decode_sc_jit(rx)
        elif sync == "chirp":
            bits, diag = self._decode_jit(rx)
        else:
            raise ValueError(f"unknown sync method {sync!r}; use 'chirp' or 'sc'")
        return self._result(np.asarray(bits), self._host_diag(jax.device_get(diag)))

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
