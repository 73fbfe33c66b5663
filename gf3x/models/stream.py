"""Multi-frame file transfer over one recording (SURVEY.md §6.7 "streaming
sync over unbounded recordings", L7 transmit/receive apps).

A file larger than one frame's payload capacity is chunked across frames
(header seq/total fields), transmitted back-to-back with short gaps, and
reassembled from a single long recording: the chirp matched filter runs once
over the whole recording on device, peak picking extracts every frame onset,
and all detected frames decode in ONE batched jit call.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.sync import matched_filter
from ..utils.bits import HEADER_OVERHEAD
from .modem import DecodeResult, Modem

__all__ = [
    "encode_file", "encode_frames", "find_frames", "find_frames_device", "decode_stream",
    "decode_stream_windows", "StreamingReceiver",
    "merge_streams", "chase_combine", "StreamResult", "frame_capacity",
]


def chase_combine(modem: Modem, receptions,
                  sfo: str = "off") -> DecodeResult:
    """HARQ chase combining: soft-combine repeated receptions of the SAME
    logical frame — e.g. a CRC-failed original and a CRC-failed
    retransmission — into one decode that succeeds where each alone fails.

    receptions: iterable of (recording, chirp_onset_sample) pairs (onsets
    from `decode_stream(...).starts` / `find_frames`). Each reception's
    descrambled coded-stream LLRs are 1/σ̂²-scaled by the demapper, so the
    straight sum is maximum-ratio combining (~+3 dB for two equal-SNR
    copies); the sum then runs the normal FEC decode + header parse.
    The pairing is the caller's (ARQ layer's) knowledge: the receiver
    knows which seqs it NACKed and in what order the retransmission
    carries them (`examples/arq_file_transfer.py`).

    sfo: 'off' | 'on' — 'on' estimates ONE shared clock offset JOINTLY
    across the receptions (same physical TX/RX clock pair → one unknown;
    `Modem.joint_clock_offset` pools the SC correlations coherently, the
    √R gain that per-reception estimation below the cliff cannot get)
    and demodulates every copy through the δ̂-warped DFT. Use it whenever
    `decode` needed sfo for these recordings; if the corrected
    combination still fails CRC, the uncorrected sum is tried as a
    fallback (harmless when δ was truly ~0).
    """
    receptions = list(receptions)
    if not receptions:
        raise ValueError("chase_combine needs at least one reception")

    def combined(delta):
        total = None
        for rx, start in receptions:
            llr = modem.coded_llrs(np.asarray(rx), int(start), delta=delta)
            total = llr if total is None else total + llr
        return modem.decode_stream_llr(total)

    if sfo == "on":
        res = combined(modem.joint_clock_offset(receptions))
        if res.crc_ok:
            return res
        plain = combined(0.0)      # δ=0 warp ≡ plain demod
        return plain if plain.crc_ok else res
    total = None
    for rx, start in receptions:
        llr = modem.coded_llrs(np.asarray(rx), int(start))
        total = llr if total is None else total + llr
    return modem.decode_stream_llr(total)


def frame_capacity(modem: Modem, filename: str = "") -> int:
    """Payload bytes one frame can carry after the header."""
    cap = modem.cfg.payload_bits_per_frame // 8 - HEADER_OVERHEAD - len(filename.encode("utf-8"))
    if cap <= 0:
        raise ValueError("frame too small for the header alone")
    return cap


def encode_file(
    modem: Modem, data: bytes, filename: str = "", gap_s: float = 0.05
) -> np.ndarray:
    """bytes of any size → one waveform of ⌈len/cap⌉ frames with gaps."""
    cap = frame_capacity(modem, filename)
    chunks = [data[i: i + cap] for i in range(0, max(len(data), 1), cap)]
    total = len(chunks)
    if total > 0xFFFF:
        raise ValueError(f"file needs {total} frames (> 65535)")
    wavs = modem.encode_batch(
        chunks, filenames=[filename] * total,
        seqs=list(range(total)), total=total,
    )
    gap = np.zeros(int(round(gap_s * modem.cfg.fs)), dtype=np.float32)
    parts: list[np.ndarray] = []
    for i in range(total):
        parts.append(wavs[i])
        if i != total - 1:
            parts.append(gap)
    return np.concatenate(parts)


def encode_frames(
    modem: Modem, data: bytes, seqs: list[int],
    filename: str = "", gap_s: float = 0.05,
) -> np.ndarray:
    """Re-encode only the selected frames of a transfer (selective
    retransmission: the recovery loop for `StreamResult.missing` —
    SURVEY.md §6.3, FEC/CRC as failure detection, retransmit as recovery)."""
    cap = frame_capacity(modem, filename)
    chunks = [data[i: i + cap] for i in range(0, max(len(data), 1), cap)]
    total = len(chunks)
    bad = [s for s in seqs if not 0 <= s < total]
    if bad:
        raise ValueError(f"seqs {bad} out of range for a {total}-frame transfer")
    wavs = modem.encode_batch(
        [chunks[s] for s in seqs], filenames=[filename] * len(seqs),
        seqs=list(seqs), total=total,
    )
    gap = np.zeros(int(round(gap_s * modem.cfg.fs)), dtype=np.float32)
    parts: list[np.ndarray] = []
    for i in range(len(seqs)):
        parts.append(wavs[i])
        if i != len(seqs) - 1:
            parts.append(gap)
    return np.concatenate(parts)


def merge_streams(*results: "StreamResult") -> "StreamResult":
    """Combine partial receptions (original + retransmissions) of one
    transfer into a single result."""
    frames = [r for res in results for r in res.frames]
    starts = np.concatenate([res.starts for res in results]) if results else np.zeros(0, np.int64)
    good = [r for r in frames if r.crc_ok]
    if not good:
        return StreamResult(payload=None, filename="", complete=False,
                            frames=frames, starts=starts)
    total = max(r.total for r in good)
    by_seq: dict[int, DecodeResult] = {}
    for r in good:
        by_seq.setdefault(r.seq, r)
    missing = [s for s in range(total) if s not in by_seq]
    complete = not missing
    payload = b"".join(by_seq[s].payload for s in range(total)) if complete else None
    return StreamResult(payload=payload, filename=good[0].filename,
                        complete=complete, frames=frames, starts=starts,
                        missing=missing)


@functools.lru_cache(maxsize=None)
def _mf_jit(cfg, streaming_chunk):
    """ONE persistent jitted matched filter per (config, chunking) — a
    fresh `jax.jit(lambda ...)` per call would retrace and recompile on
    every invocation even at identical shapes (each wrapper owns its own
    cache), which made the live StreamingReceiver pay a full XLA compile
    per fed chunk."""
    from ..ops.chirp import make_chirp
    from ..ops.sync import streaming_matched_filter

    chirp = make_chirp(cfg)
    if streaming_chunk:
        # overlap-save path: O(chunk) device memory for arbitrarily long
        # recordings (SURVEY.md §6.7)
        return jax.jit(lambda r: streaming_matched_filter(r, chirp,
                                                          streaming_chunk))
    return jax.jit(lambda r: matched_filter(r, chirp))


def find_frames(
    modem: Modem,
    rx: np.ndarray,
    max_frames: Optional[int] = None,
    threshold: float = 0.4,
    streaming_chunk: Optional[int] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Locate every frame onset in a recording → (starts, ncc_metrics).

    The FFT matched filter runs on device over the full recording; peak
    picking (greedy argmax with frame-length exclusion + first-arrival
    refinement, as in single-frame sync) runs on the host. Peaks are scored
    by *normalized* cross-correlation — |m[n]| / (‖chirp‖·‖rx[n:n+L]‖) —
    which is gain-invariant and ≈1 at a true chirp but ≈1/√L on OFDM data,
    so `threshold` (default 0.4) separates frames from self-noise robustly.
    (A bare peak/median ratio cannot: data symbols correlate at 10×+ the
    floor on long recordings.)
    """
    cfg = modem.cfg
    rx32 = np.asarray(rx, dtype=np.float32)
    mf = _mf_jit(cfg, streaming_chunk)
    mabs = np.abs(np.asarray(mf(jnp.asarray(rx32))))
    L = cfg.chirp_len
    ce = float(np.sum(modem.chirp**2))
    cs = np.concatenate([[0.0], np.cumsum(rx32.astype(np.float64) ** 2)])
    local = cs[np.minimum(np.arange(len(rx32)) + L, len(rx32))] - cs[: len(rx32)]
    # floor the window energy at −40 dB of the loudest window: in silence both
    # |m| and the local energy are ~0 and the raw ratio is FFT roundoff noise
    local = np.maximum(local, np.max(local) * 1e-4 + 1e-20)
    ncc = mabs / (np.sqrt(local * ce) + 1e-20)
    work = ncc.copy()
    min_sep = cfg.frame_len // 2
    starts, metrics = [], []
    limit = max_frames if max_frames is not None else len(rx32) // cfg.frame_len + 1
    for _ in range(limit):
        p = int(np.argmax(work))
        v = float(work[p])
        if v < threshold:
            break
        lo = max(0, p - cfg.cp)
        win = mabs[lo: p + 1]
        first = lo + int(np.argmax(win >= 0.5 * mabs[p]))
        starts.append(first)
        metrics.append(v)
        work[max(0, p - min_sep): p + min_sep] = 0.0
    order = np.argsort(starts)
    return (np.asarray(starts, dtype=np.int64)[order],
            np.asarray(metrics, dtype=np.float64)[order])


def _device_frame_scan(modem: Modem, rx32: np.ndarray, seg_len: int,
                       streaming_chunk: Optional[int]):
    """One jitted pass over the recording → per-segment sync candidates.

    Fetching the full correlation magnitude costs T floats over a ~50 MB/s
    tunnel; this returns three (n_seg,) arrays instead: each segment's best
    NCC, its refined first-arrival index, and its raw argmax. Host-side
    greedy clustering on segments replaces sample-level peak picking.
    """
    sv, fi, gp = _frame_scan_jit(modem.cfg, seg_len, streaming_chunk)(
        jnp.asarray(rx32))
    return np.asarray(sv), np.asarray(fi), np.asarray(gp)


@functools.lru_cache(maxsize=None)
def _frame_scan_jit(cfg, seg_len: int, streaming_chunk: Optional[int]):
    """Persistent jitted per-segment scan (see `_mf_jit` for why one
    wrapper per signature matters); recording-length-dependent constants
    derive from the traced shape."""
    from ..ops.chirp import make_chirp
    from ..ops.sync import streaming_matched_filter

    chirp = make_chirp(cfg)
    L = cfg.chirp_len
    ce = float(np.sum(chirp**2))
    W = cfg.cp + 1
    ones = np.ones(L, dtype=np.float64)

    def scan(rx):
        T = rx.shape[-1]
        n_seg = -(-T // seg_len)
        Tp = n_seg * seg_len
        if streaming_chunk:
            mf = lambda x, h: streaming_matched_filter(x, h, streaming_chunk)
        else:
            mf = matched_filter
        mabs = jnp.abs(mf(rx, chirp))
        # window energy = correlation of x² with a ones kernel — same
        # machinery as the matched filter. (A float32 cumsum difference
        # catastrophically cancels on long recordings: cs grows to the total
        # energy while a window is a tiny difference of two huge values;
        # the FFT convolution's error scales with window magnitudes instead.)
        local = jnp.maximum(mf(rx * rx, ones), 0.0)
        local = jnp.maximum(local, jnp.max(local) * 1e-4 + 1e-20)
        ncc = mabs / (jnp.sqrt(local * ce) + 1e-20)

        pad = Tp - T
        nccp = jnp.pad(ncc, (0, pad)).reshape(n_seg, seg_len)
        mpad = jnp.pad(mabs, (0, pad))
        seg_arg = jnp.argmax(nccp, axis=-1).astype(jnp.int32)
        seg_val = jnp.take_along_axis(nccp, seg_arg[:, None], axis=-1)[:, 0]
        gpos = seg_arg + jnp.arange(n_seg, dtype=jnp.int32) * seg_len

        def refine(p):
            base = jnp.maximum(p - cfg.cp, 0)
            win = jax.lax.dynamic_slice(mpad, (base,), (W,))
            pv = jax.lax.dynamic_slice(mpad, (p,), (1,))[0]
            first = jnp.argmax(win >= 0.5 * pv).astype(jnp.int32)
            return base + first

        firsts = jax.vmap(refine)(gpos)
        return seg_val, firsts, gpos

    return jax.jit(scan)


def find_frames_device(
    modem: Modem,
    rx: np.ndarray,
    threshold: float = 0.4,
    streaming_chunk: Optional[int] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """`find_frames` with the O(T) work and fetch kept on device (long
    recordings; SURVEY.md §6.7). Returns (starts, ncc_metrics)."""
    cfg = modem.cfg
    rx32 = np.asarray(rx, dtype=np.float32)
    if len(rx32) < cfg.frame_len:
        return np.zeros(0, np.int64), np.zeros(0)
    seg_len = max(cfg.frame_len // 2, 1)
    seg_val, firsts, gpos = _device_frame_scan(modem, rx32, seg_len, streaming_chunk)

    # greedy cluster: candidates above threshold, strongest first, excluding
    # anything within half a frame of an accepted peak (same exclusion rule
    # as the host path)
    order = np.argsort(-seg_val)
    min_sep = cfg.frame_len // 2
    starts, metrics = [], []
    taken: list[int] = []
    for s in order:
        if seg_val[s] < threshold:
            break
        p = int(gpos[s])
        if any(abs(p - t) < min_sep for t in taken):
            continue
        taken.append(p)
        starts.append(int(firsts[s]))
        metrics.append(float(seg_val[s]))
    o = np.argsort(starts)
    return (np.asarray(starts, dtype=np.int64)[o],
            np.asarray(metrics, dtype=np.float64)[o])


@dataclass
class StreamResult:
    payload: Optional[bytes]          # reassembled bytes (None if incomplete)
    filename: str
    complete: bool
    frames: list[DecodeResult] = field(default_factory=list)
    starts: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    missing: list[int] = field(default_factory=list)


def decode_stream(modem: Modem, rx: np.ndarray, threshold: float = 0.4,
                  sfo: str = "auto") -> StreamResult:
    """Recording with any number of frames → reassembled file bytes.

    All detected frames decode in one batched jit call (windows are sliced
    on the host at the detected onsets, so the in-jit sync is a no-op
    start=0). Reassembly requires every seq 0..total−1 present with CRC ok.

    sfo: 'off' | 'auto' | 'on' — the clock-offset correction loop (see
    `Modem.demodulate_sfo`); 'auto' re-decodes through it when any frame
    fails CRC or reports a clock offset beyond the plain receiver's range
    (one shared soundcard pair per recording is assumed).
    """
    cfg = modem.cfg
    rx32 = np.asarray(rx, dtype=np.float32)
    if rx32.size > 1_000_000:
        # long recording: keep the O(T) scan and its fetch on device
        # (segment-level candidates instead of T correlation samples);
        # beyond ~8M samples also switch the correlations to overlap-save
        # chunks so device memory stays O(chunk), not O(next_pow2(T))
        chunk = (1 << 17) if rx32.size > 8_000_000 else None
        starts, metrics = find_frames_device(modem, rx32, threshold=threshold,
                                             streaming_chunk=chunk)
    else:
        starts, metrics = find_frames(modem, rx32, threshold=threshold)
    if starts.size == 0:
        return StreamResult(payload=None, filename="", complete=False)

    pad = np.zeros(cfg.frame_len, dtype=np.float32)
    rx_pad = np.concatenate([rx32, pad])
    # windows are already cut at the chirp onset → static-slice decode path
    # (no full-recording FFTs)
    windows = np.stack([rx_pad[s: s + cfg.frame_len] for s in starts])
    results = decode_stream_windows(modem, windows, sfo)
    return merge_streams(StreamResult(payload=None, filename="", complete=False,
                                      frames=results, starts=starts))


class StreamingReceiver:
    """Stateful chunked receiver: `feed()` audio as it arrives (a sound-card
    callback, a socket, a growing file); frames decode as soon as their
    samples are complete, and the carried state stays O(frame_len)
    regardless of stream length (SURVEY.md §6.7 long-context streaming —
    the live-capture counterpart of `decode_stream`).

    >>> rcv = StreamingReceiver(modem)
    >>> for chunk in audio_source:          # any chunk sizes
    ...     for res in rcv.feed(chunk):     # DecodeResults as they complete
    ...         print(res.seq, res.crc_ok)
    >>> final = rcv.result()                # merged StreamResult

    Internals: the rolling buffer is padded up to a coarse length bucket so
    the jitted matched filter compiles for only a handful of shapes; decoded
    frame onsets are tracked in absolute stream position so overlapping
    detection windows never decode a frame twice.
    """

    #: detection buffers round up to a multiple of this (few jit signatures)
    _BUCKET = 8192

    def __init__(self, modem: Modem, threshold: float = 0.4,
                 sfo: str = "auto"):
        self.modem = modem
        self.threshold = threshold
        self.sfo = sfo
        self._buf = np.zeros(0, dtype=np.float32)
        self._pos = 0                       # absolute index of _buf[0]
        self._frames: list[DecodeResult] = []
        self._taken: list[int] = []         # absolute onsets already decoded

    def feed(self, chunk: np.ndarray) -> list[DecodeResult]:
        """Append samples; return DecodeResults for frames completed by them."""
        cfg = self.modem.cfg
        self._buf = np.concatenate(
            [self._buf, np.asarray(chunk, dtype=np.float32).ravel()])
        pad = (-len(self._buf)) % self._BUCKET
        det = np.pad(self._buf, (0, pad)) if pad else self._buf
        starts, _ = find_frames(self.modem, det, threshold=self.threshold)
        min_sep = cfg.frame_len // 2
        fresh = [
            int(s) for s in starts
            if s + cfg.frame_len <= len(self._buf)             # fully arrived
            and all(abs(s + self._pos - t) >= min_sep for t in self._taken)
        ]
        out: list[DecodeResult] = []
        if fresh:
            windows = np.stack(
                [self._buf[s: s + cfg.frame_len] for s in fresh])
            res = decode_stream_windows(self.modem, windows, self.sfo)
            for s, r in zip(fresh, res):
                self._taken.append(s + self._pos)
                out.append(r)
            self._frames.extend(out)
        # retain only what a future frame could still need: a chirp whose
        # frame is not yet complete can begin at most frame_len-1 samples
        # before the buffer end
        keep = min(len(self._buf), cfg.frame_len + cfg.chirp_len)
        drop = len(self._buf) - keep
        if drop > 0:
            self._buf = self._buf[drop:]
            self._pos += drop
        return out

    def result(self) -> StreamResult:
        """Merged view of everything decoded so far (reassembles the file
        once every seq 0..total−1 has arrived with CRC ok)."""
        starts = np.asarray(sorted(self._taken), dtype=np.int64)
        return merge_streams(StreamResult(
            payload=None, filename="", complete=False,
            frames=list(self._frames), starts=starts))


def decode_stream_windows(modem: Modem, windows: np.ndarray,
                          sfo: str = "auto") -> list[DecodeResult]:
    """Decode already-cut frame windows (B, frame_len) with the same
    sfo-'auto' retry policy as `decode_stream`.

    The retry decodes ONLY the rows that triggered it (a 1000-frame stream
    with one bad frame no longer pays a second full-batch decode — VERDICT
    r2 weak #6), padded up to a power-of-two row count by repeating a bad
    row so the correction jit compiles for O(log B) signatures."""
    from ..ops.sfo import auto_retry_needed, prefer_retry

    def run(wins: np.ndarray, correct: bool) -> list[DecodeResult]:
        if correct:
            if "win_sfo" not in modem._jit_cache:
                modem._jit_cache["win_sfo"] = jax.jit(
                    lambda w: modem.demodulate_prewindowed(w, sfo_correct=True))
            bits, diag = modem._jit_cache["win_sfo"](jnp.asarray(wins))
        else:
            bits, diag = modem._decode_win_jit(jnp.asarray(wins))
        bits = np.asarray(bits)
        diag = Modem._host_diag(jax.device_get(diag))
        return [
            modem._result(bits[i], jax.tree.map(lambda x, i=i: x[i], diag))
            for i in range(wins.shape[0])
        ]

    results = run(windows, sfo == "on")
    if sfo == "auto" and modem.cfg.use_schmidl_cox:
        bad = [i for i, r in enumerate(results)
               if auto_retry_needed(r.crc_ok, r.diag.clock_ppm)]
        if bad:
            nb = 1 << (len(bad) - 1).bit_length()
            idx = bad + [bad[0]] * (nb - len(bad))
            retry = run(np.asarray(windows)[idx], True)
            for j, i in enumerate(bad):
                if prefer_retry(results[i].crc_ok, retry[j].crc_ok):
                    results[i] = retry[j]
    return results
