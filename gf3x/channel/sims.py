"""Channel simulators — the modem-domain fault-injection library.

The reference evaluates over an ideal loopback, a delayed/gained WAV, AWGN,
and a simulated multipath room channel (BASELINE.json:7-9); these stand in
for the physical speaker–air–microphone channel in every test (SURVEY.md §5
"fake backend" analog, §6.3 fault injection).

Host-side NumPy float64 implementations (used by tests, the golden model,
and fixture generation). Device-side jnp mirrors for on-TPU BER sweeps live
in `gf3x.channel.jax_sims`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

import numpy as np

__all__ = [
    "awgn", "delay_gain", "multipath", "room_impulse_response", "clip",
    "resample_sfo", "speaker_mic_fir", "Impairment", "Chain",
]


def awgn(x: np.ndarray, snr_db: float, rng: np.random.Generator) -> np.ndarray:
    """Add white Gaussian noise at the given SNR relative to x's power."""
    p = np.mean(x ** 2)
    nvar = p / (10.0 ** (snr_db / 10.0))
    return x + rng.normal(0.0, np.sqrt(nvar), size=x.shape)


def delay_gain(x: np.ndarray, delay: int, gain: float, total_len: int | None = None) -> np.ndarray:
    """Prepend `delay` zero samples and scale by `gain` (BASELINE.json:8).

    Pads/truncates to `total_len` when given (receiver record length).
    """
    y = np.concatenate([np.zeros(delay, dtype=x.dtype), gain * x])
    if total_len is not None:
        if len(y) < total_len:
            y = np.concatenate([y, np.zeros(total_len - len(y), dtype=x.dtype)])
        else:
            y = y[:total_len]
    return y


def room_impulse_response(
    rng: np.random.Generator,
    fs: int = 44100,
    rt60: float = 0.03,
    length: int | None = None,
    drr_db: float = 6.0,
) -> np.ndarray:
    """Synthetic room impulse response: direct path + exponentially decaying
    Gaussian tail (the genre's "simulated multipath room channel",
    BASELINE.json:9). `drr_db` is the direct-to-reverberant energy ratio."""
    if length is None:
        length = int(rt60 * fs)
    t = np.arange(length) / fs
    tail = rng.normal(size=length) * np.exp(-6.9 * t / rt60)  # −60 dB at rt60
    tail[0] = 0.0
    te = np.sum(tail ** 2)
    if te > 0:
        tail *= np.sqrt(10.0 ** (-drr_db / 10.0) / te)  # direct energy is 1
    h = tail
    h[0] = 1.0
    return h / np.sqrt(np.sum(h ** 2))


def multipath(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Convolve with an impulse response (full length: len(x)+len(h)−1)."""
    n = len(x) + len(h) - 1
    nfft = 1 << int(np.ceil(np.log2(n)))
    y = np.fft.irfft(np.fft.rfft(x, nfft) * np.fft.rfft(h, nfft), nfft)
    return y[:n]


def clip(x: np.ndarray, limit: float = 1.0) -> np.ndarray:
    """Hard-clip (speaker/ADC saturation)."""
    return np.clip(x, -limit, limit)


def resample_sfo(x: np.ndarray, ppm: float, fs: int = 44100,
                 drift_ppm_per_s: float = 0.0,
                 wobble_ppm: float = 0.0,
                 wobble_hz: float = 1.0) -> np.ndarray:
    """Resample by a (possibly time-varying) clock ratio: sampling-frequency
    offset between the transmitter DAC and receiver ADC clocks (the acoustic
    channel's analog of carrier offset — SURVEY.md Appendix "Pilot phase
    tracking").

    δ(t) = (ppm + drift_ppm_per_s·t + wobble_ppm·sin(2π·wobble_hz·t))·1e-6:
    a constant offset (crystal tolerance), a linear ramp (a warming device —
    the genre's live-demo failure mode, VERDICT r2 missing #2), and a
    sinusoidal wobble (vibration / thermal cycling). Output sample n reads
    input time τ(n) = ∫₀ⁿ (1+δ) dt in samples (linear interpolation); the
    constant-δ case reproduces the previous fixed-ratio resampler exactly.
    """
    if drift_ppm_per_s == 0.0 and wobble_ppm == 0.0:
        ratio = 1.0 + ppm * 1e-6
        n_out = int(np.floor((len(x) - 1) / ratio)) + 1
        t = np.arange(n_out) * ratio
    else:
        # output length from the INTEGRATED clock ratio (a fixed 1% margin
        # silently truncated the tail once cumulative negative drift passed
        # 1%). The drift integral runs over the OUTPUT duration, which the
        # length itself determines — one fixed-point pass closes the
        # second-order gap (~tens of samples at heavy drift), a small slack
        # absorbs the rest, and the exact t <= end cut below trims.
        n_out = len(x)
        for _ in range(3):
            dur_out = n_out / fs
            mean_delta = 1e-6 * (ppm + drift_ppm_per_s * dur_out / 2.0
                                 - abs(wobble_ppm))
            n_out = int(np.ceil(len(x) / max(1.0 + mean_delta, 0.5)))
        n_out += 16
        n = np.arange(n_out, dtype=np.float64)
        ts = n / fs                      # output-sample wall time, seconds
        t = n + 1e-6 * (
            ppm * n
            + drift_ppm_per_s * fs * ts * ts / 2.0
            + (wobble_ppm * fs / (2.0 * np.pi * wobble_hz))
            * (1.0 - np.cos(2.0 * np.pi * wobble_hz * ts))
        )
        t = t[t <= len(x) - 1]
    i0 = np.floor(t).astype(np.int64)
    frac = t - i0
    i1 = np.minimum(i0 + 1, len(x) - 1)
    return (1.0 - frac) * x[i0] + frac * x[i1]


def speaker_mic_fir(
    fs: int = 44100,
    lowcut: float = 150.0,
    highcut: float = 15000.0,
    ripple_db: float = 0.0,
    taps: int = 513,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Linear-phase FIR modelling the speaker×microphone frequency response
    (VERDICT r2 missing #3): consumer transducers roll off below ~150 Hz
    (2nd-order highpass) and above ~15 kHz (4th-order lowpass) with a few dB
    of midband ripple — the impairment that stresses the used-band edges
    (bin_lo=24 ≈ 1 kHz at the GF3 geometry, `config.py` bin_lo rationale).

    `ripple_db` adds a smooth random ±ripple_db magnitude ripple (needs
    `rng`). Returns `taps` FIR coefficients (group delay = taps//2 samples,
    absorbed by sync like any bulk delay). Designed by frequency sampling:
    target magnitude → zero-phase irfft → center, Hann-window, truncate.
    """
    nfft = 4096
    f = np.fft.rfftfreq(nfft, 1.0 / fs)
    with np.errstate(divide="ignore"):
        r2 = (f / lowcut) ** 2
    hp = r2 / np.sqrt(1.0 + r2 * r2)                 # 2nd-order butter HP |H|
    lp = 1.0 / np.sqrt(1.0 + (f / highcut) ** 8)     # 4th-order butter LP |H|
    mag = hp * lp
    if ripple_db:
        if rng is None:
            raise ValueError("ripple_db needs an rng")
        rough = rng.normal(size=mag.shape)
        k = np.exp(-0.5 * (np.arange(-128, 129) / 32.0) ** 2)
        smooth = np.convolve(rough, k / k.sum(), mode="same")
        smooth = smooth / (np.max(np.abs(smooth)) + 1e-12)
        mag = mag * 10.0 ** (ripple_db * smooth / 20.0)
    h = np.fft.irfft(mag, nfft)
    h = np.roll(h, taps // 2)[:taps]
    h = h * np.hanning(taps)
    return h


@dataclass
class Impairment:
    """A named channel impairment: fn(waveform, rng) → waveform."""

    name: str
    fn: Callable[[np.ndarray, np.random.Generator], np.ndarray]

    def __call__(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        return self.fn(x, rng)


@dataclass
class Chain:
    """Composable impairment chain (fault-injection harness, SURVEY.md §6.3)."""

    stages: Sequence[Impairment] = field(default_factory=list)

    def __call__(self, x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        for s in self.stages:
            x = s(x, rng)
        return x
