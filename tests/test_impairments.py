"""Transducer-response and combined-impairment robustness (VERDICT r2
missing #3: speaker/mic frequency response — band-edge rolloff + midband
ripple — was absent from the fault-injection library)."""

import numpy as np
import pytest

from gf3x import GF3_STANDARD, GoldenModem, Modem
from gf3x.channel import (awgn, clip, delay_gain, multipath, resample_sfo,
                          room_impulse_response, speaker_mic_fir)


def test_speaker_mic_fir_shape():
    """The designed FIR matches the transducer model: strong rolloff below
    lowcut and above highcut, ~flat midband, bounded ripple."""
    rng = np.random.default_rng(0)
    h = speaker_mic_fir(ripple_db=2.0, rng=rng)
    H = np.abs(np.fft.rfft(h, 8192))
    f = np.fft.rfftfreq(8192, 1 / 44100)

    def gain_db(fr):
        return 20 * np.log10(H[np.argmin(np.abs(f - fr))] + 1e-12)

    assert gain_db(50.0) < -12.0
    assert gain_db(20000.0) < -8.0
    for fr in (1000.0, 3000.0, 8000.0):
        assert abs(gain_db(fr)) < 3.0, fr


def test_resample_sfo_negative_drift_keeps_tail():
    """Cumulative negative drift beyond 1 % must not truncate the output
    (the old fixed 1 % output margin silently dropped the recording tail
    and with it the final frames): output length tracks the integrated
    clock ratio, and the resampled tail still carries the signal."""
    fs = 44100
    x = np.sin(2 * np.pi * 1000.0 * np.arange(10 * fs) / fs)
    for ppm, drift in [(-6000.0, -1000.0), (0.0, -2000.0),
                       (6000.0, 1000.0), (-11000.0, 0.0)]:
        y = resample_sfo(x, ppm, fs=fs, drift_ppm_per_s=drift)
        # the output grid must run right up to the end of the input: the
        # NEXT output sample past the returned length would map beyond
        # len(x)-1 (i.e. nothing satisfying t <= end was dropped)
        n = len(y)
        dur = n / fs
        t_next = (n + 1) * (1.0 + 1e-6 * (ppm + drift * dur / 2.0))
        assert t_next > len(x) - 1, (ppm, drift, n)
        assert np.std(y[-fs // 100:]) > 0.5     # tail is signal, not pad
    y = resample_sfo(x, -6000.0, fs=fs, drift_ppm_per_s=-1000.0)
    # mean delta ≈ -6000 - 1000·(10/2) = -11000 ppm → ~1.1 % MORE samples
    assert len(y) > 1.0109 * len(x)
    # the constant branch agrees with the time-varying branch at drift 0
    y0 = resample_sfo(x, -6000.0, fs=fs)
    y1 = resample_sfo(x, -6000.0, fs=fs, drift_ppm_per_s=0.0,
                      wobble_ppm=1e-9)
    n = min(len(y0), len(y1))
    assert abs(len(y0) - len(y1)) <= 2
    np.testing.assert_allclose(y0[:n], y1[:n], atol=1e-6)


@pytest.mark.parametrize("ripple_db", [0.0, 3.0])
def test_decode_through_speaker_mic_response(ripple_db):
    """GF3 frames through the transducer FIR (+noise): the used band
    (≈1–13 kHz) sits inside the passband by design (config bin_lo
    rationale), so the one-tap EQ must absorb the band-edge tilt — on both
    twins, bit-identical."""
    cfg = GF3_STANDARD
    m, g = Modem(cfg), GoldenModem(cfg)
    rng = np.random.default_rng(int(ripple_db * 10) + 3)
    payload = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
    wav = m.encode(payload, "s.bin")
    h = speaker_mic_fir(ripple_db=ripple_db,
                        rng=np.random.default_rng(42) if ripple_db else None)
    x = multipath(wav.astype(np.float64), h)
    rx = awgn(delay_gain(x, 2500, 0.6, total_len=len(x) + 6000), 15.0, rng)
    res = m.decode(rx.astype(np.float32))
    gres = g.decode(rx)
    assert res.crc_ok and res.payload == payload
    assert gres.crc_ok and gres.payload == payload
    assert np.array_equal(res.bits, gres.bits)


def test_combined_transducer_room_drift_clip():
    """The kitchen-sink live-demo channel: speaker/mic response ∘ room
    reverb ∘ drifting clock (120 ppm + 40 ppm/s) ∘ hard clipping ∘ 14 dB
    AWGN — decodes with the default sfo='auto' policy."""
    cfg = GF3_STANDARD
    m = Modem(cfg)
    rng = np.random.default_rng(9)
    payload = bytes(rng.integers(0, 256, 450, dtype=np.uint8))
    wav = m.encode(payload, "k.bin").astype(np.float64)
    x = multipath(wav, speaker_mic_fir(ripple_db=2.0,
                                       rng=np.random.default_rng(5)))
    x = multipath(x, room_impulse_response(rng, rt60=0.02, drr_db=6.0))
    x = resample_sfo(x, 120.0, drift_ppm_per_s=40.0)
    x = clip(x, 0.9 * np.max(np.abs(x)))
    rx = awgn(delay_gain(x, 3000, 0.6, total_len=len(x) + 7000), 14.0, rng)
    res = m.decode(rx.astype(np.float32))
    assert res.crc_ok and res.payload == payload
