"""Config 3 sweep harness (BASELINE.json:9): BER-vs-SNR on device."""

import numpy as np
import pytest

from gf3x import ModemConfig, Modem
from gf3x.bench.ber import ber_sweep

UNCODED = ModemConfig(
    n_fft=256, cp=64, bin_lo=8, bin_hi=100, pilot_spacing=8,
    n_known_symbols=2, n_data_symbols=8, chirp_duration=0.02,
).validate()

CODED = UNCODED.replace(fec="ldpc", ldpc_z=24, ldpc_iters=10, n_data_symbols=12)


def test_uncoded_qpsk_curve_shape():
    m = Modem(UNCODED)
    res = ber_sweep(m, snrs_db=[-4.0, 0.0, 6.0, 14.0, 24.0], n_trials=8)
    ber = res["ber_post_fec"]
    assert ber[0] > 0.05                       # noise-dominated end
    assert ber[-1] == 0.0                      # clean end
    assert all(ber[i] >= ber[i + 1] - 1e-3 for i in range(len(ber) - 1))  # monotone


def test_coding_gain_visible():
    """Post-FEC waterfall sits left of the raw curve (config 3's point)."""
    m = Modem(CODED)
    res = ber_sweep(m, snrs_db=[2.0, 5.0, 8.0], n_trials=8)
    assert res["ber_pre_fec"][1] > 0.0         # channel still makes raw errors
    assert res["ber_post_fec"][2] == 0.0       # code cleans up at modest SNR
    assert res["ber_post_fec"][1] <= res["ber_pre_fec"][1]


def test_sweep_with_multipath_fir():
    rng = np.random.default_rng(0)
    from gf3x.channel import room_impulse_response
    h = room_impulse_response(rng, fs=44100, rt60=0.004, drr_db=8.0)
    m = Modem(UNCODED)
    res = ber_sweep(m, snrs_db=[30.0], n_trials=8, fir=h, delay_samples=50)
    assert res["ber_post_fec"][0] < 0.01
