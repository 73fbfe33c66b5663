"""Config 4 (BASELINE.json:10): the full GF3 standard frame — known-symbol
preamble, LDPC-coded payload, end-to-end file transmit/receive through a
harsh simulated acoustic channel (reverb past the CP + noise), golden and
JAX paths, cross-parity."""

import numpy as np
import pytest

from gf3x import GF3_STANDARD, GoldenModem, Modem
from gf3x.channel import awgn, clip, delay_gain, multipath, resample_sfo, room_impulse_response


@pytest.fixture(scope="module")
def modem():
    return Modem(GF3_STANDARD)


@pytest.fixture(scope="module")
def golden():
    return GoldenModem(GF3_STANDARD)


def _harsh_channel(wav, rng, snr_db=18.0, delay=5000, rt60=0.05):
    """Reverb tail past the 256-sample CP + noise: uncoded QPSK fails here,
    the LDPC frame must survive (the genre's lecture-hall demo conditions)."""
    h = room_impulse_response(rng, rt60=rt60, drr_db=6.0)
    rx = multipath(np.asarray(wav, np.float64), h)
    rx = delay_gain(rx, delay, 0.5, total_len=len(wav) + delay + 9000)
    return awgn(rx, snr_db, rng)


def test_gf3_frame_capacity():
    cfg = GF3_STANDARD
    assert cfg.n_codewords == 4
    assert cfg.payload_bits_per_frame == 4 * 1152
    assert cfg.payload_bits_per_frame // 8 == 576


def test_golden_gf3_file_roundtrip(golden):
    rng = np.random.default_rng(20)
    payload = bytes(rng.integers(0, 256, size=500, dtype=np.uint8))
    wav = golden.encode(payload, "file.bin")
    rx = _harsh_channel(wav, rng)
    res = golden.decode(rx)
    assert res.crc_ok and res.payload == payload and res.filename == "file.bin"


def test_jax_gf3_file_roundtrip(modem):
    rng = np.random.default_rng(21)
    payload = bytes(rng.integers(0, 256, size=550, dtype=np.uint8))  # +20B header ≤ 576B cap
    wav = modem.encode(payload, "file.bin")
    rx = _harsh_channel(wav, rng)
    res = modem.decode(rx)
    assert res.crc_ok and res.payload == payload and res.filename == "file.bin"


def test_cross_parity_jax_decodes_golden(modem, golden):
    rng = np.random.default_rng(22)
    payload = bytes(rng.integers(0, 256, size=300, dtype=np.uint8))
    rx = _harsh_channel(golden.encode(payload), rng)
    res = modem.decode(rx)
    gres = golden.decode(rx)
    assert res.crc_ok and res.payload == payload
    assert gres.crc_ok and gres.payload == payload
    assert np.array_equal(res.bits, gres.bits)        # bit-exact decode parity


def test_uncoded_fails_where_ldpc_survives(golden):
    """The FEC earns its keep: same channel kills the uncoded config.

    (Round 2 dropped the SNR from 18 to 12 dB: the CSI-weighted pilot
    tracking + per-symbol noise floors made the UNCODED receiver survive
    the original 18 dB lecture-hall conditions.)"""
    from gf3x import CONFIG1_LOOPBACK
    rng = np.random.default_rng(23)
    payload = bytes(rng.integers(0, 256, size=300, dtype=np.uint8))
    uncoded = GoldenModem(CONFIG1_LOOPBACK)
    rng2 = np.random.default_rng(24)
    rx_u = _harsh_channel(uncoded.encode(payload), rng2, snr_db=12.0)
    res_u = uncoded.decode(rx_u)
    rng2 = np.random.default_rng(24)
    rx_c = _harsh_channel(golden.encode(payload), rng2, snr_db=12.0)
    res_c = golden.decode(rx_c)
    assert res_c.crc_ok and res_c.payload == payload
    assert not res_u.crc_ok


def test_monte_carlo_robustness(modem):
    """Decode success across many independent channel realizations: catches
    estimator failure modes that single-seed tests miss (e.g. the pilot
    slope-refinement aliasing that rotated whole symbols by ~π/2 on
    specific room-IR draws)."""
    rng = np.random.default_rng(99)
    payload = bytes(rng.integers(0, 256, size=300, dtype=np.uint8))
    wav = modem.encode(payload)
    ok = 0
    n = 15
    for _ in range(n):
        h = room_impulse_response(rng, rt60=0.035, drr_db=5.0)
        rx = multipath(np.asarray(wav, np.float64), h)
        rx = delay_gain(rx, int(rng.integers(500, 8000)), 0.5,
                        total_len=len(wav) + 12000)
        rx = awgn(rx, 18.0, rng)
        res = modem.decode(rx)
        ok += bool(res.crc_ok and res.payload == payload)
    assert ok == n, f"only {ok}/{n} realizations decoded"


def test_gf3_with_clipping_and_sfo(modem):
    """Speaker saturation + DAC/ADC clock offset on top of reverb+noise."""
    rng = np.random.default_rng(25)
    payload = bytes(rng.integers(0, 256, size=400, dtype=np.uint8))
    wav = modem.encode(payload)
    x = clip(np.asarray(wav, np.float64), 0.9)
    x = resample_sfo(x, ppm=30.0)
    rx = _harsh_channel(x, rng, snr_db=20.0)
    res = modem.decode(rx)
    assert res.crc_ok and res.payload == payload
