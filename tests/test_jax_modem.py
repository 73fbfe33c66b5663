"""JAX modem tests: parity with the golden model + end-to-end configs 1-3.

Parity is asserted on decoded payload bits / waveform closeness, not on
intermediate floats (SURVEY.md §8 risk "Bit-exactness across float32 TPU vs
float64 NumPy"). Runs on a virtual 8-device CPU mesh (conftest).
"""

import numpy as np
import pytest

from gf3x import CONFIG1_LOOPBACK, GoldenModem, Modem
from gf3x.channel import awgn, delay_gain, multipath, room_impulse_response
from gf3x.config import layout


@pytest.fixture(scope="module")
def modem():
    return Modem(CONFIG1_LOOPBACK)


@pytest.fixture(scope="module")
def golden():
    return GoldenModem(CONFIG1_LOOPBACK)


# ------------------------------------------------------------------- parity

def test_encode_waveform_matches_golden(modem, golden):
    payload = b"parity check payload" * 3
    wj = modem.encode(payload, "p.txt")
    wg = golden.encode(payload, "p.txt")
    assert wj.shape == wg.shape
    # float32 FFT vs float64 FFT: agree to ~1e-5 of the ~0.5 peak amplitude
    assert np.max(np.abs(wj - wg.astype(np.float32))) < 1e-4


def test_jax_decodes_golden_encode(modem, golden):
    rng = np.random.default_rng(10)
    payload = bytes(rng.integers(0, 256, size=500, dtype=np.uint8))
    wav = golden.encode(payload, "x.bin")
    rx = delay_gain(wav, 4000, 0.4, total_len=len(wav) + 9000)
    rx = awgn(rx, 25.0, rng)
    res = modem.decode(rx)
    assert res.crc_ok and res.payload == payload and res.filename == "x.bin"


def test_golden_decodes_jax_encode(modem, golden):
    rng = np.random.default_rng(11)
    payload = bytes(rng.integers(0, 256, size=500, dtype=np.uint8))
    wav = modem.encode(payload)
    rx = delay_gain(wav.astype(np.float64), 4000, 0.4, total_len=len(wav) + 9000)
    rx = awgn(rx, 25.0, rng)
    res = golden.decode(rx)
    assert res.crc_ok and res.payload == payload


def test_sync_start_matches_golden(modem, golden):
    rng = np.random.default_rng(12)
    wav = golden.encode(b"sync parity")
    rx = awgn(delay_gain(wav, 7777, 0.3, total_len=len(wav) + 12000), 20.0, rng)
    gs, _ = golden.find_frame_start(rx)
    res = modem.decode(rx)
    assert abs(int(res.diag.sync_start) - gs) <= 2


# ----------------------------------------------------------- configs 1 -- 3

def test_config1_loopback_jit(modem):
    """BASELINE.json:7 — loopback QPSK-OFDM, ideal channel, jitted path."""
    payload = b"The five boxing wizards jump quickly." * 5
    wav = modem.encode(payload, "wiz.txt")
    res = modem.decode(wav, start=0)
    assert res.crc_ok and res.payload == payload and res.filename == "wiz.txt"


def test_config2_delay_gain(modem):
    """BASELINE.json:8 — chirp-synchronized decode with delay + gain."""
    rng = np.random.default_rng(13)
    payload = bytes(rng.integers(0, 256, size=700, dtype=np.uint8))
    wav = modem.encode(payload)
    rx = awgn(delay_gain(wav.astype(np.float64), 12345, 0.21,
                         total_len=len(wav) + 20000), 25.0, rng)
    res = modem.decode(rx)
    assert res.crc_ok and res.payload == payload
    assert int(res.diag.sync_start) in range(12345 - 4, 12345 + 2)


def test_config3_multipath(modem):
    """BASELINE.json:9 — pilot-aided est/EQ over a multipath room channel."""
    rng = np.random.default_rng(14)
    payload = bytes(rng.integers(0, 256, size=300, dtype=np.uint8))
    wav = modem.encode(payload)
    # margin for UNCODED QPSK: reverb well inside the CP. Harsher rooms are
    # the FEC-protected case (config 4, test_gf3_frame).
    h = room_impulse_response(rng, rt60=0.015, drr_db=6.0)
    rx = awgn(delay_gain(multipath(wav.astype(np.float64), h), 2000, 1.0,
                         total_len=len(wav) + 8000), 30.0, rng)
    res = modem.decode(rx)
    assert res.crc_ok and res.payload == payload


def test_16qam_roundtrip():
    m = Modem(CONFIG1_LOOPBACK.replace(bits_per_symbol=4))
    rng = np.random.default_rng(15)
    payload = bytes(rng.integers(0, 256, size=900, dtype=np.uint8))
    wav = m.encode(payload)
    rx = awgn(delay_gain(wav.astype(np.float64), 500, 0.6,
                         total_len=len(wav) + 2000), 30.0, rng)
    res = m.decode(rx)
    assert res.crc_ok and res.payload == payload


# ------------------------------------------------------------------ batched

def test_batched_decode_parity(modem):
    """Frame-batch data parallelism (SURVEY.md §3.2): B frames, one jit call."""
    rng = np.random.default_rng(16)
    B = 8
    payloads = [bytes(rng.integers(0, 256, size=200, dtype=np.uint8)) for _ in range(B)]
    wavs = modem.encode_batch(payloads)
    assert wavs.shape == (B, modem.cfg.frame_len)
    T = modem.cfg.frame_len + 6000
    rx = np.zeros((B, T))
    delays = rng.integers(0, 5000, size=B)
    for i in range(B):
        rx[i] = awgn(delay_gain(wavs[i].astype(np.float64), int(delays[i]),
                                0.5, total_len=T), 25.0, rng)
    results = modem.decode_batch(rx)
    for i, res in enumerate(results):
        assert res.crc_ok and res.payload == payloads[i]
        assert abs(int(res.diag.sync_start) - int(delays[i])) <= 2


def test_diag_pytree_shapes(modem):
    rng = np.random.default_rng(17)
    wav = modem.encode(b"diag")
    rx = awgn(delay_gain(wav.astype(np.float64), 100, 1.0,
                         total_len=len(wav) + 1000), 30.0, rng)
    res = modem.decode(rx)
    d = res.diag
    assert d.H.shape == (modem.cfg.n_used,)
    assert d.pilot_slope.shape == (modem.cfg.n_data_symbols,)
    assert float(d.evm) < 0.05
    assert float(d.noise_var) > 0
