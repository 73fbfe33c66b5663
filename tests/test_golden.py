"""Golden-model unit + loopback tests (SURVEY.md §5 test pyramid, levels 1-2).

The golden model is the in-repo parity oracle (reference mount empty —
SURVEY.md §0); these tests define correct modem behavior.
"""

import numpy as np
import pytest

from gf3x.channel import awgn, delay_gain, multipath, room_impulse_response
from gf3x.config import CONFIG1_LOOPBACK, ModemConfig, layout
from gf3x.golden.modem import GoldenModem, qam_demap_llr, qam_map
from gf3x.utils import bits_to_bytes, bytes_to_bits, pack_header, parse_header


# ------------------------------------------------------------------ bit layer

def test_bits_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=257, dtype=np.uint8).tobytes()
    assert bits_to_bytes(bytes_to_bits(data)) == data


def test_header_roundtrip():
    payload = b"hello GF3 standard frame"
    stream = pack_header(payload, "greeting.txt")
    out, name, ok = parse_header(stream + b"\x00" * 13)  # with trailing padding
    assert out == payload and name == "greeting.txt" and ok


def test_header_rejects_garbage():
    with pytest.raises(ValueError):
        parse_header(b"\xff" * 64)


# -------------------------------------------------------------- constellation

@pytest.mark.parametrize("bps", [2, 4, 6])
def test_qam_map_unit_power_and_gray(bps):
    n = 1 << bps
    bits = ((np.arange(n)[:, None] >> np.arange(bps - 1, -1, -1)[None, :]) & 1).astype(np.uint8)
    pts = qam_map(bits, bps)
    assert np.allclose(np.mean(np.abs(pts) ** 2), 1.0)
    assert len(np.unique(np.round(pts, 9))) == n  # all labels distinct


@pytest.mark.parametrize("bps", [2, 4, 6])
def test_demap_inverts_map_noiseless(bps):
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(500, bps), dtype=np.uint8)
    y = qam_map(bits, bps)
    llr = qam_demap_llr(y, np.full(y.shape, 0.1), bps)
    assert np.array_equal((llr < 0).astype(np.uint8), bits)


def test_qpsk_matches_canonical_formula():
    # (b0,b1) → ((1−2b0) + j(1−2b1))/√2  (SURVEY.md Appendix)
    bits = np.array([[0, 0], [0, 1], [1, 0], [1, 1]], dtype=np.int64)
    want = ((1 - 2 * bits[:, 0]) + 1j * (1 - 2 * bits[:, 1])) / np.sqrt(2)
    assert np.allclose(qam_map(bits, 2), want)


# ---------------------------------------------------------------------- OFDM

def test_ofdm_roundtrip_ideal():
    m = GoldenModem(CONFIG1_LOOPBACK)
    rng = np.random.default_rng(2)
    c = CONFIG1_LOOPBACK
    sym = (rng.normal(size=(3, c.n_used)) + 1j * rng.normal(size=(3, c.n_used))) / np.sqrt(2)
    x = m.ofdm_modulate(sym)
    assert x.dtype == np.float64 and x.size == 3 * c.symbol_len
    back = m.ofdm_demodulate(x)
    assert np.allclose(back, sym, atol=1e-10)


def test_ofdm_symbol_rms_matches_config():
    m = GoldenModem(CONFIG1_LOOPBACK)
    rng = np.random.default_rng(3)
    c = CONFIG1_LOOPBACK
    bits = rng.integers(0, 2, size=(64, c.n_used, 2), dtype=np.uint8)
    sym = qam_map(bits, 2)
    x = m.ofdm_modulate(sym)
    assert abs(np.sqrt(np.mean(x ** 2)) - c.ofdm_amplitude) / c.ofdm_amplitude < 0.05


# ----------------------------------------------------------------------- sync

def test_chirp_xcorr_finds_planted_offset():
    m = GoldenModem(CONFIG1_LOOPBACK)
    rng = np.random.default_rng(4)
    wav = m.encode(b"sync test payload")
    rx = delay_gain(wav, delay=3177, gain=0.3, total_len=len(wav) + 8000)
    rx = awgn(rx, 15.0, rng)
    start, metric = m.find_frame_start(rx)
    # first-arrival picking may land a couple of samples early on the chirp
    # autocorrelation mainlobe; anything within the CP backoff is absorbed by
    # the channel estimate (SURVEY.md Appendix "LS channel estimate").
    assert 3177 - 4 <= start <= 3177 + 1
    assert metric > 10.0


def test_schmidl_cox_plateau_at_sc_symbol():
    cfg = CONFIG1_LOOPBACK
    m = GoldenModem(cfg)
    wav = m.encode(b"sc test")
    rx = delay_gain(wav, delay=500, gain=1.0, total_len=len(wav) + 2000)
    met = m.schmidl_cox_metric(rx)
    # SC symbol body starts at delay + chirp_len + cp; the metric plateau
    # covers [start of CP, start of body]; peak must fall in that window.
    lo = 500 + cfg.chirp_len
    hi = lo + cfg.cp + cfg.n_fft // 4
    peak = int(np.argmax(met))
    assert lo - cfg.cp <= peak <= hi
    assert met[peak] > 0.9


# ------------------------------------------------------- channel est. / frame

def test_channel_estimate_on_known_synthetic_channel():
    cfg = CONFIG1_LOOPBACK
    m = GoldenModem(cfg)
    lay = layout(cfg)
    rng = np.random.default_rng(5)
    H_true = (rng.normal(size=cfg.n_used) + 1j * rng.normal(size=cfg.n_used))
    Y = lay.known_syms * H_true[None, :]
    H_hat, nv = m.estimate_channel(Y)
    assert np.allclose(H_hat, H_true, atol=1e-9)
    assert nv < 1e-12


# --------------------------------------------------- end-to-end (configs 1-3)

def test_config1_loopback_ideal_channel():
    """Driver benchmark config 1 (BASELINE.json:7): ideal-channel loopback."""
    m = GoldenModem(CONFIG1_LOOPBACK)
    payload = b"The quick brown fox jumps over the lazy dog. " * 4
    wav = m.encode(payload, "fox.txt")
    res = m.decode(wav, start=0)
    assert res.payload == payload
    assert res.filename == "fox.txt"
    assert res.crc_ok


def test_config2_delay_gain_wav_decode():
    """Driver benchmark config 2 (BASELINE.json:8): chirp-synced decode with
    simulated delay + gain offset."""
    m = GoldenModem(CONFIG1_LOOPBACK)
    rng = np.random.default_rng(6)
    payload = bytes(rng.integers(0, 256, size=400, dtype=np.uint8))
    wav = m.encode(payload, "blob.bin")
    rx = delay_gain(wav, delay=12345, gain=0.21, total_len=len(wav) + 20000)
    rx = awgn(rx, 25.0, rng)
    res = m.decode(rx)
    assert res.crc_ok and res.payload == payload


def test_config3_multipath_room_channel():
    """Driver benchmark config 3 (BASELINE.json:9): pilot-aided est + EQ over
    a simulated multipath room channel."""
    m = GoldenModem(CONFIG1_LOOPBACK)
    rng = np.random.default_rng(7)
    payload = bytes(rng.integers(0, 256, size=300, dtype=np.uint8))
    wav = m.encode(payload, "room.bin")
    # margin for UNCODED QPSK: reverb well inside the CP (≈5.8 ms); longer
    # reverb is the FEC-protected case (config 4, test_gf3_frame).
    h = room_impulse_response(rng, fs=44100, rt60=0.015, drr_db=6.0)
    rx = multipath(wav, h)
    rx = delay_gain(rx, delay=2000, gain=1.0, total_len=len(rx) + 4000)
    rx = awgn(rx, 30.0, rng)
    res = m.decode(rx)
    assert res.crc_ok and res.payload == payload


def test_sfo_resilience_via_pilot_tracking():
    """Sampling-frequency offset (clock mismatch) handled by pilot phase
    regression (SURVEY.md Appendix "Pilot phase tracking")."""
    from gf3x.channel import resample_sfo
    m = GoldenModem(CONFIG1_LOOPBACK)
    rng = np.random.default_rng(8)
    payload = bytes(rng.integers(0, 256, size=200, dtype=np.uint8))
    wav = m.encode(payload)
    rx = resample_sfo(wav, ppm=40.0)
    rx = delay_gain(rx, delay=777, gain=0.8, total_len=len(rx) + 2000)
    rx = awgn(rx, 30.0, rng)
    res = m.decode(rx)
    assert res.crc_ok and res.payload == payload


def test_16qam_loopback():
    cfg = CONFIG1_LOOPBACK.replace(bits_per_symbol=4)
    m = GoldenModem(cfg)
    rng = np.random.default_rng(9)
    payload = bytes(rng.integers(0, 256, size=600, dtype=np.uint8))
    wav = m.encode(payload)
    rx = delay_gain(wav, 1000, 0.5, total_len=len(wav) + 3000)
    rx = awgn(rx, 30.0, rng)
    res = m.decode(rx)
    assert res.crc_ok and res.payload == payload
