"""Schmidl–Cox timing fallback (BASELINE.json:5: frame synchronization by
BOTH chirp matched filtering and SC autocorrelation)."""

import numpy as np
import pytest

from gf3x import ModemConfig, Modem
from gf3x.channel import awgn, delay_gain

CFG = ModemConfig(
    n_fft=256, cp=64, bin_lo=8, bin_hi=103, pilot_spacing=8,
    n_known_symbols=2, n_data_symbols=12, chirp_duration=0.02,
    fec="ldpc", ldpc_z=24, ldpc_iters=10,
).validate()


@pytest.fixture(scope="module")
def modem():
    return Modem(CFG)


def _rx(modem, rng, payload, delay=900, snr=24.0):
    wav = modem.encode(payload)
    return awgn(delay_gain(wav.astype(np.float64), delay, 0.5,
                           total_len=len(wav) + 3000), snr, rng)


def test_sc_sync_decodes(modem):
    rng = np.random.default_rng(0)
    payload = bytes(rng.integers(0, 256, 80, dtype=np.uint8))
    res = modem.decode(_rx(modem, rng, payload), sync="sc")
    assert res.crc_ok and res.payload == payload
    # timing within the CP backoff tolerance of the true start
    assert abs(int(res.diag.sync_start) - 900) < CFG.cp


def test_sc_sync_survives_destroyed_chirp(modem):
    """The chirp is clipped/notched out of the recording: matched-filter
    sync fails, the SC plateau still finds the frame."""
    rng = np.random.default_rng(1)
    payload = bytes(rng.integers(0, 256, 80, dtype=np.uint8))
    rx = _rx(modem, rng, payload)
    rx[900: 900 + CFG.chirp_len] = rng.normal(size=CFG.chirp_len) * 0.01
    assert not modem.decode(rx).crc_ok              # chirp sync is dead
    res = modem.decode(rx, sync="sc")
    assert res.crc_ok and res.payload == payload
    assert float(res.diag.sc_metric) > 0.8


def test_sc_sync_batched(modem):
    rng = np.random.default_rng(2)
    payloads = [bytes(rng.integers(0, 256, 80, dtype=np.uint8)) for _ in range(4)]
    wavs = modem.encode_batch(payloads)
    T = wavs.shape[-1] + 2000
    rx = np.zeros((4, T), np.float32)
    for i in range(4):
        rx[i, 300 + 100 * i: 300 + 100 * i + wavs.shape[-1]] = 0.6 * wavs[i]
    rx += rng.standard_normal(rx.shape).astype(np.float32) * 3e-3
    import jax, jax.numpy as jnp
    bits, diag = jax.jit(modem.demodulate_sc)(jnp.asarray(rx))
    for i in range(4):
        r = modem._result(np.asarray(bits[i]), None)
        assert r.crc_ok and r.payload == payloads[i]


def test_sc_sync_gf3_robust_geometry():
    """The SC timing chain on GF3_ROBUST (denser pilots, K=8, fewer data
    symbols): the −cp//8 early bias must hold beyond the geometry it was
    tuned on (VERDICT r2 weak #5), with the chirp destroyed."""
    from gf3x import GF3_ROBUST

    m = Modem(GF3_ROBUST)
    rng = np.random.default_rng(7)
    payload = bytes(rng.integers(0, 256, 200, dtype=np.uint8))
    wav = m.encode(payload, "r.bin")
    delay = 4321
    rx = awgn(delay_gain(wav.astype(np.float64), delay, 0.5,
                         total_len=len(wav) + 9000), 16.0, rng)
    rx[delay: delay + GF3_ROBUST.chirp_len] = \
        rng.normal(size=GF3_ROBUST.chirp_len) * 0.01
    res = m.decode(rx.astype(np.float32), sync="sc")
    assert res.crc_ok and res.payload == payload
    assert abs(int(res.diag.sync_start) - delay) < GF3_ROBUST.cp


@pytest.mark.parametrize("n_fft,cp", [(1024, 64), (512, 32)])
def test_sc_sync_tiny_cp_geometry(n_fft, cp):
    """Tiny-CP geometries (cp = n_fft/16): the plateau is narrow and the
    early-bias budget small — exactly where a one-geometry magic constant
    would break silently (VERDICT r2 weak #5)."""
    cfg = ModemConfig(
        n_fft=n_fft, cp=cp, bin_lo=8, bin_hi=8 + 96 - 1, pilot_spacing=8,
        n_known_symbols=3, n_data_symbols=10, chirp_duration=0.03,
        fec="none",
    ).validate()
    m = Modem(cfg)
    rng = np.random.default_rng(n_fft + cp)
    payload = bytes(rng.integers(0, 256, 40, dtype=np.uint8))
    wav = m.encode(payload)
    delay = 1234
    rx = awgn(delay_gain(wav.astype(np.float64), delay, 0.6,
                         total_len=len(wav) + 4000), 28.0, rng)
    res = m.decode(rx.astype(np.float32), sync="sc")
    assert res.crc_ok and res.payload == payload
    assert abs(int(res.diag.sync_start) - delay) < cp


@pytest.mark.slow  # 79 s: harsher-channel variant of test_sc_sync_decodes
def test_sc_sync_multipath_low_snr_gf3():
    """Hardening (VERDICT r1 item 6): the SC plateau timing must survive a
    room impulse response + low SNR on the full GF3 preset — the same
    fixture family the chirp path decodes. Probed errors stay within ~40
    samples of the true onset (inside the cp//4 = 64 backoff budget)."""
    from gf3x import GF3_STANDARD
    from gf3x.channel import multipath, room_impulse_response

    m = Modem(GF3_STANDARD)
    rng = np.random.default_rng(2)
    payload = bytes(rng.integers(0, 256, 400, dtype=np.uint8))
    wav = m.encode(payload, "x.bin")
    for snr, rt60 in ((24.0, 0.0), (15.0, 0.01), (12.0, 0.02)):
        x = wav.astype(np.float64)
        if rt60:
            x = multipath(x, room_impulse_response(rng, rt60=rt60, drr_db=5.0))
        delay = int(rng.integers(1000, 9000))
        rx = awgn(delay_gain(x, delay, 0.5, total_len=len(x) + 12000), snr, rng)
        res = m.decode(rx.astype(np.float32), sync="sc")
        assert res.crc_ok and res.payload == payload, (snr, rt60)
        assert abs(int(res.diag.sync_start) - delay) < 64, (snr, rt60)
