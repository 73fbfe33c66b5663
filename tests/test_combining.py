"""HARQ chase combining (gf3x.models.stream.chase_combine): repeated
CRC-failed receptions of one frame soft-combine into a successful decode
— the ~3 dB maximum-ratio gain that turns a failed original plus a failed
retransmission into a recovered frame."""

import numpy as np
import pytest

from gf3x import Modem, preset
from gf3x.channel import awgn, delay_gain
from gf3x.models.stream import chase_combine

SNR_FAIL = -0.5      # below the gf3 waterfall cliff (~1.5 dB): FER ≈ 1


def _reception(wav, delay, seed, snr_db=SNR_FAIL):
    rng = np.random.default_rng(seed)
    return awgn(delay_gain(wav, delay, 1.0, total_len=wav.size + 2000),
                snr_db, rng), delay


def test_two_failed_receptions_combine_clean():
    m = Modem(preset("gf3"))
    rng = np.random.default_rng(5)
    payload = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
    wav = m.encode(payload, "f.bin")

    rx1, s1 = _reception(wav, 300, seed=1)
    rx2, s2 = _reception(wav, 700, seed=2)
    # each alone fails (independent noise draws below the cliff)
    assert not m.decode(rx1, start=s1, sfo="off").crc_ok
    assert not m.decode(rx2, start=s2, sfo="off").crc_ok

    res = chase_combine(m, [(rx1, s1), (rx2, s2)])
    assert res.crc_ok and res.payload == payload and res.filename == "f.bin"


def test_combining_gain_is_cumulative():
    """Three copies at a deeper SNR (≈ +4.8 dB combined) where two do not
    suffice — the sum really is accumulating soft information."""
    m = Modem(preset("gf3"))
    rng = np.random.default_rng(6)
    payload = bytes(rng.integers(0, 256, 400, dtype=np.uint8))
    wav = m.encode(payload, "g.bin")
    rcp = [_reception(wav, 200 + 150 * i, seed=10 + i, snr_db=-2.5)
           for i in range(3)]
    assert not chase_combine(m, rcp[:2]).crc_ok
    res = chase_combine(m, rcp)
    assert res.crc_ok and res.payload == payload


def test_combining_with_clock_offset_needs_joint_sfo():
    """+800 ppm (beyond the plain receiver's range) at 0.5 dB (below the
    cliff): single decodes fail on SNR, sfo='off' combining fails on
    phase damage, AND per-reception δ̂ estimation fails nonlinearly at
    this SNR (sign flips) — only the JOINT estimate (coherent SC pooling
    across receptions, `Modem.joint_clock_offset`) recovers the frame."""
    from gf3x.channel import resample_sfo

    m = Modem(preset("gf3"))
    rng = np.random.default_rng(8)
    payload = bytes(rng.integers(0, 256, 400, dtype=np.uint8))
    wav = m.encode(payload, "k.bin")
    rcp = []
    for seed in (31, 32):
        r = np.random.default_rng(seed)
        rx = resample_sfo(
            awgn(delay_gain(wav.astype(np.float64), 300, 1.0,
                            total_len=wav.size + 3000), 0.5, r), 800.0)
        rcp.append((rx.astype(np.float32), 300))
    assert not m.decode(rcp[0][0], start=300, sfo="on").crc_ok   # SNR too low
    assert not chase_combine(m, rcp, sfo="off").crc_ok           # phase damage
    # the joint estimate lands near the true offset where the
    # per-reception two-pass estimator returns garbage at this SNR
    d = m.joint_clock_offset(rcp)
    assert abs(d * 1e6 - 800.0) < 250.0
    res = chase_combine(m, rcp, sfo="on")
    assert res.crc_ok and res.payload == payload


def test_single_reception_combine_matches_decode():
    """Degenerate case: combining one clean reception equals the normal
    decode (same payload bits out)."""
    m = Modem(preset("gf3"))
    payload = b"one copy"
    wav = m.encode(payload, "h.bin")
    rx, s = _reception(wav, 400, seed=3, snr_db=12.0)
    direct = m.decode(rx, start=s, sfo="off")
    combined = chase_combine(m, [(rx, s)])
    assert direct.crc_ok and combined.crc_ok
    assert np.array_equal(direct.bits, combined.bits)
    with pytest.raises(ValueError):
        chase_combine(m, [])
