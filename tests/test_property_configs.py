"""Property sweep: random valid configs must round-trip end-to-end
(golden ≡ JAX), across FFT sizes, CP lengths, pilot grids, constellations,
preamble/data geometry, and FEC — the whole config space, not just presets."""

import numpy as np
import pytest

from gf3x import GoldenModem, Modem, ModemConfig
from gf3x.channel import awgn, delay_gain
from gf3x.models.stream import frame_capacity


def _random_config(rng) -> ModemConfig:
    n_fft = int(rng.choice([256, 512, 1024, 2048]))
    cp = n_fft // int(rng.choice([4, 8]))
    lo = int(rng.integers(4, n_fft // 16))
    spacing = int(rng.choice([4, 8]))
    n_used = spacing * int(rng.integers(8, min(40, (n_fft // 2 - lo) // spacing)))
    fec = str(rng.choice(["none", "ldpc"]))
    cfg = ModemConfig(
        n_fft=n_fft, cp=cp, bin_lo=lo, bin_hi=lo + n_used - 1,
        pilot_spacing=spacing,
        bits_per_symbol=int(rng.choice([2, 4, 6])),
        n_known_symbols=int(rng.integers(2, 6)),
        n_data_symbols=int(rng.integers(6, 24)),
        chirp_duration=float(rng.uniform(0.02, 0.08)),
        fec=fec, ldpc_z=int(rng.choice([24, 32])), ldpc_iters=10,
    )
    try:
        return cfg.validate()
    except AssertionError:
        return None


SEEDS = list(range(40, 48))


@pytest.mark.parametrize("seed", SEEDS)
def test_random_config_roundtrip(seed):
    rng = np.random.default_rng(seed)
    cfg = None
    while cfg is None:
        cfg = _random_config(rng)
    m = Modem(cfg)
    g = GoldenModem(cfg)
    payload = bytes(rng.integers(
        0, 256, min(frame_capacity(m), 120), dtype=np.uint8))
    # high SNR, mild channel: this sweep checks GEOMETRY handling, not margin
    wav = m.encode(payload)
    rx = awgn(delay_gain(wav.astype(np.float64),
                         int(rng.integers(100, 3000)), 0.7,
                         total_len=len(wav) + 5000), 32.0, rng)
    res = m.decode(rx)
    gres = g.decode(rx)
    assert res.crc_ok and res.payload == payload, cfg
    assert gres.crc_ok and gres.payload == payload, cfg
    assert np.array_equal(res.bits, gres.bits), cfg
