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
        ldpc_rate=str(rng.choice(["1/2", "2/3", "3/4", "5/6"])),
    )
    try:
        cfg = cfg.validate()
    except AssertionError:
        return None
    if rng.random() < 0.35:
        # per-bin bit-loading (SPEC §5b) over the drawn geometry: random
        # mixed orders incl. nulls; keep ≥ half the bins active so coded
        # configs still fit a codeword
        table = tuple(int(x) for x in rng.choice(
            [0, 2, 4, 6], size=cfg.n_data_bins, p=[0.2, 0.4, 0.25, 0.15]))
        try:
            cfg = cfg.replace(bit_loading=table)
        except AssertionError:
            return None
    return cfg


SEEDS = list(range(40, 48))


# Degenerate-but-valid corners `validate()` accepts: every one must decode a
# clean loopback bit-exactly on BOTH twins (VERDICT r2 weak #1 — pilotless
# configs NaN'd the per-symbol noise floor; the random sweep never drew
# pilot_spacing=0, P∈{1,2}, interleave off, tiny CP, or K=1).
CORNERS = {
    "pilotless": dict(pilot_spacing=0),
    "one_pilot": dict(pilot_spacing=280),
    "two_pilots": dict(pilot_spacing=140),
    "no_interleave": dict(interleave=False),
    "tiny_cp": dict(cp=16),
    "one_known_symbol": dict(n_known_symbols=1),
    "one_data_symbol": dict(n_data_symbols=1),
    "pilotless_tiny_cp_k1": dict(pilot_spacing=0, cp=16, n_known_symbols=1,
                                 interleave=False),
    "qam64_two_pilots": dict(pilot_spacing=140, bits_per_symbol=6),
    "narrow_band": dict(bin_lo=100, bin_hi=107, pilot_spacing=4),
    # SPEC §5b loading degenerates: pilotless loading (n_data_bins =
    # n_used = 280), and a nearly-all-null table (24/245 bins carry all
    # the bits at maximum power reallocation gain ≈ √10)
    "loaded_pilotless": dict(pilot_spacing=0,
                             bit_loading=tuple([2, 4] * 140)),
    "loaded_sparse": dict(
        bit_loading=tuple(6 if i % 10 == 0 else 0 for i in range(245))),
}


@pytest.mark.parametrize("name", sorted(CORNERS))
def test_degenerate_corner_loopback(name):
    cfg = ModemConfig(fec="none", **CORNERS[name]).validate()
    m = Modem(cfg)
    g = GoldenModem(cfg)
    rng = np.random.default_rng(hash(name) % 2**32)
    payload = bytes(rng.integers(
        0, 256, min(frame_capacity(m), 64), dtype=np.uint8))
    wav = m.encode(payload)
    res = m.decode(wav, start=0)
    gres = g.decode(wav.astype(np.float64), start=0)
    assert res.crc_ok and res.payload == payload, cfg
    assert gres.crc_ok and gres.payload == payload, cfg
    assert np.array_equal(res.bits, gres.bits), cfg
    assert np.all(np.isfinite(res.diag.mean_abs_llr)), cfg


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
