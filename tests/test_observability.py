"""Observability + recovery-loop tests: SC validation metric, constellation
extraction, plots, selective retransmission (SURVEY.md §6.1/6.3/6.5, §5c)."""

import numpy as np
import pytest

from gf3x import ModemConfig, Modem
from gf3x.channel import awgn, delay_gain
from gf3x.models.stream import (
    decode_stream, encode_file, encode_frames, frame_capacity, merge_streams,
)

CFG = ModemConfig(
    n_fft=256, cp=64, bin_lo=8, bin_hi=103, pilot_spacing=8,
    n_known_symbols=2, n_data_symbols=12, chirp_duration=0.02,
    fec="ldpc", ldpc_z=24, ldpc_iters=10,
).validate()


@pytest.fixture(scope="module")
def modem():
    return Modem(CFG)


@pytest.mark.slow  # 59 s: SC metric on a real frame; the metric and its
# window are covered in test_sc_sync.py on synthetic geometry
def test_sc_metric_validates_real_frame(modem):
    rng = np.random.default_rng(0)
    wav = modem.encode(b"sc check")
    rx = awgn(delay_gain(wav.astype(np.float64), 700, 0.6,
                         total_len=len(wav) + 2500), 25.0, rng)
    res = modem.decode(rx)
    assert res.crc_ok
    assert float(res.diag.sc_metric) > 0.7      # repeated halves present

    junk = rng.normal(size=rx.shape) * 0.05
    res_j = modem.decode(junk)
    assert float(res_j.diag.sc_metric) < 0.5    # no SC structure at "sync"


def test_equalized_symbols_cluster_on_constellation(modem):
    rng = np.random.default_rng(1)
    wav = modem.encode(b"constellation payload!")
    rx = awgn(delay_gain(wav.astype(np.float64), 300, 0.7,
                         total_len=len(wav) + 1500), 28.0, rng)
    syms = modem.equalized_symbols(rx)
    assert syms.shape == (CFG.n_data_symbols, CFG.n_data_bins)
    # every symbol within 0.25 of a QPSK point
    ref = np.array([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j]) / np.sqrt(2)
    d = np.min(np.abs(syms[..., None] - ref), axis=-1)
    assert np.percentile(d, 99) < 0.25


@pytest.mark.slow  # 62 s: matplotlib render smoke; diag VALUES are
# asserted by the other observability tests
def test_plots_render(tmp_path, modem):
    from gf3x.bench.ber import ber_sweep
    from gf3x.bench.plots import save_ber_plot, save_channel_response, save_constellation

    res = ber_sweep(modem, snrs_db=[4.0, 10.0], n_trials=2)
    save_ber_plot(res, tmp_path / "ber.png")
    rng = np.random.default_rng(2)
    wav = modem.encode(b"plots")
    rx = awgn(delay_gain(wav.astype(np.float64), 100, 1.0,
                         total_len=len(wav) + 500), 30.0, rng)
    dres = modem.decode(rx)
    save_channel_response(dres.diag.H, CFG, tmp_path / "h.png")
    save_constellation(modem.equalized_symbols(rx), tmp_path / "c.png")
    for f in ("ber.png", "h.png", "c.png"):
        assert (tmp_path / f).stat().st_size > 5000


def test_selective_retransmission_recovers_file(modem):
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 256, frame_capacity(modem, "r.bin") * 3, dtype=np.uint8))
    wav = encode_file(modem, data, "r.bin")
    # kill frame 1's chirp in the first reception
    gap = int(round(0.05 * CFG.fs))
    rx1 = wav.astype(np.float64).copy()
    rx1[CFG.frame_len + gap: CFG.frame_len + gap + CFG.chirp_len] = 0.0
    first = decode_stream(modem, rx1)
    assert not first.complete and first.missing == [1]

    retx = encode_frames(modem, data, first.missing, "r.bin")
    second = decode_stream(modem, awgn(retx.astype(np.float64), 25.0, rng))
    merged = merge_streams(first, second)
    assert merged.complete and merged.payload == data and merged.filename == "r.bin"


def test_64qam_roundtrip():
    m = Modem(CFG.replace(bits_per_symbol=6, fec="none", n_data_symbols=8))
    rng = np.random.default_rng(4)
    payload = bytes(rng.integers(0, 256, 200, dtype=np.uint8))
    wav = m.encode(payload)
    rx = awgn(delay_gain(wav.astype(np.float64), 400, 0.8,
                         total_len=len(wav) + 1200), 35.0, rng)
    res = m.decode(rx)
    assert res.crc_ok and res.payload == payload


def test_timer_report():
    from gf3x.utils.profiling import Timer
    t = Timer()
    with t.section("a"):
        pass
    assert "a" in t.report()


def test_fec_convergence_diag_matches_golden(modem):
    """DecodeDiag.fec_iters / fec_unsat (SURVEY.md §6.5, VERDICT r2 missing
    #4): on identical LLRs the JAX-reported pass count equals the golden
    decoder's, and a noisy-but-decodable frame reports 0 unsat codewords
    while junk reports stress."""
    from gf3x import GoldenModem

    g = GoldenModem(CFG)
    rng = np.random.default_rng(6)
    payload = bytes(rng.integers(0, 256, 60, dtype=np.uint8))
    wav = modem.encode(payload)
    rx = awgn(delay_gain(wav.astype(np.float64), 500, 0.6,
                         total_len=len(wav) + 2000), 7.0, rng)
    res = modem.decode(rx.astype(np.float32))
    gres = g.decode(rx)
    assert res.crc_ok and gres.crc_ok
    assert int(res.diag.fec_unsat) == gres.diag["fec_unsat"] == 0
    # near-threshold SNR: the decoder had to actually iterate, and both
    # twins ran the same number of passes on the same frame
    assert int(res.diag.fec_iters) == gres.diag["ldpc_iters"]
    assert 1 <= int(res.diag.fec_iters) <= CFG.ldpc_iters

    # junk recording: CRC fails and the diag shows the decoder gave up
    junk = (rng.normal(size=rx.shape) * 0.1)
    rj = modem.decode(junk.astype(np.float32))
    assert not rj.crc_ok
    assert int(rj.diag.fec_unsat) >= 1
    assert int(rj.diag.fec_iters) == CFG.ldpc_iters


def test_fec_diag_zero_without_fec():
    m = Modem(CFG.replace(fec="none"))
    wav = m.encode(b"nofec")
    res = m.decode(wav, start=0)
    assert int(res.diag.fec_iters) == 0 and int(res.diag.fec_unsat) == 0


def test_llr_hist_diag(modem):
    """DecodeDiag.llr_hist (SURVEY.md §6.5's named LLR-histogram item):
    16 static log2 bins over a 1/8 subsample of the coded LLRs. A clean
    high-SNR decode concentrates mass in high-|LLR| bins; a noise-only
    decode sits in the low bins."""
    rng = np.random.default_rng(4)
    wav = modem.encode(b"hist check payload")
    rx = awgn(delay_gain(wav.astype(np.float64), 300, 0.7,
                         total_len=len(wav) + 1200), 30.0, rng)
    res = modem.decode(rx)
    assert res.crc_ok
    h = np.asarray(res.diag.llr_hist)
    assert h.shape == (16,) and h.sum() > 0
    centers = np.arange(16)
    mean_clean = float((h * centers).sum() / h.sum())

    junk = (rng.normal(size=rx.shape) * 0.05).astype(np.float32)
    hj = np.asarray(modem.decode(junk).diag.llr_hist)
    assert hj.shape == (16,) and hj.sum() > 0
    mean_junk = float((hj * centers).sum() / hj.sum())
    assert mean_clean > mean_junk + 2.0
