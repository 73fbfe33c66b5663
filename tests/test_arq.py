"""ArqSender/ArqReceiver (gf3x.models.arq): the selective-repeat + HARQ
state machines. The headline property: two rounds that BOTH fail every
single-frame decode still complete the transfer, because the receiver
kept the failed receptions and chase-combined them per seq."""

import numpy as np

from gf3x import Modem, preset
from gf3x.channel import awgn, delay_gain
from gf3x.models.arq import ArqReceiver, ArqSender, decode_nack, encode_nack
from gf3x.models.stream import frame_capacity


def _air(wav, delay, seed, snr_db):
    rng = np.random.default_rng(seed)
    return awgn(delay_gain(wav, delay, 1.0, total_len=wav.size + 4000),
                snr_db, rng)


def test_session_completes_by_combining_two_failed_rounds():
    m = Modem(preset("gf3"))
    rng = np.random.default_rng(9)
    payload = bytes(rng.integers(0, 256, 2 * frame_capacity(m, "d.bin"),
                                 dtype=np.uint8))
    tx = ArqSender(m, payload, "d.bin")
    rx = ArqReceiver(m, sfo="off")
    assert tx.n_frames == 2

    # round 0 at 0 dB: every frame fails → NACK "all"
    got = rx.feed(_air(tx.initial(), 600, seed=51, snr_db=0.0))
    assert not got.complete and not any(f.crc_ok for f in got.frames)
    nack = rx.nack()
    assert nack == "all"

    # round 1, still 0 dB: singles fail again, but each seq now has two
    # stored receptions → chase combining (+3 dB) completes the transfer
    wire = encode_nack(nack, "d.bin")
    req, _ = decode_nack(wire)
    # the NACK value round-trips into feed() verbatim ("all" included)
    got = rx.feed(_air(tx.retransmit(req), 900, seed=52, snr_db=0.0),
                  nacked=req)
    assert got.complete, got.missing
    assert got.payload == payload
    assert rx.nack() == []
    # completed transfer: an empty NACK yields an empty retransmission
    assert tx.retransmit(rx.nack()).size == 0
    # soft copies are released once their seqs decode
    assert not rx._receptions


def test_attribution_survives_sync_missed_frame():
    """A burst that eats frame 1's CHIRP makes the sync miss it entirely;
    plain positional attribution would then shift every later frame down a
    slot and poison combining. The CRC-ok anchor + frame-stride rule must
    attribute the OTHER failure (frame 3, detected but 9/20 symbols
    destroyed) to its true seq, so that combining it with a
    differently-damaged retransmission completes the transfer."""
    m = Modem(preset("gf3"))
    cfg = m.cfg
    rng = np.random.default_rng(11)
    payload = bytes(rng.integers(0, 256, 4 * frame_capacity(m, "f.bin"),
                                 dtype=np.uint8))
    tx = ArqSender(m, payload, "f.bin")
    rx = ArqReceiver(m, sfo="off")
    stride = cfg.frame_len + int(round(0.05 * cfg.fs))

    def burst(x, a, n_sym):
        x[a: a + n_sym * cfg.symbol_len] = rng.normal(
            0, 0.6, n_sym * cfg.symbol_len)

    data0 = cfg.preamble_len + cfg.n_known_symbols * cfg.symbol_len
    air0 = _air(tx.initial(), 400, seed=61, snr_db=16.0)
    burst(air0, 400 + 1 * stride, 9)                 # frame 1: chirp gone
    # frame 3: DATA symbols 1-9 destroyed (knowns intact: Ĥ survives, the
    # per-symbol noise floor turns the burst into erasures)
    burst(air0, 400 + 3 * stride + data0 + cfg.symbol_len, 9)
    got = rx.feed(air0)
    assert got.starts.size == 3                      # frame 1 never seen
    assert sorted(rx.nack()) == [1, 3]
    assert 3 in rx._receptions and len(rx._receptions[3]) == 1

    req = rx.nack()
    air1 = _air(tx.retransmit(req), 600, seed=62, snr_db=16.0)
    # the retransmitted frame 3 (second in NACK order) is damaged AGAIN,
    # at a different symbol span — alone it fails, combined it decodes
    p3 = 600 + stride * req.index(3)
    burst(air1, p3 + data0 + 10 * cfg.symbol_len, 9)  # data symbols 10-18
    got = rx.feed(air1, nacked=req)
    assert got.complete, got.missing
    assert got.payload == payload


def test_session_plain_selective_repeat():
    """The non-combining path: one frame burst-destroyed, NACKed by seq,
    recovered by a clean retransmission of exactly that frame."""
    m = Modem(preset("gf3"))
    rng = np.random.default_rng(10)
    payload = bytes(rng.integers(0, 256, 2 * frame_capacity(m, "e.bin"),
                                 dtype=np.uint8))
    tx = ArqSender(m, payload, "e.bin")
    rx = ArqReceiver(m, sfo="off")
    wav = tx.initial()
    air = _air(wav, 500, seed=53, snr_db=16.0)
    fl = m.cfg.frame_len
    a = 500 + fl + int(0.3 * fl)                    # inside frame 1
    air[a: a + m.cfg.symbol_len * 8] = rng.normal(0, 0.6,
                                                  m.cfg.symbol_len * 8)
    got = rx.feed(air)
    assert not got.complete and got.missing == [1]
    got = rx.feed(_air(tx.retransmit(rx.nack()), 700, seed=54, snr_db=16.0),
                  nacked=rx.nack())
    assert got.complete and got.payload == payload
