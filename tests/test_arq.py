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


def test_attribute_positions_mis_refined_anchor():
    """One anchor whose measured start is −cp early (first-arrival latched
    a reflection) must not skew the stride for every attribution. The
    legacy FIRST-to-LAST two-point fit fails this whenever the corrupt
    anchor is an endpoint: its error err/Δp leaks into every position and
    flips round() once (err/Δp)·|p − p_ref| exceeds stride/2. The
    pairwise-median stride + median base are exact for any minority of
    corrupt anchors. (Exactly-two-anchor rounds stay inherently ambiguous
    — a −256-early anchor is indistinguishable from a 256-longer gap —
    so no assertion is possible there.)"""
    from gf3x.models.arq import attribute_positions

    stride = 31_385                       # gf3 frame_len + 0.05 s gap
    n = 80
    starts = np.asarray([400 + p * stride for p in range(n)])

    # dense anchors, first one mis-refined 256 samples early: the median
    # over 190 pairs ignores the 19 contaminated ones entirely
    bad = starts.copy()
    bad[0] -= 256
    anchors = [(i, i) for i in range(0, n, 4)]
    assert attribute_positions(bad, anchors, stride) == list(range(n))

    # 3 good anchors outvote 1 corrupt one (legacy first-to-last fit:
    # stride skew 256/9 per frame ⇒ position 79 lands at 78)
    pos = attribute_positions(bad, [(0, 0), (1, 1), (5, 5), (9, 9)], stride)
    assert pos == list(range(n))

    # duplicate detection: a second sync hit on frame 0's position wrongly
    # anchored as frame 1 — the pair median still recovers the true stride
    # from the two good pairs, and the duplicate itself attributes to 0
    dup = starts.copy()
    dup[1] = dup[0]
    pos = attribute_positions(dup, [(0, 0), (1, 1), (2, 2)], stride)
    assert pos[0] == 0 and pos[1] == 0 and pos[2:] == list(range(2, n))

    # stride-collapse guard: with ONLY the corrupt pair, the measured
    # stride (0) is rejected for the nominal one instead of dividing by ~0
    pos = attribute_positions(dup, [(0, 0), (1, 1)], stride)
    assert len(pos) == n and pos[0] == 0


def test_attribute_positions_heavy_sfo():
    """A round received at ±800 ppm clock offset: the true on-air stride
    scales by (1+δ). The measured (anchor-pair median) stride tracks it
    exactly; the nominal-stride fallback (single anchor) survives round()
    out to the drift budget."""
    from gf3x.models.arq import attribute_positions

    stride = 31_385
    for ppm in (800.0, -800.0):
        scale = 1.0 + ppm * 1e-6
        starts = np.asarray([round(200 + p * stride * scale)
                             for p in range(40)])
        anchors = [(3, 3), (20, 20), (31, 31)]
        assert attribute_positions(starts, anchors, stride) == list(range(40))
        # single anchor → nominal stride; 40 frames × 25 samples/frame of
        # drift is still ≪ stride/2
        assert attribute_positions(starts, [(3, 3)], stride) == list(range(40))


def test_arq_round_through_resampled_channel():
    """End-to-end: a retransmission round whose recording rides a +800 ppm
    clock offset (resampled air). The sfo='auto' receive path decodes the
    clean frames; attribution and combining complete the transfer."""
    from gf3x.channel import resample_sfo

    m = Modem(preset("gf3"))
    rng = np.random.default_rng(21)
    payload = bytes(rng.integers(0, 256, 2 * frame_capacity(m, "s.bin"),
                                 dtype=np.uint8))
    tx = ArqSender(m, payload, "s.bin")
    rx = ArqReceiver(m)                   # sfo='auto'
    fl = m.cfg.frame_len
    air = _air(tx.initial(), 500, seed=71, snr_db=16.0)
    a = 500 + fl + int(0.3 * fl)          # burst inside frame 1
    air[a: a + m.cfg.symbol_len * 8] = rng.normal(0, 0.6,
                                                  m.cfg.symbol_len * 8)
    air = resample_sfo(air, 800.0, m.cfg.fs)
    got = rx.feed(air)
    assert not got.complete and got.missing == [1]
    rair = resample_sfo(_air(tx.retransmit(rx.nack()), 700, seed=72,
                             snr_db=16.0), 800.0, m.cfg.fs)
    got = rx.feed(rair, nacked=rx.nack())
    assert got.complete and got.payload == payload


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
