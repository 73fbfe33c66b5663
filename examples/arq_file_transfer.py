#!/usr/bin/env python
"""ARQ session walkthrough: selective-repeat file transfer over a lossy
half-duplex acoustic link, with the FEEDBACK channel also carried by the
modem (reference L7 recovery flow — SURVEY.md §6.3 failure
detection/recovery: CRC + seq/total + selective retransmission —
composed into a full protocol loop).

Forward link: data frames through a room channel where random bursts
obliterate entire frames. Reverse link: the receiver encodes its NACK
list (missing seq numbers) as a tiny gf3 frame and "plays" it back
through its own noisy channel; the transmitter decodes it and re-sends
exactly those frames (`encode_frames`, the CLI `retransmit` machinery).
`merge_streams` reassembles across rounds. Terminates when the receiver
ACKs complete (empty NACK) or after max rounds.

    python examples/arq_file_transfer.py [outdir]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")   # latency-bound demo: local CPU

import numpy as np

from gf3x import Modem, preset
from gf3x.channel import awgn, delay_gain, multipath, room_impulse_response
from gf3x.io import write_wav
from gf3x.models.stream import (chase_combine, decode_stream, encode_file,
                                encode_frames, frame_capacity, merge_streams)


def air(wav, rir, rng, snr_db=16.0, kill_spans=()):
    """Room + AWGN + frame-killing bursts at the given sample spans."""
    x = multipath(wav, rir)
    x = delay_gain(x, int(rng.integers(500, 3000)), 0.7,
                   total_len=x.size + 6000)
    x = awgn(x, snr_db, rng)
    for (a, b) in kill_spans:
        x[a: b] = rng.normal(0, 0.5, b - a)   # burst ≫ signal: frame dies
    return x


def main(outdir: str = "demo_out"):
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    rir = room_impulse_response(rng, rt60=0.015, drr_db=8.0)
    modem = Modem(preset("gf3"))
    fl = modem.cfg.frame_len

    payload = bytes(rng.integers(0, 256, 4 * frame_capacity(modem, "data.bin"),
                                 dtype=np.uint8))

    # ---- round 0: full transmission; two frames burst-destroyed in the air
    wav = encode_file(modem, payload, "data.bin")
    kill = [(int(1.2 * fl), int(1.5 * fl)), (int(3.3 * fl), int(3.6 * fl))]
    rx = air(wav, rir, rng, kill_spans=kill)
    write_wav(out / "arq_round0.wav", rx, modem.cfg.fs)
    got = decode_stream(modem, rx)
    print(f"round 0: {sum(r.crc_ok for r in got.frames)}/{got.starts.size} "
          f"frames ok, missing {got.missing}")

    n_total = -(-len(payload) // frame_capacity(modem, "data.bin"))
    rounds = 0
    while not got.complete and rounds < 4:
        rounds += 1
        # ---- reverse link: NACK list as a real modem frame. Total loss
        # (zero CRC-ok frames) leaves missing=[] with complete=False — the
        # receiver can't know the frame count it never saw, so it NACKs
        # "all" and the transmitter (who knows n_total) resends everything
        nack_val = got.missing if got.missing else "all"
        nack = json.dumps({"nack": nack_val, "file": got.filename}).encode()
        fb_rx = air(modem.encode(nack, "nack.json"), rir, rng, snr_db=14.0)
        fb = decode_stream(modem, fb_rx)
        assert fb.complete, "feedback frame lost — ARQ would retry it"
        req = json.loads(fb.payload)["nack"]
        if req == "all":
            req = list(range(n_total))
        print(f"round {rounds}: transmitter decoded NACK for frames {req}")

        # ---- selective retransmission of exactly the NACKed frames
        retx = encode_frames(modem, payload, req, "data.bin")
        rx2 = air(retx, rir, rng)
        write_wav(out / f"arq_round{rounds}.wav", rx2, modem.cfg.fs)
        got = merge_streams(got, decode_stream(modem, rx2))
        print(f"round {rounds}: merged — missing now {got.missing}")

    assert got.complete and got.payload == payload
    print(f"transfer complete after {rounds} retransmission round(s): "
          f"{len(payload)} B bit-exact "
          f"({got.starts.size} forward frames decoded in total)")

    # ---- HARQ upgrade: when a RETRANSMISSION also arrives damaged, the
    # two failed copies still carry enough soft information together —
    # chase combining sums their coded LLRs (~+3 dB) instead of wasting
    # the failed receptions
    one = modem.encode(payload[: frame_capacity(modem, "x")], "x")
    bad = []
    for seed in (21, 22):
        r = np.random.default_rng(seed)
        rx1 = awgn(delay_gain(one, 250, 1.0, total_len=one.size + 2000),
                   -0.5, r)
        bad.append((rx1, 250))
    singles = [modem.decode(rx, start=s, sfo="off").crc_ok for rx, s in bad]
    combined = chase_combine(modem, bad)
    print(f"chase combining: single decodes crc_ok={singles} → "
          f"combined crc_ok={combined.crc_ok} (two failed copies, one frame)")
    assert not any(singles) and combined.crc_ok


if __name__ == "__main__":
    main(*sys.argv[1:])
