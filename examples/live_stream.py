#!/usr/bin/env python
"""Live chunked-capture walkthrough: a file streams across multiple GF3
frames, "air" arrives in arbitrary-size audio chunks (as a sound card
delivers them), and the stateful StreamingReceiver decodes each frame as
its samples complete — O(frame) memory, no full-recording buffering.

With `sounddevice` installed (`pip install gf3x[audio]`) the same receiver
loop runs on real microphone input; this demo simulates the capture so it
works headless.

    python examples/live_stream.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")   # latency-bound demo: local CPU

import numpy as np

from gf3x import Modem, preset
from gf3x.channel import awgn, delay_gain, multipath, room_impulse_response
from gf3x.models.stream import StreamingReceiver, encode_file


def main():
    modem = Modem(preset("gf3"))
    rng = np.random.default_rng(7)

    # --- transmit: one file -> several frames of sound
    payload = rng.integers(0, 256, 1500, dtype=np.uint8).tobytes()
    wav = encode_file(modem, payload, "report.bin")
    print(f"transmitting {len(payload)} B as {wav.size} samples "
          f"({wav.size / modem.cfg.fs:.2f} s of audio)")

    # --- simulated air: room reverb, delay, 18 dB SNR
    h = room_impulse_response(rng, rt60=0.03, drr_db=6.0)
    air = awgn(delay_gain(multipath(wav.astype(np.float64), h), 9000, 0.5,
                          total_len=wav.size + 22050), 18.0, rng)

    # --- receive: feed arbitrary-size chunks as a sound card would deliver
    rcv = StreamingReceiver(modem)
    pos, decoded = 0, 0
    while pos < air.size:
        n = int(rng.integers(2048, 16384))          # ragged chunk sizes
        chunk = air[pos: pos + n].astype(np.float32)
        pos += n
        for res in rcv.feed(chunk):
            decoded += 1
            print(f"  frame {res.seq + 1}/{res.total} decoded at "
                  f"~{pos / modem.cfg.fs:.2f} s  crc_ok={res.crc_ok}  "
                  f"clock={float(np.max(res.diag.clock_ppm)):+.0f} ppm")

    out = rcv.result()
    assert out.payload == payload, "payload mismatch"
    print(f"reassembled {len(out.payload)} B as {out.filename!r} "
          f"from {decoded} frames — bit-exact")


if __name__ == "__main__":
    main()
