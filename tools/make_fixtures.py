#!/usr/bin/env python
"""Generate the frozen "recorded capture" fixtures in tests/fixtures/.

The reference keeps recorded test captures in-repo and re-decodes them as
its parity check (BASELINE.json:5; SURVEY.md §5b). Our captures are
deterministic simulated recordings (golden-model TX + seeded channel) so
they also pin the WIRE FORMAT: any change to the PRBS, header layout, LDPC
code, constellation labeling, or frame schema breaks their decode and fails
tests/test_captures.py.

Run from the repo root to (re)generate — but regenerating DELIBERATELY
invalidates compatibility with previously recorded audio; bump the manifest
"format" field when the wire format changes intentionally.
"""

import hashlib
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from gf3x import CONFIG1_LOOPBACK, GF3_STANDARD, GoldenModem
from gf3x.config import WIRE_FORMAT
from gf3x.channel import awgn, clip, delay_gain, multipath, resample_sfo, room_impulse_response
from gf3x.io import write_wav
from gf3x.models.stream import encode_file
from gf3x.models import Modem

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    manifest = {"format": WIRE_FORMAT, "captures": []}

    def add(name, rx, payload, preset, filename, n_frames, **extra):
        write_wav(OUT / name, rx)
        manifest["captures"].append({
            "wav": name,
            "preset": preset,
            "filename": filename,
            "payload_sha256": hashlib.sha256(payload).hexdigest(),
            "payload_len": len(payload),
            "n_frames": n_frames,
            **extra,
        })

    # 1. GF3 standard single frame through a mild room (golden-model TX)
    rng = np.random.default_rng(101)
    payload = bytes(rng.integers(0, 256, 400, dtype=np.uint8))
    g = GoldenModem(GF3_STANDARD)
    wav = g.encode(payload, "capture1.bin")
    h = room_impulse_response(rng, rt60=0.04, drr_db=6.0)
    rx = awgn(delay_gain(multipath(wav, h), 6000, 0.4, total_len=len(wav) + 16000), 20.0, rng)
    add("gf3_single_room.wav", rx, payload, "gf3", "capture1.bin", 1)

    # 2. GF3 multi-frame file with clipping + clock offset (JAX TX)
    rng = np.random.default_rng(102)
    payload = bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
    m = Modem(GF3_STANDARD)
    wav = encode_file(m, payload, "capture2.bin")
    x = clip(resample_sfo(np.asarray(wav, np.float64), 20.0), 0.95)
    rx = awgn(delay_gain(x, 3000, 0.5, total_len=len(x) + 8000), 19.0, rng)
    add("gf3_multiframe_sfo.wav", rx, payload, "gf3", "capture2.bin", 3)

    # 4. Robustness capture (round 2): clock offset + spectral notch + a
    #    destroyed OFDM symbol — pins the SFO loop, CSI-weighted pilot fit,
    #    per-symbol noise floor, and the v3 interleaver into the
    #    conformance set
    rng = np.random.default_rng(104)
    payload = bytes(rng.integers(0, 256, 520, dtype=np.uint8))
    g4 = GoldenModem(GF3_STANDARD)
    wav = g4.encode(payload, "capture4.bin")
    from scipy.signal import firwin2
    notch = firwin2(255, [f / 22050 for f in [0, 2400, 2600, 3000, 3400, 3600, 22050]],
                    [1, 1, 0.02, 0.01, 0.02, 1, 1])
    x = np.convolve(wav, notch)[: len(wav) + 254]
    x = resample_sfo(x, 300.0)
    x = delay_gain(x, 4000, 0.5, total_len=len(x) + 10000)
    # burst position on the RECEIVED timeline: frame start = 4000 + the
    # notch FIR's 127-sample group delay, positions compressed by the
    # +300 ppm resample; a 2-symbol-long burst guarantees at least one
    # data symbol is fully destroyed
    c = GF3_STANDARD
    burst_at = 4000 + round((127 + c.preamble_len + 9 * c.symbol_len) / 1.0003)
    x[burst_at: burst_at + 2 * c.symbol_len] += (
        rng.standard_normal(2 * c.symbol_len) * 0.5)
    rx = awgn(x, 16.0, rng)
    add("gf3_sfo_notch_burst.wav", rx, payload, "gf3", "capture4.bin", 1)

    # 3. Uncoded loopback preset, delay+gain only (config 2 shape)
    rng = np.random.default_rng(103)
    payload = bytes(rng.integers(0, 256, 600, dtype=np.uint8))
    g1 = GoldenModem(CONFIG1_LOOPBACK)
    wav = g1.encode(payload, "capture3.bin")
    rx = awgn(delay_gain(wav, 9000, 0.25, total_len=len(wav) + 14000), 24.0, rng)
    add("uncoded_delay_gain.wav", rx, payload, "loopback", "capture3.bin", 1)

    # 5. gf3-hicap (16-QAM, rate-3/4) single frame through a mild room —
    #    pins the MULTI-RATE code family: the seeded higher-rate base
    #    matrix construction (fec/codes._design_base) is wire format; any
    #    change to its seeds/scoring breaks this decode
    from gf3x.config import preset as _preset
    rng = np.random.default_rng(105)
    payload = bytes(rng.integers(0, 256, 1500, dtype=np.uint8))
    g5 = GoldenModem(_preset("gf3-hicap"))
    wav = g5.encode(payload, "capture5.bin")
    h = room_impulse_response(rng, rt60=0.015, drr_db=8.0)
    rx = awgn(delay_gain(multipath(wav, h), 5000, 0.5,
                         total_len=len(wav) + 12000), 24.0, rng)
    add("hicap_rate34_room.wav", rx, payload, "gf3-hicap", "capture5.bin", 1)

    # 6. Bit-loaded frame (SPEC §5b) with a FIXED deterministic table —
    #    pins the group-sorted wire order, the static permutation, and
    #    the power-reallocation gain. The table itself lives in the
    #    manifest (the out-of-band agreement, exactly as deployed).
    rng = np.random.default_rng(106)
    table = tuple(int(x) for x in
                  np.resize([0, 2, 2, 4, 4, 6, 2, 4],
                            GF3_STANDARD.n_data_bins))
    lcfg = GF3_STANDARD.replace(bit_loading=table)
    payload = bytes(rng.integers(0, 256, 800, dtype=np.uint8))
    g6 = GoldenModem(lcfg)
    wav = g6.encode(payload, "capture6.bin")
    rx = awgn(delay_gain(wav, 7000, 0.6, total_len=len(wav) + 14000),
              22.0, rng)
    add("bitloaded_delay_gain.wav", rx, payload, "gf3", "capture6.bin", 1,
        bit_loading=list(table))

    (OUT / "manifest.json").write_text(json.dumps(manifest, indent=1))
    print(f"wrote {len(manifest['captures'])} captures to {OUT}")


if __name__ == "__main__":
    main()
