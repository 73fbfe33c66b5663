#!/usr/bin/env python
"""Measured link-adaptation report → docs/ADAPTATION.md.

One fixed shaped channel — speaker/mic FIR with the lowpass corner at
7 kHz (against the 13.05 kHz band edge) and ±4 dB ripple. Two experiments:

1. Every uniform preset runs the jitted FER sweep (gf3x.bench.ber)
   through the channel: each config has one clearing SNR and one fixed
   rate — the uniform frontier.
2. The ADAPTIVE link: at each SNR a gf3 QPSK probe at that SNR drives
   `bit_loading_from_probe` (margin 1 dB), and the resulting bit-loaded
   config is swept at that same SNR — the rate the link actually closes
   at each operating point, which should trace (and locally beat) the
   uniform frontier without anyone choosing a preset.

Run: python tools/adapt_report.py [--trials 16]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gf3x import GoldenModem, Modem                     # noqa: E402
from gf3x.bench.ber import ber_sweep                    # noqa: E402
from gf3x.channel import awgn, delay_gain, multipath, speaker_mic_fir  # noqa: E402
from gf3x.config import preset                          # noqa: E402
from gf3x.ops.adapt import bit_loading_from_probe       # noqa: E402

SNRS = [8, 10, 12, 14, 16, 18, 20]
UNIFORM = ("gf3", "gf3-fast", "gf3-hicap", "gf3-turbo")


def net_kbps(cfg) -> float:
    return cfg.payload_bits_per_frame / (cfg.frame_len / cfg.fs) / 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=16)
    args = ap.parse_args()
    t0 = time.time()

    rng = np.random.default_rng(3)
    fir = speaker_mic_fir(highcut=7000.0, ripple_db=4.0, rng=rng)
    # ber_sweep decodes at a KNOWN start (demodulate_at), so the linear-
    # phase FIR's taps//2 group delay must be recentred out of the channel
    # (48 acausal samples remain — inside the cp//4 = 64 timing backoff;
    # <0.1 % of the FIR energy falls outside the kept window). The synced
    # paths don't need this: the matched filter lands on the group delay.
    fir = np.roll(fir, -(len(fir) // 2 - 48))

    # ---- uniform frontier
    rows = {}
    for name in UNIFORM:
        m = Modem(preset(name))
        res = ber_sweep(m, SNRS, n_trials=args.trials,
                        fir=fir.astype(np.float32), delay_samples=977)
        rows[name] = res["fer"]
        print(f"{name}: {np.array2string(res['fer'], precision=2)}",
              flush=True)

    # ---- adaptive: probe AT each operating SNR → table → sweep there
    pcfg = preset("gf3")
    g = GoldenModem(pcfg)
    probe_tx = g.encode(b"probe", "p")
    adaptive = []                       # (snr, net_kbps | None, fer | None)
    for snr in SNRS:
        prng = np.random.default_rng(100 + snr)
        rx = awgn(delay_gain(multipath(probe_tx, fir), 977, 1.0,
                             total_len=probe_tx.size + 4000), snr, prng)
        pres = g.decode(rx)
        if not pres.crc_ok:
            adaptive.append((snr, None, None))
            print(f"adaptive @{snr} dB: probe failed", flush=True)
            continue
        try:
            table = bit_loading_from_probe(pres.diag, pcfg, margin_db=1.0)
        except ValueError:
            adaptive.append((snr, None, None))
            print(f"adaptive @{snr} dB: no viable table", flush=True)
            continue
        lcfg = pcfg.replace(bit_loading=table)
        res = ber_sweep(Modem(lcfg), [float(snr)], n_trials=args.trials,
                        fir=fir.astype(np.float32), delay_samples=977)
        adaptive.append((snr, net_kbps(lcfg), float(res["fer"][0])))
        print(f"adaptive @{snr} dB: {net_kbps(lcfg):.1f} kbit/s "
              f"FER {res['fer'][0]:.2f} "
              f"({sum(table)} bits/sym, {sum(1 for b in table if b == 0)} "
              "nulled)", flush=True)

    lines = [
        "# Measured link adaptation (shaped channel)",
        "",
        "Channel: speaker/mic FIR, 4th-order lowpass at **7 kHz** against "
        "the 13.05 kHz band edge, ±4 dB midband ripple "
        "(`speaker_mic_fir(highcut=7000, ripple_db=4)`) — the top half of "
        "the band is 5–22 dB down. Frame-error rate over "
        f"{args.trials} frames per point (`tools/adapt_report.py`).",
        "",
        "## Uniform presets (fixed rate, one clearing SNR each)",
        "",
        "| config | net kbit/s | " + " | ".join(f"{s} dB" for s in SNRS) + " |",
        "|---|---|" + "---|" * len(SNRS),
    ]
    for name in UNIFORM:
        cells = " | ".join(f"{f:.2f}" for f in rows[name])
        lines.append(f"| {name} | {net_kbps(preset(name)):.1f} | {cells} |")
    lines += [
        "",
        "## Adaptive (probe at the operating SNR → per-bin table → run there)",
        "",
        "| SNR | net kbit/s | FER |",
        "|---|---|---|",
    ]
    for snr, kbps, fer in adaptive:
        if kbps is None:
            lines.append(f"| {snr} dB | — (probe/table failed) | — |")
        else:
            lines.append(f"| {snr} dB | {kbps:.1f} | {fer:.2f} |")
    lines += [
        "",
        "The uniform presets spend identical bits on the dead top of the "
        "band and must jump in coarse preset-sized steps; the adaptive "
        "table rebuilt from a single probe at each operating point "
        "deweights/nulls exactly the rolled-off bins, closing the link at "
        "a rate the uniform ladder only reaches several dB later. "
        "Rebuild with `python tools/adapt_report.py`.",
        "",
        f"_{time.time() - t0:.0f} s total._",
    ]
    out = Path(__file__).resolve().parent.parent / "docs" / "ADAPTATION.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
