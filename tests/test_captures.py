"""Recorded-capture regression: decode the frozen WAVs in tests/fixtures/
and verify payload hashes (the reference's decode-parity check on recorded
test captures, BASELINE.json:5). These captures pin the wire format — a
failure here means an encode-side change broke compatibility with audio
recorded by earlier versions."""

import hashlib
import json
from pathlib import Path

import pytest

from gf3x import Modem, preset
from gf3x.io import read_wav
from gf3x.models.stream import decode_stream

FIXTURES = Path(__file__).parent / "fixtures"
MANIFEST = json.loads((FIXTURES / "manifest.json").read_text())


def test_manifest_format_matches_wire_format():
    """The checked-in fixtures must carry the current wire-format marker —
    catches a make_fixtures.py / gf3x.config.WIRE_FORMAT drift."""
    from gf3x.config import WIRE_FORMAT

    assert MANIFEST["format"] == WIRE_FORMAT


from gf3x.utils.captures import capture_config as _capture_config


@pytest.mark.parametrize("cap", MANIFEST["captures"], ids=lambda c: c["wav"])
def test_capture_decodes_bit_exact(cap):
    rx, _ = read_wav(FIXTURES / cap["wav"])
    modem = Modem(_capture_config(cap))
    res = decode_stream(modem, rx)
    assert res.complete, f"{cap['wav']}: missing frames {res.missing}"
    assert res.starts.size == cap["n_frames"]
    assert res.filename == cap["filename"]
    assert len(res.payload) == cap["payload_len"]
    assert hashlib.sha256(res.payload).hexdigest() == cap["payload_sha256"]


def test_golden_also_decodes_single_frame_captures():
    """Cross-implementation parity on the captures (golden = reference
    stand-in, SURVEY.md §0): both decoders recover identical bytes."""
    from gf3x import GoldenModem

    for cap in MANIFEST["captures"]:
        if cap["n_frames"] != 1:
            continue
        rx, _ = read_wav(FIXTURES / cap["wav"])
        g = GoldenModem(_capture_config(cap))
        res = g.decode(rx.astype("float64"))
        assert res.crc_ok
        assert hashlib.sha256(res.payload).hexdigest() == cap["payload_sha256"]


def test_realistic_room_combined_impairments():
    """All impairment axes at once — the honest 'bad real room' case the
    per-axis sweeps (docs/ROBUSTNESS.md) cannot show: reverb + clock
    offset + speaker clipping + delay + 12 dB SNR, decoded with the
    default sfo='auto' policy on golden and JAX paths."""
    import numpy as np

    from gf3x import GF3_STANDARD, GoldenModem, Modem
    from gf3x.channel import (awgn, clip, delay_gain, multipath,
                              resample_sfo, room_impulse_response)

    m = Modem(GF3_STANDARD)
    rng = np.random.default_rng(99)
    payload = bytes(rng.integers(0, 256, 420, dtype=np.uint8))
    wav = m.encode(payload, "room.bin").astype(np.float64)

    x = multipath(wav, room_impulse_response(rng, rt60=0.08, drr_db=5.0))
    x = resample_sfo(x, 150.0)                       # consumer soundcard pair
    x = clip(x, 0.5 * float(np.max(np.abs(x))))      # cheap speaker limiter
    T = m.cfg.frame_len + 12000
    rx = awgn(delay_gain(x[: T - 3000], 3000, 0.5, total_len=T), 12.0, rng)

    res = m.decode(rx.astype(np.float32))
    assert res.crc_ok and res.payload == payload
    g = GoldenModem(GF3_STANDARD).decode(rx)
    assert g.crc_ok and g.payload == payload
