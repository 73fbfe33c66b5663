"""Live-audio host boundary under a fake `sounddevice` (VERDICT r4 missing
#3): the image has no audio stack, so `io/audio.py`'s play/record branch and
the live-capture loop shipped unexecuted. A monkeypatched `sounddevice`
module drives them end to end: play() receives the TX waveform, rec()
serves microphone chunks from a simulated air buffer, and the chunk loop
feeds `StreamingReceiver` exactly as `examples/live_stream.py`'s real-mic
variant would (SURVEY.md §2 L0; BASELINE.json "live record-playback")."""

import sys
import types

import numpy as np
import pytest

from gf3x import Modem, ModemConfig
from gf3x.channel import awgn, delay_gain

CFG = ModemConfig(
    n_fft=256, cp=64, bin_lo=8, bin_hi=103, pilot_spacing=8,
    n_known_symbols=2, n_data_symbols=12, chirp_duration=0.02,
    fec="ldpc", ldpc_z=24, ldpc_iters=10,
).validate()


class FakeSoundDevice(types.ModuleType):
    """Minimal sounddevice twin: play() captures, rec() serves a cursor
    over a prepared capture buffer (as a sound card delivers chunks)."""

    def __init__(self, capture: np.ndarray):
        super().__init__("sounddevice")
        self.capture = np.asarray(capture, np.float32)
        self.cursor = 0
        self.played = []

    def play(self, x, fs):
        assert fs == 44100
        self.played.append(np.asarray(x))

    def rec(self, n, samplerate, channels, dtype):
        assert samplerate == 44100 and channels == 1 and dtype == "float32"
        seg = self.capture[self.cursor: self.cursor + n]
        self.cursor += n
        out = np.zeros((n, 1), np.float32)
        out[: seg.size, 0] = seg
        return out

    def wait(self):
        pass


@pytest.fixture
def fake_sd(monkeypatch):
    def install(capture):
        mod = FakeSoundDevice(capture)
        monkeypatch.setitem(sys.modules, "sounddevice", mod)
        return mod
    yield install
    # monkeypatch restores sys.modules


def test_play_record_roundtrip(fake_sd):
    from gf3x.io import audio

    rng = np.random.default_rng(0)
    wav = rng.standard_normal(4096).astype(np.float32) * 0.1
    sd = fake_sd(wav)
    assert audio.have_live_audio()
    audio.play(wav, 44100)
    assert len(sd.played) == 1 and np.array_equal(sd.played[0], wav)
    got = audio.record(4096 / 44100.0, 44100)
    assert got.shape == (4096,) and np.array_equal(got, wav)


def test_gated_error_without_sounddevice(monkeypatch):
    """Without the package the branch must raise the documented guidance,
    not an opaque ImportError."""
    import builtins

    from gf3x.io import audio

    monkeypatch.delitem(sys.modules, "sounddevice", raising=False)
    real_import = builtins.__import__

    def no_sd(name, *a, **k):
        if name == "sounddevice":
            raise ImportError("No module named 'sounddevice'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_sd)
    assert not audio.have_live_audio()
    with pytest.raises(RuntimeError, match="sounddevice"):
        audio.play(np.zeros(8), 44100)
    with pytest.raises(RuntimeError, match="sounddevice"):
        audio.record(0.01)


def test_live_capture_loop_decodes_file(fake_sd):
    """The real-microphone receiver loop: repeated fixed-length record()
    calls feed StreamingReceiver until the transfer completes — the exact
    host loop a live user runs, through the fake device."""
    from gf3x.io import audio
    from gf3x.models.stream import StreamingReceiver, encode_file

    m = Modem(CFG)
    rng = np.random.default_rng(3)
    payload = rng.integers(0, 256, 300, dtype=np.uint8).tobytes()
    wav = encode_file(m, payload, "live.bin").astype(np.float64)
    air = awgn(delay_gain(wav, 1500, 0.6, total_len=wav.size + 6000),
               25.0, rng)
    fake_sd(air.astype(np.float32))

    rcv = StreamingReceiver(m)
    frames = []
    chunk_s = 4096 / 44100.0
    for _ in range(int(np.ceil(air.size / 4096)) + 1):
        frames += list(rcv.feed(audio.record(chunk_s)))
        if rcv.result().complete:
            break
    out = rcv.result()
    assert out.complete and out.payload == payload
    assert out.filename == "live.bin"
    assert all(f.crc_ok for f in frames)
