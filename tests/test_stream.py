"""Multi-frame file transfer + streaming receiver tests (SURVEY.md §6.7)."""

import numpy as np
import pytest

from gf3x import ModemConfig, Modem
from gf3x.channel import awgn, delay_gain
from gf3x.models.stream import decode_stream, encode_file, find_frames, frame_capacity

CFG = ModemConfig(
    n_fft=256, cp=64, bin_lo=8, bin_hi=100, pilot_spacing=8,
    n_known_symbols=2, n_data_symbols=12, chirp_duration=0.02,
    fec="ldpc", ldpc_z=24, ldpc_iters=10,
).validate()


@pytest.fixture(scope="module")
def modem():
    return Modem(CFG)


def test_single_frame_stream(modem):
    data = b"short payload"
    wav = encode_file(modem, data, "one.txt")
    rng = np.random.default_rng(0)
    rx = awgn(delay_gain(wav.astype(np.float64), 900, 0.5, total_len=len(wav) + 3000), 25.0, rng)
    res = decode_stream(modem, rx)
    assert res.complete and res.payload == data and res.filename == "one.txt"
    assert res.starts.size == 1


def test_multi_frame_file_roundtrip(modem):
    rng = np.random.default_rng(1)
    cap = frame_capacity(modem, "big.bin")
    data = bytes(rng.integers(0, 256, size=int(cap * 4.5), dtype=np.uint8))  # 5 frames
    wav = encode_file(modem, data, "big.bin")
    rx = awgn(delay_gain(wav.astype(np.float64), 2500, 0.4,
                         total_len=len(wav) + 6000), 22.0, rng)
    res = decode_stream(modem, rx)
    assert res.starts.size == 5
    assert res.complete and res.payload == data
    assert [r.seq for r in res.frames if r.crc_ok] == [0, 1, 2, 3, 4]


def test_find_frames_positions(modem):
    data = b"x" * frame_capacity(modem, "f") * 2  # 2 frames
    wav = encode_file(modem, data, "f", gap_s=0.1)
    rx = delay_gain(wav.astype(np.float64), 1234, 1.0, total_len=len(wav) + 4000)
    starts, metrics = find_frames(modem, rx)
    assert starts.size == 2
    assert abs(int(starts[0]) - 1234) <= 4
    gap = int(round(0.1 * CFG.fs))
    assert abs(int(starts[1]) - (1234 + CFG.frame_len + gap)) <= 4
    assert (metrics > 0.4).all()


def test_missing_frame_reported(modem):
    data = b"y" * frame_capacity(modem, "g") * 3  # 3 frames
    wav = encode_file(modem, data, "g")
    # chop out the middle frame's chirp so it can't sync
    gap = int(round(0.05 * CFG.fs))
    second_start = CFG.frame_len + gap
    rx = wav.astype(np.float64).copy()
    rx[second_start: second_start + CFG.chirp_len] = 0.0
    res = decode_stream(modem, rx)
    assert not res.complete
    assert res.missing == [1]
    assert res.payload is None


def test_empty_recording(modem):
    rng = np.random.default_rng(2)
    res = decode_stream(modem, rng.normal(size=40000) * 0.01)
    assert not res.complete and res.payload is None and res.starts.size == 0


def test_cli_transmit_receive_roundtrip(tmp_path):
    from gf3x.cli import main
    rng = np.random.default_rng(3)
    f = tmp_path / "doc.bin"
    f.write_bytes(bytes(rng.integers(0, 256, size=700, dtype=np.uint8)))
    wav_path = tmp_path / "tx.wav"
    assert main(["--preset", "gf3", "transmit", str(f), "-o", str(wav_path)]) == 0
    outdir = tmp_path / "out"
    assert main(["--preset", "gf3", "receive", str(wav_path), "-o", str(outdir)]) == 0
    assert (outdir / "doc.bin").read_bytes() == f.read_bytes()


def test_streaming_receiver_incremental(modem):
    """StreamingReceiver: feed a multi-frame transfer in odd-sized chunks;
    frames surface as their samples complete, state stays O(frame_len),
    and the final result reassembles the file (SURVEY.md §6.7)."""
    from gf3x.models.stream import StreamingReceiver, encode_file, frame_capacity

    rng = np.random.default_rng(17)
    cap = frame_capacity(modem, "inc.bin")
    data = bytes(rng.integers(0, 256, 3 * cap + 123, dtype=np.uint8))
    n_frames = -(-len(data) // cap)
    wav = encode_file(modem, data, "inc.bin")
    rx = awgn(delay_gain(wav.astype(np.float64), 3000,
                         0.5, total_len=len(wav) + 8000), 20.0, rng)

    rcv = StreamingReceiver(modem)
    seen = []
    pos, sizes = 0, [13_000, 47_111, 30_000, 61_013]
    i = 0
    while pos < len(rx):
        n = sizes[i % len(sizes)]
        seen += rcv.feed(rx[pos: pos + n])
        pos += n
        i += 1
        # buffer never grows beyond one frame + chirp of carry-over
        assert rcv._buf.size <= modem.cfg.frame_len + modem.cfg.chirp_len + n
    assert len(seen) == n_frames and all(r.crc_ok for r in seen)
    assert sorted(r.seq for r in seen) == list(range(n_frames))
    res = rcv.result()
    assert res.complete and res.payload == data

    # feeding unrelated noise afterwards must not re-detect old frames
    assert rcv.feed(rng.normal(size=50_000).astype(np.float32) * 0.01) == []
