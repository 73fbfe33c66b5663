"""Overlap-save streaming sync (SURVEY.md §6.7): identical to the one-shot
matched filter, bounded memory, works on long multi-frame recordings."""

import numpy as np
import jax
import jax.numpy as jnp

from gf3x import ModemConfig, Modem
from gf3x.channel import awgn, delay_gain
from gf3x.models.stream import decode_stream, encode_file, find_frames, frame_capacity
from gf3x.ops.sync import matched_filter, streaming_matched_filter

CFG = ModemConfig(
    n_fft=256, cp=64, bin_lo=8, bin_hi=103, pilot_spacing=8,
    n_known_symbols=2, n_data_symbols=12, chirp_duration=0.02,
).validate()


def test_streaming_equals_oneshot():
    m = Modem(CFG)
    rng = np.random.default_rng(0)
    rx = jnp.asarray(rng.standard_normal((3, 50000)).astype(np.float32))
    a = np.asarray(jax.jit(lambda r: matched_filter(r, m.chirp))(rx))
    b = np.asarray(jax.jit(
        lambda r: streaming_matched_filter(r, m.chirp, 4096))(rx))
    assert np.max(np.abs(a - b)) < 1e-3 * np.max(np.abs(a))


def test_streaming_find_frames_on_long_recording():
    m = Modem(CFG)
    rng = np.random.default_rng(1)
    data = b"z" * (frame_capacity(m, "s") * 4)      # 4 frames
    wav = encode_file(m, data, "s", gap_s=0.3)
    rx = awgn(delay_gain(wav.astype(np.float64), 30000, 0.5,
                         total_len=len(wav) + 90000), 22.0, rng)
    s1, _ = find_frames(m, rx)
    s2, _ = find_frames(m, rx, streaming_chunk=8192)
    assert s1.size == 4
    assert np.array_equal(s1, s2) or np.max(np.abs(s1 - s2)) <= 1
    res = decode_stream(m, rx)
    assert res.complete and res.payload == data
