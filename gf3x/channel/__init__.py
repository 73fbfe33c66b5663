from .sims import (
    awgn,
    delay_gain,
    multipath,
    room_impulse_response,
    clip,
    resample_sfo,
    speaker_mic_fir,
    Impairment,
    Chain,
)

__all__ = [
    "awgn",
    "delay_gain",
    "multipath",
    "room_impulse_response",
    "clip",
    "resample_sfo",
    "speaker_mic_fir",
    "Impairment",
    "Chain",
]
