from .audio import write_wav, read_wav, play, record, have_live_audio

__all__ = ["write_wav", "read_wav", "play", "record", "have_live_audio"]
