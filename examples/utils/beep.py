"""Generate a short confirmation beep (int16 PCM), used by the
activation-capture example to signal a detection."""

import numpy as np


def make_beep(freq_hz: float = 880.0, duration_s: float = 0.15,
              sr: int = 16000, volume: float = 0.3) -> np.ndarray:
    t = np.arange(int(duration_s * sr)) / sr
    envelope = np.minimum(1.0, 10 * np.minimum(t, duration_s - t) / duration_s)
    return (volume * 32767 * envelope * np.sin(2 * np.pi * freq_hz * t)).astype(np.int16)


def play_beep(**kwargs):
    """Play the beep through the default output device (requires pyaudio)."""
    import pyaudio
    beep = make_beep(**kwargs)
    pa = pyaudio.PyAudio()
    stream = pa.open(format=pyaudio.paInt16, channels=1, rate=16000, output=True)
    stream.write(beep.tobytes())
    stream.stop_stream()
    stream.close()
    pa.terminate()
