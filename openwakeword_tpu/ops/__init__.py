from openwakeword_tpu.ops.melspec import (
    hann_window,
    mel_filterbank,
    stft_power_basis,
    frame_signal,
    melspectrogram,
    log_mel_features,
)

__all__ = [
    "hann_window",
    "mel_filterbank",
    "stft_power_basis",
    "frame_signal",
    "melspectrogram",
    "log_mel_features",
]
