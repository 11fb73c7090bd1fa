"""openwakeword_tpu: a TPU-native wake-word detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of openWakeWord
(github.com/dscripka/openWakeWord): streaming mel-spectrogram frontend,
Google speech-embedding CNN, per-wakeword classifier heads, VAD gating,
speaker verifiers, a full training stack, and a multi-stream engine that
batches tens of thousands of concurrent 16 kHz streams on one TPU chip.
"""

from openwakeword_tpu.registry import (
    MODELS,
    FEATURE_MODELS,
    VAD_MODELS,
    model_class_mappings,
    get_pretrained_model_paths,
)
from openwakeword_tpu.model import Model
from openwakeword_tpu.vad import VAD
from openwakeword_tpu.custom_verifier_model import train_custom_verifier
from openwakeword_tpu import utils  # noqa: F401  (reference-parity namespace)

__all__ = [
    "Model", "VAD", "train_custom_verifier",
    "MODELS", "FEATURE_MODELS", "VAD_MODELS",
    "model_class_mappings", "get_pretrained_model_paths",
]

__version__ = "0.1.0"
