"""Training-module alias matching the reference's ``openwakeword.train``
surface: the trainable Model class (here HeadTrainer), the LR schedule, and
the ONNX->TFLite converter (reference train.py:25-593)."""

from openwakeword_tpu.training.trainer import HeadTrainer as Model  # noqa: F401
from openwakeword_tpu.training.trainer import lr_warmup_cosine_decay  # noqa: F401
from openwakeword_tpu.io.tflite_export import convert_onnx_to_tflite  # noqa: F401

__all__ = ["Model", "lr_warmup_cosine_decay", "convert_onnx_to_tflite"]
