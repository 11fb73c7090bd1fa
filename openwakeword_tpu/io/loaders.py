"""Unified model-file loading: native .npz checkpoints plus importers for the
reference's frozen .onnx / .tflite artifacts."""

import os
from typing import Dict, Tuple

from openwakeword_tpu.io.checkpoints import load_checkpoint


def load_model_file(path: str, quantized: str = "dequant"
                    ) -> Tuple[str, Dict, Dict]:
    """Load any supported model file -> (kind, params, meta).

    kind is one of 'embedding', 'head', 'vad'; meta carries auxiliary data
    such as class mappings. ``quantized`` selects how int8-quantized .tflite
    graphs execute: 'dequant' (float emulation, fast default) or 'exact'
    (LiteRT integer-kernel score parity — io.tflite_graph). QDQ-quantized
    .onnx graphs always execute with exact QuantizeLinear semantics.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npz":
        return load_checkpoint(path)
    if ext == ".onnx":
        from openwakeword_tpu.io.onnx_import import import_onnx_model
        return import_onnx_model(path)
    if ext == ".tflite":
        from openwakeword_tpu.io.tflite_import import import_tflite_model
        return import_tflite_model(path, quantized=quantized)
    raise ValueError(f"Unsupported model file extension '{ext}' for {path}")
