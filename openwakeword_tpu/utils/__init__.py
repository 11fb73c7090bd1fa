"""Utility namespace, mirroring the reference's openwakeword.utils surface:
AudioFeatures, bulk_predict, compute_features_from_generator, download_models,
re_arg (reference utils.py), plus this framework's profiling helpers."""

from openwakeword_tpu.features import AudioFeatures, compute_features_from_generator
from openwakeword_tpu.parallel.bulk import bulk_predict
from openwakeword_tpu.utils.args import re_arg
from openwakeword_tpu.utils.download import download_models, download_file, convert_local_models

__all__ = [
    "AudioFeatures", "compute_features_from_generator", "bulk_predict",
    "re_arg", "download_models", "download_file", "convert_local_models",
]
