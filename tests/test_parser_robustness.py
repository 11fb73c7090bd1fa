"""Malformed model files must fail with clean ValueErrors, not low-level
struct/index errors or hangs: Model.__init__ hands user-supplied paths
straight to these parsers (reference parity: onnxruntime/LiteRT raise their
own typed errors on corrupt files)."""

import os

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from openwakeword_tpu.io import onnx_export, onnx_proto, tflite_import  # noqa: E402
from openwakeword_tpu.io import tflite_export                           # noqa: E402
from openwakeword_tpu.models import heads                               # noqa: E402


@pytest.fixture(scope="module")
def valid_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("valid")
    params = jax.device_get(heads.init_params(jax.random.PRNGKey(0)))
    onnx_path = str(d / "head.onnx")
    tfl_path = str(d / "head.tflite")
    onnx_export.export_head_onnx(params, onnx_path, output_name="y")
    tflite_export.export_head_tflite(params, tfl_path)
    return onnx_path, tfl_path


GARBAGE = [b"", b"\x00", b"not a model", os.urandom(64), os.urandom(4096),
           b"\x00\x00\x00\x00TFL3", b"\xff" * 512]


@pytest.mark.parametrize("idx", range(len(GARBAGE)))
def test_garbage_rejected(tmp_path, idx):
    p = str(tmp_path / f"junk{idx}")
    with open(p, "wb") as f:
        f.write(GARBAGE[idx])
    with pytest.raises(ValueError):
        onnx_proto.load_onnx(p)
    with pytest.raises(ValueError):
        tflite_import.load_tflite(p)


def test_truncations_rejected_cleanly(tmp_path, valid_files):
    """Every prefix-truncation of a real artifact either parses (long
    prefixes of a protobuf can be self-consistent) or raises ValueError --
    never struct.error / IndexError / unbounded work."""
    onnx_path, tfl_path = valid_files
    for path, loader in ((onnx_path, onnx_proto.load_onnx),
                         (tfl_path, tflite_import.load_tflite)):
        blob = open(path, "rb").read()
        for frac in (0.02, 0.1, 0.3, 0.6, 0.9, 0.99):
            p = str(tmp_path / "trunc")
            with open(p, "wb") as f:
                f.write(blob[:int(len(blob) * frac)])
            try:
                loader(p)
            except ValueError:
                pass


def test_random_mutations_never_crash_low_level(tmp_path, valid_files):
    """Byte-flip fuzz: any exception is fine as long as it is a typed
    ValueError (or the parse succeeds on a benign flip)."""
    onnx_path, tfl_path = valid_files
    rng = np.random.default_rng(13)
    for path, loader in ((onnx_path, onnx_proto.load_onnx),
                         (tfl_path, tflite_import.load_tflite)):
        blob = bytearray(open(path, "rb").read())
        for trial in range(40):
            mutated = bytearray(blob)
            for _ in range(int(rng.integers(1, 8))):
                mutated[int(rng.integers(0, len(mutated)))] = int(rng.integers(0, 256))
            p = str(tmp_path / "mut")
            with open(p, "wb") as f:
                f.write(bytes(mutated))
            try:
                loader(p)
            except ValueError:
                pass
            # anything else (struct.error, IndexError, OverflowError,
            # MemoryError) propagates and fails the test
