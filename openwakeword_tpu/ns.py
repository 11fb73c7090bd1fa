"""Noise suppression: ctypes binding to the native C++ spectral-subtraction
library (native/ns.cpp), the TPU build's equivalent of the reference's
SpeexDSP dependency (reference model.py:200-205, 481-504). Operates
statefully on 160-sample (10 ms) int16 frames at 16 kHz.
"""

import ctypes

import numpy as np

from openwakeword_tpu.utils.native_lib import build_and_load

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    lib = build_and_load("libowwns.so", "ns.cpp")
    lib.owwns_create.restype = ctypes.c_void_p
    lib.owwns_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.owwns_process.restype = None
    lib.owwns_process.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_short),
                                  ctypes.POINTER(ctypes.c_short)]
    lib.owwns_destroy.restype = None
    lib.owwns_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NoiseSuppression:
    """Stateful single-channel noise suppressor (10 ms frame granularity)."""

    def __init__(self, frame_size: int = 160, sample_rate: int = 16000):
        self._lib = _load_lib()
        self.frame_size = frame_size
        self._state = self._lib.owwns_create(frame_size, sample_rate)
        if not self._state:
            raise RuntimeError("Failed to create native noise-suppression state")

    def process(self, frame: np.ndarray) -> np.ndarray:
        """Suppress noise in one ``frame_size``-sample int16 frame."""
        frame = np.ascontiguousarray(frame, dtype=np.int16)
        out = np.empty_like(frame)
        self._lib.owwns_process(
            self._state,
            frame.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_short)))
        return out

    def process_frames(self, x: np.ndarray) -> np.ndarray:
        """Suppress noise across an arbitrary-length int16 buffer, frame by
        frame (reference model.py:481-504 contract)."""
        x = np.ascontiguousarray(x, dtype=np.int16)
        out = np.empty_like(x)
        fs = self.frame_size
        for i in range(0, x.shape[0], fs):
            chunk = x[i:i + fs]
            if chunk.shape[0] == fs:
                out[i:i + fs] = self.process(chunk)
            else:
                out[i:i + chunk.shape[0]] = chunk
        return out

    def __del__(self):
        try:
            if getattr(self, "_state", None):
                self._lib.owwns_destroy(self._state)
                self._state = None
        except Exception:
            pass


class JaxNoiseSuppression:
    """Drop-in fallback when the native library cannot build (no compiler on
    the host): the same suppressor as batched XLA ops (ops.ns_jax, <=1 int16
    LSB vs native), run one stream at a time behind the ``process_frames``
    interface the Model consumes. The multi-stream engine uses ops.ns_jax
    directly inside its fused step."""

    def __init__(self, frame_size: int = 160, sample_rate: int = 16000,
                 algorithm: str = "spectral"):
        from openwakeword_tpu.ops import ns_jax
        if frame_size != ns_jax.FRAME or sample_rate != 16000:
            raise ValueError("JaxNoiseSuppression supports the 160-sample "
                             "16 kHz frame contract only")
        import functools

        import jax
        self.frame_size = frame_size
        self.algorithm = algorithm
        self._ns_jax = ns_jax
        self._state = ns_jax.init_state(1, profile=algorithm)
        self._step = jax.jit(functools.partial(
            ns_jax.step, profile=algorithm))   # fixed (1, 160): no retraces

    def process(self, frame: np.ndarray) -> np.ndarray:
        frame = np.ascontiguousarray(frame, dtype=np.int16)
        self._state, out = self._step(self._state,
                                      frame.astype(np.float32)[None])
        return np.asarray(out[0]).astype(np.int16)

    def process_frames(self, x: np.ndarray) -> np.ndarray:
        """Suppress an arbitrary-length int16 buffer frame by frame; the
        sub-frame tail passes through (native process_frames contract)."""
        x = np.ascontiguousarray(x, dtype=np.int16)
        out = np.empty_like(x)
        fs = self.frame_size
        for i in range(0, x.shape[0], fs):
            chunk = x[i:i + fs]
            if chunk.shape[0] == fs:
                out[i:i + fs] = self.process(chunk)
            else:
                out[i:i + chunk.shape[0]] = chunk
        return out
