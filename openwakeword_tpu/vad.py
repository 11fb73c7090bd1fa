"""Voice activity detection with the reference's VAD class contract
(reference openwakeword/vad.py:54-130): stateful 480-sample-frame scoring,
explicit (2, B, 64) recurrent state across calls, chunked averaging, and a
125-entry (~10 s) score history used by the Model's VAD gate.

Two interchangeable networks sit behind the same contract:

- an imported Silero VAD graph (``silero_vad.onnx`` or its ``.npz``
  conversion), compiled into one XLA program (models.silero) — scores match
  the reference's onnxruntime execution of the same artifact;
- the trainable native ``models.vad_net`` (openwakeword_tpu.training.vad),
  used when no Silero artifact is available.
"""

import logging
import os
from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

from openwakeword_tpu import config, registry
from openwakeword_tpu.models import vad_net


def load_vad_apply(model_path: str = "", params=None):
    """Resolve a VAD checkpoint -> (apply_fn, params, min_samples).

    ``apply_fn(params, x, h, c) -> (score (B,), h', c')`` is the shared
    calling convention (models.silero / models.vad_net); used by both the
    single-stream VAD class and the MultiStreamEngine's fused step."""
    if params is not None:
        return vad_net.apply, params, vad_net.MIN_SAMPLES
    path = model_path or registry.VAD_MODELS["silero_vad"]["model_path"]
    if path and os.path.exists(path):
        from openwakeword_tpu.io.loaders import load_model_file
        kind, params, meta = load_model_file(path)
        if kind not in ("vad", "unknown"):
            raise ValueError(f"Checkpoint at {path} is a '{kind}' model, expected a VAD model")
        if meta.get("format") == "onnx_program":
            from openwakeword_tpu.models import silero
            prog = silero.from_meta(meta, params)
            return prog.apply, prog.params, prog.min_samples
        logging.warning(
            "VAD checkpoint at '%s' is a native vad_net network (the bundled "
            "one is a home-trained substitute), NOT the released Silero VAD: "
            "vad_threshold gating behaves materially differently from the "
            "reference. Import the real graph (python verify_artifacts.py "
            "--download --install, or utils.download.convert_local_models on "
            "silero_vad.onnx) for reference-equivalent gating. See "
            "COMPATIBILITY.md #8.", path)
        return vad_net.apply, params, vad_net.MIN_SAMPLES
    logging.warning(
        "No VAD checkpoint found at '%s'; using a deterministic random "
        "initialization. Train or import weights for meaningful VAD scores.", path)
    return vad_net.apply, vad_net.init_params(jax.random.PRNGKey(7)), vad_net.MIN_SAMPLES


class VAD():
    """Stateful voice-activity detector."""

    def __init__(self, model_path: str = "", n_threads: int = 1, params=None):
        """``model_path`` may be a native .npz checkpoint or a silero_vad
        .onnx artifact; defaults to the registry's bundled VAD. ``n_threads``
        is accepted for API parity."""
        apply_fn, self.params, self._min_samples = load_vad_apply(model_path, params)
        self._step = jax.jit(apply_fn)
        # vad_net provably ignores the sub-hop tail of a frame (it steps once
        # per full 256-sample STFT frame at hop 112), so tail chunks can be
        # truncated to the step boundary: identical numerics, and the set of
        # distinct jit input shapes stays bounded (one per step count)
        # instead of one fresh XLA compile per distinct clip-tail length.
        # Imported ONNX graphs make no such promise — leave their tails alone.
        self._tail_quantum = vad_net.HOP if apply_fn is vad_net.apply else None

        self.prediction_buffer: deque = deque(maxlen=config.VAD_BUFFER_MAX)
        self.sample_rate = np.array(config.SAMPLE_RATE).astype(np.int64)
        self.reset_states()

    def reset_states(self, batch_size: int = 1):
        # the predict path always scores one stream (chunk[None]); the
        # reference accepts the same argument and has the same constraint
        # (vad.py:92-96) — reject other values instead of corrupting state
        if batch_size != 1:
            raise ValueError("VAD.predict scores one stream; batch_size must "
                             "be 1 (use MultiStreamEngine for batched VAD)")
        self._h = np.zeros((config.VAD_STATE_LAYERS, batch_size, config.VAD_STATE_DIM), dtype=np.float32)
        self._c = np.zeros((config.VAD_STATE_LAYERS, batch_size, config.VAD_STATE_DIM), dtype=np.float32)

    def predict(self, x: np.ndarray, frame_size: int = config.VAD_FRAME_SAMPLES) -> float:
        """Average VAD score over ``frame_size``-sample chunks of ``x``
        (16 kHz int16), advancing the recurrent state chunk by chunk. Any
        frame size >= 256 samples is scored in full (the network steps once
        per internal STFT frame), matching the reference's variable-frame
        behavior (vad.py:98-127)."""
        if x.shape[0] == 0:
            # np.mean([]) would poison the gate buffer with NaN
            return 0.0
        scores = []
        h, c = jnp.asarray(self._h), jnp.asarray(self._c)
        for i in range(0, x.shape[0], frame_size):
            chunk = (x[i:i + frame_size] / 32767).astype(np.float32)
            if chunk.shape[0] < self._min_samples:
                chunk = np.pad(chunk, (0, self._min_samples - chunk.shape[0]))
            elif self._tail_quantum and chunk.shape[0] < frame_size:
                q = self._tail_quantum
                keep = self._min_samples + (
                    (chunk.shape[0] - self._min_samples) // q) * q
                chunk = chunk[:keep]
            score, h, c = self._step(self.params, jnp.asarray(chunk[None]), h, c)
            scores.append(float(score[0]))
        self._h, self._c = np.asarray(h), np.asarray(c)
        return float(np.mean(scores))

    def __call__(self, x, frame_size: int = config.VAD_CALL_FRAME_SAMPLES):
        self.prediction_buffer.append(self.predict(x, frame_size))
