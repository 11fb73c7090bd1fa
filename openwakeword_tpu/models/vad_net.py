"""JAX voice-activity-detection network with the Silero VAD state contract.

The reference gates predictions with Silero's frozen ``silero_vad.onnx``
(reference openwakeword/vad.py:54-130): stateful inference over 480-sample
(30 ms) frames with explicit LSTM state h, c of shape (2, B, 64) carried
across calls. This module provides a TPU-native network with the same I/O
contract -- spectral frontend -> projection -> 2-layer LSTM(64) -> sigmoid --
expressed as a pure function so it scans/vmaps/shards like everything else.

Weights: train with openwakeword_tpu.training.vad (or import a compatible
checkpoint); a deterministic random init keeps the pipeline runnable without
artifacts.
"""

import functools
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from openwakeword_tpu.ops import melspec as melspec_ops

FRAME_SAMPLES = 480
N_FFT = 256
HOP = 112           # -> 3 STFT frames per 480-sample frame
N_BANDS = 32
HIDDEN = 64
LAYERS = 2


@functools.lru_cache(maxsize=None)
def _frontend_consts():
    basis = melspec_ops.stft_power_basis(n_fft=N_FFT, win_length=N_FFT).astype(np.float32)
    melw = melspec_ops.mel_filterbank(sr=16000, n_fft=N_FFT, n_mels=N_BANDS,
                                      fmin=60.0, fmax=7800.0).astype(np.float32)
    return basis, melw


def init_params(key) -> Dict:
    params: Dict = {}
    k1, k2, key = jax.random.split(key, 3)
    n_feat = 3 * N_BANDS
    params["proj"] = {
        "w": jax.random.normal(k1, (n_feat, HIDDEN)) * np.sqrt(2.0 / n_feat),
        "b": jnp.zeros((HIDDEN,)),
    }
    for layer in range(LAYERS):
        in_dim = HIDDEN
        key, kih, khh = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(HIDDEN)
        params[f"lstm{layer}"] = {
            "w_ih": jax.random.uniform(kih, (in_dim, 4 * HIDDEN), jnp.float32, -bound, bound),
            "w_hh": jax.random.uniform(khh, (HIDDEN, 4 * HIDDEN), jnp.float32, -bound, bound),
            "b_ih": jnp.zeros((4 * HIDDEN,)),
            "b_hh": jnp.zeros((4 * HIDDEN,)),
        }
    params["out"] = {
        "w": jax.random.normal(k2, (HIDDEN, 1)) * np.sqrt(1.0 / HIDDEN),
        "b": jnp.zeros((1,)),
    }
    return params


def _features(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 480) audio in [-1, 1] -> (B, 3*N_BANDS) log-mel-band features."""
    basis, melw = _frontend_consts()
    idx = np.arange(3)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = x[:, idx]                                    # (B, 3, 256)
    spec = jnp.matmul(frames, jnp.asarray(basis), precision=jax.lax.Precision.HIGHEST)
    power = spec[..., 0::2] ** 2 + spec[..., 1::2] ** 2
    mel = jnp.matmul(power, jnp.asarray(melw), precision=jax.lax.Precision.HIGHEST)
    feats = jnp.log(mel + 1e-6)
    return feats.reshape(x.shape[0], -1)


def _lstm_cell(p, x, h, c):
    gates = (jnp.matmul(x, p["w_ih"], precision=jax.lax.Precision.HIGHEST) + p["b_ih"]
             + jnp.matmul(h, p["w_hh"], precision=jax.lax.Precision.HIGHEST) + p["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def apply(params: Dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One stateful VAD step.

    Args:
        x: (B, 480) float32 audio normalized to [-1, 1] (int16/32767).
        h, c: (2, B, 64) LSTM state (silero state contract, vad.py:92-96).
    Returns:
        (score (B,), h', c') with score in [0, 1].
    """
    feat = _features(x.astype(jnp.float32))
    z = jnp.maximum(jnp.matmul(feat, params["proj"]["w"],
                               precision=jax.lax.Precision.HIGHEST) + params["proj"]["b"], 0.0)
    new_h, new_c = [], []
    for layer in range(LAYERS):
        hl, cl = _lstm_cell(params[f"lstm{layer}"], z, h[layer], c[layer])
        new_h.append(hl)
        new_c.append(cl)
        z = hl
    score = jax.nn.sigmoid(jnp.matmul(z, params["out"]["w"],
                                      precision=jax.lax.Precision.HIGHEST) + params["out"]["b"])
    return score[:, 0], jnp.stack(new_h), jnp.stack(new_c)
