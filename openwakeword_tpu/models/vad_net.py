"""JAX voice-activity-detection network with the Silero VAD state contract.

The reference gates predictions with Silero's frozen ``silero_vad.onnx``
(reference openwakeword/vad.py:54-130): stateful inference over audio frames
with explicit LSTM state h, c of shape (2, B, 64) carried across calls, and
*variable* frame sizes (the reference's predict defaults to 480 samples while
its __call__ path feeds 640). This network operates per STFT frame: any
input length >= 256 samples maps to (len-256)//112+1 internal LSTM steps.
The 480-sample default tiles exactly (3 steps cover all 480 samples); other
frame sizes drop the sub-hop tail that doesn't fill a frame (640-sample
calls: 4 steps cover samples 0..591, the final 48 are unseen). The framing
is identical at training (training/vad.py) and inference, so the bundled
checkpoint's calibration assumes it.

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

FRAME_SAMPLES = 480   # recommended/default external frame (3 LSTM steps)
MIN_SAMPLES = 256     # one STFT frame
N_FFT = 256
HOP = 112
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
    params["proj"] = {
        "w": jax.random.normal(k1, (N_BANDS, HIDDEN)) * np.sqrt(2.0 / N_BANDS),
        "b": jnp.zeros((HIDDEN,)),
    }
    for layer in range(LAYERS):
        key, kih, khh = jax.random.split(key, 3)
        bound = 1.0 / np.sqrt(HIDDEN)
        params[f"lstm{layer}"] = {
            "w_ih": jax.random.uniform(kih, (HIDDEN, 4 * HIDDEN), jnp.float32, -bound, bound),
            "w_hh": jax.random.uniform(khh, (HIDDEN, 4 * HIDDEN), jnp.float32, -bound, bound),
            "b_ih": jnp.zeros((4 * HIDDEN,)),
            "b_hh": jnp.zeros((4 * HIDDEN,)),
        }
    params["out"] = {
        "w": jax.random.normal(k2, (HIDDEN, 1)) * np.sqrt(1.0 / HIDDEN),
        "b": jnp.zeros((1,)),
    }
    return params


def _frame_features(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N>=256) audio in [-1, 1] -> (B, T, 32) per-STFT-frame log-mel."""
    basis, melw = _frontend_consts()
    n = x.shape[-1]
    t = (n - N_FFT) // HOP + 1
    idx = np.arange(t)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = x[:, idx]                                    # (B, T, 256)
    spec = jnp.matmul(frames, jnp.asarray(basis), precision=jax.lax.Precision.HIGHEST)
    power = spec[..., 0::2] ** 2 + spec[..., 1::2] ** 2
    mel = jnp.matmul(power, jnp.asarray(melw), precision=jax.lax.Precision.HIGHEST)
    return jnp.log(mel + 1e-6)                            # (B, T, 32)


def _lstm_cell(p, x, h, c):
    gates = (jnp.matmul(x, p["w_ih"], precision=jax.lax.Precision.HIGHEST) + p["b_ih"]
             + jnp.matmul(h, p["w_hh"], precision=jax.lax.Precision.HIGHEST) + p["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def apply(params: Dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One stateful VAD step over an audio frame of any length >= 256.

    Args:
        x: (B, N) float32 audio normalized to [-1, 1] (int16/32767).
        h, c: (2, B, 64) LSTM state (silero state contract, vad.py:92-96).
    Returns:
        (score (B,), h', c') with score in [0, 1]; the recurrent state
        advances once per internal STFT frame ((N-256)//112+1 steps).
    """
    feats = _frame_features(x.astype(jnp.float32))         # (B, T, 32)
    z_seq = jnp.maximum(
        jnp.matmul(feats, params["proj"]["w"],
                   precision=jax.lax.Precision.HIGHEST) + params["proj"]["b"], 0.0)

    def step_fn(carry, z_t):
        h, c = carry
        new_h, new_c = [], []
        z = z_t
        for layer in range(LAYERS):
            hl, cl = _lstm_cell(params[f"lstm{layer}"], z, h[layer], c[layer])
            new_h.append(hl)
            new_c.append(cl)
            z = hl
        return (jnp.stack(new_h), jnp.stack(new_c)), None

    (h, c), _ = jax.lax.scan(step_fn, (h, c), jnp.swapaxes(z_seq, 0, 1))
    score = jax.nn.sigmoid(jnp.matmul(h[-1], params["out"]["w"],
                                      precision=jax.lax.Precision.HIGHEST) + params["out"]["b"])
    return score[:, 0], h, c
