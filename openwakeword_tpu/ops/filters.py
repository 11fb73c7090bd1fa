"""Exact biquad (RBJ Audio-EQ-Cookbook) filters applied in the FFT domain.

The reference's EQ / band-stop augmentations are second-order-section IIR
filters run sample-sequentially by its CPU augmentation libraries
(reference data.py:558-697 composes audiomentations SevenBandParametricEQ
and torch_audiomentations BandStopFilter). A sequential IIR recurrence is
hostile to TPUs, but its *zero-state output* is reproducible exactly in the
frequency domain: zero-pad past the impulse-response decay, multiply by the
cascade's complex transfer function H(e^{jw}) evaluated from the biquad
coefficients, and truncate. The result matches scipy.signal.sosfilt to the
periodization tail (< 1e-4 for the pads used here; tests/test_filters.py
checks against scipy as the oracle).

All functions are batched over a leading example axis and jit-friendly;
coefficients are computed in-graph from (possibly traced) random
frequencies/gains.
"""

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from openwakeword_tpu.ops.fftc import spectral_op

TWO_PI = 2.0 * np.pi


def peaking_coeffs(f0, q, gain_db, sr: int = 16000) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RBJ cookbook peaking-EQ biquad. Inputs broadcast; returns (b, a) with
    trailing dim 3, normalized so a0 == 1."""
    f0, q, gain_db = jnp.asarray(f0), jnp.asarray(q), jnp.asarray(gain_db)
    amp = 10.0 ** (gain_db / 40.0)
    w0 = TWO_PI * f0 / sr
    alpha = jnp.sin(w0) / (2.0 * q)
    cos_w0 = jnp.cos(w0)
    b0 = 1.0 + alpha * amp
    b1 = -2.0 * cos_w0
    b2 = 1.0 - alpha * amp
    a0 = 1.0 + alpha / amp
    a1 = -2.0 * cos_w0
    a2 = 1.0 - alpha / amp
    b = jnp.stack([b0 / a0, b1 / a0, b2 / a0], axis=-1)
    a = jnp.stack([jnp.ones_like(a0), a1 / a0, a2 / a0], axis=-1)
    return b, a


def notch_coeffs(f0, q, sr: int = 16000) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RBJ cookbook notch biquad (zero gain at f0, unity elsewhere).
    ``q = f0 / bandwidth``."""
    f0, q = jnp.asarray(f0), jnp.asarray(q)
    w0 = TWO_PI * f0 / sr
    alpha = jnp.sin(w0) / (2.0 * q)
    cos_w0 = jnp.cos(w0)
    a0 = 1.0 + alpha
    b = jnp.stack([1.0 / a0, -2.0 * cos_w0 / a0, 1.0 / a0], axis=-1)
    a = jnp.stack([jnp.ones_like(a0), -2.0 * cos_w0 / a0, (1.0 - alpha) / a0],
                  axis=-1)
    return b, a


@spectral_op
def cascade_response(b: jnp.ndarray, a: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Complex frequency response of a biquad cascade on the rfft grid.

    The grid is in normalized frequency — the sample rate only matters when
    *designing* the coefficients (*_coeffs functions), not when applying them.

    Args:
        b, a: (..., K, 3) cascade coefficients (K sections).
        n_fft: transform length the response will multiply.
    Returns:
        (..., n_fft//2 + 1) complex64 response (product over sections).
    """
    w = jnp.asarray(TWO_PI * np.fft.rfftfreq(n_fft), jnp.float32)     # (F,)
    # z^-1 = e^{-jw} built from real cos/sin: the TPU backend implements
    # complex mul/div but NOT complex exp (UNIMPLEMENTED at lowering)
    z1 = jax.lax.complex(jnp.cos(w), -jnp.sin(w))                     # z^-1
    z2 = z1 * z1
    bb = b[..., None, :]                                              # (...,K,1,3)
    aa = a[..., None, :]
    num = bb[..., 0] + bb[..., 1] * z1 + bb[..., 2] * z2              # (...,K,F)
    den = aa[..., 0] + aa[..., 1] * z1 + aa[..., 2] * z2
    return jnp.prod(num / den, axis=-2).astype(jnp.complex64)         # (...,F)


@spectral_op
def apply_cascade(x: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray,
                  pad: int = 8192) -> jnp.ndarray:
    """Filter (B, N) audio through a per-example biquad cascade (B, K, 3).

    Zero-state IIR semantics: zero-padding by ``pad`` samples pushes the
    circular wrap-around below the impulse response's decayed tail (8192
    samples cover poles down to ~30 Hz bandwidth at 16 kHz to < -80 dB), so
    the truncated output equals the sequential filter's.
    """
    n = x.shape[-1]
    m = n + pad
    h = cascade_response(b, a, m)                                     # (B, F)
    spec = jnp.fft.rfft(x, n=m)
    y = jnp.fft.irfft(spec * h, n=m)[..., :n]
    return y.astype(x.dtype)
