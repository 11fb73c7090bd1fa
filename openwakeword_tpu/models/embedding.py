"""TPU-native reimplementation of Google's speech_embedding CNN.

Architecture per the reference's reconstruction of the TFHub
``speech_embedding/1`` module (reference
``notebooks/converting_google_speech_embedding_model.ipynb`` cell 18,
arXiv:2002.01322): a stem conv with in-graph ReLU, 21 BatchNorm +
clipped-leaky-ReLU ``max(max(0.2x, x), -0.4)`` stages, 5 interleaved max-pools,
and a final projection conv. Input is a (B, 76, 32, 1) transformed log-mel
window (775 ms), output a (B, 96) embedding.

TPU-first notes:
  * Functional: params are a plain dict pytree; ``apply`` is pure and
    jit/vmap/pjit-friendly. No framework Module machinery.
  * NHWC layout with HWIO conv kernels (TPU-native conv layout).
  * ``fold_batchnorm`` folds each inference-mode BatchNorm into the preceding
    conv (mathematically exact at f32), halving elementwise traffic; the stem
    BN (which follows an in-graph ReLU) folds to a per-channel affine.
"""

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

BN_EPS = 1e-3  # Keras BatchNormalization default, used by the reference export

# Layer program: ('pad', width_pad) | ('conv', out_ch, (kh, kw), padding, act)
# | ('bnact',) | ('pool', window, strides, padding)
# 'bnact' = BatchNorm followed by the clipped leaky activation.
_SPEC: List[Tuple] = [
    ("pad", (0, 1)),
    ("conv", 24, (3, 3), "VALID", "relu"),
    ("bnact",),
    # Block 1
    ("conv", 24, (1, 3), "SAME", None), ("bnact",),
    ("conv", 24, (3, 1), "VALID", None), ("bnact",),
    ("pool", (2, 2), (2, 2), "VALID"),
    ("conv", 48, (1, 3), "SAME", None), ("bnact",),
    ("conv", 48, (3, 1), "VALID", None), ("bnact",),
    # Block 2
    ("conv", 48, (1, 3), "SAME", None), ("bnact",),
    ("conv", 48, (3, 1), "VALID", None), ("bnact",),
    ("pool", (1, 2), (1, 2), "SAME"),
    ("conv", 72, (1, 3), "SAME", None), ("bnact",),
    ("conv", 72, (3, 1), "VALID", None), ("bnact",),
    # Block 3
    ("conv", 72, (1, 3), "SAME", None), ("bnact",),
    ("conv", 72, (3, 1), "VALID", None), ("bnact",),
    ("pool", (2, 2), (2, 2), "VALID"),
    ("conv", 96, (1, 3), "SAME", None), ("bnact",),
    ("conv", 96, (3, 1), "VALID", None), ("bnact",),
    # Block 4
    ("conv", 96, (1, 3), "SAME", None), ("bnact",),
    ("conv", 96, (3, 1), "VALID", None), ("bnact",),
    ("pool", (1, 2), (1, 2), "VALID"),
    ("conv", 96, (1, 3), "SAME", None), ("bnact",),
    ("conv", 96, (3, 1), "VALID", None), ("bnact",),
    # Block 5
    ("conv", 96, (1, 3), "SAME", None), ("bnact",),
    ("conv", 96, (3, 1), "VALID", None), ("bnact",),
    ("pool", (2, 2), (2, 2), "VALID"),
    ("conv", 96, (3, 1), "VALID", None),
]

INPUT_SHAPE = (76, 32, 1)
OUTPUT_DIM = 96


def spec():
    """The layer program (read-only copy)."""
    return list(_SPEC)


def _clipped_leaky(x):
    """max(max(0.2*x, x), -0.4) -- the embedding model's activation."""
    return jnp.maximum(jnp.maximum(0.2 * x, x), -0.4)


def init_params(key, dtype=jnp.float32) -> Dict:
    """Random (He-normal) initialization with the exact layer geometry.

    Real deployments import weights (openwakeword_tpu.io.weights); random
    params exist so the full pipeline is testable without the frozen artifact.
    """
    params: Dict = {}
    in_ch = INPUT_SHAPE[-1]
    conv_i = bn_i = 0
    for op in _SPEC:
        if op[0] == "conv":
            _, out_ch, (kh, kw), _, _ = op
            key, sub = jax.random.split(key)
            fan_in = kh * kw * in_ch
            w = jax.random.normal(sub, (kh, kw, in_ch, out_ch), dtype) * np.sqrt(2.0 / fan_in)
            params[f"conv_{conv_i}"] = {"w": w}
            conv_i += 1
            in_ch = out_ch
        elif op[0] == "bnact":
            params[f"bn_{bn_i}"] = {
                "gamma": jnp.ones((in_ch,), dtype),
                "beta": jnp.zeros((in_ch,), dtype),
                "mean": jnp.zeros((in_ch,), dtype),
                "var": jnp.ones((in_ch,), dtype),
            }
            bn_i += 1
    return params


def _conv(x, w, padding, precision=None):
    # default: bf16 weights take the fast MXU path (f32 accumulation either
    # way); f32 weights use HIGHEST for exact parity. An explicit
    # ``precision`` (e.g. HIGH = 3-pass bf16) overrides.
    if precision is None:
        precision = jax.lax.Precision.HIGHEST if w.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype), w,
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _pool(x, window, strides, padding):
    kh, kw = window
    sh, sw = strides
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=padding,
    )


def apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass with explicit BatchNorm (bit-exact wrt imported weights).

    Args:
        params: pytree from init_params / the weight importer.
        x: (B, 76, 32) or (B, 76, 32, 1) transformed log-mel windows, float32.
    Returns:
        (B, 96) embeddings.
    """
    if x.ndim == 3:
        x = x[..., None]
    x = x.astype(jnp.float32)
    conv_i = bn_i = 0
    for op in _SPEC:
        kind = op[0]
        if kind == "pad":
            pw = op[1]
            x = jnp.pad(x, ((0, 0), (pw[0], pw[0]), (pw[1], pw[1]), (0, 0)))
        elif kind == "conv":
            _, _, _, padding, act = op
            x = _conv(x, params[f"conv_{conv_i}"]["w"], padding)
            if act == "relu":
                x = jnp.maximum(x, 0.0)
            conv_i += 1
        elif kind == "bnact":
            bn = params[f"bn_{bn_i}"]
            inv = jax.lax.rsqrt(bn["var"] + BN_EPS)
            x = (x - bn["mean"]) * inv * bn["gamma"] + bn["beta"]
            x = _clipped_leaky(x)
            bn_i += 1
        elif kind == "pool":
            _, window, strides, padding = op
            x = _pool(x, window, strides, padding)
    return x.reshape(x.shape[0], OUTPUT_DIM)


def fold_batchnorm(params: Dict) -> Dict:
    """Fold inference BatchNorms into adjacent convs (exact linear algebra).

    For conv->BN pairs the BN scale/shift folds into the conv kernel plus a
    bias. The stem conv has an in-graph ReLU *before* its BN, so that BN
    remains a standalone per-channel affine ('affine_0').
    """
    folded: Dict = {}
    conv_i = bn_i = 0
    prev_conv = None  # index of conv immediately preceding a bnact, None if relu'd stem
    for op in _SPEC:
        if op[0] == "conv":
            _, _, _, _, act = op
            folded[f"conv_{conv_i}"] = {"w": params[f"conv_{conv_i}"]["w"],
                                        "b": jnp.zeros(params[f"conv_{conv_i}"]["w"].shape[-1])}
            prev_conv = None if act == "relu" else conv_i
            conv_i += 1
        elif op[0] == "bnact":
            bn = params[f"bn_{bn_i}"]
            scale = bn["gamma"] / jnp.sqrt(bn["var"] + BN_EPS)
            shift = bn["beta"] - bn["mean"] * scale
            if prev_conv is not None:
                c = folded[f"conv_{prev_conv}"]
                folded[f"conv_{prev_conv}"] = {"w": c["w"] * scale, "b": c["b"] * scale + shift}
            else:
                folded[f"affine_{bn_i}"] = {"scale": scale, "shift": shift}
            prev_conv = None
            bn_i += 1
    return folded


def n_convs() -> int:
    """Number of conv layers in the embedding program (mixed-precision
    serving addresses convs by this index order)."""
    return sum(1 for layer in _SPEC if layer[0] == "conv")


# The measured per-conv mixed-precision assignment behind the engine's
# ``precision='mixed'`` tier: these convs run 1-pass bf16 MXU matmuls
# ('fast'), the rest 3-pass ('high'). Chosen by a FLOPs-per-drift knapsack
# over the per-layer drift probe (benchmark/precision_drift.py --cnn-probe)
# and validated by direct combined measurement on real audio + noise:
# max |dScore| vs 'highest' = 7.9e-4 — inside the 1e-3 parity budget —
# while putting ~60% of the CNN MACs on the 1-pass path. Adding conv 8
# (the next knapsack pick) measures 1.11e-3: over budget, interactions are
# super-RMS, so the set is pinned by measurement, not by the model
# (PERF_NOTES.md round 5).
MIXED_FAST_CONVS = (1, 2, 5, 6, 9)


def mixed_precision() -> tuple:
    """The per-conv mode tuple for the measured 'mixed' serving tier."""
    return tuple("fast" if i in MIXED_FAST_CONVS else "high"
                 for i in range(n_convs()))


def layer_precision(precision, conv_i: int):
    """Resolve the precision for conv ``conv_i``.

    ``precision`` is either one precision for every conv (the existing
    contract) or a sequence of per-conv precisions indexed by program order
    (mixed-precision serving: spend 3-pass HIGH only on the drift-dominant
    layers, 1-pass bf16 on the rest — PERF_NOTES round 5)."""
    if isinstance(precision, (list, tuple)):
        return precision[conv_i]
    return precision


def is_folded(params: Dict) -> bool:
    """True if params are already in BN-folded form (e.g. imported from a
    TFLite artifact whose converter folded the BatchNorms)."""
    return any(k.startswith("affine_") for k in params) or \
        ("conv_0" in params and "b" in params["conv_0"])


def ensure_folded(params: Dict) -> Dict:
    return params if is_folded(params) else fold_batchnorm(params)


def apply_folded(folded: Dict, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Forward pass using BN-folded params (fewer elementwise stages)."""
    if x.ndim == 3:
        x = x[..., None]
    x = x.astype(jnp.float32)
    conv_i = bn_i = 0
    for op in _SPEC:
        kind = op[0]
        if kind == "pad":
            pw = op[1]
            x = jnp.pad(x, ((0, 0), (pw[0], pw[0]), (pw[1], pw[1]), (0, 0)))
        elif kind == "conv":
            _, _, _, padding, act = op
            c = folded[f"conv_{conv_i}"]
            x = _conv(x, c["w"], padding, layer_precision(precision, conv_i)) + c["b"]
            if act == "relu":
                x = jnp.maximum(x, 0.0)
            conv_i += 1
        elif kind == "bnact":
            aff = folded.get(f"affine_{bn_i}")
            if aff is not None:
                x = x * aff["scale"] + aff["shift"]
            x = _clipped_leaky(x)
            bn_i += 1
        elif kind == "pool":
            _, window, strides, padding = op
            x = _pool(x, window, strides, padding)
    return x.reshape(x.shape[0], OUTPUT_DIM)
