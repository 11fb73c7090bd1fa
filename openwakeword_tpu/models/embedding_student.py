"""TPU-shaped student speech-embedding network ("student" embedding).

The faithful embedding (models/embedding.py, the reference's reconstruction
of TFHub speech_embedding/1 — conversion notebook cell 18) is 27 sequential
convolutions with <=96 channels and tiny spatial extents: measured at ~8%
MFU it is ~53% of the engine step, and every sub-model attack (im2col,
stream-minor layout, Pallas, int8, micro-batching) was measured and
rejected (PERF_NOTES.md rounds 1-3) — the architecture itself starves the
MXU. This module is the model-level answer: a student network with the SAME
external contract — input one (76, 32) transformed log-mel window (775 ms),
output one 96-d embedding per 80 ms hop — whose entire forward pass is
three large matmuls with every contraction dimension a multiple of 128:

  1. block embed:  the window as 19 disjoint 4-frame blocks, each a
                   128-feature vector (4 frames x 32 mels) -> LayerNorm ->
                   (128 -> 256) matmul -> GELU
  2. mix hidden:   flatten the 19 x 256 block ring (4864 = 38*128) ->
                   (4864 -> 512) matmul -> GELU -> (512 -> 512) -> GELU
  3. project:      (512 -> 96)

Streaming is exact and trivial: an 80 ms hop adds 8 mel rows = exactly 2
new blocks, so the streaming state is one (S, 19, 256) block ring — block
boundaries stay aligned across hops, and a streamed embedding equals the
full-window embedding bit-for-bit (same blocks, same matmuls), unlike the
teacher's cache algebra. Per step the work is one (2S, 128) @ (128, 256)
and one (S, 4864) @ (4864, 512) chain — MXU-dense at any serving batch.

Weights come from distilling the loaded teacher (training/distill.py) —
the recipe targets whatever embedding checkpoint is installed, so when the
real released weights arrive the same run retargets them. Without a
checkpoint a deterministic random init keeps the pipeline runnable (same
policy as every other artifact in this package).
"""

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

INPUT_SHAPE = (76, 32, 1)
OUTPUT_DIM = 96
BLOCK_FRAMES = 4                      # mel rows per block
N_BLOCKS = INPUT_SHAPE[0] // BLOCK_FRAMES          # 19
BLOCK_IN = BLOCK_FRAMES * INPUT_SHAPE[1]           # 128
BLOCK_DIM = 256
HIDDEN = 512
HOP_BLOCKS = 2                        # 8 new mel rows per 80 ms = 2 blocks


def is_student(params: Dict) -> bool:
    """True if a params pytree is a student embedding (vs the faithful CNN)."""
    return isinstance(params, dict) and "mix1" in params and "block1" in params


def init_params(key, dtype=jnp.float32) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def lin(k, n_in, n_out):
        return {"w": jax.random.normal(k, (n_in, n_out), dtype)
                * np.sqrt(2.0 / n_in),
                "b": jnp.zeros((n_out,), dtype)}

    return {
        "block_ln": {"gamma": jnp.ones((BLOCK_IN,), dtype),
                     "beta": jnp.zeros((BLOCK_IN,), dtype)},
        "block1": lin(k1, BLOCK_IN, BLOCK_DIM),
        "mix1": lin(k2, N_BLOCKS * BLOCK_DIM, HIDDEN),
        "mix2": lin(k3, HIDDEN, HIDDEN),
        "out": lin(k4, HIDDEN, OUTPUT_DIM),
    }


def n_params(params: Dict) -> int:
    return int(sum(np.prod(a.shape) for a in jax.tree_util.tree_leaves(params)))


def _matmul(p, x, precision):
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST
                     if p["w"].dtype == jnp.float32 else None)
    return jnp.matmul(x.astype(p["w"].dtype), p["w"], precision=precision,
                      preferred_element_type=jnp.float32) \
        + p["b"].astype(jnp.float32)


def _embed_blocks(params: Dict, mel: jnp.ndarray, precision) -> jnp.ndarray:
    """(..., 4k, 32) mel rows -> (..., k, BLOCK_DIM) block features."""
    shape = mel.shape
    k = shape[-2] // BLOCK_FRAMES
    z = mel.astype(jnp.float32).reshape(*shape[:-2], k, BLOCK_IN)
    ln = params["block_ln"]
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
    z = (z - mu) * jax.lax.rsqrt(var + 1e-5) * ln["gamma"].astype(jnp.float32) \
        + ln["beta"].astype(jnp.float32)
    return jax.nn.gelu(_matmul(params["block1"], z, precision))


def _mix(params: Dict, blocks: jnp.ndarray, precision) -> jnp.ndarray:
    """(..., 19, BLOCK_DIM) block ring -> (..., 96) embedding."""
    flat = blocks.reshape(*blocks.shape[:-2], N_BLOCKS * BLOCK_DIM)
    h = jax.nn.gelu(_matmul(params["mix1"], flat, precision))
    h = jax.nn.gelu(_matmul(params["mix2"], h, precision))
    return _matmul(params["out"], h, precision)


def apply(params: Dict, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Full-window forward: (B, 76, 32) or (B, 76, 32, 1) -> (B, 96).

    Same signature/contract as embedding.apply_folded, so AudioFeatures and
    the engine swap it in without code changes at call sites.
    """
    if x.ndim == 4:
        x = x[..., 0]
    blocks = _embed_blocks(params, x, precision)     # (B, 19, BLOCK_DIM)
    return _mix(params, blocks, precision)


# ---------------------------------------------------------------------------
# Streaming evaluation (engine hot path) — same interface as embedding_stream
# ---------------------------------------------------------------------------

def init_caches(params: Dict, mel_window: jnp.ndarray, precision=None
                ) -> Tuple[Dict, jnp.ndarray]:
    """Prime the block ring from a full (S, 76, 32) window.

    Returns (caches, embedding (S, 96)); caches = {"blocks": (S, 19, D)}.
    """
    blocks = _embed_blocks(params, mel_window, precision)
    return {"blocks": blocks}, _mix(params, blocks, precision)


def step(params: Dict, caches: Dict, new_mel: jnp.ndarray, precision=None
         ) -> Tuple[Dict, jnp.ndarray]:
    """Advance by 8*k new mel rows (k >= 1): embed the 2k new blocks, roll
    the ring, emit one embedding per 8-row hop.

    Returns (new caches, (S, 96) for k == 1 else (S, k, 96)) — bit-identical
    to re-running ``apply`` on each implicit 76-row window, because blocks
    are pure functions of disjoint row groups and hops keep 4-row alignment.
    """
    new_blocks = _embed_blocks(params, new_mel, precision)   # (S, 2k, D)
    ring = caches["blocks"].astype(new_blocks.dtype)
    k = new_blocks.shape[1] // HOP_BLOCKS
    all_blocks = jnp.concatenate([ring, new_blocks], axis=1)
    if k == 1:
        window = all_blocks[:, -N_BLOCKS:]
        return {"blocks": window}, _mix(params, window, precision)
    windows = jnp.stack(
        [all_blocks[:, HOP_BLOCKS * (j + 1):HOP_BLOCKS * (j + 1) + N_BLOCKS]
         for j in range(k)], axis=1)                         # (S, k, 19, D)
    return {"blocks": all_blocks[:, -N_BLOCKS:]}, _mix(params, windows, precision)
