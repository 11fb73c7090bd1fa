"""Incremental (streaming) evaluation of the speech-embedding CNN.

The reference recomputes the full 76-frame window for every 80 ms step
(reference utils.py:437-443), but consecutive windows overlap by 68 frames
and every layer of the CNN is time-invariant with valid time convolutions and
phase-aligned stride-2 time pools (8 new mel frames per step = 2^3, matching
the three (2,2) pools). Intermediate activations at a given absolute time are
therefore identical across windows, so caching a 2-row tail of each
time-conv's input lets each step compute only the new rows: ~8x fewer FLOPs
than re-running the window, with *bit-identical* output (the embedding's
receptive field is exactly 76 frames, fully contained in the cached state).

Used by the multi-stream engine's hot path. Operates on BN-folded params
(embedding.fold_batchnorm / TFLite import format).

All functions are batched over a leading stream axis and jit/scan-friendly.
"""

from typing import Dict, List, Tuple


import jax
import jax.numpy as jnp

from openwakeword_tpu.models import embedding as E


# shared with the full-window evaluator: one definition keeps the
# streaming path bit-identical to embedding.apply_folded by construction
from openwakeword_tpu.models.embedding import _clipped_leaky, _conv, _pool  # noqa: E402


def cache_spec() -> List[Tuple[str, int]]:
    """[(cache_name, conv_index)] for every conv with time extent > 1, in
    program order. Each cache holds the last 2 time-rows of that conv's
    (pre-pad) input."""
    out = []
    conv_i = 0
    for layer in E.spec():
        if layer[0] == "conv":
            kh = layer[2][0]
            if kh > 1:
                out.append((f"cache_{conv_i}", conv_i))
            conv_i += 1
    return out


def init_caches(folded: Dict, mel_window: jnp.ndarray, precision=None) -> Tuple[Dict, jnp.ndarray]:
    """Prime the caches by running the full window forward, capturing each
    time-conv input's last 2 rows.

    Args:
        folded: BN-folded embedding params.
        mel_window: (S, 76, 32) transformed log-mel.
    Returns:
        (caches, embedding (S, 96)).
    """
    x = mel_window[..., None].astype(jnp.float32)
    caches: Dict[str, jnp.ndarray] = {}
    conv_i = bn_i = 0
    for layer in E.spec():
        kind = layer[0]
        if kind == "pad":
            pw = layer[1]
            x = jnp.pad(x, ((0, 0), (pw[0], pw[0]), (pw[1], pw[1]), (0, 0)))
        elif kind == "conv":
            _, _, (kh, kw), padding, act = layer
            if kh > 1:
                caches[f"cache_{conv_i}"] = x[:, -2:]
            c = folded[f"conv_{conv_i}"]
            x = _conv(x, c["w"], padding, E.layer_precision(precision, conv_i)) + c["b"]
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
            _, window, strides, padding = layer
            x = _pool(x, window, strides, padding)
    return caches, x.reshape(x.shape[0], E.OUTPUT_DIM)


def step(folded: Dict, caches: Dict, new_mel: jnp.ndarray, precision=None) -> Tuple[Dict, jnp.ndarray]:
    """Advance the streaming CNN by 8*k new mel frames (k >= 1).

    Every layer of the program is time-invariant, so the same 2-row caches
    support any multiple of 8 new rows per call: feeding 8*k rows yields the
    k per-80 ms embeddings in one pass with caches identical to k sequential
    8-row calls. Multi-frame steps amortize the per-op overhead of the many
    small convolutions (the time extent of each op grows ~k-fold), which is
    the engine's frames_per_step throughput lever (PERF_NOTES.md).

    Args:
        folded: BN-folded embedding params.
        caches: per-time-conv 2-row input tails (from init_caches / prior step).
        new_mel: (S, 8*k, 32) new transformed log-mel rows.
    Returns:
        (new_caches, embeddings) -- (S, 96) when k == 1, else (S, k, 96),
        one embedding per implicit sliding 76-frame window ending at each
        8-row boundary; equal to k sequential single-frame steps up to XLA
        conv-tiling reassociation (~1e-5 on O(10) activations).
    """
    x = new_mel[..., None].astype(jnp.float32)
    new_caches: Dict[str, jnp.ndarray] = {}
    conv_i = bn_i = 0
    for layer in E.spec():
        kind = layer[0]
        if kind == "pad":
            pw = layer[1]
            # width-only padding each step; time context comes from caches
            x = jnp.pad(x, ((0, 0), (0, 0), (pw[1], pw[1]), (0, 0)))
        elif kind == "conv":
            _, _, (kh, kw), padding, act = layer
            if kh > 1:
                cache = caches[f"cache_{conv_i}"]
                if padding == "SAME":
                    raise ValueError("time-extended SAME convs unsupported in streaming mode")
                full = jnp.concatenate([cache, x], axis=1)
                new_caches[f"cache_{conv_i}"] = full[:, -2:]
                # stem cache rows were captured post-(width)pad; re-pad only
                # the fresh rows happens above, so widths already align
                x = full
                pad_mode = "VALID"
            else:
                pad_mode = padding
            c = folded[f"conv_{conv_i}"]
            x = _conv(x, c["w"], pad_mode, E.layer_precision(precision, conv_i)) + c["b"]
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
            _, window, strides, padding = layer
            x = _pool(x, window, strides, padding)
    emb = x.reshape(x.shape[0], x.shape[1], E.OUTPUT_DIM)   # (S, k, 96)
    return new_caches, (emb[:, 0] if emb.shape[1] == 1 else emb)


# ---------------------------------------------------------------------------
# Stream-minor ("lanes") layout: activations as (C, T, W, S)
# ---------------------------------------------------------------------------
# With streams on the (128-wide) lane axis every tensor is lane-dense for
# S % 128 == 0, and each conv is exactly one MXU matmul
# (Cout, kh*kw*Cin) @ (kh*kw*Cin, T*W*S) instead of a lane-padded
# <=96-channel convolution. This targets the dominant engine stage
# (PERF_NOTES.md: incremental CNN = 53% of step time at ~8% MFU).


def _weight_mat(w: jnp.ndarray) -> jnp.ndarray:
    """HWIO (kh, kw, Cin, Cout) -> (Cout, kh*kw*Cin), tap order (dt, dw, c)."""
    kh, kw, cin, cout = w.shape
    return jnp.transpose(w.reshape(kh * kw * cin, cout))


def _conv_t(x, w, kh, kw, precision):
    """x: (Cin, T, W, S) unpadded/valid -> (Cout, T-kh+1, W-kw+1, S)."""
    cin, t, wd, s = x.shape
    t_out, w_out = t - kh + 1, wd - kw + 1
    taps = [x[:, dt:dt + t_out, dw:dw + w_out, :]
            for dt in range(kh) for dw in range(kw)]
    col = jnp.concatenate(taps, axis=0) if len(taps) > 1 else taps[0]
    if precision is None:
        precision = jax.lax.Precision.HIGHEST if w.dtype == jnp.float32 else None
    out = jax.lax.dot_general(
        _weight_mat(w).astype(w.dtype), col.astype(w.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    return out


def _pool_t(x, window, strides):
    """Exact-tiling max pool in (C, T, W, S) layout (all pools in the spec
    tile their inputs exactly at streaming shapes)."""
    c, t, wd, s = x.shape
    if window[0] > 1:
        x = x.reshape(c, t // window[0], window[0], wd, s).max(axis=2)
        t = t // window[0]
    if window[1] > 1:
        x = x.reshape(c, t, wd // window[1], window[1], s).max(axis=3)
    return x


def _forward_t(folded: Dict, x: jnp.ndarray, caches: Dict = None,
               precision=None) -> Tuple[Dict, jnp.ndarray]:
    """Shared layer program in (C, T, W, S) layout.

    With ``caches`` given, runs one streaming step (8 new rows, consuming and
    refreshing the 2-row tails); with ``caches=None`` primes from a full
    window, capturing the tails.
    """
    new_caches: Dict[str, jnp.ndarray] = {}
    prime = caches is None
    conv_i = bn_i = 0
    for layer in E.spec():
        kind = layer[0]
        if kind == "pad":
            pw = layer[1]
            x = jnp.pad(x, ((0, 0), (pw[0], pw[0]) if prime else (0, 0),
                            (pw[1], pw[1]), (0, 0)))
        elif kind == "conv":
            _, _, (kh, kw), padding, act = layer
            if kw > 1 and padding == "SAME":
                x = jnp.pad(x, ((0, 0), (0, 0), (kw // 2, kw // 2), (0, 0)))
            if kh > 1:
                if prime:
                    new_caches[f"cache_{conv_i}"] = x[:, -2:]
                else:
                    x = jnp.concatenate([caches[f"cache_{conv_i}"], x], axis=1)
                    new_caches[f"cache_{conv_i}"] = x[:, -2:]
            c = folded[f"conv_{conv_i}"]
            x = _conv_t(x, c["w"], kh, kw, E.layer_precision(precision, conv_i)) \
                + c["b"].astype(jnp.float32)[:, None, None, None]
            if act == "relu":
                x = jnp.maximum(x, 0.0)
            conv_i += 1
        elif kind == "bnact":
            aff = folded.get(f"affine_{bn_i}")
            if aff is not None:
                x = x * aff["scale"][:, None, None, None] \
                    + aff["shift"][:, None, None, None]
            x = _clipped_leaky(x)
            bn_i += 1
        elif kind == "pool":
            _, window, strides, padding = layer
            x = _pool_t(x, window, strides)
    return new_caches, x.reshape(E.OUTPUT_DIM, x.shape[-1])


def init_caches_t(folded: Dict, mel_window: jnp.ndarray, precision=None
                  ) -> Tuple[Dict, jnp.ndarray]:
    """Prime in stream-minor layout.

    Args:
        mel_window: (S, 76, 32).
    Returns:
        (caches in (C, rows, W, S) layout, embedding (S, 96)).
    """
    x = jnp.transpose(mel_window, (1, 2, 0))[None].astype(jnp.float32)  # (1,76,32,S)
    caches, emb = _forward_t(folded, x, caches=None, precision=precision)
    return caches, jnp.transpose(emb)


def step_t(folded: Dict, caches: Dict, new_mel: jnp.ndarray, precision=None
           ) -> Tuple[Dict, jnp.ndarray]:
    """Streaming step in stream-minor layout; bit-compatible with ``step``.

    Args:
        new_mel: (S, 8, 32).
    Returns:
        (new caches, embedding (S, 96)).
    """
    x = jnp.transpose(new_mel, (1, 2, 0))[None].astype(jnp.float32)     # (1,8,32,S)
    new_caches, emb = _forward_t(folded, x, caches, precision=precision)
    return new_caches, jnp.transpose(emb)
