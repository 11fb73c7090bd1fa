"""Wake-word classifier heads as functional JAX modules.

Three architectures cover the reference's model families:
  * ``dnn``  -- Flatten -> Linear(W) -> LayerNorm -> ReLU ->
               n x [Linear(W) -> LayerNorm -> ReLU] -> Linear(classes) ->
               sigmoid (binary) / relu-logits (multiclass).
               With W=64, n_blocks=1 this is exactly the published binary
               heads (102,849 params; reference docs/models/alexa.md:11-36,
               train.py:56-83).
  * ``mlp``  -- Flatten -> Linear(W) -> ReLU -> Linear(W) -> ReLU ->
               Linear(classes) [-> softmax at inference]. With W=128 and 34
               input frames this is the published timer multiclass head
               (435,335 params; docs/models/timers.md:12-36).
  * ``rnn``  -- 2-layer bidirectional LSTM(64) -> Linear -> sigmoid
               (reference train.py:84-96).

All heads consume a (B, F, 96) window of speech embeddings (F = input_frames)
and produce (B, n_classes) scores in [0, 1]. Everything is a pure function of
a params pytree so heads stack cleanly under vmap/pjit and many heads can be
fused into one XLA program per frame.
"""

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from openwakeword_tpu import config

EMB_DIM = config.EMB_DIM


def _linear_init(key, n_in, n_out, dtype=jnp.float32):
    # torch.nn.Linear-style uniform init: U(-1/sqrt(n_in), 1/sqrt(n_in))
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(n_in)
    return {
        "w": jax.random.uniform(kw, (n_in, n_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (n_out,), dtype, -bound, bound),
    }


def init_params(key, model_type: str = "dnn", input_frames: int = config.DEFAULT_HEAD_INPUT_FRAMES,
                n_classes: int = 1, layer_dim: int = config.DEFAULT_HEAD_WIDTH,
                n_blocks: int = 1) -> Dict:
    """Build a head params pytree with architecture metadata under '__meta__'."""
    meta = {
        "model_type": model_type,
        "input_frames": int(input_frames),
        "n_classes": int(n_classes),
        "layer_dim": int(layer_dim),
        "n_blocks": int(n_blocks),
    }
    params: Dict = {}
    n_in = input_frames * EMB_DIM
    if model_type == "dnn":
        key, k0 = jax.random.split(key)
        params["layer1"] = _linear_init(k0, n_in, layer_dim)
        params["ln1"] = {"gamma": jnp.ones((layer_dim,)), "beta": jnp.zeros((layer_dim,))}
        for i in range(n_blocks):
            key, k = jax.random.split(key)
            params[f"block{i}_fc"] = _linear_init(k, layer_dim, layer_dim)
            params[f"block{i}_ln"] = {"gamma": jnp.ones((layer_dim,)), "beta": jnp.zeros((layer_dim,))}
        key, k = jax.random.split(key)
        params["out"] = _linear_init(k, layer_dim, n_classes)
    elif model_type == "mlp":
        key, k0 = jax.random.split(key)
        params["layer1"] = _linear_init(k0, n_in, layer_dim)
        key, k1 = jax.random.split(key)
        params["layer2"] = _linear_init(k1, layer_dim, layer_dim)
        key, k = jax.random.split(key)
        params["out"] = _linear_init(k, layer_dim, n_classes)
    elif model_type == "rnn":
        hidden = 64
        for layer in range(2):
            in_dim = EMB_DIM if layer == 0 else 2 * hidden
            for direction in ("fwd", "bwd"):
                key, kih, khh = jax.random.split(key, 3)
                bound = 1.0 / np.sqrt(hidden)
                params[f"lstm{layer}_{direction}"] = {
                    "w_ih": jax.random.uniform(kih, (in_dim, 4 * hidden), jnp.float32, -bound, bound),
                    "w_hh": jax.random.uniform(khh, (hidden, 4 * hidden), jnp.float32, -bound, bound),
                    "b_ih": jnp.zeros((4 * hidden,)),
                    "b_hh": jnp.zeros((4 * hidden,)),
                }
        key, k = jax.random.split(key)
        params["out"] = _linear_init(k, 2 * hidden, n_classes)
    else:
        raise ValueError(f"Unknown head model_type: {model_type}")
    params["__meta__"] = meta
    return params


def _apply_linear(p, x, precision=None):
    if precision is None:
        precision = jax.lax.Precision.HIGHEST if p["w"].dtype == jnp.float32 else None
    return jnp.matmul(x.astype(p["w"].dtype), p["w"], precision=precision,
                      preferred_element_type=jnp.float32) + p["b"].astype(jnp.float32)


def _layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["gamma"] + p["beta"]


def _lstm_scan(p, xs, reverse=False):
    """Single-direction LSTM over (T, B, D) -> (T, B, H). torch gate order i,f,g,o."""
    hidden = p["w_hh"].shape[0]
    B = xs.shape[1]
    h0 = jnp.zeros((B, hidden), xs.dtype)
    c0 = jnp.zeros((B, hidden), xs.dtype)

    prec = jax.lax.Precision.HIGHEST if p["w_ih"].dtype == jnp.float32 else None

    def cell(carry, x_t):
        h, c = carry
        gates = (jnp.matmul(x_t.astype(p["w_ih"].dtype), p["w_ih"], precision=prec,
                            preferred_element_type=jnp.float32) + p["b_ih"]
                 + jnp.matmul(h.astype(p["w_hh"].dtype), p["w_hh"], precision=prec,
                              preferred_element_type=jnp.float32) + p["b_hh"])
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    _, hs = jax.lax.scan(cell, (h0, c0), xs, reverse=reverse)
    return hs


def apply(params: Dict, x: jnp.ndarray, inference: bool = True) -> jnp.ndarray:
    """Score a (B, F, 96) embedding window -> (B, n_classes).

    Binary heads (n_classes == 1) return sigmoid probabilities regardless of
    ``inference`` (the architecture ends in Sigmoid, reference train.py:75-83;
    the trainer's BCE consumes probabilities). For multiclass heads,
    ``inference=True`` returns softmax probabilities (matching the
    reference's export-time softmax wrapper, train.py:152-165) and
    ``inference=False`` returns the (optionally ReLU'd) logits for CE loss.
    """
    return forward(params, x, params["__meta__"], inference)


def forward(params: Dict, x: jnp.ndarray, meta: Dict, inference: bool = True,
            precision=None) -> jnp.ndarray:
    """Like ``apply`` but with the (static) architecture meta passed
    explicitly, so params can be a meta-free pytree under jit."""
    model_type, n_classes = meta["model_type"], meta["n_classes"]
    x = x.astype(jnp.float32)
    if model_type in ("dnn", "mlp"):
        h = x.reshape(x.shape[0], -1)
        if model_type == "dnn":
            h = jnp.maximum(_layer_norm(params["ln1"],
                                        _apply_linear(params["layer1"], h, precision)), 0.0)
            for i in range(meta["n_blocks"]):
                h = jnp.maximum(_layer_norm(params[f"block{i}_ln"],
                                            _apply_linear(params[f"block{i}_fc"], h, precision)), 0.0)
        else:
            h = jnp.maximum(_apply_linear(params["layer1"], h, precision), 0.0)
            h = jnp.maximum(_apply_linear(params["layer2"], h, precision), 0.0)
        logits = _apply_linear(params["out"], h, precision)
    elif model_type == "rnn":
        xs = jnp.swapaxes(x, 0, 1)  # (T, B, D)
        for layer in range(2):
            fwd = _lstm_scan(params[f"lstm{layer}_fwd"], xs)
            bwd = _lstm_scan(params[f"lstm{layer}_bwd"], xs, reverse=True)
            xs = jnp.concatenate([fwd, bwd], axis=-1)
        logits = _apply_linear(params["out"], xs[-1])
    elif model_type == "graph":
        # generic imported .onnx head: the general ONNX->XLA compiler is the
        # forward (io.onnx_import.import_graph_head_onnx). The graph carries
        # its own output activation (exported heads end in sigmoid/softmax),
        # so its first output IS the score — no activation logic below.
        if not inference:
            raise ValueError(
                "graph-imported heads are inference-only (train native "
                "dnn/mlp/rnn heads with training.HeadTrainer)")
        h = x.reshape(x.shape[0], -1) if meta["input_rank"] == 2 else x
        prog, in_name, out_name = (meta["program"], meta["input_name"],
                                   meta["output_name"])
        if meta.get("batch1_only"):
            # graphs with pinned batch dims (fixed Reshape shapes — common in
            # .tflite files, where LiteRT resizes at runtime) run per-sample
            # under vmap; XLA still fuses the batch into one program
            def one(xi):
                return jnp.asarray(
                    prog.apply(params, {in_name: xi[None]})[out_name],
                    jnp.float32).reshape(-1)
            return jax.vmap(one)(h)
        out = prog.apply(params, {in_name: h})
        scores = jnp.asarray(out[out_name], jnp.float32)
        return scores.reshape(x.shape[0], -1)
    else:
        raise ValueError(f"Unknown head model_type: {model_type}")

    if n_classes == 1:
        return jax.nn.sigmoid(logits)
    # The reference's multiclass nets apply ReLU as the last activation
    # (train.py:75) and wrap softmax at export (train.py:152-165); heads
    # trained that way carry relu_logits=True in their metadata.
    if meta.get("relu_logits", True):
        logits = jnp.maximum(logits, 0.0)
    if inference:
        return jax.nn.softmax(logits, axis=-1)
    return logits


def stack_params(params_list):
    """Stack same-architecture head param pytrees along a leading head axis,
    so N heads evaluate as single batched einsums (engine fusion)."""
    leaves = [{k: v for k, v in p.items() if k != "__meta__"} for p in params_list]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)


def forward_stacked(stacked: Dict, x: jnp.ndarray, meta: Dict,
                    inference: bool = True, precision=None) -> jnp.ndarray:
    """Evaluate H stacked dnn/mlp heads on a shared input.

    Args:
        stacked: stack_params output (leading head axis H on every leaf).
        x: (S, F, 96) embedding windows shared by all heads.
    Returns:
        (S, H, n_classes) scores.
    """
    model_type, n_classes = meta["model_type"], meta["n_classes"]
    if model_type not in ("dnn", "mlp"):
        raise ValueError(f"Stacked evaluation unsupported for '{model_type}' heads")

    def linear(p, z):
        # z: (S, H, D) or (S, D) for the first layer
        prec = precision
        if prec is None:
            prec = jax.lax.Precision.HIGHEST if p["w"].dtype == jnp.float32 else None
        w = p["w"]
        if z.ndim == 2:
            out = jnp.einsum("sd,hdw->shw", z.astype(w.dtype), w, precision=prec,
                             preferred_element_type=jnp.float32)
        else:
            out = jnp.einsum("shd,hdw->shw", z.astype(w.dtype), w, precision=prec,
                             preferred_element_type=jnp.float32)
        return out + p["b"].astype(jnp.float32)[None]

    def layer_norm(p, z, eps=1e-5):
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
        return (z - mu) * jax.lax.rsqrt(var + eps) * p["gamma"][None] + p["beta"][None]

    h = x.astype(jnp.float32).reshape(x.shape[0], -1)
    if model_type == "dnn":
        z = jnp.maximum(layer_norm(stacked["ln1"], linear(stacked["layer1"], h)), 0.0)
        i = 0
        while f"block{i}_fc" in stacked:
            z = jnp.maximum(layer_norm(stacked[f"block{i}_ln"],
                                       linear(stacked[f"block{i}_fc"], z)), 0.0)
            i += 1
    else:
        z = jnp.maximum(linear(stacked["layer1"], h), 0.0)
        z = jnp.maximum(linear(stacked["layer2"], z), 0.0)
    logits = linear(stacked["out"], z)                     # (S, H, C)

    if n_classes == 1:
        return jax.nn.sigmoid(logits)
    if meta.get("relu_logits", True):
        logits = jnp.maximum(logits, 0.0)
    if inference:
        return jax.nn.softmax(logits, axis=-1)
    return logits


def n_params(params: Dict) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(
        {k: v for k, v in params.items() if k != "__meta__"})))
