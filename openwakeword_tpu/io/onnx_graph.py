"""Compile an ONNX dataflow graph into one jitted JAX program.

The reference executes its frozen ``.onnx`` artifacts with onnxruntime
(reference openwakeword/utils.py:64-93, vad.py:60-96). The TPU-native
equivalent is to *compile the dataflow graph itself*: every node becomes a
``jnp``/``lax`` op inside a single traced function, so XLA fuses the whole
graph into one TPU program — no interpreter, no per-node dispatch, and the
float initializers become an ordinary params pytree (shardable, donatable,
convertible to bf16).

Primary consumer: Silero VAD import (reference vad.py:87-127 — a graph of
STFT-as-conv frontend, conv encoder, LSTM decoder with explicit ``h``/``c``
state I/O, and an ``If`` switch on the ``sr`` input). It is general enough to
also execute the head / embedding artifacts, which serves as the in-repo
cross-check oracle for the fast structural importers (io.onnx_import).

Execution model
---------------
Two kinds of tensor values flow through the evaluator:

- **static** (``np.ndarray``): initializers, pinned inputs (e.g. ``sr``),
  ``Constant`` outputs, ``Shape`` results (shapes are static under jit), and
  anything computed only from those. Evaluated with numpy *at trace time*,
  so shape-consuming ops (Reshape/Slice/Pad/...) always see concrete values.
- **dynamic** (jax array / tracer): graph inputs and everything downstream.

``If`` nodes whose condition is static are folded at build time by splicing
the taken branch into the node list (Silero's sample-rate switch). Dynamic
conditions are not supported (nothing in the artifact family needs them).

Float initializers are exposed as the params pytree (keys = sanitized tensor
names); integer initializers stay embedded as static constants. A program is
JSON-serializable via ``to_spec``/``from_spec`` so imported graphs round-trip
through the native ``.npz`` checkpoint format.
"""

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from openwakeword_tpu.io import onnx_proto as op

_FLOAT_DTYPES = (np.float32, np.float64, np.float16)

# ONNX TensorProto dtype codes -> numpy dtypes (for Cast / ConstantOfShape)
_CAST_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 5: np.int16,
                6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16,
                11: np.float64, 12: np.uint32, 13: np.uint64}


def _is_static(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic, int, float, bool))


def _xp(vals):
    return np if all(_is_static(v) for v in vals) else jnp


def _attr(node, name, default=None):
    a = node["attributes"].get(name)
    if a is None:
        return default
    for k in ("i", "f", "ints", "floats", "t", "g", "graphs", "strings"):
        if k in a:
            return a[k]
    if "s" in a:
        return a["s"].decode() if isinstance(a["s"], bytes) else a["s"]
    return default


def _concrete(v, what: str):
    """Shape-slot arguments must be host-concrete."""
    if not _is_static(v):
        raise ValueError(
            f"ONNX program: {what} must be statically computable, got a "
            f"traced value. (Dynamic shapes are unsupported on TPU.)")
    return np.asarray(v)


# ---------------------------------------------------------------------------
# Op implementations. Each takes (node, vals) where vals are the resolved
# input values (None for omitted optional inputs) and returns a list of
# outputs aligned with node["output"].
# ---------------------------------------------------------------------------

def _binop(fn):
    def impl(node, vals):
        return [fn(_xp(vals), vals[0], vals[1])]
    return impl


def _unop(fn):
    def impl(node, vals):
        return [fn(_xp(vals), vals[0])]
    return impl


def _op_gemm(node, vals):
    a, b = vals[0], vals[1]
    alpha = _attr(node, "alpha", 1.0)
    beta = _attr(node, "beta", 1.0)
    if _attr(node, "transA", 0):
        a = a.T
    if _attr(node, "transB", 0):
        b = b.T
    y = jnp.matmul(a, b) * alpha
    if len(vals) > 2 and vals[2] is not None:
        y = y + beta * vals[2]
    return [y]


def _conv_padding(node, spatial_rank, lhs_shape, rhs_shape, strides, dilations):
    pads = _attr(node, "pads")
    auto = _attr(node, "auto_pad", "NOTSET")
    if pads is not None:
        return [(int(pads[i]), int(pads[i + spatial_rank])) for i in range(spatial_rank)]
    if auto in ("NOTSET", "VALID"):
        return [(0, 0)] * spatial_rank
    # SAME_UPPER / SAME_LOWER
    out = []
    for i in range(spatial_rank):
        in_dim = lhs_shape[2 + i]
        k = (rhs_shape[2 + i] - 1) * dilations[i] + 1
        out_dim = -(-in_dim // strides[i])
        total = max(0, (out_dim - 1) * strides[i] + k - in_dim)
        lo = total // 2 if auto == "SAME_UPPER" else total - total // 2
        out.append((lo, total - lo))
    return out


def _op_conv(node, vals):
    x, w = vals[0], vals[1]
    b = vals[2] if len(vals) > 2 else None
    rank = x.ndim - 2                       # spatial rank (1 or 2)
    strides = tuple(_attr(node, "strides", [1] * rank))
    dilations = tuple(_attr(node, "dilations", [1] * rank))
    group = int(_attr(node, "group", 1))
    padding = _conv_padding(node, rank, x.shape, w.shape, strides, dilations)
    spatial = "DHW"[3 - rank:] if rank <= 3 else None
    dn = ("NC" + spatial, "OI" + spatial, "NC" + spatial)
    y = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), window_strides=strides, padding=padding,
        rhs_dilation=dilations, dimension_numbers=dn, feature_group_count=group,
        precision=lax.Precision.HIGHEST)
    if b is not None:
        y = y + jnp.asarray(b).reshape((1, -1) + (1,) * rank)
    return [y]


def _op_convtranspose(node, vals):
    """ConvTranspose as a fractionally-strided conv (lhs_dilation) with the
    spatially-flipped, group-rearranged kernel. W: (Cin, Cout/g, *k);
    supports strides/pads/output_padding/output_shape/dilations/group."""
    x, w = jnp.asarray(vals[0]), jnp.asarray(vals[1])
    b = vals[2] if len(vals) > 2 and vals[2] is not None else None
    rank = x.ndim - 2
    strides = tuple(_attr(node, "strides", [1] * rank))
    dilations = tuple(_attr(node, "dilations", [1] * rank))
    group = int(_attr(node, "group", 1))
    auto_pad = _attr(node, "auto_pad", "NOTSET")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if auto_pad not in ("NOTSET", ""):
        raise NotImplementedError(
            f"ONNX ConvTranspose auto_pad={auto_pad!r} is not supported")
    pads = list(_attr(node, "pads", [0] * (2 * rank)))
    out_pad = list(_attr(node, "output_padding", [0] * rank))
    kdims = [int((w.shape[2 + i] - 1) * dilations[i] + 1) for i in range(rank)]
    out_shape = _attr(node, "output_shape")
    if out_shape is not None:
        # spec: total_padding = stride*(in-1) + out_pad + k_eff - out_shape,
        # split begin/end (begin gets the smaller half by default)
        for i in range(rank):
            total = (strides[i] * (x.shape[2 + i] - 1) + out_pad[i]
                     + kdims[i] - int(out_shape[i]))
            pads[i] = total // 2
            pads[rank + i] = total - total // 2
    cin, cout_g = int(w.shape[0]), int(w.shape[1])
    spatial_axes = tuple(range(2, 2 + rank))
    wk = jnp.flip(w, axis=spatial_axes)
    wk = wk.reshape((group, cin // group, cout_g) + w.shape[2:])
    wk = jnp.moveaxis(wk, 2, 1).reshape((group * cout_g, cin // group)
                                        + w.shape[2:])
    padding = [(kdims[i] - 1 - pads[i],
                kdims[i] - 1 - pads[rank + i] + out_pad[i])
               for i in range(rank)]
    spatial = "DHW"[3 - rank:]
    dn = ("NC" + spatial, "OI" + spatial, "NC" + spatial)
    y = lax.conv_general_dilated(
        x, wk, window_strides=(1,) * rank, padding=padding,
        lhs_dilation=strides, rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=group, precision=lax.Precision.HIGHEST)
    if b is not None:
        y = y + jnp.asarray(b).reshape((1, -1) + (1,) * rank)
    return [y]


def _resize_axis(x, axis, out_size, scale, mode, coord, nearest_mode):
    """One separable resize axis. ``scale`` is the spec's coordinate-map
    scale: the explicit scales[] entry when the graph provides scales,
    out/in when it provides sizes (they differ when floor(in*scale) !=
    in*scale)."""
    in_size = x.shape[axis]
    if out_size == in_size and scale == 1.0:
        return x
    idx = jnp.arange(out_size, dtype=jnp.float32)
    if coord == "half_pixel":
        xo = (idx + 0.5) / scale - 0.5
    elif coord == "asymmetric":
        xo = idx / scale
    elif coord == "align_corners":
        xo = idx * ((in_size - 1) / max(out_size - 1, 1))
    elif coord == "pytorch_half_pixel":
        xo = ((idx + 0.5) / scale - 0.5) if out_size > 1 \
            else jnp.zeros_like(idx)
    else:
        raise NotImplementedError(
            f"ONNX Resize coordinate_transformation_mode={coord!r}")
    if mode == "nearest":
        j = {"floor": jnp.floor, "ceil": jnp.ceil,
             "round_prefer_ceil": lambda v: jnp.floor(v + 0.5),
             "round_prefer_floor": lambda v: jnp.ceil(v - 0.5)}[nearest_mode](xo)
        j = jnp.clip(j, 0, in_size - 1).astype(jnp.int32)
        return jnp.take(x, j, axis=axis)
    x0 = jnp.clip(jnp.floor(xo), 0, in_size - 1)
    x1 = jnp.clip(x0 + 1, 0, in_size - 1)
    w1 = jnp.clip(xo - x0, 0.0, 1.0)
    g0 = jnp.take(x, x0.astype(jnp.int32), axis=axis)
    g1 = jnp.take(x, x1.astype(jnp.int32), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = w1.reshape(shape)
    return g0 * (1.0 - w1) + g1 * w1


def _op_resize(node, vals):
    """Resize (nearest/linear, separable per axis) with static
    scales/sizes. Opset 11+ input order: X, roi, scales, sizes."""
    x = jnp.asarray(vals[0])
    mode = _attr(node, "mode", "nearest")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    if mode not in ("nearest", "linear"):
        raise NotImplementedError(f"ONNX Resize mode={mode!r}")
    coord = _attr(node, "coordinate_transformation_mode", "half_pixel")
    coord = coord.decode() if isinstance(coord, bytes) else coord
    nearest_mode = _attr(node, "nearest_mode", "round_prefer_floor")
    nearest_mode = nearest_mode.decode() \
        if isinstance(nearest_mode, bytes) else nearest_mode
    if _attr(node, "antialias", 0):
        raise NotImplementedError("ONNX Resize with antialias=1")
    if _attr(node, "exclude_outside", 0):
        raise NotImplementedError("ONNX Resize with exclude_outside=1")
    scales = vals[2] if len(vals) > 2 and vals[2] is not None else None
    sizes = vals[3] if len(vals) > 3 and vals[3] is not None else None
    if scales is not None and np.asarray(scales).size == 0:
        scales = None
    if sizes is not None:
        out_sizes = [int(s) for s in _concrete(sizes, "Resize sizes")]
        sc = [out_sizes[i] / x.shape[i] for i in range(len(out_sizes))]
    elif scales is not None:
        sc = [float(s) for s in
              np.asarray(_concrete(scales, "Resize scales"), np.float64)]
        out_sizes = [int(np.floor(x.shape[i] * sc[i]))
                     for i in range(len(sc))]
    else:
        raise ValueError("ONNX Resize needs scales or sizes")
    if len(out_sizes) != x.ndim:
        raise NotImplementedError(
            f"ONNX Resize with axes subset (got {len(out_sizes)} sizes "
            f"for rank {x.ndim})")
    for ax in range(x.ndim):
        x = _resize_axis(x, ax, out_sizes[ax], sc[ax], mode, coord,
                         nearest_mode)
    return [x]


def _op_topk(node, vals):
    x = jnp.asarray(vals[0])
    k = int(_concrete(vals[1], "TopK k").reshape(()))
    axis = int(_attr(node, "axis", -1)) % x.ndim
    if not _attr(node, "sorted", 1):
        raise NotImplementedError("ONNX TopK with sorted=0")
    xm = jnp.moveaxis(x, axis, -1)
    if _attr(node, "largest", 1):
        v, i = lax.top_k(xm, k)
    else:
        v, i = lax.top_k(-xm, k)
        v = -v
    return [jnp.moveaxis(v, -1, axis), jnp.moveaxis(i, -1, axis)]


def _op_depthtospace(node, vals):
    x = jnp.asarray(vals[0])
    bs = int(_attr(node, "blocksize"))
    mode = _attr(node, "mode", "DCR")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    n, c, h, w = x.shape
    if mode == "DCR":
        y = x.reshape(n, bs, bs, c // (bs * bs), h, w)
        y = y.transpose(0, 3, 4, 1, 5, 2)
    elif mode == "CRD":
        y = x.reshape(n, c // (bs * bs), bs, bs, h, w)
        y = y.transpose(0, 1, 4, 2, 5, 3)
    else:
        raise NotImplementedError(f"ONNX DepthToSpace mode={mode!r}")
    return [y.reshape(n, c // (bs * bs), h * bs, w * bs)]


def _op_spacetodepth(node, vals):
    x = jnp.asarray(vals[0])
    bs = int(_attr(node, "blocksize"))
    n, c, h, w = x.shape
    y = x.reshape(n, c, h // bs, bs, w // bs, bs)
    y = y.transpose(0, 3, 5, 1, 2, 4)
    return [y.reshape(n, c * bs * bs, h // bs, w // bs)]


def _op_batchnorm(node, vals):
    x, scale, bias, mean, var = vals[:5]
    eps = _attr(node, "epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = scale / np.sqrt(np.asarray(var) + eps) if _is_static(var) and _is_static(scale) \
        else scale * lax.rsqrt(jnp.asarray(var) + eps)
    return [x * jnp.reshape(jnp.asarray(inv), shape)
            + jnp.reshape(jnp.asarray(bias) - jnp.asarray(mean) * jnp.asarray(inv), shape)]


def _op_lstm(node, vals):
    """ONNX LSTM (layout=0, gate order iofc, default activations).

    X: (T, B, I); W: (D, 4H, I); R: (D, 4H, H); B: (D, 8H);
    initial_h/c: (D, B, H); P: (D, 3H) peepholes (order Pi, Po, Pf).
    Supports the `clip` (pre-activation bound) and `input_forget`
    (f = 1 - i coupling) attributes. Outputs Y (T, D, B, H), Y_h, Y_c
    (D, B, H).
    """
    x, w, r = vals[0], jnp.asarray(vals[1]), jnp.asarray(vals[2])
    hidden = int(_attr(node, "hidden_size", r.shape[-1]))
    direction = _attr(node, "direction", "forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    if _attr(node, "activations") is not None:
        acts = [a.decode() if isinstance(a, bytes) else a for a in _attr(node, "activations")]
        if [a.lower() for a in acts] not in (["sigmoid", "tanh", "tanh"],
                                             ["sigmoid", "tanh", "tanh"] * 2):
            raise NotImplementedError(f"ONNX LSTM custom activations {acts}")
    n_dirs = {"forward": 1, "reverse": 1, "bidirectional": 2}[direction]
    b = vals[3] if len(vals) > 3 and vals[3] is not None else np.zeros((n_dirs, 8 * hidden), np.float32)
    if len(vals) > 4 and vals[4] is not None:
        seq_lens = _concrete(vals[4], "LSTM sequence_lens")
        if not np.all(seq_lens == x.shape[0]):
            raise NotImplementedError("ONNX LSTM with ragged sequence_lens")
    batch = x.shape[1]
    h0 = vals[5] if len(vals) > 5 and vals[5] is not None else jnp.zeros((n_dirs, batch, hidden), x.dtype)
    c0 = vals[6] if len(vals) > 6 and vals[6] is not None else jnp.zeros((n_dirs, batch, hidden), x.dtype)
    # P: peephole weights (D, 3H) in ONNX order Pi, Po, Pf — diagonal
    # contributions of the cell state to the i/f gates (C_{t-1}) and the
    # o gate (C_t)
    p = jnp.asarray(vals[7]) if len(vals) > 7 and vals[7] is not None else None
    # clip: bounds every pre-activation gate value to [-clip, clip]
    # ("applied to the input of activations")
    clip_v = _attr(node, "clip", None)
    clip_v = float(clip_v) if clip_v is not None else None
    # input_forget=1 couples the gates: f_t = 1 - i_t (post-activation)
    input_forget = bool(_attr(node, "input_forget", 0))
    x, h0, c0, b = jnp.asarray(x), jnp.asarray(h0), jnp.asarray(c0), jnp.asarray(b)

    def run_dir(xs, wd, rd, bd, pd, h_init, c_init):
        wb, rb = bd[: 4 * hidden], bd[4 * hidden:]
        w_t, r_t = wd.T, rd.T                      # (I, 4H), (H, 4H)
        bias = wb + rb
        if pd is not None:
            p_i, p_o, p_f = (pd[:hidden], pd[hidden:2 * hidden],
                             pd[2 * hidden:])

        def pre(v):
            return jnp.clip(v, -clip_v, clip_v) if clip_v is not None else v

        def step(carry, x_t):
            h, c = carry
            gates = (jnp.matmul(x_t, w_t, precision=lax.Precision.HIGHEST)
                     + jnp.matmul(h, r_t, precision=lax.Precision.HIGHEST) + bias)
            i, o, f, g = jnp.split(gates, 4, axis=-1)     # ONNX order: iofc
            if pd is not None:
                i = i + p_i * c
                f = f + p_f * c
            i_act = jax.nn.sigmoid(pre(i))
            f_act = 1.0 - i_act if input_forget else jax.nn.sigmoid(pre(f))
            c_new = f_act * c + i_act * jnp.tanh(pre(g))
            if pd is not None:
                o = o + p_o * c_new
            h_new = jax.nn.sigmoid(pre(o)) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        (h_fin, c_fin), ys = lax.scan(step, (h_init, c_init), xs)
        return ys, h_fin, c_fin

    ys_f, h_f, c_f = run_dir(x if direction != "reverse" else x[::-1],
                             w[0], r[0], b[0], None if p is None else p[0],
                             h0[0], c0[0])
    if direction == "reverse":
        ys_f = ys_f[::-1]
    if direction == "bidirectional":
        ys_b, h_b, c_b = run_dir(x[::-1], w[1], r[1], b[1],
                                 None if p is None else p[1], h0[1], c0[1])
        y = jnp.stack([ys_f, ys_b[::-1]], axis=1)          # (T, 2, B, H)
        y_h = jnp.stack([h_f, h_b])
        y_c = jnp.stack([c_f, c_b])
    else:
        y = ys_f[:, None]                                  # (T, 1, B, H)
        y_h, y_c = h_f[None], c_f[None]
    outs = [y, y_h, y_c]
    return outs[:max(1, len(node["output"]))]


def _op_gru(node, vals):
    """ONNX GRU (layout=0, gate order zrh, default activations).

    X: (T, B, I); W: (D, 3H, I); R: (D, 3H, H); B: (D, 6H).
    Supports `linear_before_reset` and the `clip` pre-activation bound.
    Outputs Y (T, D, B, H), Y_h (D, B, H).
    """
    x, w, r = vals[0], jnp.asarray(vals[1]), jnp.asarray(vals[2])
    hidden = int(_attr(node, "hidden_size", r.shape[-1]))
    direction = _attr(node, "direction", "forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    if _attr(node, "activations") is not None:
        acts = [a.decode() if isinstance(a, bytes) else a
                for a in _attr(node, "activations")]
        if [a.lower() for a in acts] not in (["sigmoid", "tanh"],
                                             ["sigmoid", "tanh"] * 2):
            raise NotImplementedError(f"ONNX GRU custom activations {acts}")
    n_dirs = {"forward": 1, "reverse": 1, "bidirectional": 2}[direction]
    b = vals[3] if len(vals) > 3 and vals[3] is not None \
        else np.zeros((n_dirs, 6 * hidden), np.float32)
    if len(vals) > 4 and vals[4] is not None:
        seq_lens = _concrete(vals[4], "GRU sequence_lens")
        if not np.all(seq_lens == x.shape[0]):
            raise NotImplementedError("ONNX GRU with ragged sequence_lens")
    batch = x.shape[1]
    h0 = vals[5] if len(vals) > 5 and vals[5] is not None \
        else jnp.zeros((n_dirs, batch, hidden), x.dtype)
    clip_v = _attr(node, "clip", None)
    clip_v = float(clip_v) if clip_v is not None else None
    lbr = bool(_attr(node, "linear_before_reset", 0))
    x, h0, b = jnp.asarray(x), jnp.asarray(h0), jnp.asarray(b)

    def run_dir(xs, wd, rd, bd, h_init):
        wb, rb = bd[: 3 * hidden], bd[3 * hidden:]
        w_t = wd.T                                  # (I, 3H)
        rzr_t = rd[: 2 * hidden].T                  # (H, 2H) — z, r gates
        rh_t = rd[2 * hidden:].T                    # (H, H)  — h candidate
        rbh = rb[2 * hidden:]

        def pre(v):
            return jnp.clip(v, -clip_v, clip_v) if clip_v is not None else v

        def step(h, x_t):
            gx = jnp.matmul(x_t, w_t, precision=lax.Precision.HIGHEST) + wb
            zr = (gx[..., : 2 * hidden]
                  + jnp.matmul(h, rzr_t, precision=lax.Precision.HIGHEST)
                  + rb[: 2 * hidden])
            z, rg = jnp.split(zr, 2, axis=-1)
            z = jax.nn.sigmoid(pre(z))
            rg = jax.nn.sigmoid(pre(rg))
            hx = gx[..., 2 * hidden:]
            if lbr:    # ht = g(Xt·Wh + rt ⊙ (Ht-1·Rh + Rbh) + Wbh)
                hh = hx + rg * (jnp.matmul(
                    h, rh_t, precision=lax.Precision.HIGHEST) + rbh)
            else:      # ht = g(Xt·Wh + (rt ⊙ Ht-1)·Rh + Rbh + Wbh)
                hh = hx + jnp.matmul(
                    rg * h, rh_t, precision=lax.Precision.HIGHEST) + rbh
            h_new = (1.0 - z) * jnp.tanh(pre(hh)) + z * h
            return h_new, h_new

        h_fin, ys = lax.scan(step, h_init, xs)
        return ys, h_fin

    ys_f, h_f = run_dir(x if direction != "reverse" else x[::-1],
                        w[0], r[0], b[0], h0[0])
    if direction == "reverse":
        ys_f = ys_f[::-1]
    if direction == "bidirectional":
        ys_b, h_b = run_dir(x[::-1], w[1], r[1], b[1], h0[1])
        y = jnp.stack([ys_f, ys_b[::-1]], axis=1)          # (T, 2, B, H)
        y_h = jnp.stack([h_f, h_b])
    else:
        y = ys_f[:, None]                                  # (T, 1, B, H)
        y_h = h_f[None]
    outs = [y, y_h]
    return outs[:max(1, len(node["output"]))]


def _op_rnn(node, vals):
    """ONNX RNN (vanilla Elman cell, layout=0).

    X: (T, B, I); W: (D, H, I); R: (D, H, H); B: (D, 2H).
    ``h_t = f(X_t·W^T + Wb + h_{t-1}·R^T + Rb)`` with the ``clip``
    pre-activation bound; f defaults to Tanh (Relu/Sigmoid accepted).
    Outputs Y (T, D, B, H), Y_h (D, B, H).
    """
    x, w, r = vals[0], jnp.asarray(vals[1]), jnp.asarray(vals[2])
    hidden = int(_attr(node, "hidden_size", r.shape[-1]))
    direction = _attr(node, "direction", "forward")
    if isinstance(direction, bytes):
        direction = direction.decode()
    n_dirs = {"forward": 1, "reverse": 1, "bidirectional": 2}[direction]
    acts = _attr(node, "activations") or ["Tanh"] * n_dirs
    acts = [a.decode() if isinstance(a, bytes) else a for a in acts]
    fns = {"tanh": jnp.tanh, "relu": lambda v: jnp.maximum(v, 0.0),
           "sigmoid": jax.nn.sigmoid}
    if any(a.lower() not in fns for a in acts):
        raise NotImplementedError(f"ONNX RNN activations {acts}")
    if len({a.lower() for a in acts}) != 1:
        raise NotImplementedError(
            f"ONNX RNN with per-direction activations {acts}")
    f = fns[acts[0].lower()]
    b = vals[3] if len(vals) > 3 and vals[3] is not None \
        else np.zeros((n_dirs, 2 * hidden), np.float32)
    if len(vals) > 4 and vals[4] is not None:
        seq_lens = _concrete(vals[4], "RNN sequence_lens")
        if not np.all(seq_lens == x.shape[0]):
            raise NotImplementedError("ONNX RNN with ragged sequence_lens")
    batch = x.shape[1]
    h0 = vals[5] if len(vals) > 5 and vals[5] is not None \
        else jnp.zeros((n_dirs, batch, hidden), x.dtype)
    clip_v = _attr(node, "clip", None)
    clip_v = float(clip_v) if clip_v is not None else None
    x, h0, b = jnp.asarray(x), jnp.asarray(h0), jnp.asarray(b)

    def run_dir(xs, wd, rd, bd, h_init):
        bias = bd[:hidden] + bd[hidden:]
        pre_x = jnp.einsum("tbi,hi->tbh", xs, wd,
                           precision=lax.Precision.HIGHEST) + bias
        r_t = rd.T

        def step(h, px):
            z = px + jnp.matmul(h, r_t, precision=lax.Precision.HIGHEST)
            if clip_v is not None:
                z = jnp.clip(z, -clip_v, clip_v)
            h_new = f(z)
            return h_new, h_new

        h_fin, ys = lax.scan(step, h_init, pre_x)
        return ys, h_fin

    ys_f, h_f = run_dir(x if direction != "reverse" else x[::-1],
                        w[0], r[0], b[0], h0[0])
    if direction == "reverse":
        ys_f = ys_f[::-1]
    if direction == "bidirectional":
        ys_b, h_b = run_dir(x[::-1], w[1], r[1], b[1], h0[1])
        y = jnp.stack([ys_f, ys_b[::-1]], axis=1)          # (T, 2, B, H)
        y_h = jnp.stack([h_f, h_b])
    else:
        y = ys_f[:, None]                                  # (T, 1, B, H)
        y_h = h_f[None]
    outs = [y, y_h]
    return outs[:max(1, len(node["output"]))]


def _pool_common(node, x, reducer, init):
    if _attr(node, "ceil_mode", 0):
        raise NotImplementedError("Pool with ceil_mode=1 is not supported")
    rank = x.ndim - 2
    kernel = tuple(_attr(node, "kernel_shape"))
    strides = tuple(_attr(node, "strides", [1] * rank))
    padding = _conv_padding(node, rank, x.shape,
                            (0, 0) + kernel, strides, (1,) * rank)
    dims = (1, 1) + kernel
    strd = (1, 1) + strides
    pads = ((0, 0), (0, 0)) + tuple(padding)
    return lax.reduce_window(jnp.asarray(x), init, reducer, dims, strd, pads)


def _op_maxpool(node, vals):
    return [_pool_common(node, vals[0], lax.max, -jnp.inf)]


def _op_avgpool(node, vals):
    x = vals[0]
    summed = _pool_common(node, x, lax.add, 0.0)
    if _attr(node, "count_include_pad", 0):
        denom = float(np.prod(_attr(node, "kernel_shape")))
        return [summed / denom]
    counts = _pool_common(node, jnp.ones_like(jnp.asarray(x)), lax.add, 0.0)
    return [summed / counts]


def _op_slice(node, vals):
    x = vals[0]
    if len(vals) > 1:                       # opset >= 10: runtime inputs
        starts = _concrete(vals[1], "Slice starts")
        ends = _concrete(vals[2], "Slice ends")
        axes = _concrete(vals[3], "Slice axes") if len(vals) > 3 and vals[3] is not None \
            else np.arange(len(starts))
        steps = _concrete(vals[4], "Slice steps") if len(vals) > 4 and vals[4] is not None \
            else np.ones(len(starts), np.int64)
    else:                                   # opset 1: attributes
        starts = np.asarray(_attr(node, "starts"))
        ends = np.asarray(_attr(node, "ends"))
        axes = np.asarray(_attr(node, "axes", list(range(len(starts)))))
        steps = np.ones(len(starts), np.int64)
    slices = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts.tolist(), ends.tolist(), axes.tolist(), steps.tolist()):
        a = a % x.ndim
        dim = x.shape[a]
        # ONNX clamps INT_MAX-ish sentinels to the dim bounds
        s_c = max(-dim, min(int(s), dim))
        e_c = max(-dim - 1, min(int(e), dim))
        slices[a] = slice(s_c, e_c, int(st))
    return [x[tuple(slices)]]


def _op_split(node, vals):
    x = vals[0]
    axis = int(_attr(node, "axis", 0))
    n_out = len(node["output"])
    if len(vals) > 1 and vals[1] is not None:
        sizes = _concrete(vals[1], "Split sizes").tolist()
    else:
        sizes = _attr(node, "split")
        if sizes is None:
            base = x.shape[axis] // n_out
            sizes = [base] * n_out
    idx = np.cumsum(sizes)[:-1].tolist()
    return list(_xp([x]).split(x, idx, axis=axis))


def _op_pad(node, vals):
    x = vals[0]
    mode = _attr(node, "mode", "constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if len(vals) > 1 and vals[1] is not None:
        pads = _concrete(vals[1], "Pad pads").astype(np.int64)
    else:
        pads = np.asarray(_attr(node, "pads"), np.int64)
    cval = 0.0
    if len(vals) > 2 and vals[2] is not None:
        cval = float(_concrete(vals[2], "Pad value"))
    rank = x.ndim
    axes = (_concrete(vals[3], "Pad axes").tolist()
            if len(vals) > 3 and vals[3] is not None else list(range(rank)))
    width = [(0, 0)] * rank
    half = len(pads) // 2
    for i, a in enumerate(axes):
        width[a % rank] = (int(pads[i]), int(pads[half + i]))
    xp = _xp([x])
    if mode == "constant":
        return [xp.pad(x, width, constant_values=cval)]
    return [xp.pad(x, width, mode={"reflect": "reflect", "edge": "edge"}[mode])]


def _op_reshape(node, vals):
    shape = _concrete(vals[1], "Reshape shape").astype(np.int64).copy()
    x = vals[0]
    for i, d in enumerate(shape):
        if d == 0 and not _attr(node, "allowzero", 0):
            shape[i] = x.shape[i]
    return [_xp([x]).reshape(x, tuple(int(d) for d in shape))]


def _axes_arg(node, vals, idx=1):
    if len(vals) > idx and vals[idx] is not None:
        return _concrete(vals[idx], "axes").tolist()
    a = _attr(node, "axes")
    return list(a) if a is not None else None


def _op_squeeze(node, vals):
    x = vals[0]
    axes = _axes_arg(node, vals)
    if axes is None:
        axes = [i for i, d in enumerate(x.shape) if d == 1]
    return [_xp([x]).squeeze(x, axis=tuple(a % x.ndim for a in axes))]


def _op_unsqueeze(node, vals):
    x = vals[0]
    axes = sorted(a % (x.ndim + len(_axes_arg(node, vals))) for a in _axes_arg(node, vals))
    for a in axes:
        x = _xp([x]).expand_dims(x, a)
    return [x]


def _op_reduce(fn_name):
    def impl(node, vals):
        x = vals[0]
        axes = _axes_arg(node, vals)
        keep = bool(_attr(node, "keepdims", 1))
        xp = _xp([x])
        fn = getattr(xp, fn_name)
        # ONNX Reduce*: an absent OR zero-length axes spec means "all axes"
        # unless noop_with_empty_axes=1, which makes the node an identity
        if axes is None or len(axes) == 0:
            if _attr(node, "noop_with_empty_axes", 0):
                return [x]
            ax = None
        else:
            ax = tuple(a % x.ndim for a in axes)
        return [fn(x, axis=ax, keepdims=keep)]
    return impl


def _op_reduce_comp(kind):
    """Composite Reduce* (L1/L2/LogSum/LogSumExp/SumSquare) with the same
    absent/empty-axes semantics as _op_reduce."""
    def impl(node, vals):
        x = jnp.asarray(vals[0])
        axes = _axes_arg(node, vals)
        keep = bool(_attr(node, "keepdims", 1))
        if axes is None or len(axes) == 0:
            if _attr(node, "noop_with_empty_axes", 0):
                return [vals[0]]
            ax = None
        else:
            ax = tuple(a % x.ndim for a in axes)
        if kind == "L1":
            r = jnp.sum(jnp.abs(x), axis=ax, keepdims=keep)
        elif kind == "L2":
            r = jnp.sqrt(jnp.sum(x * x, axis=ax, keepdims=keep))
        elif kind == "LogSum":
            r = jnp.log(jnp.sum(x, axis=ax, keepdims=keep))
        elif kind == "LogSumExp":
            r = jax.scipy.special.logsumexp(x, axis=ax, keepdims=keep)
        else:                                        # SumSquare
            r = jnp.sum(x * x, axis=ax, keepdims=keep)
        return [r]
    return impl


def _op_argminmax(kind):
    def impl(node, vals):
        x = jnp.asarray(vals[0])
        axis = int(_attr(node, "axis", 0))
        if _attr(node, "select_last_index", 0):
            raise NotImplementedError(f"ONNX {kind} with select_last_index=1")
        # ONNX specifies int64 indices; under x32 JAX these trace as int32,
        # which every index consumer (Gather/Slice/Cast) accepts
        r = (jnp.argmax if kind == "ArgMax" else jnp.argmin)(x, axis=axis)
        return [jnp.expand_dims(r, axis) if _attr(node, "keepdims", 1) else r]
    return impl


def _op_gelu(node, vals):
    approx = _attr(node, "approximate", "none")
    if isinstance(approx, bytes):
        approx = approx.decode()
    return [jax.nn.gelu(jnp.asarray(vals[0]), approximate=approx == "tanh")]


def _op_instancenorm(node, vals):
    """InstanceNormalization: per-(N, C) normalization over the spatial
    dims; scale/B are per-channel (C,)."""
    x = jnp.asarray(vals[0])
    scale, b = jnp.asarray(vals[1]), jnp.asarray(vals[2])
    eps = float(_attr(node, "epsilon", 1e-5))
    ax = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=ax, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=ax, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return [scale.reshape(shape) * (x - mean)
            * lax.rsqrt(var + eps) + b.reshape(shape)]


def _op_cast(node, vals):
    to = _CAST_DTYPES[int(_attr(node, "to"))]
    v = vals[0]
    return [v.astype(to) if hasattr(v, "astype") else np.asarray(v, to)]


def _op_constantofshape(node, vals):
    shape = _concrete(vals[0], "ConstantOfShape shape").astype(np.int64)
    t = _attr(node, "value")
    fill = t["array"].reshape(-1)[0] if t is not None else np.float32(0)
    return [np.full(tuple(int(d) for d in shape), fill)]


def _op_constant(node, vals):
    a = node["attributes"]
    if "value" in a:
        return [np.asarray(a["value"]["t"]["array"])]
    for k, cast in (("value_float", np.float32), ("value_int", np.int64)):
        if k in a:
            return [np.asarray(_attr(node, k), cast)]
    if "value_floats" in a:
        return [np.asarray(a["value_floats"]["floats"], np.float32)]
    if "value_ints" in a:
        return [np.asarray(a["value_ints"]["ints"], np.int64)]
    raise ValueError("Constant node without a supported value attribute")


def _op_expand(node, vals):
    shape = _concrete(vals[1], "Expand shape").astype(np.int64)
    x = vals[0]
    target = list(shape)
    # ONNX Expand: result shape is the broadcast of x.shape and shape
    xp = _xp([vals[0]])
    return [xp.broadcast_to(x, np.broadcast_shapes(tuple(x.shape), tuple(int(d) for d in target)))]


def _op_gather(node, vals):
    x, idx = vals
    axis = int(_attr(node, "axis", 0))
    xp = _xp(vals)
    return [xp.take(x, np.asarray(idx) if _is_static(idx) else idx, axis=axis)]


def _op_clip(node, vals):
    x = vals[0]
    lo = vals[1] if len(vals) > 1 and vals[1] is not None else _attr(node, "min")
    hi = vals[2] if len(vals) > 2 and vals[2] is not None else _attr(node, "max")
    xp = _xp([x])
    if lo is not None:
        x = xp.maximum(x, lo)
    if hi is not None:
        x = xp.minimum(x, hi)
    return [x]


def _op_softmax(node, vals):
    axis = int(_attr(node, "axis", -1))
    return [jax.nn.softmax(jnp.asarray(vals[0]), axis=axis)]


def _op_flatten(node, vals):
    x = vals[0]
    axis = int(_attr(node, "axis", 1)) % (x.ndim + 1)
    lead = int(np.prod(x.shape[:axis])) if axis else 1
    return [_xp([x]).reshape(x, (lead, -1))]


def _op_transpose(node, vals):
    perm = _attr(node, "perm")
    x = vals[0]
    if perm is None:
        perm = list(range(x.ndim))[::-1]
    return [_xp([x]).transpose(x, tuple(perm))]


def _op_layernorm(node, vals):
    x, scale = vals[0], vals[1]
    bias = vals[2] if len(vals) > 2 else None
    # ONNX LayerNormalization normalizes over ALL dims [axis, rank) -- not
    # just the one `axis` dim (they coincide only for axis=-1)
    axis = int(_attr(node, "axis", -1)) % x.ndim
    red = tuple(range(axis, x.ndim))
    eps = _attr(node, "epsilon", 1e-5)
    mean = jnp.mean(x, axis=red, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=red, keepdims=True)
    inv = lax.rsqrt(var + eps)
    y = (x - mean) * inv * scale
    if bias is not None:
        y = y + bias
    outs = [y, mean, inv]                   # optional Mean / InvStdDev outputs
    return outs[:max(1, len(node["output"]))]


def _qdq_reshape(s, x, axis):
    """Per-axis scale/zero_point -> broadcastable shape (QuantizeLinear /
    DequantizeLinear `axis` attribute; scalar passes through)."""
    arr = np.asarray(s) if _is_static(s) else s
    if getattr(arr, "ndim", 0) == 0 or arr.size == 1:
        return arr.reshape(()) if hasattr(arr, "reshape") else arr
    if arr.ndim > 1:
        raise NotImplementedError(
            "ONNX program: blocked quantization (multi-dim scale) is "
            "unsupported; only per-tensor and per-axis QDQ execute")
    shape = [1] * x.ndim
    shape[axis % x.ndim] = arr.shape[0]
    return arr.reshape(shape)


def _op_quantizelinear(node, vals):
    """Exact ONNX semantics: saturate(round_half_even(x/scale) + zp) in the
    zero_point's integer dtype (uint8 when zp is omitted)."""
    x, scale = vals[0], vals[1]
    zp = vals[2] if len(vals) > 2 else None
    axis = int(_attr(node, "axis", 1))
    qdt = np.asarray(_concrete(zp, "QuantizeLinear zero_point")).dtype \
        if zp is not None else np.dtype(np.uint8)
    info = np.iinfo(qdt)
    s = _qdq_reshape(scale, x, axis)
    xp = _xp([x, scale])
    q = xp.round(x.astype(np.float32) / s if xp is np
                 else jnp.asarray(x, jnp.float32) / jnp.asarray(s))
    if zp is not None:
        q = q + _qdq_reshape(zp, x, axis).astype(np.float32)
    return [xp.clip(q, info.min, info.max).astype(qdt)]


def _op_dequantizelinear(node, vals):
    """(x - zero_point) * scale, per-axis when scale is 1-D."""
    x, scale = vals[0], vals[1]
    zp = vals[2] if len(vals) > 2 else None
    axis = int(_attr(node, "axis", 1))
    xp = _xp([x, scale])
    xf = x.astype(np.float32) if xp is np else jnp.asarray(x, jnp.float32)
    if zp is not None:
        xf = xf - _qdq_reshape(zp, x, axis).astype(np.float32)
    return [xf * _qdq_reshape(scale, x, axis)]


_OPS = {
    "Add": _binop(lambda xp, a, b: xp.add(a, b)),
    "Sub": _binop(lambda xp, a, b: xp.subtract(a, b)),
    "Mul": _binop(lambda xp, a, b: xp.multiply(a, b)),
    "Div": _binop(lambda xp, a, b: xp.divide(a, b)),
    "Pow": _binop(lambda xp, a, b: xp.power(a, b)),
    "Min": lambda node, vals: [_xp(vals).minimum(vals[0], vals[1])] if len(vals) == 2
        else [np.minimum.reduce(vals) if all(_is_static(v) for v in vals)
              else jnp.min(jnp.stack([jnp.asarray(v) for v in vals]), axis=0)],
    "Max": lambda node, vals: [_xp(vals).maximum(vals[0], vals[1])] if len(vals) == 2
        else [np.maximum.reduce(vals) if all(_is_static(v) for v in vals)
              else jnp.max(jnp.stack([jnp.asarray(v) for v in vals]), axis=0)],
    "Equal": _binop(lambda xp, a, b: xp.equal(a, b)),
    "Greater": _binop(lambda xp, a, b: xp.greater(a, b)),
    "GreaterOrEqual": _binop(lambda xp, a, b: xp.greater_equal(a, b)),
    "Less": _binop(lambda xp, a, b: xp.less(a, b)),
    "LessOrEqual": _binop(lambda xp, a, b: xp.less_equal(a, b)),
    "And": _binop(lambda xp, a, b: xp.logical_and(a, b)),
    "Or": _binop(lambda xp, a, b: xp.logical_or(a, b)),
    "Not": _unop(lambda xp, a: xp.logical_not(a)),
    "Sqrt": _unop(lambda xp, a: xp.sqrt(a)),
    "Exp": _unop(lambda xp, a: xp.exp(a)),
    "Log": _unop(lambda xp, a: xp.log(a)),
    "Neg": _unop(lambda xp, a: xp.negative(a)),
    "Abs": _unop(lambda xp, a: xp.abs(a)),
    "Floor": _unop(lambda xp, a: xp.floor(a)),
    "Ceil": _unop(lambda xp, a: xp.ceil(a)),
    "Erf": _unop(lambda xp, a: jax.scipy.special.erf(jnp.asarray(a)) if xp is jnp
                 else np.vectorize(__import__("math").erf)(a).astype(a.dtype)),
    "Tanh": _unop(lambda xp, a: xp.tanh(a)),
    "Sigmoid": _unop(lambda xp, a: jax.nn.sigmoid(jnp.asarray(a)) if xp is jnp
                     else 1.0 / (1.0 + np.exp(-a))),
    "Relu": _unop(lambda xp, a: xp.maximum(a, 0)),
    "LeakyRelu": lambda node, vals: [jnp.where(jnp.asarray(vals[0]) >= 0, vals[0],
                                               vals[0] * _attr(node, "alpha", 0.01))],
    "Identity": lambda node, vals: [vals[0]],
    "Dropout": lambda node, vals: [vals[0]],
    "Where": lambda node, vals: [_xp(vals).where(vals[0], vals[1], vals[2])],
    "Concat": lambda node, vals: [_xp(vals).concatenate(
        [v if not _is_static(v) or _xp(vals) is np else jnp.asarray(v) for v in vals],
        axis=int(_attr(node, "axis", 0)))],
    "Shape": lambda node, vals: [np.asarray(
        vals[0].shape[int(_attr(node, "start", 0)):
                      (int(_attr(node, "end")) if _attr(node, "end") is not None
                       else len(vals[0].shape))], np.int64)],
    "Size": lambda node, vals: [np.asarray(int(np.prod(vals[0].shape)), np.int64)],
    "Range": lambda node, vals: [np.arange(int(_concrete(vals[0], "Range start")),
                                           int(_concrete(vals[1], "Range limit")),
                                           int(_concrete(vals[2], "Range delta")))],
    "Tile": lambda node, vals: [_xp([vals[0]]).tile(
        vals[0], tuple(_concrete(vals[1], "Tile repeats").astype(np.int64)))],
    "MatMul": _binop(lambda xp, a, b: jnp.matmul(jnp.asarray(a), jnp.asarray(b),
                                                 precision=lax.Precision.HIGHEST)
                     if xp is jnp else np.matmul(a, b)),
    "Gemm": _op_gemm,
    "Conv": _op_conv,
    "ConvTranspose": _op_convtranspose,
    "Resize": _op_resize,
    "TopK": _op_topk,
    "DepthToSpace": _op_depthtospace,
    "SpaceToDepth": _op_spacetodepth,
    "Einsum": lambda node, vals: [jnp.einsum(
        (_attr(node, "equation").decode()
         if isinstance(_attr(node, "equation"), bytes)
         else _attr(node, "equation")),
        *[jnp.asarray(v) for v in vals], precision=lax.Precision.HIGHEST)],
    "BatchNormalization": _op_batchnorm,
    "LSTM": _op_lstm,
    "GRU": _op_gru,
    "RNN": _op_rnn,
    "MaxPool": _op_maxpool,
    "AveragePool": _op_avgpool,
    "GlobalAveragePool": lambda node, vals: [jnp.mean(
        jnp.asarray(vals[0]), axis=tuple(range(2, vals[0].ndim)), keepdims=True)],
    "Softmax": _op_softmax,
    "LayerNormalization": _op_layernorm,
    "Flatten": _op_flatten,
    "Transpose": _op_transpose,
    "Reshape": _op_reshape,
    "Squeeze": _op_squeeze,
    "Unsqueeze": _op_unsqueeze,
    "Slice": _op_slice,
    "Split": _op_split,
    "Pad": _op_pad,
    "Gather": _op_gather,
    "Cast": _op_cast,
    "CastLike": lambda node, vals: [vals[0].astype(vals[1].dtype)],
    "Clip": _op_clip,
    "Constant": _op_constant,
    "ConstantOfShape": _op_constantofshape,
    "Expand": _op_expand,
    "QuantizeLinear": _op_quantizelinear,
    "DequantizeLinear": _op_dequantizelinear,
    "ReduceMean": _op_reduce("mean"),
    "ReduceSum": _op_reduce("sum"),
    "ReduceMax": _op_reduce("max"),
    "ReduceMin": _op_reduce("min"),
    "ReduceProd": _op_reduce("prod"),
    "ReduceL1": _op_reduce_comp("L1"),
    "ReduceL2": _op_reduce_comp("L2"),
    "ReduceLogSum": _op_reduce_comp("LogSum"),
    "ReduceLogSumExp": _op_reduce_comp("LogSumExp"),
    "ReduceSumSquare": _op_reduce_comp("SumSquare"),
    "ArgMax": _op_argminmax("ArgMax"),
    "ArgMin": _op_argminmax("ArgMin"),
    "LogSoftmax": lambda node, vals: [jax.nn.log_softmax(
        jnp.asarray(vals[0]), axis=int(_attr(node, "axis", -1)))],
    "Elu": lambda node, vals: [jnp.where(
        jnp.asarray(vals[0]) > 0, vals[0],
        float(_attr(node, "alpha", 1.0)) * (jnp.exp(jnp.asarray(vals[0])) - 1))],
    "Selu": lambda node, vals: [float(_attr(node, "gamma", 1.0507009873554805))
        * jnp.where(jnp.asarray(vals[0]) > 0, vals[0],
                    float(_attr(node, "alpha", 1.6732632423543772))
                    * (jnp.exp(jnp.asarray(vals[0])) - 1))],
    "Softplus": _unop(lambda xp, a: jax.nn.softplus(jnp.asarray(a))),
    "Softsign": _unop(lambda xp, a: jnp.asarray(a) / (1 + jnp.abs(jnp.asarray(a)))),
    "HardSigmoid": lambda node, vals: [jnp.clip(
        float(_attr(node, "alpha", 0.2)) * jnp.asarray(vals[0])
        + float(_attr(node, "beta", 0.5)), 0.0, 1.0)],
    "HardSwish": lambda node, vals: [jnp.asarray(vals[0]) * jnp.clip(
        jnp.asarray(vals[0]) / 6.0 + 0.5, 0.0, 1.0)],
    "PRelu": lambda node, vals: [jnp.where(
        jnp.asarray(vals[0]) >= 0, vals[0],
        jnp.asarray(vals[1]) * jnp.asarray(vals[0]))],
    "ThresholdedRelu": lambda node, vals: [jnp.where(
        jnp.asarray(vals[0]) > float(_attr(node, "alpha", 1.0)), vals[0], 0.0)],
    "Gelu": _op_gelu,
    "InstanceNormalization": _op_instancenorm,
}


# ---------------------------------------------------------------------------


def _sanitize(name: str) -> str:
    return name.replace("/", ".").replace("__", "_")


class OnnxProgram:
    """An ONNX graph compiled to a pure JAX function.

    Attributes:
        params:       float-initializer pytree ``{sanitized_name: array}``.
        input_names:  dynamic graph inputs (pinned static inputs excluded).
        output_names: graph outputs, in graph order.

    ``apply(params, inputs_dict)`` evaluates the graph; wrap it in
    ``jax.jit`` (the whole graph traces into one XLA program).
    """

    def __init__(self, graph: Dict, static_inputs: Optional[Dict[str, Any]] = None,
                 _params: Optional[Dict[str, np.ndarray]] = None):
        self._static_inputs = {k: np.asarray(v) for k, v in (static_inputs or {}).items()}
        inits = dict(graph.get("initializers", {}))
        nodes = self._fold_if(list(graph["nodes"]), inits)

        self._inits_static: Dict[str, np.ndarray] = {}
        params: Dict[str, np.ndarray] = {}
        self._param_key: Dict[str, str] = {}
        for name, arr in inits.items():
            arr = np.asarray(arr)
            if arr.dtype in [np.dtype(d) for d in _FLOAT_DTYPES]:
                key = _sanitize(name) or "_"
                while key in params:
                    key += "_"
                params[key] = arr.astype(np.float32) if arr.dtype != np.float32 else arr
                self._param_key[name] = key
            else:
                self._inits_static[name] = arr
        self.params = _params if _params is not None else params

        self.nodes = nodes
        in_names = [i["name"] for i in graph["inputs"] if i["name"] not in inits]
        self.input_names = [n for n in in_names if n not in self._static_inputs]
        self.output_names = [o["name"] for o in graph["outputs"]]
        self._graph_inputs = {i["name"]: i for i in graph["inputs"]}

        # Build-time static pass: evaluate everything derivable from
        # initializers + pinned inputs (used for If folding above and as the
        # fallback for shape slots whose producer became a param).
        self._static = self._eval_static()

    # -- If folding --------------------------------------------------------

    def _fold_if(self, nodes: List[Dict], inits: Dict[str, np.ndarray]) -> List[Dict]:
        """Splice statically-decidable If branches inline (Silero's sr switch)."""
        out: List[Dict] = []
        static: Dict[str, np.ndarray] = dict(self._static_inputs)
        for name, arr in inits.items():
            static[name] = np.asarray(arr)
        pending = list(nodes)
        while pending:
            n = pending.pop(0)
            if n["op_type"] != "If":
                out.append(n)
                # keep the static env current for later If conditions
                if all(i in static or i == "" for i in n["input"]) and n["op_type"] in _OPS:
                    try:
                        vals = [static[i] if i else None for i in n["input"]]
                        res = _OPS[n["op_type"]](n, vals)
                        for o_name, v in zip(n["output"], res):
                            if _is_static(v):
                                static[o_name] = np.asarray(v)
                    except Exception:
                        pass
                continue
            cond_name = n["input"][0]
            if cond_name not in static:
                raise NotImplementedError(
                    f"ONNX If node '{n['name']}' has a dynamic condition "
                    f"'{cond_name}'; pin it via static_inputs.")
            branch = _attr(node=n, name="then_branch") if bool(np.asarray(static[cond_name]).reshape(-1)[0]) \
                else _attr(node=n, name="else_branch")
            sub_inits = branch.get("initializers", {})
            rename = {}
            for k, v in sub_inits.items():
                nk = k if k not in inits else f"{n['name']}.{k}"
                inits[nk] = v
                rename[k] = nk
            sub_outs = [o["name"] for o in branch["outputs"]]
            out_map = dict(zip(sub_outs, n["output"]))
            spliced = []
            for sn in branch["nodes"]:
                sn = dict(sn)
                # inputs must follow both renames: initializer de-collision
                # AND the branch-output -> If-output mapping (an intra-branch
                # consumer of a tensor that is also a branch output must read
                # the producer's new outer name)
                sn["input"] = [out_map.get(rename.get(i, i), rename.get(i, i))
                               for i in sn["input"]]
                sn["output"] = [out_map.get(rename.get(o, o), rename.get(o, o)) for o in sn["output"]]
                spliced.append(sn)
            # If a branch output is a direct passthrough of an outer tensor,
            # alias it with an Identity node.
            produced = {o for sn in spliced for o in sn["output"]}
            for so, oo in out_map.items():
                if oo not in produced:
                    spliced.append({"op_type": "Identity", "input": [rename.get(so, so)],
                                    "output": [oo], "name": f"{n['name']}.alias.{oo}",
                                    "attributes": {}})
            pending = spliced + pending
        return out

    # -- evaluation --------------------------------------------------------

    def _eval_static(self) -> Dict[str, np.ndarray]:
        env: Dict[str, Any] = dict(self._static_inputs)
        for name, arr in self._inits_static.items():
            env[name] = arr
        for name, key in self._param_key.items():
            env[name] = np.asarray(self.params[key]) if key in self.params else None
        for n in self.nodes:
            if n["op_type"] not in _OPS:
                continue
            if not all((i == "") or (i in env and env[i] is not None) for i in n["input"]):
                continue
            if n["op_type"] == "Constant":
                env[n["output"][0]] = np.asarray(_op_constant(n, [])[0])
                continue
            try:
                vals = [env[i] if i else None for i in n["input"]]
                res = _OPS[n["op_type"]](n, vals)
            except Exception:
                continue
            for o, v in zip(n["output"], res):
                if _is_static(v):
                    env[o] = np.asarray(v)
        return {k: v for k, v in env.items() if v is not None}

    def apply(self, params: Dict, inputs: Dict[str, Any]) -> Dict[str, Any]:
        """Evaluate the graph. ``inputs`` maps dynamic input names to arrays."""
        missing = [n for n in self.input_names if n not in inputs]
        if missing:
            raise ValueError(f"ONNX program missing inputs: {missing}")
        env: Dict[str, Any] = {}
        env.update(self._static_inputs)
        env.update(self._inits_static)
        for name, key in self._param_key.items():
            env[name] = params[key]
        for name in self.input_names:
            env[name] = inputs[name]

        for n in self.nodes:
            t = n["op_type"]
            impl = _OPS.get(t)
            if impl is None:
                raise NotImplementedError(f"ONNX op '{t}' is not supported "
                                          f"(node '{n['name']}')")
            vals = []
            for i in n["input"]:
                if i == "":
                    vals.append(None)
                elif i in env:
                    vals.append(env[i])
                elif i in self._static:
                    vals.append(self._static[i])
                else:
                    raise ValueError(f"ONNX program: tensor '{i}' (input of "
                                     f"'{n['name']}') has no producer")
            res = impl(n, vals)
            for o, v in zip(n["output"], res):
                if o:
                    env[o] = v
        return {o: env[o] for o in self.output_names}

    def __call__(self, params: Dict, *args) -> Tuple:
        """Positional convenience: args align with input_names, outputs with
        output_names."""
        out = self.apply(params, dict(zip(self.input_names, args)))
        return tuple(out[o] for o in self.output_names)

    # -- serialization -----------------------------------------------------

    def to_spec(self) -> Dict:
        """JSON-safe structural spec (params stored separately)."""
        def enc_attr(a):
            out = {}
            for k in ("i", "f"):
                if k in a:
                    out[k] = a[k]
            if "s" in a:
                out["s"] = a["s"].decode() if isinstance(a["s"], bytes) else a["s"]
            for k in ("ints", "floats"):
                if k in a:
                    out[k] = list(a[k])
            if "t" in a:
                arr = a["t"]["array"]
                out["t"] = {"dtype": str(arr.dtype), "shape": list(arr.shape),
                            "data": np.asarray(arr).reshape(-1).tolist()}
            return out

        nodes = []
        for n in self.nodes:
            nodes.append({"op_type": n["op_type"], "name": n["name"],
                          "input": n["input"], "output": n["output"],
                          "attributes": {k: enc_attr(a) for k, a in n["attributes"].items()}})
        return {
            "nodes": nodes,
            "input_names": self.input_names,
            "output_names": self.output_names,
            "param_key": self._param_key,
            "static_inputs": {k: {"dtype": str(v.dtype), "shape": list(v.shape),
                                  "data": v.reshape(-1).tolist()}
                              for k, v in self._static_inputs.items()},
            "inits_static": {k: {"dtype": str(v.dtype), "shape": list(v.shape),
                                 "data": v.reshape(-1).tolist()}
                             for k, v in self._inits_static.items()},
        }

    @classmethod
    def from_spec(cls, spec: Dict, params: Dict) -> "OnnxProgram":
        def dec_tensor(d):
            return np.asarray(d["data"], dtype=np.dtype(d["dtype"])).reshape(d["shape"])

        def dec_attr(name, d):
            out = {"name": name}
            out.update({k: d[k] for k in ("i", "f", "ints", "floats") if k in d})
            if "s" in d:
                out["s"] = d["s"].encode()
            if "t" in d:
                out["t"] = {"name": name, "array": dec_tensor(d["t"])}
            return out

        prog = cls.__new__(cls)
        prog._static_inputs = {k: dec_tensor(v) for k, v in spec["static_inputs"].items()}
        prog._inits_static = {k: dec_tensor(v) for k, v in spec["inits_static"].items()}
        prog._param_key = dict(spec["param_key"])
        prog.params = {k: jnp.asarray(v) if not isinstance(v, np.ndarray) else v
                       for k, v in params.items()}
        prog.nodes = [{"op_type": n["op_type"], "name": n["name"],
                       "input": list(n["input"]), "output": list(n["output"]),
                       "attributes": {k: dec_attr(k, a) for k, a in n["attributes"].items()}}
                      for n in spec["nodes"]]
        prog.input_names = list(spec["input_names"])
        prog.output_names = list(spec["output_names"])
        prog._graph_inputs = {}
        prog._static = prog._eval_static()
        return prog


def load_program(path: str, static_inputs: Optional[Dict[str, Any]] = None) -> OnnxProgram:
    """Read an .onnx file and compile it into an OnnxProgram."""
    return OnnxProgram(op.load_onnx(path)["graph"], static_inputs=static_inputs)
