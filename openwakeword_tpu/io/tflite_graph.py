"""General TFLite -> XLA executor: run an arbitrary .tflite graph as one
jittable JAX function.

The reference executes ANY user .tflite through the LiteRT interpreter
(reference model.py:85-103 / utils.py:88-108 just construct an Interpreter
around whatever file they are handed) — its own exports are dnn/mlp/rnn
heads, but community models (e.g. microWakeWord-style depthwise-CNN
streaming classifiers) are ordinary TFLite graphs too. This module is the
TFLite twin of io.onnx_graph.OnnxProgram: the flatbuffer (parsed by
io.tflite_import.load_tflite, a self-contained reader) compiles to a pure
function over a float-params pytree, so imported graphs serve on TPU through
the same engine paths as native heads.

Float and quantized graphs both execute. Quantized graphs (int8/uint8
weights with flatbuffer QuantizationParameters — the usual microWakeWord /
TFLite-converter output) run in one of two modes, selected by the
``quantized=`` constructor argument:

- ``"dequant"`` (default, fast): const tensors dequantize at load time
  ((q - zero_point) * scale, per-channel along quantized_dimension),
  QUANTIZE/DEQUANTIZE boundary ops pass through, and all arithmetic is
  float32. This matches the float model the graph was quantized from rather
  than LiteRT's bit-exact int8 kernels — on TPU the MXU runs bf16/f32
  natively, so emulating int8 rounding by default would cost speed to add
  noise.
- ``"exact"`` (LiteRT score parity): integer tensors stay integer and the
  graph executes with LiteRT's integer-kernel semantics — int32
  accumulation, per-channel Q31 fixed-point requantization
  (ops.qmath.multiply_by_quantized_multiplier), saturating int8/uint8
  activations, and the LUT activations the default op resolver uses. The
  reference runs int8 graphs natively through the interpreter (reference
  openwakeword/utils.py:112-161); this mode reproduces those scores to the
  last output LSB for the supported op set (conv/depthwise/fully-connected,
  pooling, mean, add/sub/mul, logistic/tanh, quantize/requantize, shape
  ops). Ops outside that set with quantized outputs raise a typed error
  pointing back at ``quantized='dequant'``.

Quantized tensors MISSING their scale raise a typed error naming the tensor.
"""

from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# BuiltinOperator codes (tensorflow/lite/schema/schema.fbs)
_OP_ADD, _OP_AVERAGE_POOL_2D, _OP_CONCATENATION, _OP_CONV_2D = 0, 1, 2, 3
_OP_DEPTHWISE_CONV_2D, _OP_FULLY_CONNECTED, _OP_LOGISTIC = 4, 9, 14
_OP_MAX_POOL_2D, _OP_MUL, _OP_RELU, _OP_RELU6, _OP_RESHAPE = 17, 18, 19, 21, 22
_OP_SOFTMAX, _OP_TANH, _OP_PAD, _OP_TRANSPOSE, _OP_MEAN = 25, 28, 34, 39, 40
_OP_SUB, _OP_DIV, _OP_SQUEEZE, _OP_UNI_LSTM, _OP_STRIDED_SLICE = 41, 42, 43, 44, 45
_OP_EXP, _OP_SPLIT, _OP_MAXIMUM, _OP_MINIMUM, _OP_PADV2 = 47, 49, 55, 57, 60
_OP_SLICE, _OP_SUM, _OP_SQRT, _OP_RSQRT, _OP_LOG = 65, 74, 75, 76, 73
_OP_SQUARED_DIFFERENCE, _OP_REDUCE_MAX, _OP_LEAKY_RELU = 99, 82, 98
_OP_REVERSE_V2, _OP_NEG, _OP_ABS, _OP_PRELU = 105, 59, 101, 54
_OP_HARD_SWISH, _OP_GELU, _OP_SVDF = 117, 150, 27
_OP_RNN, _OP_UNI_RNN, _OP_L2_NORMALIZATION = 24, 35, 11
_OP_DEPTH_TO_SPACE, _OP_SPACE_TO_DEPTH, _OP_FLOOR, _OP_CEIL = 5, 26, 8, 104
_OP_RESIZE_BILINEAR, _OP_RESIZE_NEAREST_NEIGHBOR = 23, 97
_OP_GATHER, _OP_CAST, _OP_TOPK_V2, _OP_LOG_SOFTMAX = 36, 53, 48, 50
_OP_LESS, _OP_GREATER, _OP_GREATER_EQUAL, _OP_LESS_EQUAL = 58, 61, 62, 63
_OP_EQUAL, _OP_NOT_EQUAL, _OP_SELECT, _OP_SELECT_V2 = 71, 72, 64, 123
_OP_SIN, _OP_COS, _OP_TILE, _OP_EXPAND_DIMS, _OP_SHAPE = 66, 108, 69, 70, 77
_OP_POW, _OP_ARG_MAX, _OP_ARG_MIN, _OP_PACK, _OP_UNPACK = 78, 56, 79, 83, 88
_OP_REDUCE_MIN, _OP_REDUCE_PROD, _OP_FLOOR_DIV, _OP_FLOOR_MOD = 89, 81, 90, 95
_OP_SQUARE, _OP_ZEROS_LIKE, _OP_FILL, _OP_RANGE, _OP_ROUND = 92, 93, 94, 96, 116
_OP_MIRROR_PAD, _OP_ADD_N, _OP_ELU, _OP_BATCH_MATMUL = 100, 106, 111, 126
_OP_TRANSPOSE_CONV, _OP_ONE_HOT = 67, 85
_OP_LOGICAL_OR, _OP_LOGICAL_AND, _OP_LOGICAL_NOT = 84, 86, 87
_OP_DEQUANTIZE, _OP_QUANTIZE = 6, 114

_OP_NAMES = {
    v: k[4:] for k, v in list(globals().items()) if k.startswith("_OP_")
}

# TensorType code -> numpy dtype (flatbuffer schema enum)
_TT_NP = {0: np.float32, 1: np.float16, 2: np.int32, 3: np.uint8,
          4: np.int64, 6: np.bool_, 7: np.int16, 9: np.int8, 10: np.float64}


def _fused(act: int, x):
    """ActivationFunctionType: NONE=0 RELU=1 RELU_N1_TO_1=2 RELU6=3 TANH=4."""
    if act == 0:
        return x
    if act == 1:
        return jnp.maximum(x, 0.0)
    if act == 2:
        return jnp.clip(x, -1.0, 1.0)
    if act == 3:
        return jnp.clip(x, 0.0, 6.0)
    if act == 4:
        return jnp.tanh(x)
    raise NotImplementedError(f"TFLite fused activation {act}")


def _pad_mode(code: int) -> str:
    return "SAME" if code == 0 else "VALID"


def _static(v, what: str) -> np.ndarray:
    if isinstance(v, jax.core.Tracer):
        raise NotImplementedError(
            f"TFLite executor: {what} must be a constant tensor")
    return np.asarray(v)


def _dequantize(data: np.ndarray, quant: Dict, name: str) -> np.ndarray:
    """(q - zero_point) * scale, per-channel along quantized_dimension when
    the scale vector has one entry per channel (schema.fbs
    QuantizationParameters; lite/kernels/internal/quantization_util)."""
    scale = np.asarray(quant["scale"], np.float32)
    zp = np.asarray(quant["zero_point"] or [0], np.int64)
    x = data.astype(np.float32)
    if scale.size == 1:
        return (x - np.float32(zp.reshape(-1)[0])) * scale.reshape(-1)[0]
    dim = int(quant.get("dim", 0)) % max(data.ndim, 1)
    if scale.size != data.shape[dim]:
        raise ValueError(
            f"TFLite executor: tensor '{name}' has {scale.size} quantization "
            f"scales but {data.shape[dim]} channels along "
            f"quantized_dimension {dim}")
    bshape = [1] * data.ndim
    bshape[dim] = scale.size
    if zp.size == 1:
        zp = np.broadcast_to(zp, scale.shape)
    return (x - zp.astype(np.float32).reshape(bshape)) * scale.reshape(bshape)


class TfliteProgram:
    """A TFLite graph compiled to a pure JAX function.

    Attributes:
        params:       float const tensors ``{t<idx>_<name>: array}``.
        input_names:  graph input tensor names (graph order).
        output_names: graph output tensor names.

    ``apply(params, inputs_dict)`` evaluates the graph (wrap in ``jax.jit``);
    variable tensors (SVDF memory, LSTM state) read as zeros sized by the
    runtime batch — one call is one stateless evaluation, like a fresh
    LiteRT interpreter. ``apply_stateful(params, inputs, state)`` threads
    the variable tensors across calls like a persistent interpreter
    (streaming KWS models).
    """

    def __init__(self, model: Dict, quantized: str = "dequant"):
        if quantized not in ("dequant", "exact"):
            raise ValueError(
                f"quantized must be 'dequant' or 'exact', got {quantized!r}")
        self._model = model
        self._quantized = quantized
        self._tensors = model["tensors"]
        self.params: Dict[str, Any] = {}
        self._param_key: Dict[int, str] = {}
        self._static_vals: Dict[int, np.ndarray] = {}
        self._input_idx: List[int] = list(model["inputs"])
        self._output_idx: List[int] = list(model["outputs"])
        self._var_idx: List[int] = [
            i for i, t in enumerate(self._tensors) if t["is_variable"]]

        for i, t in enumerate(self._tensors):
            if t["data"] is None:
                continue
            quant = t.get("quant")
            if quant and quant.get("details_type"):
                raise NotImplementedError(
                    f"TFLite executor: tensor '{t['name']}' uses custom "
                    f"quantization details (type {quant['details_type']}); "
                    "only standard affine quantization executes")
            key = f"t{i}_" + (t["name"] or "const").replace("/", ".")[-40:]
            if t["dtype"] in (0, 1):                 # float32/float16 -> leaf
                self.params[key] = np.asarray(t["data"], np.float32)
                self._param_key[i] = key
            elif t["dtype"] in (3, 7, 9) or (t["dtype"] == 2 and quant
                                             and quant["scale"]):
                if not (quant and quant["scale"]):
                    raise NotImplementedError(
                        f"TFLite executor: tensor '{t['name']}' is quantized "
                        f"(dtype {t['dtype']}) but carries no scale — cannot "
                        "dequantize; re-export the model with standard "
                        "quantization parameters or as float")
                if quantized == "exact":
                    if t["dtype"] == 7:
                        raise NotImplementedError(
                            "TFLite executor: int16 quantization is "
                            "unsupported under quantized='exact' "
                            f"(tensor '{t['name']}'); use quantized='dequant'")
                    # integer weights/biases stay integer; the graph runs
                    # LiteRT's integer kernels (see module docstring)
                    self.params[key] = np.asarray(t["data"])
                else:
                    # quantized weights/biases dequantize at load; the graph
                    # then executes in float (see module docstring)
                    self.params[key] = _dequantize(
                        np.asarray(t["data"]), quant, t["name"])
                self._param_key[i] = key
            else:                                    # shapes/axes/indices
                self._static_vals[i] = np.asarray(t["data"])

        def _name(i):
            return self._tensors[i]["name"] or f"tensor_{i}"
        self.input_names = [_name(i) for i in self._input_idx]
        self.output_names = [_name(i) for i in self._output_idx]

        unknown = sorted({o["opcode"] for o in model["operators"]}
                         - set(_OP_NAMES))
        if unknown:
            raise NotImplementedError(
                f"TFLite executor: unsupported builtin opcode(s) {unknown} "
                f"(supported: {sorted(_OP_NAMES.values())})")

    # ------------------------------------------------------------------

    def apply(self, params: Dict, inputs: Dict[str, Any]) -> Dict[str, Any]:
        """Evaluate the graph. ``inputs`` maps input tensor names to arrays."""
        return self._run(params, inputs, None)[0]

    def apply_stateful(self, params: Dict, inputs: Dict[str, Any],
                       state: Optional[Dict[str, Any]] = None):
        """Evaluate the graph threading variable-tensor state across calls.

        LiteRT's interpreter persists ``is_variable`` tensors (SVDF memory,
        streaming-LSTM h/c) between ``invoke()`` calls — streaming KWS
        models depend on it (reference runtime:
        ``/root/reference/openwakeword/utils.py:112-161`` runs whatever the
        .tflite contains under a persistent interpreter). ``state`` maps
        variable tensor names to arrays (``None``/missing entries start
        zeroed, exactly like a fresh interpreter); returns
        ``(outputs, new_state)`` where ``new_state`` feeds the next call.
        Jit-friendly: shapes are static given a fixed batch.
        """
        return self._run(params, inputs, dict(state or {}))

    def variable_names(self) -> List[str]:
        """Names of persistent (``is_variable``) tensors, ``apply_stateful``
        state-dict keys; empty for stateless graphs."""
        return [self._tensors[i]["name"] or f"tensor_{i}"
                for i in self._var_idx]

    def _run(self, params: Dict, inputs: Dict[str, Any],
             state: Optional[Dict[str, Any]]):
        missing = [n for n in self.input_names if n not in inputs]
        if missing:
            raise ValueError(f"TFLite program missing inputs: {missing}")
        env: Dict[int, Any] = {}
        for i, key in self._param_key.items():
            env[i] = params[key]
        env.update(self._static_vals)
        if state:
            by_name = {(self._tensors[i]["name"] or f"tensor_{i}"): i
                       for i in self._var_idx}
            unknown = sorted(set(state) - set(by_name))
            if unknown:
                raise ValueError(
                    f"TFLite program has no variable tensors named {unknown} "
                    f"(variables: {sorted(by_name)})")
            for name, v in state.items():
                if v is not None:
                    env[by_name[name]] = jnp.asarray(v)
        for name, i in zip(self.input_names, self._input_idx):
            env[i] = jnp.asarray(inputs[name])

        for op in self._model["operators"]:
            self._exec(op, env)
        outs = {name: env[i]
                for name, i in zip(self.output_names, self._output_idx)}
        new_state = {(self._tensors[i]["name"] or f"tensor_{i}"): env[i]
                     for i in self._var_idx if i in env}
        return outs, new_state

    def __call__(self, params: Dict, *args):
        out = self.apply(params, dict(zip(self.input_names, args)))
        return tuple(out[n] for n in self.output_names)

    # ------------------------------------------------------------------

    def _val(self, env, idx, op, what="input"):
        if idx < 0:
            return None
        if idx in env:
            return env[idx]
        t = self._tensors[idx]
        if t["is_variable"]:
            # variable tensors (LSTM h/c state) start zeroed; batch dim is
            # resolved at runtime by the consuming op
            return None
        raise ValueError(
            f"TFLite executor: {what} tensor {idx} ('{t['name']}') of "
            f"{_OP_NAMES.get(op['opcode'], op['opcode'])} has no producer")

    def _exec(self, op, env):
        code = op["opcode"]
        ins, outs = op["inputs"], op["outputs"]
        if self._quantized == "exact" and self._exec_int(op, env):
            return
        opt = op.get("options")

        def a(i, what="input"):
            return self._val(env, ins[i] if i < len(ins) else -1, op, what)

        def scalar_opt(field, fmt, default):
            return opt.scalar(field, fmt, default) if opt is not None else default

        if code in (_OP_ADD, _OP_SUB, _OP_MUL, _OP_DIV, _OP_MAXIMUM,
                    _OP_MINIMUM, _OP_SQUARED_DIFFERENCE):
            x, y = jnp.asarray(a(0)), jnp.asarray(a(1))
            fn = {_OP_ADD: jnp.add, _OP_SUB: jnp.subtract,
                  _OP_MUL: jnp.multiply, _OP_DIV: jnp.divide,
                  _OP_MAXIMUM: jnp.maximum, _OP_MINIMUM: jnp.minimum,
                  _OP_SQUARED_DIFFERENCE: lambda p, q: (p - q) ** 2}[code]
            act = scalar_opt(0, "<b", 0) if code in (
                _OP_ADD, _OP_SUB, _OP_MUL, _OP_DIV) else 0
            env[outs[0]] = _fused(act, fn(x, y))
        elif code == _OP_FULLY_CONNECTED:
            x, w = jnp.asarray(a(0)), jnp.asarray(a(1))       # w: (out, in)
            b = a(2)
            keep = bool(scalar_opt(2, "<b", 0))
            h = x if keep else x.reshape(-1, w.shape[1])
            y = jnp.matmul(h, w.T, precision=lax.Precision.HIGHEST)
            if b is not None:
                y = y + jnp.asarray(b)
            env[outs[0]] = _fused(scalar_opt(0, "<b", 0), y)
        elif code in (_OP_CONV_2D, _OP_DEPTHWISE_CONV_2D):
            x, w = jnp.asarray(a(0)), jnp.asarray(a(1))
            b = a(2)
            padding = _pad_mode(scalar_opt(0, "<b", 0))
            stride_w = scalar_opt(1, "<i", 1)
            stride_h = scalar_opt(2, "<i", 1)
            if code == _OP_CONV_2D:
                act = scalar_opt(3, "<b", 0)
                dil = (scalar_opt(5, "<i", 1), scalar_opt(4, "<i", 1))
                # weights (O, KH, KW, I) NHWC graph
                y = lax.conv_general_dilated(
                    x, w, (stride_h, stride_w), padding, rhs_dilation=dil,
                    dimension_numbers=("NHWC", "OHWI", "NHWC"),
                    precision=lax.Precision.HIGHEST)
            else:
                act = scalar_opt(4, "<b", 0)
                dil = (scalar_opt(6, "<i", 1), scalar_opt(5, "<i", 1))
                # weights (1, KH, KW, C*mult): depthwise = grouped conv with
                # one input channel per group
                cin = x.shape[-1]
                w_hwio = jnp.transpose(w, (1, 2, 0, 3))       # (KH,KW,1,C*M)
                y = lax.conv_general_dilated(
                    x, w_hwio, (stride_h, stride_w), padding,
                    rhs_dilation=dil, feature_group_count=cin,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=lax.Precision.HIGHEST)
            if b is not None:
                y = y + jnp.asarray(b)
            env[outs[0]] = _fused(act, y)
        elif code in (_OP_MAX_POOL_2D, _OP_AVERAGE_POOL_2D):
            x = jnp.asarray(a(0))
            padding = _pad_mode(scalar_opt(0, "<b", 0))
            strides = (1, scalar_opt(2, "<i", 1), scalar_opt(1, "<i", 1), 1)
            win = (1, scalar_opt(4, "<i", 1), scalar_opt(3, "<i", 1), 1)
            if code == _OP_MAX_POOL_2D:
                y = lax.reduce_window(x, -jnp.inf, lax.max, win, strides, padding)
            else:
                s = lax.reduce_window(x, 0.0, lax.add, win, strides, padding)
                n = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, win,
                                      strides, padding)
                y = s / n
            env[outs[0]] = _fused(scalar_opt(5, "<b", 0), y)
        elif code == _OP_RESHAPE:
            x = jnp.asarray(a(0))
            if len(ins) > 1 and ins[1] >= 0:
                shape = _static(a(1), "Reshape shape").astype(np.int64)
            else:
                shape = np.asarray(opt.vector_scalars(0, "i", 4), np.int64)
            shape = [int(d) for d in shape]
            env[outs[0]] = x.reshape(shape)
        elif code == _OP_SOFTMAX:
            beta = scalar_opt(0, "<f", 1.0)
            env[outs[0]] = jax.nn.softmax(jnp.asarray(a(0)) * beta, axis=-1)
        elif code in (_OP_LOGISTIC, _OP_RELU, _OP_RELU6, _OP_TANH, _OP_EXP,
                      _OP_LOG, _OP_SQRT, _OP_RSQRT, _OP_NEG, _OP_ABS,
                      _OP_HARD_SWISH, _OP_GELU):
            x = jnp.asarray(a(0))
            env[outs[0]] = {
                _OP_LOGISTIC: jax.nn.sigmoid, _OP_RELU: lambda v: jnp.maximum(v, 0.0),
                _OP_RELU6: lambda v: jnp.clip(v, 0.0, 6.0), _OP_TANH: jnp.tanh,
                _OP_EXP: jnp.exp, _OP_LOG: jnp.log, _OP_SQRT: jnp.sqrt,
                _OP_RSQRT: lax.rsqrt, _OP_NEG: jnp.negative, _OP_ABS: jnp.abs,
                _OP_HARD_SWISH: jax.nn.hard_swish, _OP_GELU: jax.nn.gelu,
            }[code](x)
        elif code == _OP_LEAKY_RELU:
            alpha = scalar_opt(0, "<f", 0.01)
            x = jnp.asarray(a(0))
            env[outs[0]] = jnp.where(x >= 0, x, alpha * x)
        elif code == _OP_PRELU:
            x, slope = jnp.asarray(a(0)), jnp.asarray(a(1))
            env[outs[0]] = jnp.where(x >= 0, x, slope * x)
        elif code == _OP_CONCATENATION:
            axis = scalar_opt(0, "<i", 0)
            vals = [jnp.asarray(a(i)) for i in range(len(ins))]
            env[outs[0]] = _fused(scalar_opt(1, "<b", 0),
                                  jnp.concatenate(vals, axis=axis))
        elif code in (_OP_MEAN, _OP_SUM, _OP_REDUCE_MAX):
            x = jnp.asarray(a(0))
            axes = tuple(int(v) % x.ndim
                         for v in np.atleast_1d(_static(a(1), "reduce axes")))
            keep = bool(scalar_opt(0, "<b", 0))
            fn = {_OP_MEAN: jnp.mean, _OP_SUM: jnp.sum,
                  _OP_REDUCE_MAX: jnp.max}[code]
            env[outs[0]] = fn(x, axis=axes, keepdims=keep)
        elif code in (_OP_PAD, _OP_PADV2):
            x = jnp.asarray(a(0))
            pads = _static(a(1), "Pad paddings").astype(int)
            cval = float(np.asarray(_static(a(2), "Pad value"))) \
                if code == _OP_PADV2 and len(ins) > 2 and ins[2] >= 0 else 0.0
            env[outs[0]] = jnp.pad(x, [(int(lo), int(hi)) for lo, hi in pads],
                                   constant_values=cval)
        elif code == _OP_TRANSPOSE:
            x = jnp.asarray(a(0))
            perm = [int(v) for v in _static(a(1), "Transpose perm")]
            env[outs[0]] = jnp.transpose(x, perm)
        elif code == _OP_SQUEEZE:
            x = jnp.asarray(a(0))
            dims = (list(opt.vector_scalars(0, "i", 4)) if opt is not None
                    else [])
            if dims:
                env[outs[0]] = jnp.squeeze(x, axis=tuple(d % x.ndim for d in dims))
            else:
                env[outs[0]] = jnp.squeeze(x)
        elif code == _OP_STRIDED_SLICE:
            x = jnp.asarray(a(0))
            begin = _static(a(1), "StridedSlice begin").astype(int)
            end = _static(a(2), "StridedSlice end").astype(int)
            strides = _static(a(3), "StridedSlice strides").astype(int)
            bm = scalar_opt(0, "<i", 0)
            em = scalar_opt(1, "<i", 0)
            ellipsis = scalar_opt(2, "<i", 0)
            new_axis = scalar_opt(3, "<i", 0)
            if bin(ellipsis).count("1") > 1:
                raise NotImplementedError(
                    "TFLite executor: STRIDED_SLICE with more than one "
                    "ellipsis_mask bit is malformed")
            shrink = scalar_opt(4, "<i", 0)
            # one index entry per SPEC position (TF strided-slice semantics:
            # a new_axis entry inserts a dim, an ellipsis entry expands to
            # however many full slices the rank needs, any missing trailing
            # entries are full slices — numpy indexing implements all three)
            idx = []
            for d in range(len(begin)):
                if (new_axis >> d) & 1:
                    idx.append(None)
                elif (ellipsis >> d) & 1:
                    idx.append(Ellipsis)
                elif (shrink >> d) & 1:
                    idx.append(int(begin[d]))
                else:
                    b0 = None if (bm >> d) & 1 else int(begin[d])
                    e0 = None if (em >> d) & 1 else int(end[d])
                    idx.append(slice(b0, e0, int(strides[d])))
            env[outs[0]] = x[tuple(idx)]
        elif code == _OP_SLICE:
            x = jnp.asarray(a(0))
            begin = _static(a(1), "Slice begin").astype(int)
            size = _static(a(2), "Slice size").astype(int)
            idx = tuple(slice(int(b), None if s == -1 else int(b + s))
                        for b, s in zip(begin, size))
            env[outs[0]] = x[idx]
        elif code == _OP_SPLIT:
            axis = int(np.asarray(_static(a(0), "Split axis")))
            x = jnp.asarray(a(1))
            parts = jnp.split(x, len(outs), axis=axis)
            for o, p in zip(outs, parts):
                env[o] = p
        elif code == _OP_REVERSE_V2:
            x = jnp.asarray(a(0))
            axes = [int(v) for v in np.atleast_1d(_static(a(1), "Reverse axes"))]
            env[outs[0]] = jnp.flip(x, axis=tuple(axes))
        elif code in (_OP_QUANTIZE, _OP_DEQUANTIZE):
            # boundary casts in converter output (float in -> QUANTIZE ->
            # int8 body -> DEQUANTIZE -> float out). Under dequantized-float
            # emulation every value in env is already in real (float) units,
            # so both are identity
            env[outs[0]] = jnp.asarray(a(0))
        elif code == _OP_SVDF:
            # lite/kernels/svdf.cc float path: per invoke, shift each
            # filter's memory row left one slot, append the new feature
            # activation, then time-weight, rank-sum, bias, activation.
            x = jnp.asarray(a(0))                         # (B, I)
            wf = jnp.asarray(a(1))                        # (F, I)
            wt = jnp.asarray(a(2))                        # (F, M)
            b = a(3)
            rank = scalar_opt(0, "<i", 1)
            act = scalar_opt(1, "<b", 0)
            n_filters, memory = int(wt.shape[0]), int(wt.shape[1])
            if rank <= 0 or n_filters % rank:
                raise NotImplementedError(
                    f"TFLite SVDF: num_filters {n_filters} not divisible "
                    f"by rank {rank}")
            batch = x.shape[0]
            st = a(4)
            st = (jnp.zeros((batch, n_filters * memory), x.dtype)
                  if st is None else jnp.asarray(st))
            st = st.reshape(batch, n_filters, memory)
            feat = jnp.matmul(x, wf.T, precision=lax.Precision.HIGHEST)
            st = jnp.concatenate([st[..., 1:], feat[..., None]], axis=-1)
            scratch = jnp.einsum("bfm,fm->bf", st, wt,
                                 precision=lax.Precision.HIGHEST)
            y = scratch.reshape(batch, n_filters // rank, rank).sum(-1)
            if b is not None:
                y = y + jnp.asarray(b)
            env[outs[0]] = _fused(act, y)
            if len(ins) > 4 and ins[4] >= 0:              # persist the memory
                env[ins[4]] = st.reshape(batch, n_filters * memory)
        elif code in (_OP_RNN, _OP_UNI_RNN):
            # lite/kernels/basic_rnn.cc / unidirectional_sequence_rnn.cc:
            # h' = act(x·W^T + h·R^T + b), hidden state is a variable tensor
            # (input 4) persisted across invokes under apply_stateful
            x = jnp.asarray(a(0))
            w, rw = jnp.asarray(a(1)), jnp.asarray(a(2))  # (U, I), (U, U)
            b = a(3)
            if code == _OP_RNN:
                act = scalar_opt(0, "<b", 0)
                time_major = False
                xs = x[None]                              # (1, B, I)
            else:
                time_major = bool(scalar_opt(0, "<b", 0))
                act = scalar_opt(1, "<b", 0)
                xs = x if time_major else jnp.swapaxes(x, 0, 1)  # (T, B, I)
            batch, units = xs.shape[1], int(w.shape[0])
            h0 = a(4)
            h0 = (jnp.zeros((batch, units), x.dtype)
                  if h0 is None else jnp.asarray(h0).reshape(batch, units))
            pre_x = jnp.einsum("tbi,ui->tbu", xs, w,
                               precision=lax.Precision.HIGHEST)
            if b is not None:
                pre_x = pre_x + jnp.asarray(b)

            def rnn_step(h, px):
                h_new = _fused(act, px + jnp.matmul(
                    h, rw.T, precision=lax.Precision.HIGHEST))
                return h_new, h_new

            h_fin, hs = lax.scan(rnn_step, h0, pre_x)     # (T, B, U)
            if len(ins) > 4 and ins[4] >= 0:              # persist state
                env[ins[4]] = h_fin
            if code == _OP_RNN:
                env[outs[0]] = hs[0]                      # (B, U)
            else:
                env[outs[0]] = hs if time_major else jnp.swapaxes(hs, 0, 1)
        elif code == _OP_L2_NORMALIZATION:
            x = jnp.asarray(a(0))
            y = x * lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
            env[outs[0]] = _fused(scalar_opt(0, "<b", 0), y)
        elif code in (_OP_SIN, _OP_COS, _OP_FLOOR, _OP_CEIL, _OP_ROUND,
                      _OP_SQUARE, _OP_ZEROS_LIKE, _OP_LOGICAL_NOT, _OP_ELU,
                      _OP_LOG_SOFTMAX):
            x = jnp.asarray(a(0))
            env[outs[0]] = {
                _OP_SIN: jnp.sin, _OP_COS: jnp.cos, _OP_FLOOR: jnp.floor,
                _OP_CEIL: jnp.ceil,
                # lite/kernels/round.cc: round half to even (like jnp.round)
                _OP_ROUND: jnp.round, _OP_SQUARE: jnp.square,
                _OP_ZEROS_LIKE: jnp.zeros_like,
                _OP_LOGICAL_NOT: jnp.logical_not,
                _OP_ELU: jax.nn.elu,
                _OP_LOG_SOFTMAX: lambda v: jax.nn.log_softmax(v, axis=-1),
            }[code](x)
        elif code in (_OP_LESS, _OP_GREATER, _OP_GREATER_EQUAL,
                      _OP_LESS_EQUAL, _OP_EQUAL, _OP_NOT_EQUAL, _OP_POW,
                      _OP_FLOOR_DIV, _OP_FLOOR_MOD, _OP_LOGICAL_OR,
                      _OP_LOGICAL_AND):
            x, y = jnp.asarray(a(0)), jnp.asarray(a(1))
            env[outs[0]] = {
                _OP_LESS: jnp.less, _OP_GREATER: jnp.greater,
                _OP_GREATER_EQUAL: jnp.greater_equal,
                _OP_LESS_EQUAL: jnp.less_equal, _OP_EQUAL: jnp.equal,
                _OP_NOT_EQUAL: jnp.not_equal, _OP_POW: jnp.power,
                _OP_FLOOR_DIV: jnp.floor_divide, _OP_FLOOR_MOD: jnp.mod,
                _OP_LOGICAL_OR: jnp.logical_or,
                _OP_LOGICAL_AND: jnp.logical_and,
            }[code](x, y)
        elif code in (_OP_SELECT, _OP_SELECT_V2):
            env[outs[0]] = jnp.where(jnp.asarray(a(0)), jnp.asarray(a(1)),
                                     jnp.asarray(a(2)))
        elif code == _OP_ADD_N:
            acc = jnp.asarray(a(0))
            for i in range(1, len(ins)):
                acc = acc + jnp.asarray(a(i))
            env[outs[0]] = acc
        elif code == _OP_GATHER:
            axis = scalar_opt(0, "<i", 0)
            if scalar_opt(1, "<i", 0):
                raise NotImplementedError(
                    "TFLite GATHER with batch_dims > 0")
            idx = jnp.asarray(a(1)).astype(jnp.int32)
            env[outs[0]] = jnp.take(jnp.asarray(a(0)), idx, axis=axis)
        elif code == _OP_CAST:
            to = _TT_NP.get(self._tensors[outs[0]]["dtype"])
            if to is None:
                raise NotImplementedError(
                    f"TFLite CAST to tensor type "
                    f"{self._tensors[outs[0]]['dtype']}")
            env[outs[0]] = jnp.asarray(a(0)).astype(to)
        elif code == _OP_TOPK_V2:
            x = jnp.asarray(a(0))
            k = int(np.asarray(_static(a(1), "TopKV2 k")).reshape(()))
            v, i = lax.top_k(x, k)
            env[outs[0]], env[outs[1]] = v, i
        elif code == _OP_TILE:
            reps = tuple(int(v) for v in
                         np.atleast_1d(_static(a(1), "Tile multiples")))
            env[outs[0]] = jnp.tile(jnp.asarray(a(0)), reps)
        elif code == _OP_EXPAND_DIMS:
            ax = int(np.asarray(_static(a(1), "ExpandDims axis")))
            env[outs[0]] = jnp.expand_dims(jnp.asarray(a(0)), ax)
        elif code == _OP_SHAPE:
            env[outs[0]] = np.asarray(a(0).shape, np.int32)
        elif code in (_OP_ARG_MAX, _OP_ARG_MIN):
            x = jnp.asarray(a(0))
            ax = int(np.asarray(_static(a(1), "ArgMax axis")))
            env[outs[0]] = (jnp.argmax if code == _OP_ARG_MAX
                            else jnp.argmin)(x, axis=ax)
        elif code == _OP_PACK:
            axis = scalar_opt(1, "<i", 0)
            env[outs[0]] = jnp.stack(
                [jnp.asarray(a(i)) for i in range(len(ins))], axis=axis)
        elif code == _OP_UNPACK:
            axis = scalar_opt(1, "<i", 0)
            x = jnp.asarray(a(0))
            for j, o in enumerate(outs):
                env[o] = lax.index_in_dim(x, j, axis=axis, keepdims=False)
        elif code in (_OP_REDUCE_MIN, _OP_REDUCE_PROD):
            x = jnp.asarray(a(0))
            axes = tuple(int(v) % x.ndim
                         for v in np.atleast_1d(_static(a(1), "reduce axes")))
            keep = bool(scalar_opt(0, "<b", 0))
            env[outs[0]] = (jnp.min if code == _OP_REDUCE_MIN else jnp.prod)(
                x, axis=axes, keepdims=keep)
        elif code == _OP_FILL:
            dims = tuple(int(v) for v in
                         np.atleast_1d(_static(a(0), "Fill dims")))
            env[outs[0]] = jnp.full(dims, jnp.asarray(a(1)))
        elif code == _OP_RANGE:
            env[outs[0]] = np.arange(
                int(np.asarray(_static(a(0), "Range start"))),
                int(np.asarray(_static(a(1), "Range limit"))),
                int(np.asarray(_static(a(2), "Range delta"))), np.int32)
        elif code == _OP_MIRROR_PAD:
            pads = _static(a(1), "MirrorPad paddings").astype(int)
            mode = "reflect" if scalar_opt(0, "<b", 0) == 0 else "symmetric"
            env[outs[0]] = jnp.pad(
                jnp.asarray(a(0)),
                [(int(lo), int(hi)) for lo, hi in pads], mode=mode)
        elif code == _OP_BATCH_MATMUL:
            x, y = jnp.asarray(a(0)), jnp.asarray(a(1))
            if scalar_opt(0, "<b", 0):
                x = jnp.swapaxes(x, -1, -2)
            if scalar_opt(1, "<b", 0):
                y = jnp.swapaxes(y, -1, -2)
            env[outs[0]] = jnp.matmul(x, y, precision=lax.Precision.HIGHEST)
        elif code == _OP_ONE_HOT:
            idx = jnp.asarray(a(0)).astype(jnp.int32)
            depth = int(np.asarray(_static(a(1), "OneHot depth")))
            on, off = jnp.asarray(a(2)), jnp.asarray(a(3))
            axis = scalar_opt(0, "<i", -1)
            oh = jax.nn.one_hot(idx, depth, axis=axis, dtype=on.dtype)
            env[outs[0]] = oh * on + (1 - oh) * off
        elif code in (_OP_DEPTH_TO_SPACE, _OP_SPACE_TO_DEPTH):
            x = jnp.asarray(a(0))                         # NHWC
            bs = scalar_opt(0, "<i", 2)
            n, h, w, c = x.shape
            if code == _OP_DEPTH_TO_SPACE:
                y = x.reshape(n, h, w, bs, bs, c // (bs * bs))
                y = y.transpose(0, 1, 3, 2, 4, 5)
                env[outs[0]] = y.reshape(n, h * bs, w * bs, c // (bs * bs))
            else:
                y = x.reshape(n, h // bs, bs, w // bs, bs, c)
                y = y.transpose(0, 1, 3, 2, 4, 5)
                env[outs[0]] = y.reshape(n, h // bs, w // bs, c * bs * bs)
        elif code in (_OP_RESIZE_BILINEAR, _OP_RESIZE_NEAREST_NEIGHBOR):
            x = jnp.asarray(a(0))                         # NHWC
            new_hw = [int(v) for v in _static(a(1), "Resize size")]
            if code == _OP_RESIZE_BILINEAR:
                # ResizeBilinearOptions: fields 0/1 are deprecated
                # new_height/new_width, 2 = align_corners, 3 =
                # half_pixel_centers
                ac = bool(scalar_opt(2, "<b", 0))
                hpc = bool(scalar_opt(3, "<b", 0))
            else:
                ac = bool(scalar_opt(0, "<b", 0))
                hpc = bool(scalar_opt(1, "<b", 0))
            if ac and hpc:
                raise NotImplementedError(
                    "TFLite Resize: align_corners with half_pixel_centers")
            y = x
            for ax, out_size in zip((1, 2), new_hw):
                in_size = y.shape[ax]
                if in_size == out_size:
                    continue
                idx = jnp.arange(out_size, dtype=jnp.float32)
                scale = ((in_size - 1) / max(out_size - 1, 1) if ac
                         else in_size / out_size)
                if code == _OP_RESIZE_BILINEAR:
                    xo = ((idx + 0.5) * scale - 0.5 if hpc
                          else idx * scale)
                    x0 = jnp.clip(jnp.floor(xo), 0, in_size - 1)
                    x1 = jnp.clip(x0 + 1, 0, in_size - 1)
                    w1 = jnp.clip(xo - x0, 0.0, 1.0)
                    g0 = jnp.take(y, x0.astype(jnp.int32), axis=ax)
                    g1 = jnp.take(y, x1.astype(jnp.int32), axis=ax)
                    shape = [1] * y.ndim
                    shape[ax] = out_size
                    y = g0 * (1.0 - w1.reshape(shape)) \
                        + g1 * w1.reshape(shape)
                else:
                    # reference_ops::ResizeNearestNeighbor rounding rules
                    if hpc:
                        j = jnp.floor((idx + 0.5) * scale)
                    elif ac:
                        j = jnp.round(idx * scale)
                    else:
                        j = jnp.floor(idx * scale)
                    j = jnp.clip(j, 0, in_size - 1).astype(jnp.int32)
                    y = jnp.take(y, j, axis=ax)
            env[outs[0]] = y
        elif code == _OP_TRANSPOSE_CONV:
            # inputs: output_shape (const), weights (O, KH, KW, I), x (NHWC),
            # optional bias; fractionally-strided conv with the flipped,
            # IO-swapped kernel (lite/kernels/transpose_conv.cc)
            out_shape = [int(v) for v in
                         _static(a(0), "TransposeConv output_shape")]
            w, x = jnp.asarray(a(1)), jnp.asarray(a(2))
            b = a(3) if len(ins) > 3 else None
            stride_w = scalar_opt(1, "<i", 1)
            stride_h = scalar_opt(2, "<i", 1)
            strides = (stride_h, stride_w)
            kdims = (int(w.shape[1]), int(w.shape[2]))
            pad_code = scalar_opt(0, "<b", 0)             # 0 SAME, 1 VALID
            padding = []
            for i in range(2):
                if pad_code == 0:                         # SAME
                    total = (strides[i] * (x.shape[1 + i] - 1) + kdims[i]
                             - out_shape[1 + i])
                    lo = total // 2
                    hi = total - lo
                else:                                     # VALID
                    lo = hi = 0
                padding.append((kdims[i] - 1 - lo, kdims[i] - 1 - hi))
            wk = jnp.flip(w, axis=(1, 2))                 # (O, KH, KW, I)
            wk = jnp.transpose(wk, (1, 2, 0, 3))          # (KH, KW, O, I)
            y = lax.conv_general_dilated(
                x, wk, window_strides=(1, 1), padding=padding,
                lhs_dilation=strides,
                dimension_numbers=("NHWC", "HWOI", "NHWC"),
                precision=lax.Precision.HIGHEST)
            if b is not None:
                y = y + jnp.asarray(b)
            env[outs[0]] = _fused(scalar_opt(3, "<b", 0), y)
        elif code == _OP_UNI_LSTM:
            env[outs[0]] = self._uni_lstm(op, env)
        else:  # pragma: no cover — constructor pre-screens opcodes
            raise NotImplementedError(
                f"TFLite executor: opcode {code} not implemented")

    # ---------------- exact integer execution (quantized='exact') --------

    _QINT = (3, 9)                       # uint8, int8 activation dtypes
    _QRANGE = {3: (0, 255), 9: (-128, 127)}
    _QNP = {3: np.uint8, 9: np.int8}
    # shape-only ops preserve dtype in the float handlers — no arithmetic
    _INT_PASSTHROUGH = frozenset((
        _OP_RESHAPE, _OP_SQUEEZE, _OP_TRANSPOSE, _OP_STRIDED_SLICE,
        _OP_SLICE, _OP_SPLIT, _OP_REVERSE_V2))

    def _qp(self, idx: int):
        """(scale float32 array, zero_point int array, quantized_dimension)
        for a tensor, or a typed error naming it."""
        t = self._tensors[idx]
        q = t.get("quant")
        if not (q and q["scale"]):
            raise NotImplementedError(
                f"TFLite executor (exact): tensor '{t['name']}' has no "
                "quantization parameters — cannot run integer kernels; "
                "use quantized='dequant'")
        scale = np.asarray(q["scale"], np.float32)
        zp = np.asarray(q["zero_point"] or [0], np.int64)
        if zp.size == 1 and scale.size > 1:
            zp = np.broadcast_to(zp, scale.shape)
        return scale, zp, int(q.get("dim", 0))

    def _qp_scalar(self, idx: int):
        """Per-tensor (scale, zp) — activations are always per-tensor."""
        scale, zp, _ = self._qp(idx)
        if scale.size != 1:
            raise NotImplementedError(
                f"TFLite executor (exact): tensor "
                f"'{self._tensors[idx]['name']}' carries per-channel "
                "quantization where a per-tensor activation is expected")
        return float(scale.reshape(-1)[0]), int(zp.reshape(-1)[0])

    def _requant_consts(self, real_multiplier):
        """Host-side Q31 decomposition; accepts scalar or per-channel."""
        from openwakeword_tpu.ops import qmath
        qm, sh = qmath.quantize_multipliers(np.atleast_1d(real_multiplier))
        if qm.size == 1:
            return int(qm[0]), int(sh[0])
        return qm, sh

    def _act_clamp_q(self, y_i32, act: int, out_idx: int):
        """Add nothing — clamp an int32 value (already including the output
        zero point) to the fused-activation range in the quantized domain
        and cast to the output tensor dtype."""
        from openwakeword_tpu.ops import qmath
        odt = self._tensors[out_idx]["dtype"]
        qmin, qmax = self._QRANGE[odt]
        scale, zp = self._qp_scalar(out_idx)
        amin, amax = qmath.quantized_activation_range(act, scale, zp,
                                                      qmin, qmax)
        return jnp.clip(y_i32, amin, amax).astype(self._QNP[odt])

    def _exec_int(self, op, env) -> bool:
        """Integer-kernel execution for ops whose output is a quantized
        int8/uint8 tensor (LiteRT semantics — see module docstring). Returns
        False when the op belongs on the float path."""
        from openwakeword_tpu.ops import qmath

        code = op["opcode"]
        ins, outs = op["inputs"], op["outputs"]
        opt = op.get("options")

        def a(i, what="input"):
            return self._val(env, ins[i] if i < len(ins) else -1, op, what)

        def scalar_opt(field, fmt, default):
            return opt.scalar(field, fmt, default) if opt is not None \
                else default

        in_dt = self._tensors[ins[0]]["dtype"] if ins and ins[0] >= 0 else 0
        if code == _OP_DEQUANTIZE and in_dt in self._QINT:
            scale, zp = self._qp_scalar(ins[0])
            env[outs[0]] = (jnp.asarray(a(0)).astype(jnp.float32) - zp) * scale
            return True
        odt = self._tensors[outs[0]]["dtype"] if outs else 0
        if odt == 7 or (code == _OP_DEQUANTIZE and in_dt == 7):
            raise NotImplementedError(
                "TFLite executor: int16 activations are unsupported under "
                "quantized='exact'; use quantized='dequant'")
        if odt not in self._QINT:
            return False                              # float path handles it
        if code in self._INT_PASSTHROUGH:
            return False                              # dtype-agnostic handler

        qmin, qmax = self._QRANGE[odt]
        np_odt = self._QNP[odt]

        if code == _OP_QUANTIZE:
            out_scale, out_zp = self._qp_scalar(outs[0])
            x = jnp.asarray(a(0))
            if in_dt in self._QINT:
                # int->int requantize (lite/kernels/quantize.cc Requantize)
                in_scale, in_zp = self._qp_scalar(ins[0])
                qm, sh = self._requant_consts(in_scale / out_scale)
                y = qmath.multiply_by_quantized_multiplier(
                    x.astype(jnp.int32) - in_zp, qm, sh) + out_zp
            else:
                # float->int AffineQuantize: TfLiteRound(x/scale) + zp
                y = qmath.round_half_away(
                    x.astype(jnp.float32) / out_scale).astype(jnp.int32) \
                    + out_zp
            env[outs[0]] = jnp.clip(y, qmin, qmax).astype(np_odt)
        elif code == _OP_FULLY_CONNECTED:
            x, w = jnp.asarray(a(0)), jnp.asarray(a(1))   # w: (out, in) int
            b = a(2)
            in_scale, in_zp = self._qp_scalar(ins[0])
            w_scale, w_zp, _ = self._qp(ins[1])
            out_scale, out_zp = self._qp_scalar(outs[0])
            keep = bool(scalar_opt(2, "<b", 0))
            h = x if keep else x.reshape(-1, w.shape[1])
            acc = jnp.matmul(h.astype(jnp.int32) - in_zp,
                             (w.astype(jnp.int32)
                              - w_zp.astype(np.int32).reshape(-1, 1)).T,
                             preferred_element_type=jnp.int32)
            if b is not None:
                acc = acc + jnp.asarray(b).astype(jnp.int32)
            qm, sh = self._requant_consts(
                in_scale * w_scale.reshape(-1) / out_scale)
            y = qmath.multiply_by_quantized_multiplier(acc, qm, sh) + out_zp
            env[outs[0]] = self._act_clamp_q(y, scalar_opt(0, "<b", 0),
                                             outs[0])
        elif code in (_OP_CONV_2D, _OP_DEPTHWISE_CONV_2D):
            x, w = jnp.asarray(a(0)), jnp.asarray(a(1))
            b = a(2)
            in_scale, in_zp = self._qp_scalar(ins[0])
            w_scale, w_zp, _ = self._qp(ins[1])
            out_scale, out_zp = self._qp_scalar(outs[0])
            padding = _pad_mode(scalar_opt(0, "<b", 0))
            stride_w = scalar_opt(1, "<i", 1)
            stride_h = scalar_opt(2, "<i", 1)
            # padded positions contribute nothing to the accumulator
            # (reference_integer_ops conv), which equals SAME-padding the
            # zero-point-subtracted input with zeros
            xs = x.astype(jnp.int32) - in_zp
            if code == _OP_CONV_2D:
                act = scalar_opt(3, "<b", 0)
                dil = (scalar_opt(5, "<i", 1), scalar_opt(4, "<i", 1))
                w_zp_b = w_zp.astype(np.int32).reshape(-1, 1, 1, 1) \
                    if w_zp.size > 1 else int(w_zp.reshape(-1)[0])
                ws = w.astype(jnp.int32) - w_zp_b            # (O,KH,KW,I)
                acc = lax.conv_general_dilated(
                    xs, ws, (stride_h, stride_w), padding, rhs_dilation=dil,
                    dimension_numbers=("NHWC", "OHWI", "NHWC"),
                    preferred_element_type=jnp.int32)
            else:
                act = scalar_opt(4, "<b", 0)
                dil = (scalar_opt(6, "<i", 1), scalar_opt(5, "<i", 1))
                cin = x.shape[-1]
                w_zp_b = w_zp.astype(np.int32).reshape(1, 1, 1, -1) \
                    if w_zp.size > 1 else int(w_zp.reshape(-1)[0])
                ws = w.astype(jnp.int32) - w_zp_b            # (1,KH,KW,C*M)
                acc = lax.conv_general_dilated(
                    xs, jnp.transpose(ws, (1, 2, 0, 3)),
                    (stride_h, stride_w), padding, rhs_dilation=dil,
                    feature_group_count=cin,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
            if b is not None:
                acc = acc + jnp.asarray(b).astype(jnp.int32)
            qm, sh = self._requant_consts(
                in_scale * w_scale.reshape(-1) / out_scale)
            y = qmath.multiply_by_quantized_multiplier(acc, qm, sh) + out_zp
            env[outs[0]] = self._act_clamp_q(y, act, outs[0])
        elif code == _OP_MAX_POOL_2D:
            x = jnp.asarray(a(0))
            padding = _pad_mode(scalar_opt(0, "<b", 0))
            strides = (1, scalar_opt(2, "<i", 1), scalar_opt(1, "<i", 1), 1)
            win = (1, scalar_opt(4, "<i", 1), scalar_opt(3, "<i", 1), 1)
            y = lax.reduce_window(x, np_odt(qmin), lax.max, win, strides,
                                  padding)
            env[outs[0]] = self._act_clamp_q(y.astype(jnp.int32),
                                             scalar_opt(5, "<b", 0), outs[0])
        elif code == _OP_AVERAGE_POOL_2D:
            # int32 window sum, count of in-image positions, then LiteRT's
            # rounded division: (acc +/- count/2) / count, trunc toward zero
            x = jnp.asarray(a(0)).astype(jnp.int32)
            padding = _pad_mode(scalar_opt(0, "<b", 0))
            strides = (1, scalar_opt(2, "<i", 1), scalar_opt(1, "<i", 1), 1)
            win = (1, scalar_opt(4, "<i", 1), scalar_opt(3, "<i", 1), 1)
            s = lax.reduce_window(x, jnp.int32(0), lax.add, win, strides,
                                  padding)
            n = lax.reduce_window(jnp.ones_like(x), jnp.int32(0), lax.add,
                                  win, strides, padding)
            y = jnp.sign(s) * ((jnp.abs(s) + n // 2) // n)
            env[outs[0]] = self._act_clamp_q(y, scalar_opt(5, "<b", 0),
                                             outs[0])
        elif code == _OP_MEAN:
            x = jnp.asarray(a(0))
            axes = tuple(int(v) % x.ndim
                         for v in np.atleast_1d(_static(a(1), "reduce axes")))
            keep = bool(scalar_opt(0, "<b", 0))
            in_scale, in_zp = self._qp_scalar(ins[0])
            out_scale, out_zp = self._qp_scalar(outs[0])
            num = int(np.prod([x.shape[d] for d in axes]))
            s = jnp.sum(x.astype(jnp.int32), axis=axes, keepdims=keep)
            if in_scale == out_scale and in_zp == out_zp:
                # reference_ops::Mean int path: rounded integer division
                y = jnp.sign(s) * ((jnp.abs(s) + num // 2) // num)
            else:
                # QuantizedMeanOrSum float path with TfLiteRound
                scale = in_scale / out_scale
                bias = -in_zp * scale
                y = qmath.round_half_away(
                    s.astype(jnp.float32) * scale / num + bias) \
                    .astype(jnp.int32) + out_zp
            env[outs[0]] = jnp.clip(y, qmin, qmax).astype(np_odt)
        elif code in (_OP_LOGISTIC, _OP_TANH):
            # the default op resolver's int8 kernels evaluate the float
            # function over all 256 input codes into a lookup table
            # (lite/kernels/activations.cc PopulateLookupTable)
            in_scale, in_zp = self._qp_scalar(ins[0])
            out_scale, out_zp = self._qp_scalar(outs[0])
            codes = np.arange(qmin, qmax + 1, dtype=np.int64)
            deq = (np.float32(in_scale)
                   * (codes - in_zp).astype(np.float32))
            f = (1.0 / (1.0 + np.exp(-deq, dtype=np.float32))
                 if code == _OP_LOGISTIC else np.tanh(deq, dtype=np.float32))
            vals = qmath.round_half_away_host(
                f / np.float32(out_scale)).astype(np.int64) + out_zp
            table = jnp.asarray(np.clip(vals, qmin, qmax).astype(np_odt))
            x = jnp.asarray(a(0))
            env[outs[0]] = jnp.take(table,
                                    x.astype(jnp.int32) - qmin, axis=0)
        elif code in (_OP_ADD, _OP_SUB):
            # reference_integer_ops::Add: rescale both operands into a
            # shared <<20 fixed-point domain, add, requantize
            left_shift = 20
            s1, z1 = self._qp_scalar(ins[0])
            s2, z2 = self._qp_scalar(ins[1])
            so, zo = self._qp_scalar(outs[0])
            twice_max = 2.0 * max(s1, s2)
            qm1, sh1 = self._requant_consts(s1 / twice_max)
            qm2, sh2 = self._requant_consts(s2 / twice_max)
            qmo, sho = self._requant_consts(
                twice_max / ((1 << left_shift) * so))
            v1 = (jnp.asarray(a(0)).astype(jnp.int32) - z1) * (1 << left_shift)
            v2 = (jnp.asarray(a(1)).astype(jnp.int32) - z2) * (1 << left_shift)
            sc1 = qmath.multiply_by_quantized_multiplier(v1, qm1, sh1)
            sc2 = qmath.multiply_by_quantized_multiplier(v2, qm2, sh2)
            raw = sc1 + sc2 if code == _OP_ADD else sc1 - sc2
            y = qmath.multiply_by_quantized_multiplier(raw, qmo, sho) + zo
            env[outs[0]] = self._act_clamp_q(y, scalar_opt(0, "<b", 0),
                                             outs[0])
        elif code == _OP_MUL:
            s1, z1 = self._qp_scalar(ins[0])
            s2, z2 = self._qp_scalar(ins[1])
            so, zo = self._qp_scalar(outs[0])
            raw = (jnp.asarray(a(0)).astype(jnp.int32) - z1) \
                * (jnp.asarray(a(1)).astype(jnp.int32) - z2)
            qm, sh = self._requant_consts(s1 * s2 / so)
            y = qmath.multiply_by_quantized_multiplier(raw, qm, sh) + zo
            env[outs[0]] = self._act_clamp_q(y, scalar_opt(0, "<b", 0),
                                             outs[0])
        elif code == _OP_CONCATENATION:
            so, zo = self._qp_scalar(outs[0])
            for i in range(len(ins)):
                si, zi = self._qp_scalar(ins[i])
                if si != so or zi != zo:
                    raise NotImplementedError(
                        "TFLite executor (exact): CONCATENATION with "
                        "mismatched input/output quantization is "
                        "unsupported; use quantized='dequant'")
            axis = scalar_opt(0, "<i", 0)
            if scalar_opt(1, "<b", 0):
                raise NotImplementedError(
                    "TFLite executor (exact): CONCATENATION with a fused "
                    "activation is unsupported")
            env[outs[0]] = jnp.concatenate(
                [jnp.asarray(a(i)) for i in range(len(ins))], axis=axis)
        elif code in (_OP_PAD, _OP_PADV2):
            x = jnp.asarray(a(0))
            pads = _static(a(1), "Pad paddings").astype(int)
            if code == _OP_PADV2 and len(ins) > 2 and ins[2] >= 0:
                cval = int(np.asarray(_static(a(2), "Pad value")))
            else:
                _, cval = self._qp_scalar(ins[0])    # pad with the zero point
            env[outs[0]] = jnp.pad(x, [(int(lo), int(hi)) for lo, hi in pads],
                                   constant_values=np_odt(cval))
        else:
            raise NotImplementedError(
                f"TFLite executor: op {_OP_NAMES.get(code, code)} has a "
                "quantized output, which is unsupported under "
                "quantized='exact'; run with quantized='dequant' "
                "(float emulation)")
        return True

    def _uni_lstm(self, op, env):
        """UNIDIRECTIONAL_SEQUENCE_LSTM, float path, gate order i,f,c,o
        (input indices per lite/kernels/lstm.cc; matches this package's
        exporter layout io/tflite_export.py)."""
        ins = op["inputs"]

        def g(i):
            v = self._val(env, ins[i] if i < len(ins) else -1, op)
            return None if v is None else jnp.asarray(v)

        opt = op.get("options")
        time_major = bool(opt.scalar(3, "<b", 0)) if opt is not None else False
        # UnidirectionalSequenceLSTMOptions field 1: cell_clip (converter
        # output commonly sets it; lite/kernels/lstm_eval.cc clips the cell
        # state each step when > 0)
        cell_clip = float(opt.scalar(1, "<f", 0.0)) if opt is not None else 0.0
        proj_clip = float(opt.scalar(2, "<f", 0.0)) if opt is not None else 0.0
        x = g(0)
        if time_major:
            x = jnp.swapaxes(x, 0, 1)                     # -> (B, T, I)
        w_i, w_f, w_c, w_o = g(1), g(2), g(3), g(4)       # (H, I)
        r_i, r_f, r_c, r_o = g(5), g(6), g(7), g(8)       # (H, H)
        b_i, b_f, b_c, b_o = g(12), g(13), g(14), g(15)
        # CIFG variant: input-gate tensors absent (index -1); the input gate
        # is coupled to the forget gate as i = 1 - f (lite/kernels/
        # lstm_eval.cc, use_cifg). All three must be absent together.
        cifg = w_i is None
        if cifg != (r_i is None) or (cifg and b_i is not None):
            raise NotImplementedError(
                "TFLite LSTM: malformed CIFG tensor set (input-gate "
                "weights/bias must all be absent together)")
        if any(v is not None for v in (g(9), g(10), g(11))):
            raise NotImplementedError("TFLite LSTM: peephole weights unsupported")
        if g(16) is not None:
            raise NotImplementedError("TFLite LSTM: projection unsupported")
        if proj_clip > 0.0:
            # only meaningful with projection weights, which are rejected
            # above — unreachable in practice, kept for clarity
            raise NotImplementedError("TFLite LSTM: proj_clip unsupported")
        B, H = x.shape[0], w_f.shape[0]
        # inputs 18/19 are the persistent activation/cell state variables
        # (lite/kernels/unidirectional_sequence_lstm.cc); zeros on a fresh
        # interpreter, threaded across calls under apply_stateful
        h0 = g(18)
        c0 = g(19)
        h0 = jnp.zeros((B, H), x.dtype) if h0 is None else h0.reshape(B, H)
        c0 = jnp.zeros((B, H), x.dtype) if c0 is None else c0.reshape(B, H)
        gates_x = [w_f, w_c, w_o] if cifg else [w_i, w_f, w_c, w_o]
        gates_h = [r_f, r_c, r_o] if cifg else [r_i, r_f, r_c, r_o]
        gates_b = [b_f, b_c, b_o] if cifg else [b_i, b_f, b_c, b_o]
        n_gates = len(gates_x)
        wx = jnp.concatenate(gates_x, axis=0)                  # (GH, I)
        wh = jnp.concatenate(gates_h, axis=0)                  # (GH, H)
        bias = jnp.concatenate(gates_b) \
            if gates_b[0] is not None else jnp.zeros(n_gates * H, x.dtype)
        xs = jnp.swapaxes(x, 0, 1)                             # (T, B, I)
        pre_x = jnp.einsum("tbi,gi->tbg", xs, wx,
                           precision=lax.Precision.HIGHEST) + bias

        def step(carry, px):
            h, c = carry
            z = px + jnp.matmul(h, wh.T, precision=lax.Precision.HIGHEST)
            if cifg:
                f, cc, o = jnp.split(z, 3, axis=-1)
                f_s = jax.nn.sigmoid(f)
                c = f_s * c + (1.0 - f_s) * jnp.tanh(cc)
            else:
                i, f, cc, o = jnp.split(z, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(cc)
            if cell_clip > 0.0:
                c = jnp.clip(c, -cell_clip, cell_clip)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        (h_fin, c_fin), hs = lax.scan(step, (h0, c0), pre_x)   # (T, B, H)
        if len(ins) > 19 and ins[18] >= 0 and ins[19] >= 0:    # persist state
            env[ins[18]] = h_fin
            env[ins[19]] = c_fin
        out = jnp.swapaxes(hs, 0, 1)                           # (B, T, H)
        return jnp.swapaxes(out, 0, 1) if time_major else out


def import_graph_head_tflite(path: str, model: Optional[Dict] = None,
                             quantized: str = "dequant"):
    """Arbitrary-architecture .tflite classifier -> generic 'graph' head
    (the TFLite twin of io.onnx_import.import_graph_head_onnx; same
    (B, F, 96) / (B, F*96) window contract, same 'graph' model_type).
    ``quantized='exact'`` runs int8 graphs with LiteRT integer-kernel
    semantics instead of the default dequantized-float emulation."""
    from openwakeword_tpu.io.graph_head import build_graph_head
    from openwakeword_tpu.io.tflite_import import load_tflite

    if model is None:
        model = load_tflite(path)
    prog = TfliteProgram(model, quantized=quantized)
    dims = list(model["tensors"][model["inputs"][0]]["shape"]) \
        if model["inputs"] else []
    return build_graph_head(prog, dims, path)
