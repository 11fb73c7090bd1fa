"""Export classifier heads as TFLite flatbuffers.

The reference converts trained heads ONNX -> TF SavedModel -> TFLite via
tensorflow (reference train.py:574-593); this writer emits the TFLite
flatbuffer directly with the flatbuffers runtime: RESHAPE -> FULLY_CONNECTED
chains with decomposed LayerNorm (MEAN / SQUARED_DIFFERENCE / ADD / RSQRT /
MUL / SUB) and LOGISTIC / SOFTMAX tails -- the same op vocabulary the
converter produces, with the builtin-options union populated per op
(FullyConnectedOptions, ReshapeOptions with new_shape, ReducerOptions with
keep_dims, Add/Sub/Mul fused-activation NONE, SoftmaxOptions beta=1) so
LiteRT can load the files; round-trip is validated against this package's
own reader in tests.

``convert_onnx_to_tflite`` keeps the reference's conversion entry point.
"""

from typing import Dict, List

import numpy as np

from openwakeword_tpu.io import tflite_import as TL


class _TfliteBuilder:
    def __init__(self):
        import flatbuffers
        self.b = flatbuffers.Builder(1 << 20)
        self.buffers = [self._buffer(b"")]          # buffer 0: by-convention empty
        self.tensors: List[int] = []
        self.opcodes: List[int] = []
        self._opcode_idx: Dict[int, int] = {}
        self.operators: List[int] = []

    # -- low-level table builders --------------------------------------

    def _buffer(self, data: bytes):
        b = self.b
        dv = b.CreateByteVector(data) if data else None
        b.StartObject(1)
        if dv:
            b.PrependUOffsetTRelativeSlot(0, dv, 0)
        return b.EndObject()

    def _int_vector(self, vals):
        b = self.b
        b.StartVector(4, len(vals), 4)
        for v in reversed(vals):
            b.PrependInt32(int(v))
        return b.EndVector()

    def _float_vector(self, vals):
        b = self.b
        b.StartVector(4, len(vals), 4)
        for v in reversed(vals):
            b.PrependFloat32(float(v))
        return b.EndVector()

    def _long_vector(self, vals):
        b = self.b
        b.StartVector(8, len(vals), 8)
        for v in reversed(vals):
            b.PrependInt64(int(v))
        return b.EndVector()

    def _quant_params(self, scales, zero_points, dim: int = 0):
        """QuantizationParameters table: min(0) max(1) scale(2)
        zero_point(3) details_type(4) details(5) quantized_dimension(6)."""
        s_off = self._float_vector(list(scales))
        z_off = self._long_vector(list(zero_points))
        b = self.b
        b.StartObject(7)
        b.PrependUOffsetTRelativeSlot(2, s_off, 0)
        b.PrependUOffsetTRelativeSlot(3, z_off, 0)
        if dim:
            b.PrependInt32Slot(6, dim, 0)
        return b.EndObject()

    def _offset_vector(self, offs):
        b = self.b
        b.StartVector(4, len(offs), 4)
        for o in reversed(offs):
            b.PrependUOffsetTRelative(o)
        return b.EndVector()

    # -- graph building --------------------------------------------------

    def add_tensor(self, shape, name: str, data: np.ndarray = None,
                   ttype: int = 0, is_variable: bool = False,
                   quant: tuple = None) -> int:
        """quant: optional (scales, zero_points, quantized_dimension)."""
        buf_idx = 0
        if data is not None:
            self.buffers.append(self._buffer(np.ascontiguousarray(data).tobytes()))
            buf_idx = len(self.buffers) - 1
        b = self.b
        q_off = self._quant_params(*quant) if quant is not None else None
        name_off = b.CreateString(name)
        shape_off = self._int_vector(list(shape))
        b.StartObject(6)
        b.PrependUOffsetTRelativeSlot(0, shape_off, 0)
        b.PrependInt8Slot(1, ttype, 0)
        b.PrependUint32Slot(2, buf_idx, 0)
        b.PrependUOffsetTRelativeSlot(3, name_off, 0)
        if q_off is not None:
            b.PrependUOffsetTRelativeSlot(4, q_off, 0)
        if is_variable:
            b.PrependBoolSlot(5, True, False)
        self.tensors.append(b.EndObject())
        return len(self.tensors) - 1

    def _opcode(self, code: int) -> int:
        if code not in self._opcode_idx:
            b = self.b
            b.StartObject(4)
            b.PrependInt8Slot(0, min(code, 127), 0)
            b.PrependInt32Slot(3, code, 0)
            self.opcodes.append(b.EndObject())
            self._opcode_idx[code] = len(self.opcodes) - 1
        return self._opcode_idx[code]

    # BuiltinOptions union discriminants (tensorflow/lite/schema/schema.fbs)
    OPT_CONV_2D = 1
    OPT_POOL_2D = 5
    OPT_FULLY_CONNECTED = 8
    OPT_SOFTMAX = 9
    OPT_ADD = 11
    OPT_RESHAPE = 17
    OPT_MUL = 21
    OPT_PAD = 22
    OPT_REDUCER = 27
    OPT_SUB = 28
    OPT_MAXIMUM_MINIMUM = 39
    OPT_TRANSPOSE = 26
    OPT_STRIDED_SLICE = 32
    OPT_SQUARED_DIFFERENCE = 76
    OPT_CONCATENATION = 10
    OPT_UNIDIRECTIONAL_SEQUENCE_LSTM = 71
    OPT_REVERSE_V2 = 81

    # Padding enum: SAME=0, VALID=1
    PAD_SAME, PAD_VALID = 0, 1
    # ActivationFunctionType: NONE=0, RELU=1, TANH=4
    ACT_NONE, ACT_RELU, ACT_TANH = 0, 1, 4

    def _conv2d_options(self, padding: int, stride_h: int, stride_w: int,
                        activation: int = 0):
        b = self.b
        b.StartObject(6)
        b.PrependInt8Slot(0, padding, 0)
        b.PrependInt32Slot(1, stride_w, 0)
        b.PrependInt32Slot(2, stride_h, 0)
        b.PrependInt8Slot(3, activation, 0)
        return b.EndObject()

    def _pool2d_options(self, padding: int, stride_h: int, stride_w: int,
                        filter_h: int, filter_w: int):
        b = self.b
        b.StartObject(6)
        b.PrependInt8Slot(0, padding, 0)
        b.PrependInt32Slot(1, stride_w, 0)
        b.PrependInt32Slot(2, stride_h, 0)
        b.PrependInt32Slot(3, filter_w, 0)
        b.PrependInt32Slot(4, filter_h, 0)
        return b.EndObject()

    def _strided_slice_options(self, begin_mask=0, end_mask=0,
                               ellipsis_mask=0, new_axis_mask=0,
                               shrink_axis_mask=0):
        b = self.b
        b.StartObject(5)
        b.PrependInt32Slot(0, begin_mask, 0)
        b.PrependInt32Slot(1, end_mask, 0)
        b.PrependInt32Slot(2, ellipsis_mask, 0)
        b.PrependInt32Slot(3, new_axis_mask, 0)
        b.PrependInt32Slot(4, shrink_axis_mask, 0)
        return b.EndObject()

    def _empty_options(self, n_fields: int = 1):
        """Options table with all-default fields (fused activation NONE)."""
        b = self.b
        b.StartObject(n_fields)
        return b.EndObject()

    def _reshape_options(self, new_shape):
        b = self.b
        v = self._int_vector(list(new_shape))
        b.StartObject(1)
        b.PrependUOffsetTRelativeSlot(0, v, 0)
        return b.EndObject()

    def _softmax_options(self, beta: float = 1.0):
        b = self.b
        b.StartObject(1)
        b.PrependFloat32Slot(0, beta, 0.0)
        return b.EndObject()

    def _reducer_options(self, keep_dims: bool):
        b = self.b
        b.StartObject(1)
        b.PrependBoolSlot(0, keep_dims, False)
        return b.EndObject()

    def _concatenation_options(self, axis: int):
        b = self.b
        b.StartObject(2)
        b.PrependInt32Slot(0, axis, 0)
        return b.EndObject()

    def _uni_lstm_options(self, time_major: bool = False):
        # UnidirectionalSequenceLSTMOptions: fused activation TANH (the
        # standard float LSTM), no cell/proj clip, batch-major layout
        b = self.b
        b.StartObject(6)
        b.PrependInt8Slot(0, self.ACT_TANH, 0)
        if time_major:
            b.PrependBoolSlot(3, True, False)
        return b.EndObject()

    def add_op(self, code: int, inputs, outputs, options_type: int = 0,
               options=None):
        """LiteRT requires the builtin-options union on ops that declare one
        (e.g. FULLY_CONNECTED's fused activation, MEAN's keep_dims); callers
        pass the discriminant + table built by the _*_options helpers."""
        b = self.b
        idx = self._opcode(code)
        ins, outs = self._int_vector(inputs), self._int_vector(outputs)
        b.StartObject(5)
        b.PrependUint32Slot(0, idx, 0)
        b.PrependUOffsetTRelativeSlot(1, ins, 0)
        b.PrependUOffsetTRelativeSlot(2, outs, 0)
        if options_type:
            b.PrependUint8Slot(3, options_type, 0)
            if options is not None:
                b.PrependUOffsetTRelativeSlot(4, options, 0)
        self.operators.append(b.EndObject())

    def finish(self, graph_inputs, graph_outputs, description="openwakeword_tpu") -> bytes:
        b = self.b
        tensors_off = self._offset_vector(self.tensors)
        ops_off = self._offset_vector(self.operators)
        sg_in, sg_out = self._int_vector(graph_inputs), self._int_vector(graph_outputs)
        b.StartObject(5)
        b.PrependUOffsetTRelativeSlot(0, tensors_off, 0)
        b.PrependUOffsetTRelativeSlot(1, sg_in, 0)
        b.PrependUOffsetTRelativeSlot(2, sg_out, 0)
        b.PrependUOffsetTRelativeSlot(3, ops_off, 0)
        sg = b.EndObject()

        desc = b.CreateString(description)
        sgs = self._offset_vector([sg])
        codes = self._offset_vector(self.opcodes)
        bufs = self._offset_vector(self.buffers)
        b.StartObject(8)
        b.PrependInt32Slot(0, 3, 0)          # schema version
        b.PrependUOffsetTRelativeSlot(1, codes, 0)
        b.PrependUOffsetTRelativeSlot(2, sgs, 0)
        b.PrependUOffsetTRelativeSlot(3, desc, 0)
        b.PrependUOffsetTRelativeSlot(4, bufs, 0)
        model = b.EndObject()
        b.Finish(model, b"TFL3")
        return bytes(b.Output())


def _export_rnn_head_tflite(params: Dict, path: str, output_name: str):
    """Write an rnn head (2-layer bidirectional LSTM -> Linear -> sigmoid,
    reference train.py:84-96) as a .tflite file.

    Each direction becomes one float UNIDIRECTIONAL_SEQUENCE_LSTM op
    (batch-major, fused TANH, variable h/c state tensors); the backward
    direction is REVERSE_V2-wrapped on the time axis before and after its
    LSTM so the concatenated (1, T, 2H) output matches torch/JAX
    bidirectional semantics. Gate tensors are per-gate (H, I) slices of the
    native torch-order (I, 4H) weights — TFLite's input/forget/cell/output
    order coincides with torch's i, f, g, o — and the per-gate bias carries
    b_ih + b_hh (the forward pass only ever consumes their sum).
    """
    meta = params["__meta__"]
    frames = int(meta["input_frames"])
    n_classes = int(meta["n_classes"])

    tb = _TfliteBuilder()
    x = tb.add_tensor([1, frames, 96], "input")
    cur, ch = x, 96
    layer = 0
    while f"lstm{layer}_fwd" in params:
        hidden = int(np.asarray(params[f"lstm{layer}_fwd"]["w_hh"]).shape[0])
        outs = []
        for tag in ("fwd", "bwd"):
            p = params[f"lstm{layer}_{tag}"]
            src = cur
            if tag == "bwd":
                axis = tb.add_tensor([1], f"l{layer}_rev_axis",
                                     np.asarray([1], np.int32), ttype=2)
                rev = tb.add_tensor([1, frames, ch], f"l{layer}_rev_in")
                tb.add_op(TL.OP_REVERSE_V2, [cur, axis], [rev],
                          tb.OPT_REVERSE_V2, tb._empty_options(1))
                src = rev
            w_ih = np.asarray(p["w_ih"], np.float32)        # (I, 4H)
            w_hh = np.asarray(p["w_hh"], np.float32)        # (H, 4H)
            bias = (np.asarray(p["b_ih"], np.float32)
                    + np.asarray(p["b_hh"], np.float32))    # (4H,)
            ins = [src]
            for g in range(4):
                wg = np.ascontiguousarray(w_ih[:, g * hidden:(g + 1) * hidden].T)
                ins.append(tb.add_tensor(list(wg.shape), f"l{layer}_{tag}_i2g{g}", wg))
            for g in range(4):
                wg = np.ascontiguousarray(w_hh[:, g * hidden:(g + 1) * hidden].T)
                ins.append(tb.add_tensor(list(wg.shape), f"l{layer}_{tag}_r2g{g}", wg))
            ins += [-1, -1, -1]                             # peephole weights
            for g in range(4):
                bg = np.ascontiguousarray(bias[g * hidden:(g + 1) * hidden])
                ins.append(tb.add_tensor([hidden], f"l{layer}_{tag}_bias{g}", bg))
            ins += [-1, -1]                                 # projection w/b
            ins.append(tb.add_tensor([1, hidden], f"l{layer}_{tag}_h_state",
                                     is_variable=True))
            ins.append(tb.add_tensor([1, hidden], f"l{layer}_{tag}_c_state",
                                     is_variable=True))
            ins += [-1, -1, -1, -1]                         # layer-norm coeffs
            out = tb.add_tensor([1, frames, hidden], f"l{layer}_{tag}_lstm")
            tb.add_op(TL.OP_UNIDIRECTIONAL_SEQUENCE_LSTM, ins, [out],
                      tb.OPT_UNIDIRECTIONAL_SEQUENCE_LSTM,
                      tb._uni_lstm_options())
            if tag == "bwd":
                axis2 = tb.add_tensor([1], f"l{layer}_unrev_axis",
                                      np.asarray([1], np.int32), ttype=2)
                unrev = tb.add_tensor([1, frames, hidden], f"l{layer}_bwd_aligned")
                tb.add_op(TL.OP_REVERSE_V2, [out, axis2], [unrev],
                          tb.OPT_REVERSE_V2, tb._empty_options(1))
                out = unrev
            outs.append(out)
        ch = 2 * hidden
        cat = tb.add_tensor([1, frames, ch], f"l{layer}_bilstm")
        tb.add_op(TL.OP_CONCATENATION, outs, [cat],
                  tb.OPT_CONCATENATION, tb._concatenation_options(2))
        cur = cat
        layer += 1

    begin = tb.add_tensor([3], "last_begin",
                          np.asarray([0, frames - 1, 0], np.int32), ttype=2)
    end = tb.add_tensor([3], "last_end",
                        np.asarray([1, frames, ch], np.int32), ttype=2)
    strd = tb.add_tensor([3], "last_strides",
                         np.asarray([1, 1, 1], np.int32), ttype=2)
    last3 = tb.add_tensor([1, 1, ch], "last_step")
    tb.add_op(TL.OP_STRIDED_SLICE, [cur, begin, end, strd], [last3],
              tb.OPT_STRIDED_SLICE, tb._strided_slice_options())
    shape_c = tb.add_tensor([2], "last_shape",
                            np.asarray([1, ch], np.int32), ttype=2)
    last = tb.add_tensor([1, ch], "last")
    tb.add_op(TL.OP_RESHAPE, [last3, shape_c], [last],
              tb.OPT_RESHAPE, tb._reshape_options([1, ch]))

    w = np.asarray(params["out"]["w"], np.float32).T        # (out, in)
    wi = tb.add_tensor(list(w.shape), "out_w", w)
    bi = tb.add_tensor([w.shape[0]], "out_b",
                       np.asarray(params["out"]["b"], np.float32))
    logits = tb.add_tensor([1, n_classes], "logits")
    tb.add_op(TL.OP_FULLY_CONNECTED, [last, wi, bi], [logits],
              tb.OPT_FULLY_CONNECTED, tb._empty_options(4))
    if n_classes == 1:
        final = tb.add_tensor([1, 1], output_name)
        tb.add_op(TL.OP_LOGISTIC, [logits], [final])
    else:
        if meta.get("relu_logits", True):
            r = tb.add_tensor([1, n_classes], "relu_logits")
            tb.add_op(TL.OP_RELU, [logits], [r])
            logits = r
        final = tb.add_tensor([1, n_classes], output_name)
        tb.add_op(TL.OP_SOFTMAX, [logits], [final],
                  tb.OPT_SOFTMAX, tb._softmax_options(1.0))
    data = tb.finish([x], [final])
    with open(path, "wb") as f:
        f.write(data)


def export_head_tflite(params: Dict, path: str, output_name: str = "output"):
    """Write a dnn/mlp/rnn head as a .tflite file."""
    meta = params["__meta__"]
    model_type = meta["model_type"]
    if model_type == "rnn":
        return _export_rnn_head_tflite(params, path, output_name)
    if model_type not in ("dnn", "mlp"):
        raise NotImplementedError(f"TFLite export for '{model_type}' heads is unsupported")
    frames = int(meta["input_frames"])
    n_classes = int(meta["n_classes"])
    n_in = frames * 96

    tb = _TfliteBuilder()
    x = tb.add_tensor([1, frames, 96], "input")
    shape_c = tb.add_tensor([2], "flatten_shape",
                            np.asarray([1, n_in], np.int32), ttype=2)
    flat = tb.add_tensor([1, n_in], "flat")
    tb.add_op(TL.OP_RESHAPE, [x, shape_c], [flat],
              tb.OPT_RESHAPE, tb._reshape_options([1, n_in]))
    cur, cur_dim = flat, n_in

    def fc(cur, cur_dim, p, name):
        w = np.asarray(p["w"], np.float32).T       # (out, in) tflite layout
        bvec = np.asarray(p["b"], np.float32)
        wi = tb.add_tensor(list(w.shape), name + "_w", w)
        bi = tb.add_tensor([w.shape[0]], name + "_b", bvec)
        out = tb.add_tensor([1, w.shape[0]], name)
        tb.add_op(TL.OP_FULLY_CONNECTED, [cur, wi, bi], [out],
                  tb.OPT_FULLY_CONNECTED, tb._empty_options(4))
        return out, w.shape[0]

    def layer_norm(cur, dim, p, name, eps=1e-5):
        axes = tb.add_tensor([1], name + "_axes", np.asarray([1], np.int32), ttype=2)
        mean = tb.add_tensor([1, 1], name + "_mean")
        tb.add_op(TL.OP_MEAN, [cur, axes], [mean],
                  tb.OPT_REDUCER, tb._reducer_options(True))
        sq = tb.add_tensor([1, dim], name + "_sqd")
        tb.add_op(TL.OP_SQUARED_DIFFERENCE, [cur, mean], [sq],
                  tb.OPT_SQUARED_DIFFERENCE, tb._empty_options(1))
        axes2 = tb.add_tensor([1], name + "_axes2", np.asarray([1], np.int32), ttype=2)
        var = tb.add_tensor([1, 1], name + "_var")
        tb.add_op(TL.OP_MEAN, [sq, axes2], [var],
                  tb.OPT_REDUCER, tb._reducer_options(True))
        epsc = tb.add_tensor([1], name + "_eps", np.asarray([eps], np.float32))
        vareps = tb.add_tensor([1, 1], name + "_vareps")
        tb.add_op(TL.OP_ADD, [var, epsc], [vareps],
                  tb.OPT_ADD, tb._empty_options(1))
        rstd = tb.add_tensor([1, 1], name + "_rstd")
        tb.add_op(TL.OP_RSQRT, [vareps], [rstd])
        centered = tb.add_tensor([1, dim], name + "_centered")
        tb.add_op(TL.OP_SUB, [cur, mean], [centered],
                  tb.OPT_SUB, tb._empty_options(1))
        normed = tb.add_tensor([1, dim], name + "_normed")
        tb.add_op(TL.OP_MUL, [centered, rstd], [normed],
                  tb.OPT_MUL, tb._empty_options(1))
        g = tb.add_tensor([dim], name + "_gamma", np.asarray(p["gamma"], np.float32))
        scaled = tb.add_tensor([1, dim], name + "_scaled")
        tb.add_op(TL.OP_MUL, [normed, g], [scaled],
                  tb.OPT_MUL, tb._empty_options(1))
        be = tb.add_tensor([dim], name + "_beta", np.asarray(p["beta"], np.float32))
        out = tb.add_tensor([1, dim], name)
        tb.add_op(TL.OP_ADD, [scaled, be], [out],
                  tb.OPT_ADD, tb._empty_options(1))
        return out

    def relu(cur, dim, name):
        out = tb.add_tensor([1, dim], name)
        tb.add_op(TL.OP_RELU, [cur], [out])
        return out

    if model_type == "dnn":
        cur, cur_dim = fc(cur, cur_dim, params["layer1"], "fc1")
        cur = layer_norm(cur, cur_dim, params["ln1"], "ln1")
        cur = relu(cur, cur_dim, "relu1")
        i = 0
        while f"block{i}_fc" in params:
            cur, cur_dim = fc(cur, cur_dim, params[f"block{i}_fc"], f"block{i}_fc")
            cur = layer_norm(cur, cur_dim, params[f"block{i}_ln"], f"block{i}_ln")
            cur = relu(cur, cur_dim, f"block{i}_relu")
            i += 1
    else:
        cur, cur_dim = fc(cur, cur_dim, params["layer1"], "fc1")
        cur = relu(cur, cur_dim, "relu1")
        cur, cur_dim = fc(cur, cur_dim, params["layer2"], "fc2")
        cur = relu(cur, cur_dim, "relu2")

    logits, cur_dim = fc(cur, cur_dim, params["out"], "logits")
    if n_classes == 1:
        final = tb.add_tensor([1, 1], output_name)
        tb.add_op(TL.OP_LOGISTIC, [logits], [final])
    else:
        if meta.get("relu_logits", True):
            logits = relu(logits, n_classes, "relu_logits")
        final = tb.add_tensor([1, n_classes], output_name)
        tb.add_op(TL.OP_SOFTMAX, [logits], [final],
                  tb.OPT_SOFTMAX, tb._softmax_options(1.0))

    data = tb.finish([x], [final])
    with open(path, "wb") as f:
        f.write(data)


def export_embedding_tflite(params: Dict, path: str):
    """Write the speech-embedding CNN as a .tflite file.

    Emits the BN-FOLDED form the TFLite converter produces for the
    reference's ``embedding_model.tflite`` (SURVEY.md section 2.2): CONV_2D
    ops carrying folded weights+bias (stem ReLU fused into its conv), the
    stem's unfoldable BatchNorm as vector MUL/ADD, and the clipped-leaky
    activation as scalar MUL/MAXIMUM ops. Input (1, 76, 32, 1) NHWC, output
    (1, 1, 1, 96). ``io.tflite_import.import_embedding_tflite`` round-trips
    the exact params (pinned in tests); accepts folded or unfolded pytrees.
    """
    from openwakeword_tpu.models import embedding
    folded = {k: {f: np.asarray(a, np.float32) for f, a in grp.items()}
              for k, grp in embedding.ensure_folded(params).items()}

    tb = _TfliteBuilder()
    h, w = embedding.INPUT_SHAPE[:2]
    x = tb.add_tensor([1, h, w, 1], "input")
    cur, ch = x, 1
    pending_pad = (0, 0)
    conv_i = bn_i = 0
    for layer in embedding.spec():
        kind = layer[0]
        if kind == "pad":
            pending_pad = layer[1]
        elif kind == "conv":
            _, out_ch, (kh, kw), padding, act = layer
            if pending_pad != (0, 0):
                ph, pw = pending_pad
                pads = tb.add_tensor([4, 2], f"pad{conv_i}_widths",
                                     np.asarray([[0, 0], [ph, ph], [pw, pw], [0, 0]],
                                                np.int32), ttype=2)
                h, w = h + 2 * ph, w + 2 * pw
                out = tb.add_tensor([1, h, w, ch], f"pad{conv_i}")
                tb.add_op(TL.OP_PAD, [cur, pads], [out],
                          tb.OPT_PAD, tb._empty_options(1))
                cur = out
                pending_pad = (0, 0)
            kern = np.transpose(folded[f"conv_{conv_i}"]["w"], (3, 0, 1, 2))  # HWIO->OHWI
            wi = tb.add_tensor(list(kern.shape), f"conv{conv_i}_w", kern)
            bi = tb.add_tensor([out_ch], f"conv{conv_i}_b",
                               folded[f"conv_{conv_i}"]["b"])
            if padding == "VALID":
                h, w = h - (kh - 1), w - (kw - 1)
            out = tb.add_tensor([1, h, w, out_ch], f"conv{conv_i}")
            tb.add_op(TL.OP_CONV_2D, [cur, wi, bi], [out], tb.OPT_CONV_2D,
                      tb._conv2d_options(
                          tb.PAD_VALID if padding == "VALID" else tb.PAD_SAME,
                          1, 1, tb.ACT_RELU if act == "relu" else tb.ACT_NONE))
            cur, ch = out, out_ch
            conv_i += 1
        elif kind == "bnact":
            aff = folded.get(f"affine_{bn_i}")
            if aff is not None:
                sc = tb.add_tensor([ch], f"bn{bn_i}_scale", aff["scale"])
                out = tb.add_tensor([1, h, w, ch], f"bn{bn_i}_scaled")
                tb.add_op(TL.OP_MUL, [cur, sc], [out],
                          tb.OPT_MUL, tb._empty_options(1))
                sh = tb.add_tensor([ch], f"bn{bn_i}_shift", aff["shift"])
                out2 = tb.add_tensor([1, h, w, ch], f"bn{bn_i}")
                tb.add_op(TL.OP_ADD, [out, sh], [out2],
                          tb.OPT_ADD, tb._empty_options(1))
                cur = out2
            # clipped leaky: max(max(0.2x, x), -0.4)
            slope = tb.add_tensor([1], f"leak{bn_i}_slope",
                                  np.asarray([0.2], np.float32))
            leak = tb.add_tensor([1, h, w, ch], f"leak{bn_i}")
            tb.add_op(TL.OP_MUL, [cur, slope], [leak],
                      tb.OPT_MUL, tb._empty_options(1))
            mx = tb.add_tensor([1, h, w, ch], f"leaky{bn_i}")
            tb.add_op(TL.OP_MAXIMUM, [leak, cur], [mx],
                      tb.OPT_MAXIMUM_MINIMUM, tb._empty_options(1))
            floor = tb.add_tensor([1], f"leak{bn_i}_floor",
                                  np.asarray([-0.4], np.float32))
            out = tb.add_tensor([1, h, w, ch], f"clip{bn_i}")
            tb.add_op(TL.OP_MAXIMUM, [mx, floor], [out],
                      tb.OPT_MAXIMUM_MINIMUM, tb._empty_options(1))
            cur = out
            bn_i += 1
        elif kind == "pool":
            _, window, strides, padding = layer
            if padding == "SAME":
                h, w = -(-h // strides[0]), -(-w // strides[1])
            else:
                h = (h - window[0]) // strides[0] + 1
                w = (w - window[1]) // strides[1] + 1
            out = tb.add_tensor([1, h, w, ch], f"pool{conv_i}_{bn_i}")
            tb.add_op(TL.OP_MAX_POOL_2D, [cur], [out], tb.OPT_POOL_2D,
                      tb._pool2d_options(
                          tb.PAD_VALID if padding == "VALID" else tb.PAD_SAME,
                          strides[0], strides[1], window[0], window[1]))
            cur = out
    if (h, w) != (1, 1):
        raise AssertionError(f"embedding tflite export shape tracking ended at "
                             f"{(h, w)}, expected (1, 1) -- layer spec changed?")
    data = tb.finish([x], [cur])
    with open(path, "wb") as f:
        f.write(data)


def export_melspectrogram_tflite(path: str, nominal_samples: int = 1760):
    """Write the analytic log-mel frontend as a .tflite file.

    Same op-for-op program (and the very same DFT/mel constants) as
    ``onnx_export.export_melspectrogram_onnx``, whose numerics are
    execution-verified against the native JAX frontend; this flatbuffer
    encoding is verified structurally (parse + constant round-trip). Input
    (1, samples) raw int16-range float32, output (frames, 32) power_to_db
    log-mel. Tensor shapes are declared for ``nominal_samples``; LiteRT
    callers resize the input tensor for other chunk sizes exactly as the
    reference does (reference utils.py:122-159).
    """
    from openwakeword_tpu import config
    from openwakeword_tpu.ops import melspec

    n_freqs = 1 + config.N_FFT // 2
    frames = melspec.num_frames(nominal_samples)
    tb = _TfliteBuilder()
    x = tb.add_tensor([1, nominal_samples], "input")
    shp = tb.add_tensor([4], "to_nhwc",
                        np.asarray([1, 1, nominal_samples, 1], np.int32), ttype=2)
    pcm = tb.add_tensor([1, 1, nominal_samples, 1], "pcm")
    tb.add_op(TL.OP_RESHAPE, [x, shp], [pcm], tb.OPT_RESHAPE,
              tb._reshape_options([1, 1, nominal_samples, 1]))

    basis = np.asarray(melspec.stft_power_basis(), np.float32)    # (512, 514)
    kern = np.ascontiguousarray(basis.T)[:, None, :, None]        # OHWI
    wi = tb.add_tensor(list(kern.shape), "dft_basis", kern)
    bi = tb.add_tensor([2 * n_freqs], "dft_bias",
                       np.zeros(2 * n_freqs, np.float32))
    spec = tb.add_tensor([1, 1, frames, 2 * n_freqs], "spec")
    tb.add_op(TL.OP_CONV_2D, [pcm, wi, bi], [spec], tb.OPT_CONV_2D,
              tb._conv2d_options(tb.PAD_VALID, 1, config.HOP_LENGTH))

    parts = []
    for name, start in (("re", 0), ("im", 1)):
        begin = tb.add_tensor([4], name + "_begin",
                              np.asarray([0, 0, 0, start], np.int32), ttype=2)
        end = tb.add_tensor([4], name + "_end",
                            np.asarray([0, 0, 0, 2 * n_freqs], np.int32), ttype=2)
        strd = tb.add_tensor([4], name + "_strides",
                             np.asarray([1, 1, 1, 2], np.int32), ttype=2)
        half = tb.add_tensor([1, 1, frames, n_freqs], name)
        tb.add_op(TL.OP_STRIDED_SLICE, [spec, begin, end, strd], [half],
                  tb.OPT_STRIDED_SLICE,
                  tb._strided_slice_options(begin_mask=0b0111, end_mask=0b0111))
        sq = tb.add_tensor([1, 1, frames, n_freqs], name + "2")
        tb.add_op(TL.OP_MUL, [half, half], [sq],
                  tb.OPT_MUL, tb._empty_options(1))
        parts.append(sq)
    power = tb.add_tensor([1, 1, frames, n_freqs], "power")
    tb.add_op(TL.OP_ADD, parts, [power], tb.OPT_ADD, tb._empty_options(1))

    melw = np.asarray(melspec.mel_filterbank(), np.float32).T     # (32, 257)
    mwi = tb.add_tensor(list(melw.shape), "mel_basis", melw)
    mbi = tb.add_tensor([config.N_MELS], "mel_bias",
                        np.zeros(config.N_MELS, np.float32))
    mel = tb.add_tensor([frames, config.N_MELS], "mel")
    tb.add_op(TL.OP_FULLY_CONNECTED, [power, mwi, mbi], [mel],
              tb.OPT_FULLY_CONNECTED, tb._empty_options(4))

    amin = tb.add_tensor([1], "amin", np.asarray([config.MEL_AMIN], np.float32))
    melc = tb.add_tensor([frames, config.N_MELS], "mel_clamped")
    tb.add_op(TL.OP_MAXIMUM, [mel, amin], [melc],
              tb.OPT_MAXIMUM_MINIMUM, tb._empty_options(1))
    mln = tb.add_tensor([frames, config.N_MELS], "mel_ln")
    tb.add_op(TL.OP_LOG, [melc], [mln])
    dbs = tb.add_tensor([1], "db_scale",
                        np.asarray([10.0 / np.log(10.0)], np.float32))
    cur = tb.add_tensor([frames, config.N_MELS], "mel_db")
    tb.add_op(TL.OP_MUL, [mln, dbs], [cur], tb.OPT_MUL, tb._empty_options(1))

    # mirror the ONNX twin's conditional stages exactly (power_to_db:
    # subtract 10*log10(ref) when nonzero; clamp only when top_db is set)
    ref_db = 10.0 * np.log10(max(config.MEL_AMIN, config.MEL_REF))
    if ref_db != 0.0:
        refc = tb.add_tensor([1], "ref_db", np.asarray([ref_db], np.float32))
        out = tb.add_tensor([frames, config.N_MELS], "mel_db_ref")
        tb.add_op(TL.OP_SUB, [cur, refc], [out],
                  tb.OPT_SUB, tb._empty_options(1))
        cur = out
    if config.MEL_TOP_DB is not None:
        axes = tb.add_tensor([2], "peak_axes", np.asarray([0, 1], np.int32),
                             ttype=2)
        peak = tb.add_tensor([1, 1], "db_peak")
        tb.add_op(TL.OP_REDUCE_MAX, [cur, axes], [peak],
                  tb.OPT_REDUCER, tb._reducer_options(True))
        topdb = tb.add_tensor([1], "top_db",
                              np.asarray([config.MEL_TOP_DB], np.float32))
        floor = tb.add_tensor([1, 1], "db_floor")
        tb.add_op(TL.OP_SUB, [peak, topdb], [floor],
                  tb.OPT_SUB, tb._empty_options(1))
        out = tb.add_tensor([frames, config.N_MELS], "melspectrogram")
        tb.add_op(TL.OP_MAXIMUM, [cur, floor], [out],
                  tb.OPT_MAXIMUM_MINIMUM, tb._empty_options(1))
        cur = out

    data = tb.finish([x], [cur])
    with open(path, "wb") as f:
        f.write(data)


def convert_onnx_to_tflite(onnx_model_path: str, output_path: str):
    """Convert a head .onnx into .tflite (reference train.py:574-593 entry
    point, without the tensorflow dependency)."""
    from openwakeword_tpu.io.onnx_import import import_head_onnx
    params, _ = import_head_onnx(onnx_model_path)
    export_head_tflite(params, output_path)
