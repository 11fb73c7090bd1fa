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

    def _offset_vector(self, offs):
        b = self.b
        b.StartVector(4, len(offs), 4)
        for o in reversed(offs):
            b.PrependUOffsetTRelative(o)
        return b.EndVector()

    # -- graph building --------------------------------------------------

    def add_tensor(self, shape, name: str, data: np.ndarray = None,
                   ttype: int = 0) -> int:
        buf_idx = 0
        if data is not None:
            self.buffers.append(self._buffer(np.ascontiguousarray(data).tobytes()))
            buf_idx = len(self.buffers) - 1
        b = self.b
        name_off = b.CreateString(name)
        shape_off = self._int_vector(list(shape))
        b.StartObject(6)
        b.PrependUOffsetTRelativeSlot(0, shape_off, 0)
        b.PrependInt8Slot(1, ttype, 0)
        b.PrependUint32Slot(2, buf_idx, 0)
        b.PrependUOffsetTRelativeSlot(3, name_off, 0)
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
    OPT_FULLY_CONNECTED = 8
    OPT_SOFTMAX = 9
    OPT_ADD = 11
    OPT_RESHAPE = 17
    OPT_MUL = 21
    OPT_REDUCER = 27
    OPT_SUB = 28
    OPT_SQUARED_DIFFERENCE = 76

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


def export_head_tflite(params: Dict, path: str, output_name: str = "output"):
    """Write a dnn/mlp head as a .tflite file."""
    meta = params["__meta__"]
    model_type = meta["model_type"]
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


def convert_onnx_to_tflite(onnx_model_path: str, output_path: str):
    """Convert a head .onnx into .tflite (reference train.py:574-593 entry
    point, without the tensorflow dependency)."""
    from openwakeword_tpu.io.onnx_import import import_head_onnx
    params, _ = import_head_onnx(onnx_model_path)
    export_head_tflite(params, output_path)
