"""Export trained heads as ONNX graphs loadable by the reference engine.

Emits only widely-supported primitive ops (Gemm, ReduceMean, Sub, Mul, Add,
Div, Sqrt, Relu, Sigmoid, Softmax at opset 13), mirroring how the reference's
published heads were produced by torch.onnx.export (reference
train.py:144-165): LayerNorm is decomposed, binary heads end in Sigmoid,
multiclass heads end in (Relu ->) Softmax.
"""

from typing import Dict

import numpy as np

from openwakeword_tpu.io import onnx_proto as op


def export_head_onnx(params: Dict, path: str, output_name: str = ""):
    meta = params["__meta__"]
    model_type = meta["model_type"]
    if model_type not in ("dnn", "mlp"):
        raise NotImplementedError(f"ONNX export for '{model_type}' heads is not supported yet")
    input_frames = int(meta["input_frames"])
    n_classes = int(meta["n_classes"])

    nodes, inits = [], []
    counter = [0]

    def t(name):
        counter[0] += 1
        return f"t{counter[0]}_{name}"

    def linear(x_name, p, out_name):
        w = np.asarray(p["w"], np.float32)       # (in, out)
        b = np.asarray(p["b"], np.float32)
        wn, bn = out_name + "_w", out_name + "_b"
        inits.append(op.encode_tensor(wn, w))
        inits.append(op.encode_tensor(bn, b))
        nodes.append(op.encode_node("Gemm", [x_name, wn, bn], [out_name]))
        return out_name

    def layer_norm(x_name, p, out_name, eps=1e-5):
        g = np.asarray(p["gamma"], np.float32)
        b = np.asarray(p["beta"], np.float32)
        mean = t("mean")
        nodes.append(op.encode_node("ReduceMean", [x_name], [mean], axes=[-1], keepdims=1))
        centered = t("centered")
        nodes.append(op.encode_node("Sub", [x_name, mean], [centered]))
        sq = t("sq")
        nodes.append(op.encode_node("Mul", [centered, centered], [sq]))
        var = t("var")
        nodes.append(op.encode_node("ReduceMean", [sq], [var], axes=[-1], keepdims=1))
        eps_n = t("eps")
        inits.append(op.encode_tensor(eps_n, np.asarray(eps, np.float32).reshape(())))
        var_eps = t("var_eps")
        nodes.append(op.encode_node("Add", [var, eps_n], [var_eps]))
        std = t("std")
        nodes.append(op.encode_node("Sqrt", [var_eps], [std]))
        normed = t("normed")
        nodes.append(op.encode_node("Div", [centered, std], [normed]))
        gn, bn2 = t("ln_gamma"), t("ln_beta")
        inits.append(op.encode_tensor(gn, g))
        inits.append(op.encode_tensor(bn2, b))
        scaled = t("scaled")
        nodes.append(op.encode_node("Mul", [normed, gn], [scaled]))
        nodes.append(op.encode_node("Add", [scaled, bn2], [out_name]))
        return out_name

    def relu(x_name, out_name):
        nodes.append(op.encode_node("Relu", [x_name], [out_name]))
        return out_name

    x = "input"
    flat = t("flat")
    shape_n = t("flatten_shape")
    inits.append(op.encode_tensor(shape_n, np.asarray([0, input_frames * 96], np.int64)))
    nodes.append(op.encode_node("Reshape", [x, shape_n], [flat]))
    h = flat

    if model_type == "dnn":
        h = linear(h, params["layer1"], t("fc1"))
        h = layer_norm(h, params["ln1"], t("ln1"))
        h = relu(h, t("relu1"))
        i = 0
        while f"block{i}_fc" in params:
            h = linear(h, params[f"block{i}_fc"], t(f"block{i}_fc"))
            h = layer_norm(h, params[f"block{i}_ln"], t(f"block{i}_ln"))
            h = relu(h, t(f"block{i}_relu"))
            i += 1
    else:  # mlp
        h = linear(h, params["layer1"], t("fc1"))
        h = relu(h, t("relu1"))
        h = linear(h, params["layer2"], t("fc2"))
        h = relu(h, t("relu2"))

    logits = linear(h, params["out"], t("logits"))
    final = output_name or (meta.get("name") or "output")
    if n_classes == 1:
        nodes.append(op.encode_node("Sigmoid", [logits], [final]))
    else:
        if meta.get("relu_logits", True):
            logits = relu(logits, t("relu_logits"))
        nodes.append(op.encode_node("Softmax", [logits], [final], axis=1))

    model = op.encode_model(
        nodes, inits,
        inputs=[op.encode_value_info("input", ["batch", input_frames, 96])],
        outputs=[op.encode_value_info(final, ["batch", n_classes])],
    )
    with open(path, "wb") as f:
        f.write(model)
