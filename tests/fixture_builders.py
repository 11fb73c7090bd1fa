"""Synthetic ONNX fixtures structurally exact to the reference's frozen
artifacts.

``build_silero_onnx`` emits a Silero-VAD-shaped graph (reference
openwakeword/vad.py:87-127 tensor contract): inputs ``input (B,T) float32``,
``sr int64``, ``h``/``c (2,B,64) float32``; outputs ``output (B,1)``,
``hn``/``cn``. Internally: an ``If`` switch on ``sr == 16000`` whose taken
branch runs reflect-pad -> STFT-as-Conv1d (DFT basis, 258 = 2x129 channels,
hop 64) -> magnitude -> 4-block strided Conv1d/BatchNorm/ReLU encoder ->
two stacked ONNX LSTM nodes (state sliced from / concatenated back to the
(2,B,64) contract, gate order iofc) -> ReLU -> 1x1 Conv head -> Sigmoid ->
time-mean. Weights are random but the *structure* (op sequence, attribute
placement, state routing, If nesting) mirrors the released silero_vad.onnx so
the importer is exercised on the real graph shape.

``build_melspec_onnx`` replicates the torch.onnx.export(opset 12) pattern of
the torchlibrosa feature extractor the released ``melspectrogram.onnx`` was
produced from (reference conversion notebook cell 15): real/imag STFT Conv1d
pair, transpose/unsqueeze to (B,1,T,F), Pow/Add power spectrum, MatMul mel
projection, and the monkey-patched power_to_db (Clip(amin) -> Log -> Div by
ln(10) -> Mul 10 -> Sub ref term -> data-dependent ReduceMax/Sub/Max top_db
floor).

``build_head_onnx`` replicates the torch.onnx.export pattern of the released
head artifacts: Flatten via Reshape, Gemm(transB=1), decomposed LayerNorm
(ReduceMean/Sub/Pow/Sqrt/Div/Mul/Add), Sigmoid tail for binary heads or the
timer's ReLU-logits + Softmax tail.

``build_embedding_onnx`` emits the Conv(OIHW)/BatchNormalization graph form
of the released embedding artifact from a given native param pytree.
"""

from typing import Dict, List, Tuple

import numpy as np

from openwakeword_tpu.io import onnx_proto as op

N_FFT = 256
HOP = 64
N_FREQ = N_FFT // 2 + 1          # 129
HIDDEN = 64


def _stft_basis() -> np.ndarray:
    """Forward DFT basis as a Conv1d weight (2*N_FREQ, 1, N_FFT): real rows
    then imaginary rows, Hann-windowed."""
    n = np.arange(N_FFT)
    k = np.arange(N_FREQ)[:, None]
    win = 0.5 - 0.5 * np.cos(2 * np.pi * n / N_FFT)
    cos = np.cos(2 * np.pi * k * n / N_FFT) * win
    sin = -np.sin(2 * np.pi * k * n / N_FFT) * win
    return np.concatenate([cos, sin], axis=0)[:, None, :].astype(np.float32)


def build_silero_onnx(path: str, rng: np.random.Generator) -> Dict:
    """Write a Silero-structured .onnx to ``path``; return the weight dict
    (clean keys) for an independent oracle implementation."""
    enc_spec = [(N_FREQ, 128, 1), (128, 64, 2), (64, 64, 2), (64, 128, 1)]
    weights: Dict = {"stft_w": _stft_basis(), "enc": []}
    for cin, cout, stride in enc_spec:
        weights["enc"].append({
            "w": rng.normal(0, 0.3 / np.sqrt(cin), (cout, cin, 3)).astype(np.float32),
            "b": rng.normal(0, 0.1, cout).astype(np.float32),
            "g": (1 + rng.normal(0, 0.1, cout)).astype(np.float32),
            "bb": rng.normal(0, 0.1, cout).astype(np.float32),
            "m": rng.normal(0, 0.1, cout).astype(np.float32),
            "v": np.abs(1 + rng.normal(0, 0.1, cout)).astype(np.float32),
            "stride": stride,
        })
    for name, in_dim in (("lstm0", 128), ("lstm1", HIDDEN)):
        weights[name] = {
            "W": rng.normal(0, 1 / np.sqrt(in_dim), (1, 4 * HIDDEN, in_dim)).astype(np.float32),
            "R": rng.normal(0, 1 / np.sqrt(HIDDEN), (1, 4 * HIDDEN, HIDDEN)).astype(np.float32),
            "B": rng.normal(0, 0.05, (1, 8 * HIDDEN)).astype(np.float32),
        }
    weights["head_w"] = rng.normal(0, 1 / np.sqrt(HIDDEN), (1, HIDDEN, 1)).astype(np.float32)
    weights["head_b"] = rng.normal(0, 0.1, 1).astype(np.float32)

    # ---- then-branch (16 kHz model) ----
    b_nodes: List[bytes] = []
    b_inits: List[bytes] = []

    def init(name, arr):
        b_inits.append(op.encode_tensor(name, np.asarray(arr)))
        return name

    init("stft_w", weights["stft_w"])
    init("pad6", np.asarray([0, 0, HOP, 0, 0, HOP], np.int64))
    init("s0", np.asarray([0], np.int64))
    init("s1", np.asarray([1], np.int64))
    init("s2", np.asarray([2], np.int64))
    init("sF", np.asarray([N_FREQ], np.int64))
    init("s2F", np.asarray([2 * N_FREQ], np.int64))
    init("ax0", np.asarray([0], np.int64))
    init("ax1", np.asarray([1], np.int64))

    b_nodes.append(op.encode_node("Unsqueeze", ["input", "ax1"], ["x3"]))
    b_nodes.append(op.encode_node("Pad", ["x3", "pad6"], ["padded"], mode="reflect"))
    b_nodes.append(op.encode_node("Conv", ["padded", "stft_w"], ["spec"],
                                  strides=[HOP], pads=[0, 0]))
    b_nodes.append(op.encode_node("Slice", ["spec", "s0", "sF", "ax1"], ["re"]))
    b_nodes.append(op.encode_node("Slice", ["spec", "sF", "s2F", "ax1"], ["im"]))
    b_nodes.append(op.encode_node("Mul", ["re", "re"], ["re2"]))
    b_nodes.append(op.encode_node("Mul", ["im", "im"], ["im2"]))
    b_nodes.append(op.encode_node("Add", ["re2", "im2"], ["mag2"]))
    b_nodes.append(op.encode_node("Sqrt", ["mag2"], ["mag"]))

    prev = "mag"
    for i, blk in enumerate(weights["enc"]):
        for suffix in ("w", "b", "g", "bb", "m", "v"):
            init(f"enc{i}_{suffix}", blk[suffix])
        b_nodes.append(op.encode_node("Conv", [prev, f"enc{i}_w", f"enc{i}_b"],
                                      [f"conv{i}"], strides=[blk["stride"]],
                                      pads=[1, 1], kernel_shape=[3]))
        b_nodes.append(op.encode_node(
            "BatchNormalization",
            [f"conv{i}", f"enc{i}_g", f"enc{i}_bb", f"enc{i}_m", f"enc{i}_v"],
            [f"bn{i}"]))
        b_nodes.append(op.encode_node("Relu", [f"bn{i}"], [f"enc{i}"]))
        prev = f"enc{i}"

    b_nodes.append(op.encode_node("Transpose", [prev], ["xs"], perm=[2, 0, 1]))
    b_nodes.append(op.encode_node("Slice", ["h", "s0", "s1", "ax0"], ["h0"]))
    b_nodes.append(op.encode_node("Slice", ["h", "s1", "s2", "ax0"], ["h1"]))
    b_nodes.append(op.encode_node("Slice", ["c", "s0", "s1", "ax0"], ["c0"]))
    b_nodes.append(op.encode_node("Slice", ["c", "s1", "s2", "ax0"], ["c1"]))
    for i in range(2):
        for suffix in ("W", "R", "B"):
            init(f"lstm{i}_{suffix}", weights[f"lstm{i}"][suffix])
    b_nodes.append(op.encode_node(
        "LSTM", ["xs", "lstm0_W", "lstm0_R", "lstm0_B", "", "h0", "c0"],
        ["Y0", "Yh0", "Yc0"], hidden_size=HIDDEN))
    b_nodes.append(op.encode_node("Squeeze", ["Y0", "ax1"], ["xs1"]))
    b_nodes.append(op.encode_node(
        "LSTM", ["xs1", "lstm1_W", "lstm1_R", "lstm1_B", "", "h1", "c1"],
        ["Y1", "Yh1", "Yc1"], hidden_size=HIDDEN))
    b_nodes.append(op.encode_node("Concat", ["Yh0", "Yh1"], ["hn16"], axis=0))
    b_nodes.append(op.encode_node("Concat", ["Yc0", "Yc1"], ["cn16"], axis=0))
    b_nodes.append(op.encode_node("Squeeze", ["Y1", "ax1"], ["ys"]))
    b_nodes.append(op.encode_node("Transpose", ["ys"], ["ysT"], perm=[1, 2, 0]))
    b_nodes.append(op.encode_node("Relu", ["ysT"], ["dec_in"]))
    init("head_w", weights["head_w"])
    init("head_b", weights["head_b"])
    b_nodes.append(op.encode_node("Conv", ["dec_in", "head_w", "head_b"], ["logit"]))
    b_nodes.append(op.encode_node("Sigmoid", ["logit"], ["probs"]))
    b_nodes.append(op.encode_node("ReduceMean", ["probs"], ["out16"],
                                  axes=[2], keepdims=0))

    then_graph = op.encode_graph(
        b_nodes, b_inits, [],
        [op.encode_value_info("out16", ["batch", 1]),
         op.encode_value_info("hn16", [2, "batch", HIDDEN]),
         op.encode_value_info("cn16", [2, "batch", HIDDEN])],
        graph_name="model_16k")

    # ---- else-branch (8 kHz stand-in: structurally present, numerically
    # irrelevant once the If folds on sr) ----
    e_nodes = [
        op.encode_node("ReduceMean", ["input"], ["m8"], axes=[1], keepdims=1),
        op.encode_node("Sigmoid", ["m8"], ["out8"]),
        op.encode_node("Identity", ["h"], ["hn8"]),
        op.encode_node("Identity", ["c"], ["cn8"]),
    ]
    else_graph = op.encode_graph(
        e_nodes, [], [],
        [op.encode_value_info("out8", ["batch", 1]),
         op.encode_value_info("hn8", [2, "batch", HIDDEN]),
         op.encode_value_info("cn8", [2, "batch", HIDDEN])],
        graph_name="model_8k")

    # ---- top level ----
    nodes = [
        op.encode_node("Equal", ["sr", "sr16"], ["cond"]),
        op.encode_node("If", ["cond"], ["output", "hn", "cn"],
                       name="sr_switch",
                       then_branch=op.GraphAttr(then_graph),
                       else_branch=op.GraphAttr(else_graph)),
    ]
    inits = [op.encode_tensor("sr16", np.asarray(16000, np.int64))]
    inputs = [
        op.encode_value_info("input", ["batch", "samples"]),
        op.encode_value_info("sr", [], elem_type=op.TP_INT64),
        op.encode_value_info("h", [2, "batch", HIDDEN]),
        op.encode_value_info("c", [2, "batch", HIDDEN]),
    ]
    outputs = [
        op.encode_value_info("output", ["batch", 1]),
        op.encode_value_info("hn", [2, "batch", HIDDEN]),
        op.encode_value_info("cn", [2, "batch", HIDDEN]),
    ]
    with open(path, "wb") as f:
        f.write(op.encode_model(nodes, inits, inputs, outputs,
                                graph_name="silero_vad", opset=16))
    return weights


def build_melspec_onnx(path: str) -> None:
    """torchlibrosa-pattern melspectrogram graph (true analytic weights, so
    the compiled program must agree with ops.melspec to float tolerance).
    Output is the raw dB spectrogram (B,1,T,32) -- the /10+2 affine is applied
    downstream in Python, exactly as the reference does (utils.py:180)."""
    from openwakeword_tpu.ops import melspec as ms
    from openwakeword_tpu import config

    basis = np.asarray(ms.stft_power_basis(), np.float32)     # (512, 2*257)
    w_real = basis[:, 0::2].T[:, None, :]                     # (257, 1, 512)
    w_imag = basis[:, 1::2].T[:, None, :]
    melw = np.asarray(ms.mel_filterbank(), np.float32)        # (257, 32)

    inits = [op.encode_tensor(n, a) for n, a in [
        ("stft.conv_real.weight", w_real), ("stft.conv_imag.weight", w_imag),
        ("melW", melw),
        ("amin", np.float32(config.MEL_AMIN).reshape(())),
        ("ln10", np.float32(np.log(10.0)).reshape(())),
        ("ten", np.float32(10.0).reshape(())),
        ("ref_term", np.float32(0.0).reshape(())),
        ("top_db", np.float32(config.MEL_TOP_DB).reshape(())),
        ("ax1", np.asarray([1], np.int64)),
    ]]
    nodes = [
        op.encode_node("Unsqueeze", ["input", "ax1"], ["x3"]),
        op.encode_node("Conv", ["x3", "stft.conv_real.weight"], ["re"],
                       strides=[config.HOP_LENGTH], pads=[0, 0]),
        op.encode_node("Conv", ["x3", "stft.conv_imag.weight"], ["im"],
                       strides=[config.HOP_LENGTH], pads=[0, 0]),
        op.encode_node("Transpose", ["re"], ["reT"], perm=[0, 2, 1]),
        op.encode_node("Transpose", ["im"], ["imT"], perm=[0, 2, 1]),
        op.encode_node("Unsqueeze", ["reT", "ax1"], ["re4"]),
        op.encode_node("Unsqueeze", ["imT", "ax1"], ["im4"]),
        op.encode_node("Mul", ["re4", "re4"], ["re2"]),
        op.encode_node("Mul", ["im4", "im4"], ["im2"]),
        op.encode_node("Add", ["re2", "im2"], ["power"]),
        op.encode_node("MatMul", ["power", "melW"], ["mel"]),
        op.encode_node("Clip", ["mel", "amin"], ["clipped"]),
        op.encode_node("Log", ["clipped"], ["ln"]),
        op.encode_node("Div", ["ln", "ln10"], ["log10"]),
        op.encode_node("Mul", ["log10", "ten"], ["db_raw"]),
        op.encode_node("Sub", ["db_raw", "ref_term"], ["db"]),
        op.encode_node("ReduceMax", ["db"], ["peak"], keepdims=0),
        op.encode_node("Sub", ["peak", "top_db"], ["floor"]),
        op.encode_node("Max", ["db", "floor"], ["output"]),
    ]
    with open(path, "wb") as f:
        f.write(op.encode_model(
            nodes, inits,
            [op.encode_value_info("input", ["batch_size", "samples"])],
            [op.encode_value_info("output", ["batch_size", 1, "time", 32])],
            graph_name="torchlibrosa_melspectrogram", opset=12))


def _ln_nodes(nodes, inits, x_name, out_name, gamma, beta, tag):
    """torch opset-12/13 decomposed LayerNorm."""
    inits.append(op.encode_tensor(f"{tag}.weight", gamma))
    inits.append(op.encode_tensor(f"{tag}.bias", beta))
    inits.append(op.encode_tensor(f"{tag}.eps", np.float32(1e-5).reshape(())))
    inits.append(op.encode_tensor(f"{tag}.two", np.float32(2.0).reshape(())))
    nodes += [
        op.encode_node("ReduceMean", [x_name], [f"{tag}.mu"], axes=[-1], keepdims=1),
        op.encode_node("Sub", [x_name, f"{tag}.mu"], [f"{tag}.cen"]),
        op.encode_node("Pow", [f"{tag}.cen", f"{tag}.two"], [f"{tag}.sq"]),
        op.encode_node("ReduceMean", [f"{tag}.sq"], [f"{tag}.var"], axes=[-1], keepdims=1),
        op.encode_node("Add", [f"{tag}.var", f"{tag}.eps"], [f"{tag}.vareps"]),
        op.encode_node("Sqrt", [f"{tag}.vareps"], [f"{tag}.std"]),
        op.encode_node("Div", [f"{tag}.cen", f"{tag}.std"], [f"{tag}.norm"]),
        op.encode_node("Mul", [f"{tag}.norm", f"{tag}.weight"], [f"{tag}.scaled"]),
        op.encode_node("Add", [f"{tag}.scaled", f"{tag}.bias"], [out_name]),
    ]


def build_head_onnx(path: str, rng: np.random.Generator, model_type: str = "dnn",
                    input_frames: int = 16, n_classes: int = 1,
                    layer_dim: int = 64, n_blocks: int = 1,
                    output_name: str = "output") -> Dict:
    """torch-export-style head graph; returns the native params pytree with
    the same weights for oracle comparison (models.heads.apply layout)."""
    n_in = input_frames * 96
    nodes: List[bytes] = []
    inits: List[bytes] = []
    params: Dict = {}

    def linear(x_name, out_name, din, dout, tag, scale=0.1):
        w = rng.normal(0, scale, (dout, din)).astype(np.float32)   # torch (out,in)
        b = rng.normal(0, 0.05, dout).astype(np.float32)
        inits.append(op.encode_tensor(f"{tag}.weight", w))
        inits.append(op.encode_tensor(f"{tag}.bias", b))
        nodes.append(op.encode_node("Gemm", [x_name, f"{tag}.weight", f"{tag}.bias"],
                                    [out_name], transB=1, alpha=1.0, beta=1.0))
        return {"w": w.T.copy(), "b": b}

    inits.append(op.encode_tensor("flat_shape", np.asarray([0, n_in], np.int64)))
    nodes.append(op.encode_node("Reshape", ["input", "flat_shape"], ["flat"]))

    if model_type == "dnn":
        params["layer1"] = linear("flat", "fc1", n_in, layer_dim, "model.0")
        g = (1 + rng.normal(0, 0.1, layer_dim)).astype(np.float32)
        b = rng.normal(0, 0.1, layer_dim).astype(np.float32)
        _ln_nodes(nodes, inits, "fc1", "ln1", g, b, "model.1")
        params["ln1"] = {"gamma": g, "beta": b}
        nodes.append(op.encode_node("Relu", ["ln1"], ["act1"]))
        prev = "act1"
        for i in range(n_blocks):
            # reference FCNBlock order: relu(layer_norm(fc(x)))
            # (reference train.py:56-64)
            params[f"block{i}_fc"] = linear(prev, f"blk{i}.fc", layer_dim, layer_dim,
                                            f"model.{3 + i}.0")
            g = (1 + rng.normal(0, 0.1, layer_dim)).astype(np.float32)
            b = rng.normal(0, 0.1, layer_dim).astype(np.float32)
            _ln_nodes(nodes, inits, f"blk{i}.fc", f"blk{i}.ln", g, b, f"model.{3 + i}.2")
            params[f"block{i}_ln"] = {"gamma": g, "beta": b}
            nodes.append(op.encode_node("Relu", [f"blk{i}.ln"], [f"blk{i}.relu"]))
            prev = f"blk{i}.relu"
        params["out"] = linear(prev, "logits", layer_dim, n_classes, "model.out")
        nodes.append(op.encode_node("Sigmoid", ["logits"], [output_name]))
        meta = {"model_type": "dnn", "input_frames": input_frames,
                "n_classes": n_classes, "layer_dim": layer_dim, "n_blocks": n_blocks}
    elif model_type == "mlp":
        params["layer1"] = linear("flat", "fc1", n_in, layer_dim, "model.0")
        nodes.append(op.encode_node("Relu", ["fc1"], ["act1"]))
        params["layer2"] = linear("act1", "fc2", layer_dim, layer_dim, "model.2")
        nodes.append(op.encode_node("Relu", ["fc2"], ["act2"]))
        params["out"] = linear("act2", "logits", layer_dim, n_classes, "model.4")
        # the released timer head applies ReLU to the logits before the
        # export-time softmax wrapper (heads relu_logits meta)
        nodes.append(op.encode_node("Relu", ["logits"], ["relu_logits"]))
        nodes.append(op.encode_node("Softmax", ["relu_logits"], [output_name], axis=-1))
        meta = {"model_type": "mlp", "input_frames": input_frames,
                "n_classes": n_classes, "layer_dim": layer_dim, "relu_logits": True}
    else:
        raise ValueError(model_type)

    with open(path, "wb") as f:
        f.write(op.encode_model(
            nodes, inits,
            [op.encode_value_info("input", ["batch", input_frames, 96])],
            [op.encode_value_info(output_name, ["batch", n_classes])],
            graph_name=output_name, opset=13))
    params["__meta__"] = meta
    return params


def build_embedding_onnx(path: str, params: Dict) -> None:
    """tf2onnx-style export of the released embedding CNN: NHWC graph input
    (B,76,32,1), boundary Transposes to/from NCHW, Conv(OIHW, explicit pads),
    BatchNormalization, the clipped-leaky activation as Mul/Max pairs
    (conversion notebook cell 18), and MaxPool nodes. Semantically executable
    end-to-end, from a native (unfolded) param pytree
    (models.embedding.init_params layout)."""
    from openwakeword_tpu.models import embedding

    nodes: List[bytes] = []
    inits: List[bytes] = []
    inits.append(op.encode_tensor("alpha", np.float32(0.2).reshape(())))
    inits.append(op.encode_tensor("clip_lo", np.float32(-0.4000000059604645).reshape(())))
    nodes.append(op.encode_node("Transpose", ["input_1"], ["nchw"], perm=[0, 3, 1, 2]))
    prev = "nchw"
    conv_i = bn_i = act_i = 0
    stem_relu = [False]

    def bn_activation(prev):
        nonlocal act_i
        nodes.append(op.encode_node("Mul", [prev, "alpha"], [f"act{act_i}.scaled"]))
        nodes.append(op.encode_node("Max", [f"act{act_i}.scaled", prev], [f"act{act_i}.leak"]))
        nodes.append(op.encode_node("Max", [f"act{act_i}.leak", "clip_lo"], [f"act{act_i}"]))
        out = f"act{act_i}"
        act_i += 1
        return out

    for layer in embedding.spec():
        if layer[0] == "pad":
            ph, pw = layer[1]
            inits.append(op.encode_tensor(
                "stem_pads", np.asarray([0, 0, ph, pw, 0, 0, ph, pw], np.int64)))
            nodes.append(op.encode_node("Pad", [prev, "stem_pads"], ["padded"],
                                        mode="constant"))
            prev = "padded"
        elif layer[0] == "conv":
            _, out_ch, (kh, kw), padding, act = layer
            w = np.transpose(np.asarray(params[f"conv_{conv_i}"]["w"], np.float32),
                             (3, 2, 0, 1))                     # HWIO -> OIHW
            inits.append(op.encode_tensor(f"conv{conv_i}.weight", w))
            pads = [0, 0, 0, 0] if padding == "VALID" else \
                [(kh - 1) // 2, (kw - 1) // 2, kh // 2, kw // 2]
            nodes.append(op.encode_node("Conv", [prev, f"conv{conv_i}.weight"],
                                        [f"conv{conv_i}"], kernel_shape=[kh, kw],
                                        strides=[1, 1], pads=pads))
            prev = f"conv{conv_i}"
            if act == "relu":
                nodes.append(op.encode_node("Relu", [prev], [f"conv{conv_i}.relu"]))
                prev = f"conv{conv_i}.relu"
            conv_i += 1
        elif layer[0] == "bnact":
            bn = params[f"bn_{bn_i}"]
            for nm, arr in [("gamma", bn["gamma"]), ("beta", bn["beta"]),
                            ("mean", bn["mean"]), ("var", bn["var"])]:
                inits.append(op.encode_tensor(f"bn{bn_i}.{nm}", np.asarray(arr, np.float32)))
            nodes.append(op.encode_node(
                "BatchNormalization",
                [prev, f"bn{bn_i}.gamma", f"bn{bn_i}.beta", f"bn{bn_i}.mean", f"bn{bn_i}.var"],
                [f"bn{bn_i}"], epsilon=float(embedding.BN_EPS)))  # Keras default
            prev = bn_activation(f"bn{bn_i}")
            bn_i += 1
        elif layer[0] == "pool":
            _, ksize, strides, padding = layer
            attrs = dict(kernel_shape=list(ksize), strides=list(strides))
            if padding == "SAME":
                attrs["auto_pad"] = "SAME_UPPER"
            nodes.append(op.encode_node("MaxPool", [prev], [f"pool{conv_i}_{bn_i}"], **attrs))
            prev = f"pool{conv_i}_{bn_i}"
    nodes.append(op.encode_node("Transpose", [prev], ["output"], perm=[0, 2, 3, 1]))
    with open(path, "wb") as f:
        f.write(op.encode_model(
            nodes, inits,
            [op.encode_value_info("input_1", ["batch", 76, 32, 1])],
            [op.encode_value_info("output", ["batch", 1, 1, 96])],
            graph_name="embedding_model", opset=13))


def build_cnn_graph_head_onnx(path: str, z: Dict) -> None:
    """Conv1d-tower classifier (torch CnnHead in graph_head_oracle.py) as the
    TorchScript exporter would emit it: Transpose -> Conv/Relu x2 ->
    ReduceMean -> Gemm -> Sigmoid. NOT one of the train.py head families —
    exercises the generic graph-head import."""
    nodes: List[bytes] = []
    inits: List[bytes] = []
    for key in ("conv1.weight", "conv1.bias", "conv2.weight", "conv2.bias",
                "fc.weight", "fc.bias"):
        inits.append(op.encode_tensor(key, np.asarray(z[key], np.float32)))
    nodes.append(op.encode_node("Transpose", ["emb"], ["t0"], perm=[0, 2, 1]))
    nodes.append(op.encode_node("Conv", ["t0", "conv1.weight", "conv1.bias"],
                                ["c1"], kernel_shape=[3], pads=[1, 1], strides=[1]))
    nodes.append(op.encode_node("Relu", ["c1"], ["a1"]))
    nodes.append(op.encode_node("Conv", ["a1", "conv2.weight", "conv2.bias"],
                                ["c2"], kernel_shape=[3], pads=[1, 1], strides=[1]))
    nodes.append(op.encode_node("Relu", ["c2"], ["a2"]))
    nodes.append(op.encode_node("ReduceMean", ["a2"], ["pooled"],
                                axes=[2], keepdims=0))
    nodes.append(op.encode_node("Gemm", ["pooled", "fc.weight", "fc.bias"],
                                ["logits"], transB=1, alpha=1.0, beta=1.0))
    nodes.append(op.encode_node("Sigmoid", ["logits"], ["score"]))
    with open(path, "wb") as f:
        f.write(op.encode_model(
            nodes, inits,
            [op.encode_value_info("emb", ["batch", 16, 96])],
            [op.encode_value_info("score", ["batch", 1])],
            graph_name="cnn_graph_head", opset=13))


def build_attn_graph_head_onnx(path: str, z: Dict) -> None:
    """Attention-pooled 3-class classifier over a FLATTENED (B, 1536) input
    (torch AttnPoolHead in graph_head_oracle.py): Reshape -> MatMul/Add/Tanh
    -> MatMul/Add -> Softmax(axis=1) -> Mul -> ReduceSum -> Gemm -> Softmax.
    Exercises the rank-2 input contract of the generic graph-head import."""
    nodes: List[bytes] = []
    inits: List[bytes] = []
    # 3-D linears export as MatMul(x, W^T) + Add(b); the 2-D tail as Gemm
    inits.append(op.encode_tensor("proj.w", np.asarray(z["proj.weight"], np.float32).T.copy()))
    inits.append(op.encode_tensor("proj.b", np.asarray(z["proj.bias"], np.float32)))
    inits.append(op.encode_tensor("score.w", np.asarray(z["score.weight"], np.float32).T.copy()))
    inits.append(op.encode_tensor("score.b", np.asarray(z["score.bias"], np.float32)))
    inits.append(op.encode_tensor("out.weight", np.asarray(z["out.weight"], np.float32)))
    inits.append(op.encode_tensor("out.bias", np.asarray(z["out.bias"], np.float32)))
    inits.append(op.encode_tensor("win_shape", np.asarray([-1, 16, 96], np.int64)))
    nodes.append(op.encode_node("Reshape", ["emb", "win_shape"], ["win"]))
    nodes.append(op.encode_node("MatMul", ["win", "proj.w"], ["p0"]))
    nodes.append(op.encode_node("Add", ["p0", "proj.b"], ["p1"]))
    nodes.append(op.encode_node("Tanh", ["p1"], ["h"]))
    nodes.append(op.encode_node("MatMul", ["h", "score.w"], ["s0"]))
    nodes.append(op.encode_node("Add", ["s0", "score.b"], ["s1"]))
    nodes.append(op.encode_node("Softmax", ["s1"], ["attn"], axis=1))
    nodes.append(op.encode_node("Mul", ["h", "attn"], ["weighted"]))
    nodes.append(op.encode_node("ReduceSum", ["weighted"], ["pooled"],
                                axes=[1], keepdims=0))
    nodes.append(op.encode_node("Gemm", ["pooled", "out.weight", "out.bias"],
                                ["logits"], transB=1, alpha=1.0, beta=1.0))
    nodes.append(op.encode_node("Softmax", ["logits"], ["score"], axis=-1))
    with open(path, "wb") as f:
        f.write(op.encode_model(
            nodes, inits,
            [op.encode_value_info("emb", ["batch", 16 * 96])],
            [op.encode_value_info("score", ["batch", 3])],
            graph_name="attn_graph_head", opset=13))


def build_cnn2d_graph_head_tflite(path: str, z: Dict) -> None:
    """microWakeWord-style depthwise-CNN .tflite classifier (torch Cnn2DHead
    in graph_head_oracle.py): RESHAPE -> CONV_2D(+fused RELU) ->
    MAX_POOL_2D -> DEPTHWISE_CONV_2D(+fused RELU) -> MEAN ->
    FULLY_CONNECTED -> LOGISTIC, batch pinned at 1 like real converter
    output. Exercises the general TFLite executor + the vmap'd batch1_only
    serving path."""
    from openwakeword_tpu.io.tflite_export import _TfliteBuilder
    from openwakeword_tpu.io import tflite_import as TL

    tb = _TfliteBuilder()
    b = tb.b
    conv_w = np.asarray(z["conv.weight"], np.float32).transpose(0, 2, 3, 1)  # OIHW->OHWI
    dw_w = np.asarray(z["dw.weight"], np.float32).transpose(1, 2, 3, 0)      # ->1,KH,KW,C
    emb = tb.add_tensor((1, 16, 96), "emb")
    shp = tb.add_tensor((4,), "win_shape", np.asarray([1, 16, 96, 1], np.int32), ttype=2)
    r0 = tb.add_tensor((1, 16, 96, 1), "win")
    cw = tb.add_tensor(conv_w.shape, "conv.w", conv_w)
    cb = tb.add_tensor((8,), "conv.b", np.asarray(z["conv.bias"], np.float32))
    c0 = tb.add_tensor((1, 16, 96, 8), "conv_out")
    p0 = tb.add_tensor((1, 8, 48, 8), "pool_out")
    dw = tb.add_tensor(dw_w.shape, "dw.w", dw_w)
    db = tb.add_tensor((8,), "dw.b", np.asarray(z["dw.bias"], np.float32))
    d0 = tb.add_tensor((1, 8, 48, 8), "dw_out")
    axes = tb.add_tensor((2,), "mean_axes", np.asarray([1, 2], np.int32), ttype=2)
    m0 = tb.add_tensor((1, 8), "pooled")
    fw = tb.add_tensor((1, 8), "fc.w", np.asarray(z["fc.weight"], np.float32))
    fb = tb.add_tensor((1,), "fc.b", np.asarray(z["fc.bias"], np.float32))
    lg = tb.add_tensor((1, 1), "logits")
    sc = tb.add_tensor((1, 1), "score")

    tb.add_op(TL.OP_RESHAPE, [emb, shp], [r0], tb.OPT_RESHAPE,
              tb._reshape_options([1, 16, 96, 1]))
    tb.add_op(TL.OP_CONV_2D, [r0, cw, cb], [c0], tb.OPT_CONV_2D,
              tb._conv2d_options(tb.PAD_SAME, 1, 1, activation=tb.ACT_RELU))
    tb.add_op(TL.OP_MAX_POOL_2D, [c0], [p0], tb.OPT_POOL_2D,
              tb._pool2d_options(tb.PAD_VALID, 2, 2, 2, 2))
    # DepthwiseConv2DOptions: padding(0), stride_w(1), stride_h(2),
    # depth_multiplier(3), fused_activation_function(4)
    b.StartObject(7)
    b.PrependInt8Slot(0, tb.PAD_SAME, 0)
    b.PrependInt32Slot(1, 1, 0)
    b.PrependInt32Slot(2, 1, 0)
    b.PrependInt32Slot(3, 1, 0)
    b.PrependInt8Slot(4, tb.ACT_RELU, 0)
    dw_opts = b.EndObject()
    tb.add_op(4, [p0, dw, db], [d0], 2, dw_opts)   # DEPTHWISE_CONV_2D / opts union 2
    tb.add_op(TL.OP_MEAN, [d0, axes], [m0], tb.OPT_REDUCER,
              tb._reducer_options(False))
    tb.add_op(TL.OP_FULLY_CONNECTED, [m0, fw, fb], [lg],
              tb.OPT_FULLY_CONNECTED, tb._empty_options(3))
    tb.add_op(TL.OP_LOGISTIC, [lg], [sc])
    with open(path, "wb") as f:
        f.write(tb.finish([emb], [sc]))


def build_quantized_cnn2d_graph_head_tflite(path: str, z: Dict) -> Dict:
    """Fully-quantized twin of ``build_cnn2d_graph_head_tflite``, shaped like
    real TFLite-converter int8 output: float input -> QUANTIZE -> int8 body
    (per-channel int8 conv/depthwise weights, int32 biases with
    input_scale*weight_scale, uint8 zp-128 FC weight, annotated activation
    qparams) -> LOGISTIC -> DEQUANTIZE -> float score.

    Returns the dequantized-weight dict (torch layouts) so the caller can
    build the float twin the emulation must match exactly.
    """
    from openwakeword_tpu.io.tflite_export import _TfliteBuilder
    from openwakeword_tpu.io import tflite_import as TL

    def qsym_perch(w):
        """int8 symmetric per-out-channel (dim 0 in torch layout)."""
        bshape = (-1,) + (1,) * (w.ndim - 1)
        s = np.maximum(np.abs(w.reshape(w.shape[0], -1)).max(axis=1) / 127.0,
                       1e-8).astype(np.float32)
        q = np.clip(np.round(w / s.reshape(bshape)), -127, 127).astype(np.int8)
        return q, s, q.astype(np.float32) * s.reshape(bshape)

    def qbias(bias, scales):
        """int32 bias at scale = input_scale * weight_scale (per channel)."""
        s = np.asarray(scales, np.float32)
        q = np.round(bias / s).astype(np.int32)
        return q, s, q.astype(np.float32) * s

    in_scale, c0_scale, d0_scale, m0_scale, lg_scale = .04, .1, .1, .1, .1
    conv_w = np.asarray(z["conv.weight"], np.float32)     # (8,1,3,3) OIHW
    dw_w = np.asarray(z["dw.weight"], np.float32)         # (8,1,3,3) C,1,KH,KW
    fc_w = np.asarray(z["fc.weight"], np.float32)         # (1,8)
    cq, cs, c_deq = qsym_perch(conv_w)
    dq, ds, d_deq = qsym_perch(dw_w)
    cbq, cbs, cb_deq = qbias(np.asarray(z["conv.bias"], np.float32), in_scale * cs)
    dbq, dbs, db_deq = qbias(np.asarray(z["dw.bias"], np.float32), c0_scale * ds)
    # FC weight as legacy uint8 with zero_point 128 (asymmetric path)
    fs = np.float32(max(np.abs(fc_w).max() / 127.0, 1e-8))
    fq = np.clip(np.round(fc_w / fs) + 128, 0, 255).astype(np.uint8)
    f_deq = (fq.astype(np.float32) - 128.0) * fs
    fbq, fbs, fb_deq = qbias(np.asarray(z["fc.bias"], np.float32),
                             np.float32(m0_scale * fs))

    tb = _TfliteBuilder()
    emb = tb.add_tensor((1, 16, 96), "emb")                          # float in
    qe = tb.add_tensor((1, 16, 96), "emb_q", ttype=9,
                       quant=([in_scale], [0]))
    shp = tb.add_tensor((4,), "win_shape",
                        np.asarray([1, 16, 96, 1], np.int32), ttype=2)
    r0 = tb.add_tensor((1, 16, 96, 1), "win", ttype=9, quant=([in_scale], [0]))
    cw = tb.add_tensor((8, 3, 3, 1), "conv.w", cq.transpose(0, 2, 3, 1),
                       ttype=9, quant=(cs, [0] * 8, 0))
    cb = tb.add_tensor((8,), "conv.b", cbq, ttype=2, quant=(cbs, [0] * 8, 0))
    c0 = tb.add_tensor((1, 16, 96, 8), "conv_out", ttype=9,
                       quant=([c0_scale], [0]))
    p0 = tb.add_tensor((1, 8, 48, 8), "pool_out", ttype=9,
                       quant=([c0_scale], [0]))
    dw = tb.add_tensor((1, 3, 3, 8), "dw.w", dq.transpose(1, 2, 3, 0),
                       ttype=9, quant=(ds, [0] * 8, 3))
    db = tb.add_tensor((8,), "dw.b", dbq, ttype=2, quant=(dbs, [0] * 8, 0))
    d0 = tb.add_tensor((1, 8, 48, 8), "dw_out", ttype=9,
                       quant=([d0_scale], [0]))
    axes = tb.add_tensor((2,), "mean_axes",
                         np.asarray([1, 2], np.int32), ttype=2)
    m0 = tb.add_tensor((1, 8), "pooled", ttype=9, quant=([m0_scale], [0]))
    fw = tb.add_tensor((1, 8), "fc.w", fq, ttype=3, quant=([fs], [128]))
    fb = tb.add_tensor((1,), "fc.b", fbq, ttype=2, quant=([fbs], [0]))
    lg = tb.add_tensor((1, 1), "logits", ttype=9, quant=([lg_scale], [0]))
    sq = tb.add_tensor((1, 1), "score_q", ttype=9,
                       quant=([1.0 / 256.0], [-128]))
    sc = tb.add_tensor((1, 1), "score")                              # float out

    tb.add_op(114, [emb], [qe])                                      # QUANTIZE
    tb.add_op(TL.OP_RESHAPE, [qe, shp], [r0], tb.OPT_RESHAPE,
              tb._reshape_options([1, 16, 96, 1]))
    tb.add_op(TL.OP_CONV_2D, [r0, cw, cb], [c0], tb.OPT_CONV_2D,
              tb._conv2d_options(tb.PAD_SAME, 1, 1, activation=tb.ACT_RELU))
    tb.add_op(TL.OP_MAX_POOL_2D, [c0], [p0], tb.OPT_POOL_2D,
              tb._pool2d_options(tb.PAD_VALID, 2, 2, 2, 2))
    b = tb.b
    b.StartObject(7)
    b.PrependInt8Slot(0, tb.PAD_SAME, 0)
    b.PrependInt32Slot(1, 1, 0)
    b.PrependInt32Slot(2, 1, 0)
    b.PrependInt32Slot(3, 1, 0)
    b.PrependInt8Slot(4, tb.ACT_RELU, 0)
    dw_opts = b.EndObject()
    tb.add_op(4, [p0, dw, db], [d0], 2, dw_opts)     # DEPTHWISE_CONV_2D
    tb.add_op(TL.OP_MEAN, [d0, axes], [m0], tb.OPT_REDUCER,
              tb._reducer_options(False))
    tb.add_op(TL.OP_FULLY_CONNECTED, [m0, fw, fb], [lg],
              tb.OPT_FULLY_CONNECTED, tb._empty_options(3))
    tb.add_op(TL.OP_LOGISTIC, [lg], [sq])
    tb.add_op(6, [sq], [sc])                                         # DEQUANTIZE
    with open(path, "wb") as f:
        f.write(tb.finish([emb], [sc]))
    return {"conv.weight": c_deq, "conv.bias": cb_deq,
            "dw.weight": d_deq, "dw.bias": db_deq,
            "fc.weight": f_deq, "fc.bias": fb_deq}


def build_qdq_cnn_graph_head_onnx(path: str, z: Dict) -> Dict:
    """QDQ-quantized twin of ``build_cnn_graph_head_onnx`` in onnxruntime's
    QDQ form: input fake-quant (QuantizeLinear -> DequantizeLinear, int8),
    int8 per-axis conv1 weight, int8 per-tensor conv2 weight, uint8 zp-128
    fc weight, each dequantized by a DequantizeLinear node. Returns the
    dequantized weights (plus ``in_scale``) so the caller can compute the
    exact expected output with the float graph.
    """
    def qsym_perax(w):
        s = np.maximum(np.abs(w.reshape(w.shape[0], -1)).max(axis=1) / 127.0,
                       1e-8).astype(np.float32)
        bshape = (-1,) + (1,) * (w.ndim - 1)
        q = np.clip(np.round(w / s.reshape(bshape)), -127, 127).astype(np.int8)
        return q, s, q.astype(np.float32) * s.reshape(bshape)

    def qsym(w):
        s = np.float32(max(np.abs(w).max() / 127.0, 1e-8))
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return q, s, q.astype(np.float32) * s

    in_scale = np.float32(0.02)
    w1 = np.asarray(z["conv1.weight"], np.float32)
    w2 = np.asarray(z["conv2.weight"], np.float32)
    wf = np.asarray(z["fc.weight"], np.float32)
    q1, s1, d1 = qsym_perax(w1)
    q2, s2, d2 = qsym(w2)
    sf = np.float32(max(np.abs(wf).max() / 127.0, 1e-8))
    qf = np.clip(np.round(wf / sf) + 128, 0, 255).astype(np.uint8)
    df = (qf.astype(np.float32) - 128.0) * sf

    nodes: List[bytes] = []
    inits: List[bytes] = [
        op.encode_tensor("in.s", in_scale),
        op.encode_tensor("in.zp", np.int8(0)),
        op.encode_tensor("w1.q", q1), op.encode_tensor("w1.s", s1),
        op.encode_tensor("w1.zp", np.zeros(w1.shape[0], np.int8)),
        op.encode_tensor("w2.q", q2), op.encode_tensor("w2.s", s2),
        op.encode_tensor("w2.zp", np.int8(0)),
        op.encode_tensor("wf.q", qf), op.encode_tensor("wf.s", sf),
        op.encode_tensor("wf.zp", np.uint8(128)),
        op.encode_tensor("conv1.bias", np.asarray(z["conv1.bias"], np.float32)),
        op.encode_tensor("conv2.bias", np.asarray(z["conv2.bias"], np.float32)),
        op.encode_tensor("fc.bias", np.asarray(z["fc.bias"], np.float32)),
    ]
    nodes.append(op.encode_node("QuantizeLinear", ["emb", "in.s", "in.zp"], ["emb_q"]))
    nodes.append(op.encode_node("DequantizeLinear", ["emb_q", "in.s", "in.zp"],
                                ["emb_dq"]))
    nodes.append(op.encode_node("DequantizeLinear", ["w1.q", "w1.s", "w1.zp"],
                                ["w1.f"], axis=0))
    nodes.append(op.encode_node("DequantizeLinear", ["w2.q", "w2.s", "w2.zp"],
                                ["w2.f"]))
    nodes.append(op.encode_node("DequantizeLinear", ["wf.q", "wf.s", "wf.zp"],
                                ["wf.f"]))
    nodes.append(op.encode_node("Transpose", ["emb_dq"], ["t0"], perm=[0, 2, 1]))
    nodes.append(op.encode_node("Conv", ["t0", "w1.f", "conv1.bias"],
                                ["c1"], kernel_shape=[3], pads=[1, 1], strides=[1]))
    nodes.append(op.encode_node("Relu", ["c1"], ["a1"]))
    nodes.append(op.encode_node("Conv", ["a1", "w2.f", "conv2.bias"],
                                ["c2"], kernel_shape=[3], pads=[1, 1], strides=[1]))
    nodes.append(op.encode_node("Relu", ["c2"], ["a2"]))
    nodes.append(op.encode_node("ReduceMean", ["a2"], ["pooled"],
                                axes=[2], keepdims=0))
    nodes.append(op.encode_node("Gemm", ["pooled", "wf.f", "fc.bias"],
                                ["logits"], transB=1, alpha=1.0, beta=1.0))
    nodes.append(op.encode_node("Sigmoid", ["logits"], ["score"]))
    with open(path, "wb") as f:
        f.write(op.encode_model(
            nodes, inits,
            [op.encode_value_info("emb", ["batch", 16, 96])],
            [op.encode_value_info("score", ["batch", 1])],
            graph_name="qdq_cnn_graph_head", opset=13))
    return {"conv1.weight": d1, "conv1.bias": np.asarray(z["conv1.bias"], np.float32),
            "conv2.weight": d2, "conv2.bias": np.asarray(z["conv2.bias"], np.float32),
            "fc.weight": df, "fc.bias": np.asarray(z["fc.bias"], np.float32),
            "in_scale": in_scale}
