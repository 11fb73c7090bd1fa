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
