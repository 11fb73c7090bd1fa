"""Export the pipeline's models as ONNX graphs loadable by the reference engine.

Covers every artifact family the reference distributes (SURVEY.md section 2.2):

  * heads (``export_head_onnx``) -- Gemm chains with decomposed LayerNorm,
    mirroring how the reference's published heads were produced by
    torch.onnx.export (reference train.py:144-165);
  * the melspectrogram frontend (``export_melspectrogram_onnx``) -- the
    analytic matmul-DFT formulation as a Conv/MatMul/Log graph with the same
    I/O contract as the reference's torchlibrosa export (conversion notebook
    cell 15: raw int16-range float input, librosa power_to_db output);
  * the speech-embedding CNN (``export_embedding_onnx``) -- explicit
    Conv/BatchNormalization nodes in the unfolded form our own
    ``io.onnx_import.import_embedding_onnx`` (and the reference's conversion
    notebook) expect.

Emits only widely-supported primitive ops at opset 13, so the graphs run on
onnxruntime, and round-trip through this package's own ONNX executor
(io.onnx_graph) for offline verification.
"""

from typing import Dict

import numpy as np

from openwakeword_tpu import config
from openwakeword_tpu.io import onnx_proto as op


def _torch_gates_to_onnx(m: np.ndarray) -> np.ndarray:
    """Reorder LSTM gate blocks from torch's [i, f, g, o] row/element order
    to ONNX's [i, o, f, c] (c == torch's g). Operates on the leading axis of
    a (4H, ...) weight or (4H,) bias."""
    h = m.shape[0] // 4
    i, f, g, o = m[:h], m[h:2 * h], m[2 * h:3 * h], m[3 * h:4 * h]
    return np.concatenate([i, o, f, g], axis=0)


def _onnx_gates_to_torch(m: np.ndarray) -> np.ndarray:
    h = m.shape[0] // 4
    i, o, f, c = m[:h], m[h:2 * h], m[2 * h:3 * h], m[3 * h:4 * h]
    return np.concatenate([i, f, c, o], axis=0)


def _lstm_wrb(p: Dict):
    """Native LSTM param group {w_ih, w_hh, b_ih, b_hh} -> per-direction
    ONNX (W, R, B) arrays: transposed to (4H, I)/(4H, H), gate blocks
    reordered torch->ONNX, biases concatenated to (8H,)."""
    return (_torch_gates_to_onnx(np.asarray(p["w_ih"], np.float32).T),
            _torch_gates_to_onnx(np.asarray(p["w_hh"], np.float32).T),
            np.concatenate([
                _torch_gates_to_onnx(np.asarray(p["b_ih"], np.float32)),
                _torch_gates_to_onnx(np.asarray(p["b_hh"], np.float32))]))


def export_head_onnx(params: Dict, path: str, output_name: str = ""):
    meta = params["__meta__"]
    model_type = meta["model_type"]
    if model_type not in ("dnn", "mlp", "rnn"):
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
    if model_type in ("dnn", "mlp"):
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
    elif model_type == "mlp":
        h = linear(h, params["layer1"], t("fc1"))
        h = relu(h, t("relu1"))
        h = linear(h, params["layer2"], t("fc2"))
        h = relu(h, t("relu2"))
    else:  # rnn: 2-layer bidirectional LSTM, last-timestep features
        hidden = params["lstm0_fwd"]["w_hh"].shape[0]
        xs = t("xs")
        nodes.append(op.encode_node("Transpose", [x], [xs], perm=[1, 0, 2]))
        n_layers = len({k for k in params if k.startswith("lstm")}) // 2
        for layer in range(n_layers):
            W, R, B = [], [], []
            for tag in ("fwd", "bwd"):
                w, r, b = _lstm_wrb(params[f"lstm{layer}_{tag}"])
                W.append(w)
                R.append(r)
                B.append(b)
            names = [f"lstm{layer}_{nm}" for nm in ("W", "R", "B")]
            for nm, stackd in zip(names, (W, R, B)):
                inits.append(op.encode_tensor(nm, np.stack(stackd)))
            y = t(f"lstm{layer}")
            nodes.append(op.encode_node("LSTM", [xs] + names, [y],
                                        hidden_size=int(hidden),
                                        direction="bidirectional"))
            if layer < n_layers - 1:
                # ONNX Y is (T, 2, B, H); the next layer wants (T, B, 2H)
                tr = t("dirs_last")
                nodes.append(op.encode_node("Transpose", [y], [tr],
                                            perm=[0, 2, 1, 3]))
                xs = t("merged")
                shp = t("merge_shape")
                inits.append(op.encode_tensor(shp, np.asarray([0, 0, -1], np.int64)))
                nodes.append(op.encode_node("Reshape", [tr, shp], [xs]))
            else:
                # last timestep: fwd saw the full window, bwd saw x[T-1]
                # (same contract as torch's batch-first output[:, -1, :])
                last = t("last")
                for nm, val in (("t_last_s", input_frames - 1),
                                ("t_last_e", input_frames), ("t_axis0", 0)):
                    inits.append(op.encode_tensor(nm, np.asarray([val], np.int64)))
                nodes.append(op.encode_node("Slice", [y, "t_last_s", "t_last_e",
                                                      "t_axis0"], [last]))
                tr = t("batch_first")
                nodes.append(op.encode_node("Transpose", [last], [tr],
                                            perm=[2, 0, 1, 3]))   # (B, 1, 2, H)
                h = t("features")
                shp = t("feat_shape")
                inits.append(op.encode_tensor(shp, np.asarray([0, -1], np.int64)))
                nodes.append(op.encode_node("Reshape", [tr, shp], [h]))

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


def export_melspectrogram_onnx(path: str, apply_transform: bool = False):
    """Write the analytic log-mel frontend as a standalone .onnx graph.

    Same I/O contract as the reference's ``melspectrogram.onnx`` artifact
    (reference utils.py:180-208): input ``(batch, samples)`` float32 holding
    RAW int16-range PCM values, output ``(batch, frames, 32)`` log-mel dB
    (librosa power_to_db with the per-example top_db floor). With
    ``apply_transform`` the downstream ``spec/10 + 2`` affine (which the
    reference applies in Python) is fused into the graph, so the output
    feeds the embedding model directly.

    The STFT is a strided Conv against the windowed DFT basis -- the same
    math as ops.melspec's matmul form, expressed as the conv that
    torchlibrosa's export uses, so frame count stays dynamic in ``samples``.
    """
    from openwakeword_tpu.ops import melspec

    nodes, inits = [], []
    n_freqs = 1 + config.N_FFT // 2

    # (B, samples) -> (B, 1, samples) for Conv1D
    inits.append(op.encode_tensor("to_nchw", np.asarray([0, 1, -1], np.int64)))
    nodes.append(op.encode_node("Reshape", ["input", "to_nchw"], ["pcm"]))

    # windowed DFT as a stride-hop conv: out channel c = basis column c
    basis = np.asarray(melspec.stft_power_basis(), np.float64)   # (512, 514)
    w = np.ascontiguousarray(basis.T[:, None, :]).astype(np.float32)
    inits.append(op.encode_tensor("dft_basis", w))
    nodes.append(op.encode_node("Conv", ["pcm", "dft_basis"], ["spec"],
                                strides=[config.HOP_LENGTH]))

    # |X|^2 from the interleaved (real, imag) channels
    for name, start in (("re", 0), ("im", 1)):
        inits += [op.encode_tensor(f"{name}_s", np.asarray([start], np.int64)),
                  op.encode_tensor(f"{name}_e", np.asarray([start + 2 * n_freqs], np.int64))]
        nodes.append(op.encode_node("Slice", ["spec", f"{name}_s", f"{name}_e",
                                              "spec_axis", "spec_step"], [name]))
        nodes.append(op.encode_node("Mul", [name, name], [name + "2"]))
    inits += [op.encode_tensor("spec_axis", np.asarray([1], np.int64)),
              op.encode_tensor("spec_step", np.asarray([2], np.int64))]
    nodes.append(op.encode_node("Add", ["re2", "im2"], ["power"]))

    # mel projection: (B, 257, T) -> (B, T, 257) @ (257, 32)
    nodes.append(op.encode_node("Transpose", ["power"], ["power_t"], perm=[0, 2, 1]))
    inits.append(op.encode_tensor("mel_basis",
                                  np.asarray(melspec.mel_filterbank(), np.float32)))
    nodes.append(op.encode_node("MatMul", ["power_t", "mel_basis"], ["mel"]))

    # librosa power_to_db: 10*log10(max(mel, amin)) - 10*log10(max(amin, ref))
    inits.append(op.encode_tensor("amin", np.float32(config.MEL_AMIN).reshape(())))
    nodes.append(op.encode_node("Max", ["mel", "amin"], ["mel_c"]))
    nodes.append(op.encode_node("Log", ["mel_c"], ["mel_ln"]))
    inits.append(op.encode_tensor("db_scale",
                                  np.float32(10.0 / np.log(10.0)).reshape(())))
    nodes.append(op.encode_node("Mul", ["mel_ln", "db_scale"], ["mel_db"]))
    cur = "mel_db"
    ref_db = 10.0 * np.log10(max(config.MEL_AMIN, config.MEL_REF))
    if ref_db != 0.0:
        inits.append(op.encode_tensor("ref_db", np.float32(ref_db).reshape(())))
        nodes.append(op.encode_node("Sub", [cur, "ref_db"], ["mel_db_ref"]))
        cur = "mel_db_ref"
    if config.MEL_TOP_DB is not None:
        # data-dependent floor over each example's FULL spectrogram
        nodes.append(op.encode_node("ReduceMax", [cur], ["db_peak"],
                                    axes=[1, 2], keepdims=1))
        inits.append(op.encode_tensor("top_db",
                                      np.float32(config.MEL_TOP_DB).reshape(())))
        nodes.append(op.encode_node("Sub", ["db_peak", "top_db"], ["db_floor"]))
        nodes.append(op.encode_node("Max", [cur, "db_floor"], ["mel_db_clamped"]))
        cur = "mel_db_clamped"
    if apply_transform:
        inits += [op.encode_tensor("tf_scale",
                                   np.float32(config.MEL_TRANSFORM_SCALE).reshape(())),
                  op.encode_tensor("tf_shift",
                                   np.float32(config.MEL_TRANSFORM_SHIFT).reshape(()))]
        nodes.append(op.encode_node("Mul", [cur, "tf_scale"], ["mel_scaled"]))
        nodes.append(op.encode_node("Add", ["mel_scaled", "tf_shift"], ["melspectrogram"]))
    else:
        nodes.append(op.encode_node("Identity", [cur], ["melspectrogram"]))

    model = op.encode_model(
        nodes, inits,
        inputs=[op.encode_value_info("input", ["batch", "samples"])],
        outputs=[op.encode_value_info("melspectrogram",
                                      ["batch", "frames", config.N_MELS])],
    )
    with open(path, "wb") as f:
        f.write(model)


def export_vad_onnx(params: Dict, path: str, frame_samples: int = 480):
    """Write a trained vad_net as a .onnx graph with the Silero I/O contract.

    Same interface as the reference's ``silero_vad.onnx`` artifact (reference
    vad.py:87-127): inputs ``input (batch, frame)`` float audio in [-1, 1],
    ``h``/``c`` ``(2, batch, 64)`` recurrent state, and an (ignored) ``sr``
    scalar; outputs ``output (batch, 1)`` speech probability plus the
    advanced ``hn``/``cn`` state. The frame length is baked in at export
    (Silero's own graph switches on it with If subgraphs; one export per
    frame size keeps the graph static) -- 480 covers the reference VAD's
    predict path, 640 its __call__ path.

    The graph round-trips through ``models.silero.import_onnx`` (role-mapped
    by the same heuristics as the real artifact), so an exported file drops
    into ``Model(vad_threshold=...)`` like the original.
    """
    from openwakeword_tpu.models import vad_net

    if frame_samples < vad_net.MIN_SAMPLES:
        raise ValueError(f"frame_samples={frame_samples} is below the "
                         f"{vad_net.MIN_SAMPLES}-sample minimum (one STFT frame)")
    basis, melw = vad_net._frontend_consts()
    n_freqs = basis.shape[1] // 2

    nodes, inits = [], []
    inits.append(op.encode_tensor("to_nchw", np.asarray([0, 1, -1], np.int64)))
    nodes.append(op.encode_node("Reshape", ["input", "to_nchw"], ["pcm"]))
    inits.append(op.encode_tensor(
        "vad_dft", np.ascontiguousarray(basis.T[:, None, :]).astype(np.float32)))
    nodes.append(op.encode_node("Conv", ["pcm", "vad_dft"], ["spec"],
                                strides=[vad_net.HOP]))
    for name, start in (("re", 0), ("im", 1)):
        inits += [op.encode_tensor(f"v{name}_s", np.asarray([start], np.int64)),
                  op.encode_tensor(f"v{name}_e",
                                   np.asarray([start + 2 * n_freqs], np.int64))]
        nodes.append(op.encode_node("Slice", ["spec", f"v{name}_s", f"v{name}_e",
                                              "vspec_axis", "vspec_step"], [name]))
        nodes.append(op.encode_node("Mul", [name, name], [name + "2"]))
    inits += [op.encode_tensor("vspec_axis", np.asarray([1], np.int64)),
              op.encode_tensor("vspec_step", np.asarray([2], np.int64))]
    nodes.append(op.encode_node("Add", ["re2", "im2"], ["power"]))
    nodes.append(op.encode_node("Transpose", ["power"], ["power_t"],
                                perm=[0, 2, 1]))
    inits.append(op.encode_tensor("vad_mel", np.asarray(melw, np.float32)))
    nodes.append(op.encode_node("MatMul", ["power_t", "vad_mel"], ["mel"]))
    inits.append(op.encode_tensor("log_eps", np.float32(1e-6).reshape(())))
    nodes.append(op.encode_node("Add", ["mel", "log_eps"], ["mel_eps"]))
    nodes.append(op.encode_node("Log", ["mel_eps"], ["feats"]))

    # projection to the LSTM width
    inits += [op.encode_tensor("proj_w", np.asarray(params["proj"]["w"], np.float32)),
              op.encode_tensor("proj_b", np.asarray(params["proj"]["b"], np.float32))]
    nodes.append(op.encode_node("MatMul", ["feats", "proj_w"], ["proj_mm"]))
    nodes.append(op.encode_node("Add", ["proj_mm", "proj_b"], ["proj_lin"]))
    nodes.append(op.encode_node("Relu", ["proj_lin"], ["z_btd"]))
    nodes.append(op.encode_node("Transpose", ["z_btd"], ["z_tbd"],
                                perm=[1, 0, 2]))

    hidden = vad_net.HIDDEN
    inits.append(op.encode_tensor("state_axis", np.asarray([0], np.int64)))
    xs = "z_tbd"
    h_outs, c_outs = [], []
    for layer in range(vad_net.LAYERS):
        w, r, b = _lstm_wrb(params[f"lstm{layer}"])
        inits += [
            op.encode_tensor(f"l{layer}_W", w[None]),
            op.encode_tensor(f"l{layer}_R", r[None]),
            op.encode_tensor(f"l{layer}_B", b[None]),
            op.encode_tensor(f"l{layer}_s", np.asarray([layer], np.int64)),
            op.encode_tensor(f"l{layer}_e", np.asarray([layer + 1], np.int64)),
        ]
        for state in ("h", "c"):
            nodes.append(op.encode_node(
                "Slice", [state, f"l{layer}_s", f"l{layer}_e", "state_axis"],
                [f"l{layer}_{state}0"]))
        nodes.append(op.encode_node(
            "LSTM", [xs, f"l{layer}_W", f"l{layer}_R", f"l{layer}_B", "",
                     f"l{layer}_h0", f"l{layer}_c0"],
            [f"l{layer}_Y", f"l{layer}_hn", f"l{layer}_cn"],
            hidden_size=hidden, direction="forward"))
        h_outs.append(f"l{layer}_hn")
        c_outs.append(f"l{layer}_cn")
        if layer < vad_net.LAYERS - 1:
            inits.append(op.encode_tensor(f"l{layer}_sq", np.asarray([1], np.int64)))
            nodes.append(op.encode_node("Squeeze", [f"l{layer}_Y", f"l{layer}_sq"],
                                        [f"l{layer}_out"]))
            xs = f"l{layer}_out"
    nodes.append(op.encode_node("Concat", h_outs, ["hn"], axis=0))
    nodes.append(op.encode_node("Concat", c_outs, ["cn"], axis=0))

    inits.append(op.encode_tensor("last_sq", np.asarray([0], np.int64)))
    nodes.append(op.encode_node("Squeeze", [h_outs[-1], "last_sq"], ["h_last"]))
    inits += [op.encode_tensor("out_w", np.asarray(params["out"]["w"], np.float32)),
              op.encode_tensor("out_b", np.asarray(params["out"]["b"], np.float32))]
    nodes.append(op.encode_node("Gemm", ["h_last", "out_w", "out_b"], ["logit"]))
    nodes.append(op.encode_node("Sigmoid", ["logit"], ["output"]))

    model = op.encode_model(
        nodes, inits,
        inputs=[op.encode_value_info("input", ["batch", frame_samples]),
                op.encode_value_info("h", [2, "batch", hidden]),
                op.encode_value_info("c", [2, "batch", hidden]),
                op.encode_value_info("sr", [], elem_type=op.TP_INT64)],
        outputs=[op.encode_value_info("output", ["batch", 1]),
                 op.encode_value_info("hn", [2, "batch", hidden]),
                 op.encode_value_info("cn", [2, "batch", hidden])],
    )
    with open(path, "wb") as f:
        f.write(model)


def export_embedding_onnx(params: Dict, path: str):
    """Write the speech-embedding CNN as a standalone .onnx graph.

    Same I/O contract as the reference's ``embedding_model.onnx`` artifact
    (SURVEY.md section 2.2): input ``(batch, 76, 32, 1)`` NHWC transformed
    log-mel window, output ``(batch, 1, 1, 96)``. Emits the UNFOLDED form --
    explicit BatchNormalization nodes (epsilon 1e-3) and the clipped-leaky
    activation ``max(max(0.2x, x), -0.4)`` as Mul/Max ops -- which is the
    structure ``io.onnx_import.import_embedding_onnx`` round-trips exactly.

    ``params`` must be the unfolded pytree (conv_i: {w} HWIO + bn_i stats),
    i.e. what ``models.embedding.init_params`` / the weight importer produce.
    """
    from openwakeword_tpu.models import embedding

    if embedding.is_folded(params):
        raise ValueError("export_embedding_onnx needs UNFOLDED params "
                         "(conv_i/bn_i form); BN-folded params cannot be "
                         "unfolded back into BatchNormalization nodes")

    nodes, inits = [], []
    counter = [0]

    def t(name):
        counter[0] += 1
        return f"e{counter[0]}_{name}"

    nodes.append(op.encode_node("Transpose", ["input_window"], ["x_nchw"],
                                perm=[0, 3, 1, 2]))
    cur = "x_nchw"
    h, w = embedding.INPUT_SHAPE[:2]
    pending_pad = (0, 0)
    conv_i = bn_i = 0
    for layer in embedding.spec():
        kind = layer[0]
        if kind == "pad":
            pending_pad = layer[1]
        elif kind == "conv":
            _, _, (kh, kw), padding, act = layer
            if padding == "SAME":
                ph, pw = (kh - 1), (kw - 1)   # stride 1: total pad = k - 1
            else:
                ph, pw = 0, 0
            ph, pw = ph + 2 * pending_pad[0], pw + 2 * pending_pad[1]
            pending_pad = (0, 0)
            kernel = np.asarray(params[f"conv_{conv_i}"]["w"], np.float32)
            wn = f"conv{conv_i}_w"
            inits.append(op.encode_tensor(wn, np.ascontiguousarray(
                np.transpose(kernel, (3, 2, 0, 1)))))               # HWIO -> OIHW
            out = t(f"conv{conv_i}")
            nodes.append(op.encode_node(
                "Conv", [cur, wn], [out],
                pads=[ph // 2, pw // 2, ph - ph // 2, pw - pw // 2]))
            h, w = h + ph - (kh - 1), w + pw - (kw - 1)
            cur = out
            if act == "relu":
                out = t("relu")
                nodes.append(op.encode_node("Relu", [cur], [out]))
                cur = out
            conv_i += 1
        elif kind == "bnact":
            bn = params[f"bn_{bn_i}"]
            names = []
            for field, key in (("gamma", "gamma"), ("beta", "beta"),
                               ("mean", "mean"), ("var", "var")):
                nm = f"bn{bn_i}_{field}"
                inits.append(op.encode_tensor(nm, np.asarray(bn[key], np.float32)))
                names.append(nm)
            out = t(f"bn{bn_i}")
            nodes.append(op.encode_node("BatchNormalization", [cur] + names,
                                        [out], epsilon=float(embedding.BN_EPS)))
            # clipped leaky: max(max(0.2*x, x), -0.4)
            leak = t("leak")
            nodes.append(op.encode_node("Mul", [out, "leak_slope"], [leak]))
            lo = t("leaky")
            nodes.append(op.encode_node("Max", [leak, out], [lo]))
            out2 = t("clip")
            nodes.append(op.encode_node("Max", [lo, "leak_floor"], [out2]))
            cur = out2
            bn_i += 1
        elif kind == "pool":
            _, window, strides, padding = layer
            if padding == "SAME":
                tot = [max(0, (-(-d // s) - 1) * s + k - d)
                       for d, k, s in zip((h, w), window, strides)]
                pads = [tot[0] // 2, tot[1] // 2,
                        tot[0] - tot[0] // 2, tot[1] - tot[1] // 2]
                h = -(-h // strides[0])
                w = -(-w // strides[1])
            else:
                pads = [0, 0, 0, 0]
                h = (h - window[0]) // strides[0] + 1
                w = (w - window[1]) // strides[1] + 1
            out = t("pool")
            nodes.append(op.encode_node("MaxPool", [cur], [out],
                                        kernel_shape=list(window),
                                        strides=list(strides), pads=pads))
            cur = out
    inits += [op.encode_tensor("leak_slope", np.float32(0.2).reshape(())),
              op.encode_tensor("leak_floor", np.float32(-0.4).reshape(()))]
    if (h, w) != (1, 1):
        raise AssertionError(f"embedding export shape tracking ended at {(h, w)}, "
                             "expected (1, 1) -- layer spec changed?")

    # (B, 96, 1, 1) NCHW -> the artifact's (B, 1, 1, 96) NHWC output
    nodes.append(op.encode_node("Transpose", [cur], ["embedding"],
                                perm=[0, 2, 3, 1]))
    model = op.encode_model(
        nodes, inits,
        inputs=[op.encode_value_info(
            "input_window", ["batch"] + list(embedding.INPUT_SHAPE))],
        outputs=[op.encode_value_info(
            "embedding", ["batch", 1, 1, embedding.OUTPUT_DIM])],
    )
    with open(path, "wb") as f:
        f.write(model)
