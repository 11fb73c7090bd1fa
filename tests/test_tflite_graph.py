"""General TFLite->XLA executor (io.tflite_graph.TfliteProgram).

Two proof sources: (a) differential execution of this package's OWN head
exports (dnn/mlp/rnn through export_head_tflite) against the native forward —
covering FC, the decomposed-LayerNorm op chain, STRIDED_SLICE, CONCATENATION,
REVERSE_V2, and UNIDIRECTIONAL_SEQUENCE_LSTM; (b) a hand-built
microWakeWord-style depthwise-CNN graph checked against a torch oracle —
covering CONV_2D/DEPTHWISE_CONV_2D (fused activations), MAX_POOL_2D, MEAN,
and the pinned-batch (vmap) serving path. The reference runs any such file
through the LiteRT interpreter (reference utils.py:88-108); this executor is
that capability on XLA.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from openwakeword_tpu.io.tflite_import import load_tflite
from openwakeword_tpu.io.tflite_graph import TfliteProgram
from openwakeword_tpu.models import heads as heads_lib

_HAVE_TORCH = subprocess.run(
    [sys.executable, "-c", "import torch"], capture_output=True).returncode == 0


@pytest.mark.parametrize("spec", [
    dict(model_type="dnn", input_frames=16, n_classes=1, layer_dim=32, n_blocks=1),
    dict(model_type="mlp", input_frames=16, n_classes=3, layer_dim=24),
    dict(model_type="rnn", input_frames=16, n_classes=1, layer_dim=16),
])
def test_executes_own_exports(tmp_path, spec):
    """TfliteProgram(run our own export) == native heads.apply."""
    from openwakeword_tpu.io.tflite_export import export_head_tflite

    params = heads_lib.init_params(jax.random.PRNGKey(5), **spec)
    path = str(tmp_path / "head.tflite")
    export_head_tflite(params, path, output_name="test")

    model = load_tflite(path)
    prog = TfliteProgram(model)
    assert len(prog.input_names) == 1

    in_dims = model["tensors"][model["inputs"][0]]["shape"]
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, [d if d > 0 else 1 for d in in_dims]).astype(np.float32)
    got = np.asarray(prog.apply(prog.params, {prog.input_names[0]: x})
                     [prog.output_names[0]])
    want = np.asarray(heads_lib.apply(params, x.reshape(
        -1, spec["input_frames"], 96)))
    np.testing.assert_allclose(got.reshape(want.shape), want, atol=2e-5)


@pytest.mark.skipif(not _HAVE_TORCH, reason="torch oracle unavailable")
class TestDepthwiseCnnGraph:
    @pytest.fixture(scope="class")
    def cnn2d(self, tmp_path_factory):
        from tests import fixture_builders
        tmp = tmp_path_factory.mktemp("tflite_graph")
        oracle_path = str(tmp / "oracle.npz")
        script = os.path.join(os.path.dirname(__file__), "graph_head_oracle.py")
        r = subprocess.run([sys.executable, script, "cnn2d", oracle_path],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        oracle = dict(np.load(oracle_path))
        path = str(tmp / "cnn2d_head.tflite")
        fixture_builders.build_cnn2d_graph_head_tflite(path, oracle)
        return path, oracle["probe"], oracle["out"]

    def test_imports_as_graph_head_and_matches_torch(self, cnn2d):
        from openwakeword_tpu.io.tflite_import import import_tflite_model
        path, probe, expected = cnn2d
        kind, params, meta = import_tflite_model(path)
        assert kind == "head"
        m = params["__meta__"]
        assert m["model_type"] == "graph"
        assert (m["input_frames"], m["n_classes"]) == (16, 1)
        # batch pinned at 1 by the fixed Reshape — served under vmap
        assert m["batch1_only"] is True
        got = np.asarray(heads_lib.apply(params, probe))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_model_serves_it(self, cnn2d, test_clips):
        import openwakeword_tpu as oww
        path, _, _ = cnn2d
        m = oww.Model(wakeword_models=[path])
        preds = m.predict_clip(test_clips["alexa"])
        assert len(preds) > 10
        assert all(0.0 <= float(v) <= 1.0 for fr in preds for v in fr.values())

    def test_engine_serves_it(self, cnn2d):
        from openwakeword_tpu.parallel import MultiStreamEngine
        path, _, _ = cnn2d
        eng = MultiStreamEngine(wakeword_models=[path], n_streams=3, rng_seed=0)
        frames = np.random.default_rng(1).integers(
            -3000, 3000, (4, 3, 1280)).astype(np.int16)
        scores = np.asarray(eng.predict_frames(frames))
        assert scores.shape == (4, 3, len(eng.labels))
        assert np.all(scores >= 0.0) and np.all(scores <= 1.0)


@pytest.mark.skipif(not _HAVE_TORCH, reason="torch oracle unavailable")
class TestQuantizedGraph:
    """Quantized .tflite graphs execute as dequantized-float emulation (the
    reference's LiteRT interpreter runs int8 graphs natively, reference
    utils.py:88-108; here the weights dequantize at load and the body runs
    float32 — see io/tflite_graph.py module docstring)."""

    @pytest.fixture(scope="class")
    def quantized(self, tmp_path_factory):
        from tests import fixture_builders
        tmp = tmp_path_factory.mktemp("tflite_quant")
        oracle_path = str(tmp / "oracle.npz")
        script = os.path.join(os.path.dirname(__file__), "graph_head_oracle.py")
        r = subprocess.run([sys.executable, script, "cnn2d", oracle_path],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-2000:]
        oracle = dict(np.load(oracle_path))
        qpath = str(tmp / "cnn2d_int8.tflite")
        deq = fixture_builders.build_quantized_cnn2d_graph_head_tflite(
            qpath, oracle)
        fpath = str(tmp / "cnn2d_deq_twin.tflite")
        fixture_builders.build_cnn2d_graph_head_tflite(fpath, deq)
        return qpath, fpath, oracle["probe"], oracle["out"]

    def test_matches_float_twin_exactly(self, quantized):
        """Executing the int8 graph == executing a float graph built from
        the dequantized weights: proves qparam parsing (per-channel int8,
        uint8 zp-128, int32 bias) + QUANTIZE/DEQUANTIZE pass-through."""
        qpath, fpath, probe, _ = quantized
        outs = []
        for path in (qpath, fpath):
            prog = TfliteProgram(load_tflite(path))
            got = np.stack([
                np.asarray(prog.apply(prog.params,
                                      {prog.input_names[0]: x[None]})
                           [prog.output_names[0]]).reshape(-1)
                for x in probe])
            outs.append(got)
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)

    def test_close_to_float_oracle(self, quantized):
        """Weight-quantization error is the ONLY divergence from the torch
        float model — scores stay close."""
        qpath, _, probe, expected = quantized
        _, params, _ = __import__(
            "openwakeword_tpu.io.tflite_import",
            fromlist=["import_tflite_model"]).import_tflite_model(qpath)
        assert params["__meta__"]["model_type"] == "graph"
        got = np.asarray(heads_lib.apply(params, probe))
        np.testing.assert_allclose(got, expected, atol=0.05)

    def test_model_serves_it(self, quantized, test_clips):
        import openwakeword_tpu as oww
        qpath, _, _, _ = quantized
        m = oww.Model(wakeword_models=[qpath])
        preds = m.predict_clip(test_clips["alexa"])
        assert len(preds) > 10
        assert all(0.0 <= float(v) <= 1.0 for fr in preds for v in fr.values())


def test_quantized_graph_missing_scale_rejected(tmp_path):
    """int8 tensors WITHOUT quantization params raise a typed error naming
    the tensor, not a crash."""
    from openwakeword_tpu.io.tflite_export import _TfliteBuilder
    from openwakeword_tpu.io import tflite_import as TL

    tb = _TfliteBuilder()
    x = tb.add_tensor((1, 16 * 96), "emb")
    w = tb.add_tensor((1, 16 * 96), "w",
                      np.zeros((1, 16 * 96), np.int8), ttype=9)
    y = tb.add_tensor((1, 1), "out")
    tb.add_op(TL.OP_FULLY_CONNECTED, [x, w, -1], [y],
              tb.OPT_FULLY_CONNECTED, tb._empty_options(3))
    path = str(tmp_path / "quant.tflite")
    with open(path, "wb") as f:
        f.write(tb.finish([x], [y]))
    with pytest.raises(NotImplementedError, match="quantized"):
        TfliteProgram(load_tflite(path))


def test_unknown_opcode_rejected(tmp_path):
    from openwakeword_tpu.io.tflite_export import _TfliteBuilder

    tb = _TfliteBuilder()
    x = tb.add_tensor((1, 4), "in")
    y = tb.add_tensor((1, 4), "out")
    tb.add_op(127, [x], [y])            # BITCAST-ish: not implemented
    path = str(tmp_path / "exotic.tflite")
    with open(path, "wb") as f:
        f.write(tb.finish([x], [y]))
    with pytest.raises(NotImplementedError, match="opcode"):
        TfliteProgram(load_tflite(path))


def _strided_slice_prog(tmp_path, in_shape, out_shape, spec_len, begin, end,
                        strides, **kwargs):
    from openwakeword_tpu.io.tflite_export import _TfliteBuilder
    from openwakeword_tpu.io import tflite_import as TL

    tb = _TfliteBuilder()
    x = tb.add_tensor(in_shape, "in")
    b = tb.add_tensor((spec_len,), "begin",
                      np.asarray(begin, np.int32), ttype=2)
    e = tb.add_tensor((spec_len,), "end", np.asarray(end, np.int32), ttype=2)
    s = tb.add_tensor((spec_len,), "strides",
                      np.asarray(strides, np.int32), ttype=2)
    y = tb.add_tensor(out_shape, "out")
    tb.add_op(TL.OP_STRIDED_SLICE, [x, b, e, s], [y],
              tb.OPT_STRIDED_SLICE, tb._strided_slice_options(**kwargs))
    path = str(tmp_path / "ss.tflite")
    with open(path, "wb") as f:
        f.write(tb.finish([x], [y]))
    return TfliteProgram(load_tflite(path))


def test_strided_slice_ellipsis_and_new_axis_masks(tmp_path):
    """ellipsis_mask expands one spec entry to however many full slices the
    rank needs; new_axis_mask inserts a dim (TF strided-slice semantics) —
    oracle is numpy's own mixed Ellipsis/None indexing."""
    x = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)

    # spec (a, ..., c): ellipsis at position 1 covers dims 1..2
    prog = _strided_slice_prog(tmp_path, x.shape, (1, 3, 4, 2), 3,
                               [0, 0, 1], [1, 0, 5], [1, 1, 2],
                               ellipsis_mask=0b010)
    got = np.asarray(prog.apply(prog.params, {"in": x})["out"])
    np.testing.assert_array_equal(got, x[0:1, ..., 1:5:2])

    # spec (a, newaxis, b): inserts a length-1 dim between dims 0 and 1,
    # trailing dims get implicit full slices
    prog = _strided_slice_prog(tmp_path, x.shape, (1, 1, 2, 4, 5), 3,
                               [1, 0, 0], [2, 0, 2], [1, 1, 1],
                               new_axis_mask=0b010)
    got = np.asarray(prog.apply(prog.params, {"in": x})["out"])
    np.testing.assert_array_equal(got, x[1:2, None, 0:2])

    # combined with shrink: (shrink, ..., newaxis)
    prog = _strided_slice_prog(tmp_path, x.shape, (3, 4, 5, 1), 3,
                               [1, 0, 0], [2, 0, 0], [1, 1, 1],
                               ellipsis_mask=0b010, new_axis_mask=0b100,
                               shrink_axis_mask=0b001)
    got = np.asarray(prog.apply(prog.params, {"in": x})["out"])
    np.testing.assert_array_equal(got, x[1, ..., None])


def test_strided_slice_double_ellipsis_rejected(tmp_path):
    """More than one ellipsis bit is a malformed graph — typed error, not a
    silently wrong execution."""
    x = np.zeros((2, 3, 4), np.float32)
    prog = _strided_slice_prog(tmp_path, x.shape, x.shape, 3,
                               [0, 0, 0], [0, 0, 0], [1, 1, 1],
                               ellipsis_mask=0b011)
    with pytest.raises(NotImplementedError, match="ellipsis"):
        prog.apply(prog.params, {"in": x})


class _FakeLstmOpts:
    """Stands in for a flatbuffer _Table: UnidirectionalSequenceLSTMOptions
    field 1 = cell_clip, field 3 = time_major."""

    def __init__(self, cell_clip=0.0, time_major=False):
        self._f = {1: cell_clip, 3: int(time_major)}

    def scalar(self, field, fmt, default):
        return self._f.get(field, default)


def _craft_lstm_model(rng, hidden=4, t=3, inp=2, cifg=False, cell_clip=0.0):
    """Hand-built parsed-model dict around one UNIDIRECTIONAL_SEQUENCE_LSTM
    op (the executor accepts parsed dicts directly, like the import tests)."""
    def w(shape):
        return rng.normal(0, 0.5, shape).astype(np.float32)

    tensors = [{"name": f"t{i}", "shape": [], "dtype": 0, "data": None,
                "is_variable": False, "quant": None} for i in range(22)]
    weights = {}
    for i in range(1, 5):       # w_i, w_f, w_c, w_o: (H, I)
        weights[i] = w((hidden, inp))
    for i in range(5, 9):       # recurrent: (H, H)
        weights[i] = w((hidden, hidden))
    for i in range(12, 16):     # biases: (H,)
        weights[i] = w((hidden,))
    for i, arr in weights.items():
        tensors[i]["data"] = arr
    ins = [0] + list(range(1, 9)) + [-1, -1, -1] + list(range(12, 16)) \
        + [-1, -1, 18, 19]      # 18/19: variable state tensors
    tensors[18]["is_variable"] = tensors[19]["is_variable"] = True
    if cifg:
        ins[1], ins[5], ins[12] = -1, -1, -1
    op = {"opcode": 44, "inputs": ins, "outputs": [21],
          "options_type": 71,
          "options": _FakeLstmOpts(cell_clip=cell_clip)}
    tensors[0]["shape"] = [1, t, inp]
    model = {"tensors": tensors, "operators": [op],
             "inputs": [0], "outputs": [21]}
    return model, weights


def _numpy_lstm(x, weights, cell_clip=0.0, cifg=False):
    """Independent float LSTM (gate order i,f,c,o) with optional cell clip;
    cifg couples the input gate as i = 1 - f (lite/kernels/lstm_eval.cc)."""
    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))
    B, T, _ = x.shape
    H = weights[2].shape[0]
    h = np.zeros((B, H), np.float64)
    c = np.zeros((B, H), np.float64)
    outs = []
    for t in range(T):
        xt = x[:, t].astype(np.float64)
        f = sig(xt @ weights[2].T + h @ weights[6].T + weights[13])
        if cifg:
            i = 1.0 - f
        else:
            i = sig(xt @ weights[1].T + h @ weights[5].T + weights[12])
        g = np.tanh(xt @ weights[3].T + h @ weights[7].T + weights[14])
        o = sig(xt @ weights[4].T + h @ weights[8].T + weights[15])
        c = f * c + i * g
        if cell_clip > 0:
            c = np.clip(c, -cell_clip, cell_clip)
        h = o * np.tanh(c)
        outs.append(h)
    return np.stack(outs, axis=1)


def test_lstm_cell_clip_applied():
    """cell_clip > 0 in the LSTM options clips the cell state every step
    (lite/kernels/lstm_eval.cc) — weights scaled up so the clip actually
    binds, checked against an independent numpy LSTM."""
    rng = np.random.default_rng(3)
    model, weights = _craft_lstm_model(rng, cell_clip=0.4)
    # inflate gate drive so |c| would exceed the clip without it
    for i in (12, 13, 14, 15):
        weights[i] *= 4
        model["tensors"][i]["data"] = weights[i]
    prog = TfliteProgram(model)
    x = rng.normal(0, 2, (1, 3, 2)).astype(np.float32)
    got = np.asarray(prog.apply(prog.params, {"t0": x})["t21"])
    want = _numpy_lstm(x, weights, cell_clip=0.4)
    want_unclipped = _numpy_lstm(x, weights, cell_clip=0.0)
    assert np.abs(want - want_unclipped).max() > 1e-3, \
        "fixture too tame: the clip never binds"
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lstm_cifg_matches_numpy_oracle():
    """CIFG models (input-gate tensors absent, index -1) execute with the
    coupled gate i = 1 - f, checked against an independent numpy LSTM."""
    rng = np.random.default_rng(4)
    model, weights = _craft_lstm_model(rng, cifg=True)
    prog = TfliteProgram(model)
    x = rng.normal(0, 2, (2, 3, 2)).astype(np.float32)
    got = np.asarray(prog.apply(prog.params, {"t0": x})["t21"])
    want = _numpy_lstm(x, weights, cifg=True)
    want_full = _numpy_lstm(x, weights, cifg=False)
    assert np.abs(want - want_full).max() > 1e-3, \
        "fixture too tame: coupled and full gates coincide"
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lstm_partial_cifg_rejected_typed():
    """Input-gate weights absent but the recurrent input-gate tensor present
    (or vice versa) is a malformed graph — typed error."""
    rng = np.random.default_rng(5)
    model, _ = _craft_lstm_model(rng, cifg=True)
    model["operators"][0]["inputs"][5] = 5      # r_i back, w_i still absent
    prog = TfliteProgram(model)
    with pytest.raises(NotImplementedError, match="CIFG"):
        prog.apply(prog.params, {"t0": np.zeros((1, 3, 2), np.float32)})


# ======================================================================
# SVDF + stateful (persistent-interpreter) execution
# ======================================================================


class _FakeSvdfOpts:
    """SVDFOptions: field 0 = rank, field 1 = fused activation."""

    def __init__(self, rank=1, act=0):
        self._f = {0: rank, 1: act}

    def scalar(self, field, fmt, default):
        return self._f.get(field, default)


def _craft_svdf_model(rng, inp=3, n_filters=8, memory=5, rank=2, act=0,
                      with_bias=True):
    """One SVDF op (the classic streaming-KWS layer) as a parsed-model
    dict: input (B, I), weights_feature (F, I), weights_time (F, M),
    bias (F/rank,), variable state (B, F*M)."""
    tensors = [{"name": f"t{i}", "shape": [], "dtype": 0, "data": None,
                "is_variable": False, "quant": None} for i in range(6)]
    wf = rng.normal(0, 0.5, (n_filters, inp)).astype(np.float32)
    wt = rng.normal(0, 0.5, (n_filters, memory)).astype(np.float32)
    bias = rng.normal(0, 0.5, (n_filters // rank,)).astype(np.float32)
    tensors[1]["data"], tensors[2]["data"] = wf, wt
    if with_bias:
        tensors[3]["data"] = bias
    tensors[4]["is_variable"] = True
    tensors[4]["name"] = "svdf_state"
    op = {"opcode": 27, "inputs": [0, 1, 2, 3 if with_bias else -1, 4],
          "outputs": [5], "options": _FakeSvdfOpts(rank=rank, act=act)}
    model = {"tensors": tensors, "operators": [op],
             "inputs": [0], "outputs": [5]}
    return model, (wf, wt, bias if with_bias else None)


def _numpy_svdf_stream(xs, wf, wt, bias, rank):
    """Independent SVDF over T invokes (lite/kernels/svdf.cc float path):
    shift each filter's memory left, append feature activation, dot with
    weights_time, sum rank groups, add bias. Returns (T, B, U) + state."""
    T, B = xs.shape[0], xs.shape[1]
    F, M = wt.shape
    state = np.zeros((B, F, M), np.float64)
    outs = []
    for t in range(T):
        feat = xs[t].astype(np.float64) @ wf.T.astype(np.float64)
        state = np.concatenate([state[..., 1:], feat[..., None]], axis=-1)
        scratch = (state * wt[None].astype(np.float64)).sum(-1)   # (B, F)
        y = scratch.reshape(B, F // rank, rank).sum(-1)
        if bias is not None:
            y = y + bias
        outs.append(y)
    return np.stack(outs), state.reshape(B, F * M)


def test_svdf_streaming_matches_numpy_oracle():
    """SVDF threads its memory across apply_stateful calls exactly like
    LiteRT's persistent interpreter — T chained invokes against an
    independent numpy implementation, memory long enough that early
    invokes still shape later outputs."""
    rng = np.random.default_rng(11)
    model, (wf, wt, bias) = _craft_svdf_model(rng)
    prog = TfliteProgram(model)
    assert prog.variable_names() == ["svdf_state"]
    T, B = 9, 2
    xs = rng.normal(0, 1.0, (T, B, wf.shape[1])).astype(np.float32)
    want, want_state = _numpy_svdf_stream(xs, wf, wt, bias, rank=2)

    state = None
    for t in range(T):
        out, state = prog.apply_stateful(prog.params, {"t0": xs[t]}, state)
        np.testing.assert_allclose(np.asarray(out["t5"]), want[t], atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["svdf_state"]), want_state,
                               atol=1e-5)
    # plain apply = fresh interpreter (zero state), returns step-0 scores
    fresh = prog.apply(prog.params, {"t0": xs[3]})["t5"]
    first, _ = _numpy_svdf_stream(xs[3:4], wf, wt, bias, rank=2)
    np.testing.assert_allclose(np.asarray(fresh), first[0], atol=1e-5)


def test_svdf_rank1_no_bias_relu():
    """rank=1, absent bias (index -1), fused RELU."""
    rng = np.random.default_rng(12)
    model, (wf, wt, _) = _craft_svdf_model(rng, rank=1, act=1,
                                           with_bias=False)
    prog = TfliteProgram(model)
    xs = rng.normal(0, 1.0, (4, 1, wf.shape[1])).astype(np.float32)
    want, _ = _numpy_svdf_stream(xs, wf, wt, None, rank=1)
    want = np.maximum(want, 0.0)
    state = None
    for t in range(4):
        out, state = prog.apply_stateful(prog.params, {"t0": xs[t]}, state)
    np.testing.assert_allclose(np.asarray(out["t5"]), want[-1], atol=1e-5)


def test_svdf_bad_rank_rejected():
    rng = np.random.default_rng(13)
    model, _ = _craft_svdf_model(rng, n_filters=8, rank=3)
    prog = TfliteProgram(model)
    with pytest.raises(NotImplementedError, match="rank"):
        prog.apply(prog.params, {"t0": np.zeros((1, 3), np.float32)})


def test_lstm_state_threads_across_calls():
    """UNIDIRECTIONAL_SEQUENCE_LSTM persists h/c (variable inputs 18/19)
    under apply_stateful: a sequence split into two chunks chained through
    the returned state scores identically to one full-sequence call."""
    rng = np.random.default_rng(14)
    model, weights = _craft_lstm_model(rng, t=6)
    prog = TfliteProgram(model)
    assert set(prog.variable_names()) == {"t18", "t19"}
    x = rng.normal(0, 1.0, (2, 6, 2)).astype(np.float32)
    full = np.asarray(prog.apply(prog.params, {"t0": x})["t21"])
    np.testing.assert_allclose(full, _numpy_lstm(x, weights), atol=1e-5)

    out1, st = prog.apply_stateful(prog.params, {"t0": x[:, :3]})
    out2, st2 = prog.apply_stateful(prog.params, {"t0": x[:, 3:]}, st)
    got = np.concatenate([np.asarray(out1["t21"]),
                          np.asarray(out2["t21"])], axis=1)
    np.testing.assert_allclose(got, full, atol=1e-5)
    assert set(st2) == {"t18", "t19"}


class _FakeRnnOpts:
    """RNNOptions: field 0 = activation. SequenceRNNOptions: field 0 =
    time_major, field 1 = activation."""

    def __init__(self, fields):
        self._f = fields

    def scalar(self, field, fmt, default):
        return self._f.get(field, default)


def _craft_rnn_model(rng, inp=3, units=4, sequence=False, time_major=False,
                     act=4):
    tensors = [{"name": f"t{i}", "shape": [], "dtype": 0, "data": None,
                "is_variable": False, "quant": None} for i in range(6)]
    w = rng.normal(0, 0.5, (units, inp)).astype(np.float32)
    rw = rng.normal(0, 0.5, (units, units)).astype(np.float32)
    b = rng.normal(0, 0.5, (units,)).astype(np.float32)
    tensors[1]["data"], tensors[2]["data"], tensors[3]["data"] = w, rw, b
    tensors[4]["is_variable"] = True
    opts = (_FakeRnnOpts({0: int(time_major), 1: act}) if sequence
            else _FakeRnnOpts({0: act}))
    op = {"opcode": 35 if sequence else 24, "inputs": [0, 1, 2, 3, 4],
          "outputs": [5], "options": opts}
    model = {"tensors": tensors, "operators": [op],
             "inputs": [0], "outputs": [5]}
    return model, (w, rw, b)


def _numpy_rnn(xs, w, rw, b, act=np.tanh):
    """(T, B, I) -> (T, B, U); basic_rnn.cc: h' = act(x W^T + h R^T + b)."""
    h = np.zeros((xs.shape[1], w.shape[0]), np.float64)
    ys = []
    for t in range(xs.shape[0]):
        h = act(xs[t] @ w.T + h @ rw.T + b)
        ys.append(h)
    return np.stack(ys), h


def test_rnn_streaming_equals_sequence_rnn():
    """Basic RNN (one step per invoke, state threaded) scores identically
    to UNIDIRECTIONAL_SEQUENCE_RNN over the whole sequence, both matching
    an independent numpy RNN; time_major layout too."""
    rng = np.random.default_rng(16)
    model_s, (w, rw, b) = _craft_rnn_model(rng)
    step_prog = TfliteProgram(model_s)
    T, B = 6, 2
    xs = rng.normal(0, 1.0, (T, B, 3)).astype(np.float32)
    want, want_h = _numpy_rnn(xs, w, rw, b)

    state = None
    got = []
    for t in range(T):
        out, state = step_prog.apply_stateful(step_prog.params,
                                              {"t0": xs[t]}, state)
        got.append(np.asarray(out["t5"]))
    np.testing.assert_allclose(np.stack(got), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["t4"]), want_h, atol=1e-5)

    model_q, _ = _craft_rnn_model(rng, sequence=True)
    model_q["tensors"][1]["data"] = w
    model_q["tensors"][2]["data"] = rw
    model_q["tensors"][3]["data"] = b
    seq_prog = TfliteProgram(model_q)
    seq = np.asarray(seq_prog.apply(
        seq_prog.params, {"t0": np.swapaxes(xs, 0, 1)})["t5"])  # (B, T, U)
    np.testing.assert_allclose(np.swapaxes(seq, 0, 1), want, atol=1e-5)

    model_tm, _ = _craft_rnn_model(rng, sequence=True, time_major=True,
                                   act=1)
    model_tm["tensors"][1]["data"] = w
    model_tm["tensors"][2]["data"] = rw
    model_tm["tensors"][3]["data"] = b
    tm_prog = TfliteProgram(model_tm)
    got_tm = np.asarray(tm_prog.apply(tm_prog.params, {"t0": xs})["t5"])
    want_relu, _ = _numpy_rnn(xs, w, rw, b,
                              act=lambda v: np.maximum(v, 0.0))
    np.testing.assert_allclose(got_tm, want_relu, atol=1e-5)


def test_l2_normalization():
    rng = np.random.default_rng(17)
    tensors = [{"name": f"t{i}", "shape": [], "dtype": 0, "data": None,
                "is_variable": False, "quant": None} for i in range(2)]
    op = {"opcode": 11, "inputs": [0], "outputs": [1], "options": None}
    prog = TfliteProgram({"tensors": tensors, "operators": [op],
                          "inputs": [0], "outputs": [1]})
    x = rng.normal(0, 2.0, (3, 8)).astype(np.float32)
    got = np.asarray(prog.apply(prog.params, {"t0": x})["t1"])
    np.testing.assert_allclose(
        got, x / np.linalg.norm(x, axis=-1, keepdims=True), atol=1e-5)


def _craft_generic(opcode, input_arrs, const_arrs, opt_fields=None,
                   n_out=1, out_dtypes=None):
    """One-op parsed-model dict: graph inputs first, then consts, then
    outputs; `opt_fields` is a {flatbuffer field: value} dict."""
    n_in, n_const = len(input_arrs), len(const_arrs)
    total = n_in + n_const + n_out
    tensors = [{"name": f"t{i}", "shape": [], "dtype": 0, "data": None,
                "is_variable": False, "quant": None} for i in range(total)]
    for j, arr in enumerate(const_arrs):
        t = tensors[n_in + j]
        t["data"] = np.asarray(arr)
        if t["data"].dtype in (np.int32, np.int64):
            t["dtype"] = 2 if t["data"].dtype == np.int32 else 4
        elif t["data"].dtype == np.bool_:
            t["dtype"] = 6
    for j in range(n_out):
        if out_dtypes:
            tensors[n_in + n_const + j]["dtype"] = out_dtypes[j]
    op = {"opcode": opcode,
          "inputs": list(range(n_in + n_const)),
          "outputs": list(range(n_in + n_const, total)),
          "options": _FakeRnnOpts(opt_fields) if opt_fields else None}
    model = {"tensors": tensors, "operators": [op],
             "inputs": list(range(n_in)),
             "outputs": list(range(n_in + n_const, total))}
    return model


def _run_generic(opcode, input_arrs, const_arrs, **kw):
    model = _craft_generic(opcode, input_arrs, const_arrs, **kw)
    prog = TfliteProgram(model)
    feeds = {f"t{i}": arr for i, arr in enumerate(input_arrs)}
    out = prog.apply(prog.params, feeds)
    n_lead = len(input_arrs) + len(const_arrs)
    return [np.asarray(out[f"t{n_lead + j}"])
            for j in range(len(model["outputs"]))]


def test_misc_ops_numpy_oracles():
    """The converter-output op batch (gather/pack/select/cast/one-hot/
    resize-company) against numpy semantics."""
    rng = np.random.default_rng(18)
    x = rng.normal(0, 1.5, (3, 7)).astype(np.float32)

    (y,) = _run_generic(36, [x], [np.array([2, 0], np.int32)],
                        opt_fields={0: 1})                    # GATHER axis 1
    np.testing.assert_array_equal(y, x[:, [2, 0]])

    (y,) = _run_generic(53, [x], [], out_dtypes=[2])          # CAST -> int32
    np.testing.assert_array_equal(y, x.astype(np.int32))

    v, i = _run_generic(48, [x], [np.array([3], np.int32)], n_out=2)
    order = np.argsort(-x, axis=-1)[:, :3]                    # TOPK_V2
    np.testing.assert_array_equal(i, order)
    np.testing.assert_allclose(v, np.take_along_axis(x, order, -1))

    a, b = x, np.float32(x[::-1])
    (y,) = _run_generic(83, [a, b], [], opt_fields={0: 2, 1: 1})  # PACK ax 1
    np.testing.assert_array_equal(y, np.stack([a, b], axis=1))
    y0, y1, y2 = _run_generic(88, [x], [], opt_fields={0: 3, 1: 0},
                              n_out=3)                        # UNPACK axis 0
    np.testing.assert_array_equal(np.stack([y0, y1, y2]), x)

    c = x > 0
    (y,) = _run_generic(123, [c.astype(np.bool_), a, b], [])  # SELECT_V2
    np.testing.assert_array_equal(y, np.where(c, a, b))

    (y,) = _run_generic(126, [a], [b], opt_fields={0: 0, 1: 1})
    np.testing.assert_allclose(y, a @ b.T, atol=1e-5)         # BMM adj_y
    (y,) = _run_generic(126, [a.T], [b], opt_fields={0: 1, 1: 1})
    np.testing.assert_allclose(y, a @ b.T, atol=1e-5)         # BMM adj_x+y
    (y,) = _run_generic(126, [a], [b.T], opt_fields={0: 0, 1: 0})
    np.testing.assert_allclose(y, a @ b.T, atol=1e-5)         # BMM plain

    idx = np.array([0, 2, 1], np.int32)
    (y,) = _run_generic(85, [idx],                            # ONE_HOT
                        [np.array(4, np.int32), np.float32(5.0),
                         np.float32(-1.0)], opt_fields={0: -1})
    want = np.full((3, 4), -1.0, np.float32)
    want[np.arange(3), idx] = 5.0
    np.testing.assert_array_equal(y, want)

    (y,) = _run_generic(100, [x], [np.array([[1, 1], [2, 0]], np.int32)],
                        opt_fields={0: 0})                    # MIRROR_PAD
    np.testing.assert_array_equal(y, np.pad(x, [(1, 1), (2, 0)],
                                            mode="reflect"))

    (y,) = _run_generic(70, [x], [np.array(1, np.int32)])     # EXPAND_DIMS
    assert y.shape == (3, 1, 7)
    (y,) = _run_generic(77, [x], [])                          # SHAPE
    np.testing.assert_array_equal(y, [3, 7])
    (y,) = _run_generic(94, [], [np.array([2, 3], np.int32),
                                 np.float32(7.5)])            # FILL
    np.testing.assert_array_equal(y, np.full((2, 3), 7.5, np.float32))
    (y,) = _run_generic(96, [], [np.array(1, np.int32),
                                 np.array(9, np.int32),
                                 np.array(3, np.int32)])      # RANGE
    np.testing.assert_array_equal(y, [1, 4, 7])

    (y,) = _run_generic(56, [x], [np.array(1, np.int32)])     # ARG_MAX
    np.testing.assert_array_equal(y, x.argmax(1))
    (y,) = _run_generic(89, [x], [np.array([0], np.int32)],
                        opt_fields={0: 0})                    # REDUCE_MIN
    np.testing.assert_allclose(y, x.min(0))
    (y,) = _run_generic(81, [np.abs(x)], [np.array([1], np.int32)],
                        opt_fields={0: 1})                    # REDUCE_PROD
    np.testing.assert_allclose(y, np.abs(x).prod(1, keepdims=True),
                               rtol=1e-5)

    n = np.array([[7, -7], [5, -5]], np.float32)
    d = np.array([[2, 2], [-3, -3]], np.float32)
    (y,) = _run_generic(90, [n, d], [])                       # FLOOR_DIV
    np.testing.assert_array_equal(y, np.floor_divide(n, d))
    (y,) = _run_generic(95, [n, d], [])                       # FLOOR_MOD
    np.testing.assert_array_equal(y, np.mod(n, d))

    (y,) = _run_generic(106, [a, b, a], [])                   # ADD_N
    np.testing.assert_allclose(y, a + b + a, atol=1e-6)
    (y,) = _run_generic(58, [a, b], [])                       # LESS
    np.testing.assert_array_equal(y, a < b)
    (y,) = _run_generic(71, [a, a], [])                       # EQUAL
    assert y.all()
    (y,) = _run_generic(86, [a > 0, b > 0], [])               # LOGICAL_AND
    np.testing.assert_array_equal(y, (a > 0) & (b > 0))
    (y,) = _run_generic(78, [np.abs(a), b], [])               # POW
    np.testing.assert_allclose(y, np.abs(a) ** b, rtol=2e-5)

    for code, fn in [(66, np.sin), (108, np.cos), (116, np.round),
                     (92, np.square), (104, np.ceil), (8, np.floor)]:
        (y,) = _run_generic(code, [x], [])
        np.testing.assert_allclose(y, fn(x), atol=1e-6)
    (y,) = _run_generic(111, [x], [])                         # ELU
    np.testing.assert_allclose(y, np.where(x > 0, x, np.expm1(x)),
                               atol=1e-6)
    (y,) = _run_generic(50, [x], [])                          # LOG_SOFTMAX
    want = x - np.log(np.exp(x - x.max(-1, keepdims=True)).sum(
        -1, keepdims=True)) - x.max(-1, keepdims=True)
    np.testing.assert_allclose(y, want, atol=1e-5)
    (y,) = _run_generic(69, [x], [np.array([2, 1], np.int32)])  # TILE
    np.testing.assert_array_equal(y, np.tile(x, (2, 1)))

    xs = np.arange(1 * 2 * 2 * 8, dtype=np.float32).reshape(1, 2, 2, 8)
    (y,) = _run_generic(5, [xs], [], opt_fields={0: 2})       # D2S NHWC
    (z,) = _run_generic(26, [y], [], opt_fields={0: 2})       # S2D inverts
    np.testing.assert_array_equal(z, xs)
    assert y.shape == (1, 4, 4, 2)


def test_transpose_conv_resize_match_torch():
    """TRANSPOSE_CONV (SAME stride-1 k3, VALID stride-2) and
    RESIZE_BILINEAR / RESIZE_NEAREST_NEIGHBOR against torch
    (half_pixel_centers == align_corners=False bilinear; default
    nearest == torch 'nearest')."""
    rng = np.random.default_rng(19)
    x = rng.normal(0, 1, (2, 4, 5, 3)).astype(np.float32)     # NHWC
    w = rng.normal(0, .5, (6, 3, 3, 3)).astype(np.float32)    # OHWI
    xr = rng.normal(0, 1, (2, 3, 4, 5)).astype(np.float32)    # NCHW for ref

    # TRANSPOSE_CONV op inputs are (output_shape, weights, x); craft the
    # model then reorder the op's input indices accordingly
    def run_tc(pad_code, stride, out_hw):
        model = _craft_generic(67, [x],
                               [np.array([2, out_hw[0], out_hw[1], 6],
                                         np.int32), w],
                               opt_fields={0: pad_code, 1: stride, 2: stride})
        op = model["operators"][0]
        op["inputs"] = [1, 2, 0]        # (output_shape, weights, x)
        prog = TfliteProgram(model)
        return np.asarray(prog.apply(prog.params, {"t0": x})["t3"])

    y_same = run_tc(0, 1, (4, 5))
    y_valid = run_tc(1, 2, (9, 11))

    def run_resize(code, size, fields):
        model = _craft_generic(code, [xr.transpose(0, 2, 3, 1)],
                               [np.array(size, np.int32)],
                               opt_fields=fields)
        prog = TfliteProgram(model)
        out = prog.apply(prog.params,
                         {"t0": xr.transpose(0, 2, 3, 1)})["t2"]
        return np.asarray(out).transpose(0, 3, 1, 2)          # back to NCHW

    got_bil = run_resize(23, [7, 9], {2: 0, 3: 1})            # hpc bilinear
    got_bil_ac = run_resize(23, [7, 9], {2: 1, 3: 0})         # align_corners
    got_nn = run_resize(97, [7, 9], {0: 0, 1: 0})             # default nn

    oracle = textwrap.dedent("""
        import sys
        import numpy as np
        import torch
        import torch.nn.functional as F
        z = np.load(sys.argv[1])
        x = torch.from_numpy(z["x"]).permute(0, 3, 1, 2)      # NHWC->NCHW
        w = torch.from_numpy(z["w"]).permute(3, 0, 1, 2)      # OHWI->IOHW
        xr = torch.from_numpy(z["xr"])
        out = dict(
            tc_same=F.conv_transpose2d(x, w, stride=1, padding=1),
            tc_valid=F.conv_transpose2d(x, w, stride=2, padding=0),
            bil=F.interpolate(xr, size=(7, 9), mode="bilinear",
                              align_corners=False),
            bil_ac=F.interpolate(xr, size=(7, 9), mode="bilinear",
                                 align_corners=True),
            nn=F.interpolate(xr, size=(7, 9), mode="nearest"),
        )
        out["tc_same"] = out["tc_same"].permute(0, 2, 3, 1)
        out["tc_valid"] = out["tc_valid"].permute(0, 2, 3, 1)
        np.savez(sys.argv[2], **{k: v.numpy() for k, v in out.items()})
    """)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        in_npz, out_npz = f"{td}/i.npz", f"{td}/o.npz"
        script = f"{td}/oracle.py"
        np.savez(in_npz, x=x, w=w, xr=xr)
        with open(script, "w") as f:
            f.write(oracle)
        r = subprocess.run([sys.executable, script, in_npz, out_npz],
                           capture_output=True, text=True,
                           env=dict(os.environ, JAX_PLATFORMS=""),
                           timeout=300)
        assert r.returncode == 0, f"torch oracle failed:\n{r.stderr[-2000:]}"
        with np.load(out_npz) as want:
            np.testing.assert_allclose(y_same, want["tc_same"], atol=2e-5)
            np.testing.assert_allclose(y_valid, want["tc_valid"], atol=2e-5)
            np.testing.assert_allclose(got_bil,
                                       want["bil"], atol=2e-5)
            np.testing.assert_allclose(got_bil_ac,
                                       want["bil_ac"], atol=2e-5)
            np.testing.assert_allclose(got_nn, want["nn"], atol=0)


def test_stateful_unknown_state_key_rejected():
    rng = np.random.default_rng(15)
    model, _ = _craft_svdf_model(rng)
    prog = TfliteProgram(model)
    with pytest.raises(ValueError, match="no variable tensors"):
        prog.apply_stateful(prog.params, {"t0": np.zeros((1, 3), np.float32)},
                            {"nope": np.zeros(4, np.float32)})


# ======================================================================
# quantized='exact': LiteRT integer-kernel semantics
# ======================================================================

def _qmult64(m):
    """Test-local QuantizeMultiplier (frexp to Q31, round half away)."""
    import math
    if m == 0.0:
        return 0, 0
    q, sh = math.frexp(m)
    qf = int(math.floor(q * (1 << 31) + 0.5))
    if qf == (1 << 31):
        qf //= 2
        sh += 1
    if sh < -31:
        return 0, 0
    return qf, sh


def _srdhm64(a, b):
    """int64 oracle of SaturatingRoundingDoublingHighMul (b positive)."""
    ab = np.int64(a) * np.int64(b)
    nudge = np.where(ab >= 0, np.int64(1 << 30), np.int64(1 - (1 << 30)))
    v = ab + nudge
    return np.where(v >= 0, v // (1 << 31), -((-v) // (1 << 31)))


def _rdbp64(x, e):
    """int64 oracle of RoundingDivideByPOT (nearest, ties away from 0)."""
    x = np.int64(x)
    mask = np.int64((1 << e) - 1)
    rem = x & mask
    thr = (mask >> 1) + (x < 0)
    return (x >> e) + (rem > thr)


def _mbqm64(x, m):
    """int64 oracle of MultiplyByQuantizedMultiplier for real multiplier m.
    The pre-scale left shift wraps in int32, as in the C kernels."""
    qm, sh = _qmult64(m)
    left, right = max(sh, 0), max(-sh, 0)
    shifted = (np.int64(x) * (1 << left)).astype(np.int32).astype(np.int64)
    return _rdbp64(_srdhm64(shifted, qm), right)


class TestQmathPrimitives:
    """ops.qmath's limb-arithmetic fixed-point primitives are bit-equal to
    an int64 reference over the full int32 domain."""

    def test_srdhm_fuzz(self):
        from openwakeword_tpu.ops import qmath
        rng = np.random.default_rng(7)
        a = rng.integers(-2**31, 2**31, 50000).astype(np.int32)
        b = rng.integers(2**30, 2**31, 50000).astype(np.int32)
        got = np.asarray(qmath.srdhm(a, b)).astype(np.int64)
        want = _srdhm64(a, b)
        np.testing.assert_array_equal(got, want)

    def test_srdhm_edges(self):
        from openwakeword_tpu.ops import qmath
        for a in (-2**31, -2**30, -1, 0, 1, 2**30, 2**31 - 1):
            for b in (2**30, 2**30 + 1, 2**31 - 1):
                assert int(qmath.srdhm(a, b)) == int(_srdhm64(a, b)), (a, b)

    def test_rounding_divide_by_pot_fuzz(self):
        from openwakeword_tpu.ops import qmath
        rng = np.random.default_rng(8)
        x = rng.integers(-2**31, 2**31, 50000).astype(np.int32)
        e = rng.integers(0, 32, 50000).astype(np.int32)
        got = np.asarray(qmath.rounding_divide_by_pot(x, e)).astype(np.int64)
        want = np.asarray([_rdbp64(xi, ei) for xi, ei in zip(x, e)])
        np.testing.assert_array_equal(got, want)

    def test_mbqm_matches_oracle_per_multiplier(self):
        from openwakeword_tpu.ops import qmath
        rng = np.random.default_rng(9)
        x = rng.integers(-2**24, 2**24, 5000).astype(np.int32)
        for m in (1e-6, 0.01, 0.25, 0.49999999, 0.5, 0.999, 1.0, 1.5,
                  123.456, 1000.0):
            qm, sh = qmath.quantize_multiplier(m)
            qm2, sh2 = _qmult64(m)
            assert (qm, sh) == (qm2, sh2), m
            got = np.asarray(qmath.multiply_by_quantized_multiplier(
                x, qm, sh)).astype(np.int64)
            want = _mbqm64(x, m)
            np.testing.assert_array_equal(got, want, err_msg=f"m={m}")


def _oracle_exact_int8_cnn2d(model, x):
    """Independent numpy-int64 execution of the quantized cnn2d fixture
    (QUANTIZE -> RESHAPE -> CONV_2D+RELU -> MAX_POOL -> DW_CONV+RELU ->
    MEAN -> FC -> LOGISTIC -> DEQUANTIZE), reading int weights and
    quantization params straight from the parsed flatbuffer."""
    t = {tt["name"]: tt for tt in model["tensors"]}

    def q(name):
        qq = t[name]["quant"]
        scale = np.asarray(qq["scale"], np.float64)
        zp = np.asarray(qq["zero_point"] or [0], np.int64)
        return scale, zp

    def rha(v):
        return np.sign(v) * np.floor(np.abs(v) + 0.5)

    in_s, _ = q("emb_q")
    # QUANTIZE (AffineQuantize)
    xq = np.clip(rha(x.astype(np.float64) / in_s[0]), -128, 127).astype(np.int64)
    xq = xq.reshape(16, 96, 1)

    # CONV_2D SAME 3x3 stride 1, RELU, per-channel int8 weights
    cw = np.asarray(t["conv.w"]["data"], np.int64)          # (8,3,3,1) OHWI
    cb = np.asarray(t["conv.b"]["data"], np.int64)
    cs, _ = q("conv.w")
    c0s, c0z = q("conv_out")
    H, W, Ci = xq.shape
    xp = np.zeros((H + 2, W + 2, Ci), np.int64)
    xp[1:H + 1, 1:W + 1] = xq                                # in_zp == 0
    acc = np.zeros((H, W, 8), np.int64)
    for kh in range(3):
        for kw in range(3):
            acc += np.einsum("hwc,oc->hwo", xp[kh:kh + H, kw:kw + W],
                             cw[:, kh, kw, :])
    acc += cb
    y = np.zeros_like(acc)
    for o in range(8):
        y[..., o] = _mbqm64(acc[..., o], float(in_s[0] * cs[o] / c0s[0]))
    conv = np.clip(y + c0z[0], max(-128, int(c0z[0])), 127)  # RELU: q(0)=zp

    # MAX_POOL 2x2 VALID stride 2
    pool = conv.reshape(8, 2, 48, 2, 8).max(axis=(1, 3))

    # DEPTHWISE_CONV SAME 3x3, RELU, per-channel along last dim
    dw = np.asarray(t["dw.w"]["data"], np.int64)             # (1,3,3,8)
    db = np.asarray(t["dw.b"]["data"], np.int64)
    ds, _ = q("dw.w")
    d0s, d0z = q("dw_out")
    Hp, Wp, C = pool.shape
    pp = np.zeros((Hp + 2, Wp + 2, C), np.int64)
    pp[1:Hp + 1, 1:Wp + 1] = pool                            # in_zp == 0
    acc = np.zeros((Hp, Wp, C), np.int64)
    for kh in range(3):
        for kw in range(3):
            acc += pp[kh:kh + Hp, kw:kw + Wp] * dw[0, kh, kw]
    acc += db
    y = np.zeros_like(acc)
    for c in range(C):
        y[..., c] = _mbqm64(acc[..., c], float(c0s[0] * ds[c] / d0s[0]))
    dwo = np.clip(y + d0z[0], max(-128, int(d0z[0])), 127)

    # MEAN over (H, W): same scale/zp -> rounded integer division
    num = Hp * Wp
    s = dwo.sum(axis=(0, 1))
    mean = np.sign(s) * ((np.abs(s) + num // 2) // num)
    mean = np.clip(mean, -128, 127)

    # FULLY_CONNECTED, uint8 weights zp 128
    fw = np.asarray(t["fc.w"]["data"], np.int64)             # (1,8) uint8
    fb = np.asarray(t["fc.b"]["data"], np.int64)
    fs, fz = q("fc.w")
    m0s, m0z = q("pooled")
    lgs, lgz = q("logits")
    acc = (mean - m0z[0]) @ (fw - fz[0]).T + fb
    logits = np.clip(_mbqm64(acc, float(m0s[0] * fs[0] / lgs[0])) + lgz[0],
                     -128, 127)

    # LOGISTIC via 256-entry LUT (float32 math, as PopulateLookupTable)
    codes = np.arange(-128, 128, dtype=np.int64)
    deq = (np.float32(lgs[0]) * (codes - lgz[0]).astype(np.float32))
    f = 1.0 / (1.0 + np.exp(-deq, dtype=np.float32))
    sqs, sqz = q("score_q")
    table = np.clip(rha(f / np.float32(sqs[0])).astype(np.int64) + sqz[0],
                    -128, 127)
    score_q = table[logits + 128]

    # DEQUANTIZE
    return ((score_q - sqz[0]) * sqs[0]).astype(np.float32)


class TestExactInt8:
    """quantized='exact' reproduces LiteRT integer-kernel scores bit-for-bit
    against an independent numpy-int64 oracle (reference utils.py:112-161
    executes int8 graphs natively through the interpreter)."""

    @pytest.fixture(scope="class")
    def qmodel(self, tmp_path_factory):
        from tests import fixture_builders
        tmp = tmp_path_factory.mktemp("tflite_exact")
        rng = np.random.default_rng(11)
        z = {"conv.weight": rng.normal(0, .5, (8, 1, 3, 3)).astype(np.float32),
             "conv.bias": rng.normal(0, .1, 8).astype(np.float32),
             "dw.weight": rng.normal(0, .5, (8, 1, 3, 3)).astype(np.float32),
             "dw.bias": rng.normal(0, .1, 8).astype(np.float32),
             "fc.weight": rng.normal(0, .5, (1, 8)).astype(np.float32),
             "fc.bias": rng.normal(0, .1, 1).astype(np.float32)}
        path = str(tmp / "cnn2d_int8.tflite")
        fixture_builders.build_quantized_cnn2d_graph_head_tflite(path, z)
        return load_tflite(path)

    def test_bit_exact_vs_int64_oracle(self, qmodel):
        """Whole-pipeline scores are BIT-EQUAL to the independent integer
        oracle over random embedding windows (not merely within 1 LSB)."""
        prog = TfliteProgram(qmodel, quantized="exact")
        rng = np.random.default_rng(12)
        for _ in range(8):
            x = rng.normal(0, 1.2, (1, 16, 96)).astype(np.float32)
            got = np.asarray(prog.apply(prog.params, {"emb": x})["score"])
            want = _oracle_exact_int8_cnn2d(qmodel, x[0])
            np.testing.assert_array_equal(got.ravel(), want.ravel())

    def test_output_on_quantization_grid(self, qmodel):
        """Exact-mode scores land exactly on the int8 output grid
        (scale 1/256, zp -128) — a float emulation almost never does."""
        prog = TfliteProgram(qmodel, quantized="exact")
        rng = np.random.default_rng(13)
        x = rng.normal(0, 1.0, (1, 16, 96)).astype(np.float32)
        s = float(np.asarray(prog.apply(prog.params, {"emb": x})["score"]))
        assert abs(s * 256 - round(s * 256)) < 1e-6

    def test_jit_matches_eager(self, qmodel):
        import jax
        prog = TfliteProgram(qmodel, quantized="exact")
        fn = jax.jit(lambda p, x: prog.apply(p, {"emb": x})["score"])
        rng = np.random.default_rng(14)
        x = rng.normal(0, 1.0, (1, 16, 96)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(fn(prog.params, x)),
            np.asarray(prog.apply(prog.params, {"emb": x})["score"]))

    def test_emulation_drift_bounded(self, qmodel):
        """The default dequantized-float emulation tracks the exact integer
        scores within a couple of output LSBs on this graph (measured and
        documented in COMPATIBILITY.md #14)."""
        pe = TfliteProgram(qmodel, quantized="exact")
        pd = TfliteProgram(qmodel, quantized="dequant")
        rng = np.random.default_rng(15)
        x = rng.normal(0, 1.0, (64, 16, 96)).astype(np.float32)
        # batch-pinned reshape: run per-sample
        diffs = []
        for i in range(x.shape[0]):
            ye = float(np.asarray(pe.apply(pe.params, {"emb": x[i:i + 1]})["score"]))
            yd = float(np.asarray(pd.apply(pd.params, {"emb": x[i:i + 1]})["score"]))
            diffs.append(abs(ye - yd))
        assert max(diffs) < 16.0 / 256.0, max(diffs)

    def test_add_mul_ops_exact(self):
        """ADD (shared <<20 domain) and MUL integer kernels vs the oracle."""
        from openwakeword_tpu.ops import qmath

        def mk(opcode, s1, z1, s2, z2, so, zo):
            tensors = []
            for name, (s, z) in (("a", (s1, z1)), ("b", (s2, z2)),
                                 ("y", (so, zo))):
                tensors.append({"name": name, "shape": [4], "dtype": 9,
                                "data": None, "is_variable": False,
                                "quant": {"scale": [s], "zero_point": [z],
                                          "dim": 0, "details_type": 0}})
            return {"tensors": tensors,
                    "operators": [{"opcode": opcode, "inputs": [0, 1],
                                   "outputs": [2], "options": None}],
                    "inputs": [0, 1], "outputs": [2]}

        rng = np.random.default_rng(16)
        a = rng.integers(-128, 128, 256).astype(np.int8)
        b = rng.integers(-128, 128, 256).astype(np.int8)
        # flatbuffer scales are float32 — the oracle must derive multipliers
        # from the same float32 values the executor reads
        s1, s2, so = (float(np.float32(v)) for v in (0.07, 0.11, 0.2))
        z1, z2, zo = 3, -5, 1

        # ADD oracle
        twice_max = 2.0 * max(s1, s2)
        v1 = (a.astype(np.int64) - z1) << 20
        v2 = (b.astype(np.int64) - z2) << 20
        sc1 = _mbqm64(v1.astype(np.int32), s1 / twice_max)
        sc2 = _mbqm64(v2.astype(np.int32), s2 / twice_max)
        want_add = np.clip(_mbqm64((sc1 + sc2).astype(np.int32),
                                   twice_max / ((1 << 20) * so)) + zo,
                           -128, 127).astype(np.int8)
        model = mk(0, s1, z1, s2, z2, so, zo)          # ADD
        model["tensors"][0]["shape"] = [256]
        model["tensors"][1]["shape"] = [256]
        model["tensors"][2]["shape"] = [256]
        prog = TfliteProgram(model, quantized="exact")
        got = np.asarray(prog.apply(prog.params, {"a": a, "b": b})["y"])
        np.testing.assert_array_equal(got, want_add)

        # MUL oracle
        raw = (a.astype(np.int64) - z1) * (b.astype(np.int64) - z2)
        want_mul = np.clip(_mbqm64(raw.astype(np.int32), s1 * s2 / so) + zo,
                           -128, 127).astype(np.int8)
        model = mk(18, s1, z1, s2, z2, so, zo)         # MUL
        model["tensors"][0]["shape"] = [256]
        model["tensors"][1]["shape"] = [256]
        model["tensors"][2]["shape"] = [256]
        prog = TfliteProgram(model, quantized="exact")
        got = np.asarray(prog.apply(prog.params, {"a": a, "b": b})["y"])
        np.testing.assert_array_equal(got, want_mul)
        assert qmath is not None

    def test_unsupported_quantized_op_typed_error(self):
        """int8 SOFTMAX (fixed-point kernel out of scope) raises a typed
        error pointing back at quantized='dequant'."""
        tensors = [{"name": n, "shape": [1, 4], "dtype": 9, "data": None,
                    "is_variable": False,
                    "quant": {"scale": [0.1], "zero_point": [0], "dim": 0,
                              "details_type": 0}} for n in ("x", "y")]
        model = {"tensors": tensors,
                 "operators": [{"opcode": 25, "inputs": [0], "outputs": [1],
                                "options": None}],
                 "inputs": [0], "outputs": [1]}
        prog = TfliteProgram(model, quantized="exact")
        with pytest.raises(NotImplementedError, match="dequant"):
            prog.apply(prog.params, {"x": np.zeros((1, 4), np.int8)})

    def test_dequant_mode_unchanged_default(self, qmodel):
        """The default constructor still runs dequantized-float emulation
        (params are float leaves, not int)."""
        prog = TfliteProgram(qmodel)
        assert all(np.issubdtype(np.asarray(v).dtype, np.floating)
                   for v in prog.params.values())
        proge = TfliteProgram(qmodel, quantized="exact")
        assert any(np.issubdtype(np.asarray(v).dtype, np.integer)
                   for v in proge.params.values())


class TestExactInt8Serving:
    """quantized_execution='exact' plumbs end-to-end: Model and
    MultiStreamEngine serve int8 graphs with integer-kernel scores (every
    emitted score sits exactly on the graph's output quantization grid)."""

    @pytest.fixture(scope="class")
    def qpath(self, tmp_path_factory):
        from tests import fixture_builders
        tmp = tmp_path_factory.mktemp("tflite_exact_serve")
        rng = np.random.default_rng(21)
        z = {"conv.weight": rng.normal(0, .5, (8, 1, 3, 3)).astype(np.float32),
             "conv.bias": rng.normal(0, .1, 8).astype(np.float32),
             "dw.weight": rng.normal(0, .5, (8, 1, 3, 3)).astype(np.float32),
             "dw.bias": rng.normal(0, .1, 8).astype(np.float32),
             "fc.weight": rng.normal(0, .5, (1, 8)).astype(np.float32),
             "fc.bias": rng.normal(0, .1, 1).astype(np.float32)}
        path = str(tmp / "cnn2d_int8.tflite")
        fixture_builders.build_quantized_cnn2d_graph_head_tflite(path, z)
        return path

    def test_model_serves_exact(self, qpath, test_clips):
        import openwakeword_tpu as oww
        m = oww.Model(wakeword_models=[qpath],
                      quantized_execution="exact")
        preds = m.predict_clip(test_clips["alexa"])
        assert len(preds) > 10
        scores = np.asarray([float(v) for fr in preds for v in fr.values()])
        # the int8 logistic output grid is 1/256 with zp -128; a score off
        # the grid would mean float arithmetic leaked into the head
        on_grid = np.abs(scores * 256 - np.round(scores * 256)) < 1e-4
        assert on_grid.all(), scores[~on_grid][:5]

    def test_engine_serves_exact(self, qpath):
        from openwakeword_tpu.parallel.engine import MultiStreamEngine
        eng = MultiStreamEngine(wakeword_models=[qpath], n_streams=3,
                                quantized_execution="exact")
        rng = np.random.default_rng(22)
        frames = rng.integers(-3000, 3000, (4, 3, 1280)).astype(np.int16)
        scores = np.asarray(eng.predict_frames(frames))
        assert scores.shape == (4, 3, len(eng.labels))
        on_grid = np.abs(scores * 256 - np.round(scores * 256)) < 1e-3
        assert on_grid.all()
